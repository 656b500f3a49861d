"""Deduplication suite — the large-scale-training-pipeline extension set
(SURVEY §7 phase 4; no reference lineage — the reference has no dedup).

Five strategies, each shaped for 100 TB:

- **exact**: hash-groupBy on md5(text). One shuffle keyed by digest;
  digests are uniform so no skew.
- **MinHash + LSH**: shingle → minhash signature → band keys →
  bucket-join. Candidate generation is a self-equi-join on (band, key)
  — shuffle is keyed by band value, never all-pairs. Verification
  computes true Jaccard only on candidates.
- **SimHash**: 16-bit signature via array ops (zero shuffle to compute),
  equal-signature blocking.
- **n-gram Jaccard**: inverted-index join on shared shingles (classic
  "explode + self-join + count common" — pair space limited to pairs
  that share at least one shingle).
- **embedding cosine**: blocking key (label or LSH bucket) → within-block
  pairs → exact cosine. Never a full cross join.

All outputs carry total tie-break orderings so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import eager_persist
from .skew import fan_out
from ..functions.vectors import quantize
from ..functions.text import (
    minhash_signature,
    simhash16,
    simhash64_bands,
    simhash64_bands_np,
    tokenize,
    word_shingles,
)


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_md5, canonical_id, n_dups) for every distinct text; dedup =
    keep canonical_id. Works at any scale: one shuffle on the digest."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def exact_dup_groups_sql(rel: str = "documents", text_col: str = "text") -> str:
    return (
        f"SELECT md5({text_col}) AS text_md5, min(doc_id) AS canonical_id, "
        f"CAST(count(*) AS BIGINT) AS n_dups FROM {rel} GROUP BY md5({text_col})"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MINHASH_HASHES = 8
MINHASH_BANDS = 4  # rows-per-band = 2
SHINGLE_N = 3

# --- 100 TB production profile -------------------------------------------
# The defaults above are sized to the sf0.01 test vocabulary (tiny docs,
# tiny shingle space). A production corpus uses the tuple below — same
# code path, just parameters. Banding theory: a pair with Jaccard s
# becomes a candidate with p(s) = 1 - (1 - s^r)^b where r = hashes/bands;
# the S-curve midpoint ("threshold") is t ≈ (1/b)^(1/r). The production
# tuple targets t ≈ 0.707 with a sharp curve (near-dups at s ≥ 0.8 are
# caught with p > 0.99, unrelated docs at s ≤ 0.4 leak with p < 0.01).
# The recall/FPR table at these values lives in SCALING.md §"100 TB
# parameter profile"; tests/test_properties.py asserts the formula holds
# for this exact tuple so the profile can't drift from the math.
PROD_MINHASH_HASHES = 128
PROD_MINHASH_BANDS = 16  # r = 8 → t = (1/16)^(1/8) ≈ 0.707


def shingle_sets(docs: DataFrame, text_col: str = "text", shingle_n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, sh): distinct word-shingle set per doc. MinHash over the
    distinct set equals minhash over the multiset (min ignores dups)."""
    return fan_out(docs).select(
        "doc_id",
        F.array_distinct(
            word_shingles(tokenize(F.col(text_col)), shingle_n)
        ).alias("sh"),
    )


def minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = MINHASH_HASHES,
    num_bands: int = MINHASH_BANDS,
    shingle_n: int = SHINGLE_N,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, key): one row per LSH band; key concatenates the
    band's minhash values. Docs sharing any (band, key) are candidates.

    Pass a persisted ``shingles`` frame to stop the 8 per-seed signature
    passes from each re-deriving the shingle array (Catalyst inlines the
    sub-expression per pass; against a materialized column each pass is
    just an md5 scan of the cached array)."""
    rows_per_band = num_hashes // num_bands
    if shingles is None:
        shingles = shingle_sets(docs, text_col, shingle_n)
    sig = minhash_signature(F.col("sh"), num_hashes)
    d = shingles.select("doc_id", sig.alias("sig"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), "|"
                ).alias("key"),
            )
            for b in range(num_bands)
        ]
    )
    return d.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def minhash_bands_sql(
    text_tokens_sql: str,
    shingles_sql_fn,
    num_hashes: int = MINHASH_HASHES,
    num_bands: int = MINHASH_BANDS,
) -> str:
    """Built in registry (needs the shared CTE text); kept here for symmetry."""
    raise NotImplementedError("composed directly in registry oracle SQL")


def candidate_pairs(bands: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Distinct (a, b) doc pairs sharing at least one LSH band bucket.

    groupBy (band, key) → sorted id list → per-bucket pair expansion with
    array ops. ONE scan of the signature plan and ONE shuffle — a
    self-equi-join would scan it twice and shuffle twice (measured 2-3×
    slower at sf0.1). Pair count is Σ bucket² — bounded by bucket sizes,
    never n². ``max_bucket`` caps pathological mega-buckets (boilerplate
    families at 100 TB): an oversized bucket degrades to pairing every
    member with the bucket's min doc only (a star, |bucket|−1 pairs
    instead of |bucket|²/2) — members still land in one cluster through
    the connected-components step, without the quadratic blowup."""
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        star = F.transform(
            F.slice(F.col("ids"), 2, F.size(F.col("ids")) - 1),
            lambda x: F.struct(
                F.element_at(F.col("ids"), 1).alias("a"), x.alias("b")
            ),
        )
        return (
            buckets.filter(F.size("ids") > max_bucket)
            .select(F.explode(star).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .unionByName(
                # small buckets are already grouped — re-exploding and
                # re-aggregating them would cost a whole extra shuffle
                _pairs_from_buckets(buckets.filter(F.size("ids") <= max_bucket))
            )
            .distinct()
        )
    return _pairs_from_buckets(buckets)


def _pairs_from_buckets(buckets: DataFrame) -> DataFrame:
    """All (a, b), a < b, within each bucket's sorted ``ids`` array,
    deduped across buckets. Array-op pair expansion — no self-join."""
    ids = F.col("ids")
    n = F.size(ids)
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.transform(
                F.slice(ids, i + 2, n - i - 1),
                lambda x: F.struct(
                    F.element_at(ids, i + 1).alias("a"), x.alias("b")
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    text_col: str = "text",
    shingle_n: int = SHINGLE_N,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """True Jaccard over distinct word-shingle sets, only for candidate
    pairs. Shingle sets ride along the join (bounded per doc). Pass a
    precomputed (persisted) ``shingles`` frame ``(doc_id, sh)`` to reuse
    an existing materialization — the single definition of the verify
    step for every caller."""
    if shingles is None:
        shingles = docs.select(
            "doc_id",
            F.array_distinct(
                word_shingles(tokenize(F.col(text_col)), shingle_n)
            ).alias("sh"),
        )
    a = shingles.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = shingles.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - common
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            quantize(common / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
    )


def containment_on_pairs(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    text_col: str = "text",
    shingle_n: int = SHINGLE_N,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Max-containment |A∩B| / min(|A|, |B|) over distinct shingle sets,
    for candidate pairs — the NEAR-SUBSET metric. A short doc quoted
    whole inside a long one has containment ~1 but Jaccard ~|A|/|B|
    (arbitrarily low), so Jaccard-threshold dedup never sees it;
    containment is how quote-inclusion and boilerplate-wrapping
    duplicates are caught. Same join shape (and cost) as
    :func:`jaccard_on_pairs`."""
    if shingles is None:
        shingles = docs.select(
            "doc_id",
            F.array_distinct(
                word_shingles(tokenize(F.col(text_col)), shingle_n)
            ).alias("sh"),
        )
    a = shingles.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = shingles.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    smaller = F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            quantize(common / F.greatest(smaller, F.lit(1)), 6).alias(
                "containment"
            ),
        )
    )


def minhash_containment_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.6
) -> DataFrame:
    """MinHash-LSH candidates verified by CONTAINMENT >= threshold (same
    banding/persist discipline as :func:`minhash_dedup_pairs`)."""
    sh = eager_persist(shingle_sets(docs, text_col))
    pairs = candidate_pairs(minhash_bands(docs, text_col, shingles=sh))
    return containment_on_pairs(pairs, shingles=sh).filter(
        F.col("containment") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def minhash_dedup_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composed MinHash-LSH dedup: bands → candidate pairs → Jaccard
    verify, with the two shared intermediates persisted.

    Without the persists, the signature plan (tokenize → shingle → 8 md5
    passes) is re-evaluated on each side of the self-join AND under both
    jaccard lookups — ~6× the work (measured 50s → 5s at sf0.1). On a
    cluster the same pattern applies: materialize signatures once, reuse
    (mirrors the two-branch ``DStream.cache()`` the reference needed,
    ``SparkRunner.scala:79,112``)."""
    sh = eager_persist(shingle_sets(docs, text_col))
    pairs = candidate_pairs(minhash_bands(docs, text_col, shingles=sh))
    return jaccard_on_pairs(pairs, shingles=sh)


def simhash_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 16-bit signature, computed with pure array ops
    (no shuffle, no UDF). ``fan_out`` widens a sub-128MB single-split
    scan so the digest uses every core (no-op at real scale, measured
    ~2x at sf0.1)."""
    return fan_out(docs).select(
        "doc_id", simhash16(tokenize(F.col(text_col))).alias("simhash")
    )


def simhash_dup_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pairs with identical 16-bit simhash (hamming-0 blocking)."""
    s = simhash_docs(docs, text_col)
    a = s.select(F.col("doc_id").alias("a"), F.col("simhash"))
    b = s.select(F.col("doc_id").alias("b"), F.col("simhash"))
    return a.join(b, "simhash").filter(F.col("a") < F.col("b")).select("a", "b", "simhash")


def simhash64_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    digest: str = "np",
) -> DataFrame:
    """Near-dup pairs within Hamming distance ``max_hamming`` of a 64-bit
    SimHash, via 4×16-bit band blocking (pigeonhole: Hamming ≤ 3 ⇒ at
    least one identical band — see :func:`simhash64_bands`).

    Candidate generation is an equi-join on (band, value): the shuffle is
    keyed by 16-bit band values, so pair space is Σ bucket², never n².
    Verification is exact: XOR + popcount over the four bands, all
    JVM-side (``bit_count``). Bands are persisted once and reused by the
    blocking join and both verify lookups.

    ``digest``: ``"np"`` (default) uses the Arrow-vectorized digest
    (:func:`simhash64_bands_np`, ~3× faster); ``"expr"`` the
    pure-Catalyst one — bit-identical, kept for parity checks and
    UDF-free deployments."""
    digest_fn = simhash64_bands_np if digest == "np" else simhash64_bands
    s = eager_persist(  # one digest computation feeds three consumers
        fan_out(docs).select(
            "doc_id", digest_fn(tokenize(F.col(text_col))).alias("bands")
        )
    )
    e = s.select("doc_id", F.posexplode("bands").alias("band", "val"))
    a = e.select(F.col("doc_id").alias("a"), "band", "val")
    b = e.select(F.col("doc_id").alias("b"), "band", "val")
    pairs = (
        a.join(b, ["band", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ba = s.select(F.col("doc_id").alias("a"), F.col("bands").alias("ba"))
    bb = s.select(F.col("doc_id").alias("b"), F.col("bands").alias("bb"))
    ham = F.aggregate(
        F.zip_with("ba", "bb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        pairs.join(ba, "a")
        .join(bb, "b")
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index (no LSH; exact over sharing pairs)
# ---------------------------------------------------------------------------


def hashed_shingle_sets(
    docs: DataFrame, text_col: str = "text", shingle_n: int = SHINGLE_N
) -> DataFrame:
    """(doc_id, shs): distinct shingles hashed to 48-bit longs (portable
    md5 prefix), hashed ONCE per doc — join keys and per-pair verify
    arrays then carry 8-byte longs instead of shingle strings: less
    shuffle and a cheaper ``array_intersect``. 48 bits ≈ zero collision
    probability at any realistic per-doc shingle count, and set
    cardinalities are preserved, so Jaccard over the hashed sets is
    exact (DuckDB oracles verify against raw string sets)."""
    from ..sources.io import hash48

    shash = F.transform(F.col("sh"), lambda s: hash48(s))
    return shingle_sets(docs, text_col, shingle_n).select(
        "doc_id", shash.alias("shs")
    )


def ppjoin_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = SHINGLE_N,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT threshold similarity join via PPJoin-style prefix filtering:
    every pair with Jaccard ≥ ``threshold`` over distinct word-shingle
    sets, with provably complete recall (unlike the df-cut heuristic in
    :func:`ngram_jaccard_pairs` or the probabilistic MinHash path).

    Prefix-filter lemma: order the shingle universe by any fixed total
    order (here ascending document frequency, rarest first, ties by
    hash); if J(x, y) ≥ t then the first ``|x| − ⌈t·|x|⌉ + 1`` shingles
    of x and the corresponding prefix of y must intersect. Candidates =
    pairs whose PREFIXES share a shingle; the full-set Jaccard verify
    then makes the result exact. The output is independent of the
    chosen order (any consistent order satisfies the lemma), which is
    also why the DuckDB oracle — ordering raw strings where we order
    48-bit hashes — must and does produce identical rows.

    Scale shape: df table is one count shuffle bounded by |vocab|; the
    prefix cut drops ~t of every doc's exploded rows BEFORE the
    self-join, and because prefixes hold each doc's RAREST shingles the
    surviving buckets are the small ones — candidate volume falls
    quadratically. The verify join carries per-doc hashed sets, bounded
    per doc. Skew: the hottest shingle appears in a prefix only when a
    doc has nothing rarer, so boilerplate mega-buckets self-suppress."""
    shd = eager_persist(hashed_shingle_sets(docs, text_col, shingle_n))
    sh = shd.select("doc_id", F.explode("shs").alias("sh"))
    dfq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # deliberately NOT broadcast(dfq): measured equal-or-slower at sf0.1
    # (the broadcast build is a barrier; the shuffle join overlaps with
    # the df aggregate), and at web scale a 10⁷-row df table times 1000
    # executors is real network — AQE picks broadcast when it's actually
    # small
    e = sh.join(dfq, "sh")
    per_doc = Window.partitionBy("doc_id")
    rn = F.row_number().over(per_doc.orderBy("df", "sh"))
    n = F.count(F.lit(1)).over(per_doc)
    # ceil over a FLOAT product can round an exact integer t·n up (e.g.
    # 0.07·100 → 7.000000000000001 → ceil 8), shortening the prefix by
    # one and silently breaking the completeness guarantee. The epsilon
    # keeps exact-integer products at their integer; a longer prefix is
    # always safe (more candidates), a shorter one never is. The oracle
    # carries the identical epsilon.
    prefix_len = n - F.ceil(F.lit(threshold) * n - F.lit(1e-9)) + 1
    prefix = (
        e.select("doc_id", "sh", rn.alias("rn"), prefix_len.alias("plen"))
        .filter(F.col("rn") <= F.col("plen"))
        .select("doc_id", "sh")
    )
    a = prefix.select(F.col("doc_id").alias("a"), "sh")
    b = prefix.select(F.col("doc_id").alias("b"), "sh")
    pairs = (
        a.join(b, "sh").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    scored = jaccard_on_pairs(
        pairs, shingles=shd.select("doc_id", F.col("shs").alias("sh"))
    )
    return scored.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 2,
    min_jaccard: float = 0.0,
    max_df_fraction: float | None = None,
) -> DataFrame:
    """Exact Jaccard over pairs sharing ≥1 (rare) n-gram shingle.

    Inverted-index self-join: explode distinct shingles → join on shingle
    → count common → join per-doc set sizes. ``max_df_fraction`` applies
    a document-frequency cut to the JOIN shingles (PPJoin-style prefix
    filtering): only shingles appearing in ≤ frac·N docs generate
    candidate pairs — hot boilerplate shingles would otherwise make the
    join quadratic (measured 25s → 1s at sf0.1 on this tiny-vocab
    corpus). Near-dup pairs share rare shingles, so recall for
    high-jaccard pairs is preserved; Jaccard itself is still computed
    over the FULL shingle sets of each candidate pair."""
    # one materialization of the shingle plan feeds everything below
    # (inverted-index buckets, sizes, and the per-pair verify arrays).
    # Shingles are hashed to 48-bit longs (portable md5 prefix) ONCE per
    # doc: the inverted-index join keys and the per-pair verify arrays
    # then carry 8-byte longs instead of shingle strings — less shuffle
    # and a cheaper array_intersect. 48 bits ≈ zero collision probability
    # at any realistic per-doc shingle count, and set cardinalities are
    # preserved, so Jaccard is exact (the DuckDB oracle verifies against
    # raw string sets).
    shd = eager_persist(hashed_shingle_sets(docs, text_col, shingle_n))
    sh = shd.select("doc_id", F.explode("shs").alias("sh"))
    # NB: the bucket-expansion pattern (_pairs_from_buckets) was MEASURED
    # 3× slower here — rare-shingle buckets hold up to max_df≈5%·N docs,
    # so expansion builds ~(max_df²/2)-struct arrays on single rows
    # (skew + allocation); the streaming hash self-join handles big
    # buckets gracefully. Bucket expansion wins only for small buckets
    # (minhash bands). Keep the join shape.
    join_sh = sh
    if max_df_fraction is not None:
        # count off the just-persisted shingle frame (one row per doc) —
        # docs.count() would re-execute the full upstream lineage
        max_df = int(-(-shd.count() * max_df_fraction // 1))  # ceil, driver scalar
        # df >= 2 is result-preserving (a singleton shingle joins only to
        # itself, and a < b drops that row) but matters enormously at
        # scale: a Zipf vocabulary is MOSTLY hapax shingles, so the cut
        # removes the bulk of the exploded join input for free.
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("sh")
        )
        join_sh = sh.join(rare, "sh", "left_semi")
    a = join_sh.select(F.col("doc_id").alias("a"), "sh")
    b = join_sh.select(F.col("doc_id").alias("b"), "sh")
    pairs = a.join(b, "sh").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    # set sizes come free from the arrays already joined for the
    # intersection — no separate sizes frame, two fewer joins
    common = (
        pairs.join(shd.select(F.col("doc_id").alias("a"), F.col("shs").alias("sh_a")), "a")
        .join(shd.select(F.col("doc_id").alias("b"), F.col("shs").alias("sh_b")), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("common"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
    )
    return (
        common.select(
            "a",
            "b",
            quantize(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (blocking key → within-block pairs)
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    emb: DataFrame, block_col: Column, min_cos: float, dim: int = 64
) -> DataFrame:
    """Near-dup pairs by cosine within a blocking key. The block join is
    an equi-join on the key — pair count is Σ block² not n², and blocks
    shuffle independently.

    Each side carries its PRECOMPUTED norm through the join (same rule
    as ``similarity._pairs``): recomputing ``norm(va)·norm(vb)`` per
    pair triples the per-pair FLOPs. Bitwise identical to the
    per-pair form — the norm is the same fold over the same values and
    the denominator multiply order is unchanged — so the oracle hash is
    unaffected."""
    from ..functions.vectors import as_double, dot, norm, quantize

    e = emb.select(
        "vec_id", block_col.alias("blk"), as_double(F.col("embedding")).alias("v")
    ).withColumn("n", norm(F.col("v"), dim))
    # r12: the b side broadcasts (small table), so the per-pair fold
    # stage inherits a's partitioning — ONE task on the single local
    # parquet split (profiled 0.89 s serial of the query's 1.3 s wall);
    # fan_out spreads it, no-op at scale
    a = fan_out(e).select(
        F.col("vec_id").alias("a"), "blk",
        F.col("v").alias("va"), F.col("n").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("b"), "blk",
        F.col("v").alias("vb"), F.col("n").alias("nb"),
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(
        denom != 0, quantize(dot(F.col("va"), F.col("vb"), dim) / denom, 6)
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cos"))
        .filter(F.col("cos") >= min_cos)
    )


def pair_evidence(
    docs: DataFrame,
    text_col: str = "text",
    top_evidence: int = 3,
) -> DataFrame:
    """Near-dup AUDIT: the minhash candidate pairs with the evidence a
    human reviewer (or a dedup appeal process) needs — shared-shingle
    count, exact Jaccard, and the first ``top_evidence`` shared shingles
    in lexicographic order. Same shape as the verify stage (shingle sets
    ride the pair join as bounded per-row arrays; no explode), so the
    audit costs one extra per-row intersect over the frame the pipeline
    already builds."""
    from ..functions.vectors import quantize

    sh = eager_persist(shingle_sets(docs, text_col))
    pairs = candidate_pairs(minhash_bands(docs, text_col, shingles=sh))
    x = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    y = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    shared = F.array_sort(F.array_intersect(F.col("sha"), F.col("shb")))
    n_shared = F.size(shared)
    union_n = F.greatest(
        F.size("sha") + F.size("shb") - n_shared, F.lit(1)
    )
    return (
        pairs.join(x, "a")
        .join(y, "b")
        .select(
            "a",
            "b",
            n_shared.cast("int").alias("n_shared"),
            quantize(n_shared.cast("double") / union_n, 6).alias("jaccard"),
            F.array_join(F.slice(shared, 1, top_evidence), " | ").alias(
                "evidence"
            ),
        )
    )
