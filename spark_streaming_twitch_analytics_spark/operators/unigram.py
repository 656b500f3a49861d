"""Distributed unigram-LM (SentencePiece-style) tokenizer induction.

The second tokenizer family a training-data pipeline needs next to BPE
(``operators/bpe.py``): Kudo 2018's unigram language model, in its
hard-EM (Viterbi-EM) formulation — the E-step assigns each word its
single best segmentation under the current piece probabilities instead
of lattice expectations, a standard, documented EM variant that keeps
every step an exact distributed aggregate:

- **train on the distinct-word frequency table, not the corpus** (the
  same property that makes BPE feasible at 100 TB): the corpus is
  scanned once for word counts; every EM iteration afterwards touches
  only the ≤ ``top_words``-row vocabulary table, so iteration cost is
  independent of corpus size;
- **seed vocabulary** = the most frequent substrings (length ≤
  ``MAXPIECE``) of the training words, weighted by word frequency,
  plus ALL 26 letters — the letter floor (count = usage + 1) keeps
  every ``[a-z]+`` word segmentable at every round, the unigram
  equivalent of BPE's character base vocabulary;
- **E-step** = per-word Viterbi over piece log-probs, expressed as one
  ``F.aggregate`` left fold per word carrying a ``MAXPIECE``-wide DP
  window (scores + best token paths) — no Python in the row path, and
  the DuckDB oracle runs the *same* recurrence as a recursive CTE
  carrying the same window, so both engines execute the identical
  sequence of IEEE additions and comparisons on identical quantized
  inputs (piece scores are floor-quantized ``ln(cnt/total)``, the
  ``functions.vectors.quantize`` contract) → bit-equal segmentations;
- **M-step** = explode the chosen pieces weighted by word count, one
  partial aggregate over the vocab-bounded piece space, then prune to
  the top ``PRUNE_MULTI`` multi-character pieces (count desc, token asc
  — a total order) plus the letter floor. Pruning-by-rank replaces
  Kudo's likelihood-loss pruning; with integer counts it is exactly
  expressible on both engines.

Tie-breaks are pinned everywhere: at equal DP score the LONGEST piece
wins (the candidate cascade tests length-4 first with ``>=``), and
vocabulary ranks order by (count desc, token asc).

Encode mirrors ``bpe_encode``'s production shape: segment the DISTINCT
corpus-word table once (vocab-bounded folds), broadcast per-word token
counts back onto the exploded corpus — the corpus is scanned once and
never carries DP state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import quantize, quantize_sql

MAXPIECE = 4  # max piece length; the DP window width
SEED_MULTI = 60  # multi-char pieces seeded from substring counts
PRUNE_MULTI = 40  # multi-char pieces kept per EM round
EM_ITERS = 2
NEG = -1.0e18  # finite -inf: out-of-vocab / out-of-range sentinel


# ---------------------------------------------------------------------------
# Viterbi segmentation (Spark): one left fold per word
# ---------------------------------------------------------------------------


def _vocab_map(vocab: DataFrame) -> DataFrame:
    """One-row (m: map<string,double>) frame from a (token, lp) vocab —
    the broadcast-attached parameter pattern (no driver collect)."""
    return vocab.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.col("token").alias("k"), F.col("lp").alias("v"))
            )
        ).alias("m")
    )


def viterbi_tokens(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Append ``tokens`` (array<string>: the Viterbi-best segmentation)
    and ``score`` to each row of ``words`` (must carry a ``word``
    column whose values are non-empty ``[a-z]+`` strings).

    DP recurrence: dp[i] = max over n in 1..MAXPIECE of
    dp[i-n] + lp(word[i-n+1 .. i]), longest piece winning ties. The
    fold accumulator carries the last MAXPIECE dp values and their best
    paths (d0..d3 / t0..t3), shifting one position per step — O(L·4)
    per word, no growing score arrays. The letter floor guarantees a
    finite path, so the NEG sentinel never wins against a real one.
    """
    neg = F.lit(NEG)
    empty = F.array().cast("array<string>")
    init = F.struct(
        F.lit(0.0).alias("d0"),
        neg.alias("d1"),
        neg.alias("d2"),
        neg.alias("d3"),
        empty.alias("t0"),
        empty.alias("t1"),
        empty.alias("t2"),
        empty.alias("t3"),
    )
    w = words.crossJoin(F.broadcast(_vocab_map(vocab)))
    word, m = F.col("word"), F.col("m")

    def step(acc: Column, x: Column) -> Column:
        def piece(n: int) -> Column:
            # length-n piece ending at position x; null when x < n
            return F.when(x >= n, word.substr(x - F.lit(n - 1), F.lit(n)))

        def cand(dprev: Column, n: int) -> Column:
            return dprev + F.coalesce(F.try_element_at(m, piece(n)), neg)

        s1, s2, s3, s4 = (
            cand(acc.d0, 1),
            cand(acc.d1, 2),
            cand(acc.d2, 3),
            cand(acc.d3, 4),
        )
        # longest-first >= cascade: at equal score the longer piece wins
        c4 = (s4 >= s3) & (s4 >= s2) & (s4 >= s1)
        c3 = (s3 >= s2) & (s3 >= s1)
        c2 = s2 >= s1
        best_d = F.when(c4, s4).when(c3, s3).when(c2, s2).otherwise(s1)
        best_t = (
            F.when(c4, F.array_append(acc.t3, piece(4)))
            .when(c3, F.array_append(acc.t2, piece(3)))
            .when(c2, F.array_append(acc.t1, piece(2)))
            .otherwise(F.array_append(acc.t0, piece(1)))
        )
        return F.struct(
            best_d.alias("d0"),
            acc.d0.alias("d1"),
            acc.d1.alias("d2"),
            acc.d2.alias("d3"),
            best_t.alias("t0"),
            acc.t0.alias("t1"),
            acc.t1.alias("t2"),
            acc.t2.alias("t3"),
        )

    fin = F.aggregate(
        F.sequence(F.lit(1), F.length(word)), init, step
    )
    return w.withColumn("tokens", fin.getField("t0")).withColumn(
        "score", fin.getField("d0")
    ).drop("m")


# ---------------------------------------------------------------------------
# EM training (Spark)
# ---------------------------------------------------------------------------


def _letters(df_any: DataFrame) -> DataFrame:
    """All 26 lowercase letters as a (token) frame."""
    return (
        df_any.sparkSession.range(26)
        .select(F.char(F.col("id") + 97).alias("token"))
    )


def _with_lp(vocab_cnt: DataFrame) -> DataFrame:
    """(token, cnt) → (token, cnt, lp) with lp = floor-quantized
    ln(cnt / total); total attached as a broadcast one-row aggregate."""
    tot = vocab_cnt.agg(F.sum("cnt").cast("double").alias("tot"))
    return vocab_cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        "cnt",
        quantize(F.log(F.col("cnt").cast("double") / F.col("tot")), 6).alias(
            "lp"
        ),
    )


def _prune(usage: DataFrame, letters: DataFrame) -> DataFrame:
    """M-step vocabulary: all 26 letters at usage+1 (the encodability
    floor) plus the top ``PRUNE_MULTI`` multi-char pieces by
    (cnt desc, token asc)."""
    chars = letters.join(usage, "token", "left").select(
        "token",
        (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("long").alias("cnt"),
    )
    multi = (
        usage.filter(F.length("token") >= 2)
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(PRUNE_MULTI)
        .select("token", F.col("cnt").cast("long").alias("cnt"))
    )
    return chars.unionByName(multi)


def _seed_vocab(words: DataFrame) -> DataFrame:
    """(token, cnt): substring-frequency seed — every length ≤ MAXPIECE
    substring of every training word, weighted by word count, pruned
    like an M-step (letter floor + top SEED_MULTI multi-char)."""
    word = F.col("word")

    def pieces_of_len(n: int) -> Column:
        # NB: the lambda must take exactly ONE parameter — F.transform
        # treats a two-parameter lambda as the (element, index) form,
        # so a `lambda i, n=n` default-arg closure silently rebinds n
        # to the array index
        return F.when(
            F.length(word) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(word) - F.lit(n - 1)),
                lambda i: word.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    per_len = [pieces_of_len(n) for n in range(1, MAXPIECE + 1)]
    subs = words.select(
        F.explode(F.flatten(F.array(*per_len))).alias("token"), "wcnt"
    )
    usage = subs.groupBy("token").agg(
        F.sum("wcnt").cast("long").alias("cnt")
    )
    multi = (
        usage.filter(F.length("token") >= 2)
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(SEED_MULTI)
        .select("token", "cnt")
    )
    chars = _letters(words).join(usage, "token", "left").select(
        "token",
        (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("long").alias("cnt"),
    )
    return chars.unionByName(multi)


def unigram_train(words: DataFrame, iters: int = EM_ITERS) -> DataFrame:
    """Learn the unigram vocabulary from a (word, wcnt) table: seed →
    ``iters`` rounds of (Viterbi E-step → usage M-step → prune).
    Returns (token, cnt, logprob) — counts are exact integers, logprob
    the floor-quantized serving score."""
    vocab = _with_lp(_seed_vocab(words))
    letters = _letters(words)
    for _ in range(iters):
        seg = viterbi_tokens(words, vocab)
        usage = (
            seg.select(F.explode("tokens").alias("token"), "wcnt")
            .groupBy("token")
            .agg(F.sum("wcnt").cast("long").alias("cnt"))
        )
        vocab = _with_lp(_prune(usage, letters))
    return vocab.select("token", "cnt", F.col("lp").alias("logprob"))


def unigram_encode(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_tokens): tokenize every document under a
    learned (token, lp) vocabulary. Merges/DP run on the DISTINCT-word
    table only; per-word token counts broadcast-join back onto the
    exploded corpus (the ``bpe_encode`` scale shape)."""
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    )
    enc = viterbi_tokens(
        doc_words.select("word").distinct(), vocab
    ).select("word", F.size("tokens").cast("long").alias("word_tokens"))
    return (
        doc_words.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_tokens").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins: the same recurrence as recursive CTEs
# ---------------------------------------------------------------------------


def _seg_ctes(tag: str, words_cte: str, vm_cte: str) -> str:
    """Recursive-CTE Viterbi over ``words_cte`` (word, wcnt) with the
    one-row map ``vm_cte`` (m): the DP window (d0..d3 / t0..t3)
    advances one character per recursion level — the exact fold
    :func:`viterbi_tokens` runs, so scores and paths are bit-equal."""
    s = f"seg{tag}"
    return f"""{s} AS (
  SELECT word, wcnt, 0 AS i,
         CAST(0.0 AS DOUBLE) AS d0, CAST({NEG} AS DOUBLE) AS d1,
         CAST({NEG} AS DOUBLE) AS d2, CAST({NEG} AS DOUBLE) AS d3,
         CAST([] AS VARCHAR[]) AS t0, CAST([] AS VARCHAR[]) AS t1,
         CAST([] AS VARCHAR[]) AS t2, CAST([] AS VARCHAR[]) AS t3
  FROM {words_cte}
  UNION ALL
  SELECT word, wcnt, i + 1,
         CASE WHEN s4 >= s3 AND s4 >= s2 AND s4 >= s1 THEN s4
              WHEN s3 >= s2 AND s3 >= s1 THEN s3
              WHEN s2 >= s1 THEN s2 ELSE s1 END,
         d0, d1, d2,
         CASE WHEN s4 >= s3 AND s4 >= s2 AND s4 >= s1 THEN list_append(t3, p4)
              WHEN s3 >= s2 AND s3 >= s1 THEN list_append(t2, p3)
              WHEN s2 >= s1 THEN list_append(t1, p2)
              ELSE list_append(t0, p1) END,
         t0, t1, t2
  FROM (
    SELECT *,
      d0 + coalesce(map_extract(m, p1)[1], {NEG}) AS s1,
      d1 + coalesce(map_extract(m, p2)[1], {NEG}) AS s2,
      d2 + coalesce(map_extract(m, p3)[1], {NEG}) AS s3,
      d3 + coalesce(map_extract(m, p4)[1], {NEG}) AS s4
    FROM (
      SELECT {s}.*, vm.m,
        substr(word, i + 1, 1) AS p1,
        CASE WHEN i >= 1 THEN substr(word, i, 2) END AS p2,
        CASE WHEN i >= 2 THEN substr(word, i - 1, 3) END AS p3,
        CASE WHEN i >= 3 THEN substr(word, i - 2, 4) END AS p4
      FROM {s}, {vm_cte} vm
      WHERE i < length(word)
    )
  )
),
fin{tag} AS (
  SELECT word, wcnt, t0 AS tokens FROM {s} WHERE i = length(word)
)"""


def _vm_cte(tag: str, vocab_cte: str) -> str:
    """One-row map CTE from a (token, cnt) vocab CTE, with lp =
    floor-quantized ln(cnt/total) — :func:`_with_lp`'s twin."""
    lp = quantize_sql(
        "ln(CAST(cnt AS DOUBLE) / (SELECT CAST(sum(cnt) AS DOUBLE) "
        f"FROM {vocab_cte}))",
        6,
    )
    return f"""vm{tag} AS (
  SELECT map_from_entries(list({{k: token, v: CAST({lp} AS DOUBLE)}}
    ORDER BY token)) AS m
  FROM {vocab_cte})"""


def _train_ctes(docs_rel: str, top_words: int, iters: int) -> tuple[str, str]:
    """(ctes, final_vocab_cte): the full training chain — word counts,
    substring seed, ``iters`` segment/usage/prune rounds."""
    from .bpe import word_freqs_sql

    parts = [f"w AS ({word_freqs_sql(docs_rel, top_words)})"]
    parts.append(
        f"""sub AS (
  SELECT token, CAST(sum(wcnt) AS BIGINT) AS cnt FROM (
    SELECT unnest(flatten([
      [substr(word, CAST(i AS INT) + 1, n)
       for i in range(0, greatest(length(word) - n + 1, 0))]
      for n in [{", ".join(str(n) for n in range(1, MAXPIECE + 1))}]
    ])) AS token, wcnt FROM w)
  GROUP BY token)"""
    )
    # the capped UNION branch is wrapped in a subquery so the
    # ORDER BY/LIMIT binds to that branch, not the whole UNION
    parts.append(
        f"""v0 AS (
  SELECT chr(97 + CAST(i AS INT)) AS token,
         CAST(coalesce(u.cnt, 0) + 1 AS BIGINT) AS cnt
  FROM range(0, 26) t(i)
  LEFT JOIN (SELECT token, cnt FROM sub WHERE length(token) = 1) u
    ON u.token = chr(97 + CAST(i AS INT))
  UNION ALL
  SELECT token, cnt FROM (
    SELECT token, CAST(cnt AS BIGINT) AS cnt FROM sub
    WHERE length(token) >= 2
    ORDER BY cnt DESC, token ASC LIMIT {SEED_MULTI})
)"""
    )
    prev = "v0"
    for it in range(1, iters + 1):
        parts.append(_vm_cte(str(it - 1), prev))
        parts.append(_seg_ctes(str(it), "w", f"vm{it - 1}"))
        parts.append(
            f"""use{it} AS (
  SELECT token, CAST(sum(wcnt) AS BIGINT) AS cnt FROM (
    SELECT unnest(tokens) AS token, wcnt FROM fin{it})
  GROUP BY token)"""
        )
        parts.append(
            f"""v{it} AS (
  SELECT chr(97 + CAST(i AS INT)) AS token,
         CAST(coalesce(u.cnt, 0) + 1 AS BIGINT) AS cnt
  FROM range(0, 26) t(i)
  LEFT JOIN use{it} u ON u.token = chr(97 + CAST(i AS INT))
  UNION ALL
  SELECT token, cnt FROM (
    SELECT token, cnt FROM use{it} WHERE length(token) >= 2
    ORDER BY cnt DESC, token ASC LIMIT {PRUNE_MULTI})
)"""
        )
        prev = f"v{it}"
    return ",\n".join(parts), prev


def unigram_vocab_sql(
    docs_rel: str, top_words: int = 2000, iters: int = EM_ITERS
) -> str:
    """DuckDB twin of :func:`unigram_train`."""
    ctes, final = _train_ctes(docs_rel, top_words, iters)
    lp = quantize_sql(
        "ln(CAST(cnt AS DOUBLE) / (SELECT CAST(sum(cnt) AS DOUBLE) "
        f"FROM {final}))",
        6,
    )
    return f"""WITH RECURSIVE {ctes}
SELECT token, cnt, {lp} AS logprob FROM {final}"""


def unigram_encode_sql(
    docs_rel: str, top_words: int = 2000, iters: int = EM_ITERS
) -> str:
    """DuckDB twin of train-then-:func:`unigram_encode`."""
    ctes, final = _train_ctes(docs_rel, top_words, iters)
    return f"""WITH RECURSIVE {ctes},
{_vm_cte("F", final)},
dw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM ({docs_rel})),
dwd AS (SELECT DISTINCT word, 1 AS wcnt FROM dw),
{_seg_ctes("E", "dwd", "vmF")},
enc AS (SELECT word, CAST(len(tokens) AS BIGINT) AS word_tokens FROM finE)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(word_tokens) AS BIGINT) AS n_tokens
FROM dw JOIN enc USING (word)
GROUP BY doc_id"""
