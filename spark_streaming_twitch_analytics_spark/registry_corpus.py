"""Training-corpus preparation operators (extensions beyond the reference).

The reference's batch worksheet (ProcessingWorkSheet.sc) stops at
clean → filter → label-prune → single-parquet. A 100 TB pretraining
pipeline additionally needs the four operators here:

- ``text_redact_pii``     — regex scrubbing (emails / phone-shaped
  tokens) before training. The testdata contains no PII, so a
  deterministic fake contact string derived from ``doc_id`` is appended
  first — the redaction is then observable and oracle-checkable.
- ``corpus_chunk_windows`` — overlapping token windows (window 40,
  stride 30): the doc→training-sample explosion. Pure built-ins
  (sequence → explode → slice), no Python in the row path.
- ``corpus_pack_bins``    — sequence packing: running token count in
  doc_id order, bin = prev_cumsum // budget; how concat-and-split
  packing assigns docs to fixed-token training bins deterministically.
- ``corpus_mix_sample``   — stratified deterministic sampling with
  per-language keep-fractions (en 60%, fr/es 30%, rest 10%) via the
  md5 hash-bucket trick — reproducible on any engine/partitioning,
  composable with every downstream op (plain row predicate).

Scale notes: redact/chunk are narrow (no shuffle; chunking grows rows
~n/stride x but stays pipelined); pack_bins needs a global ordered
cumsum — a single-direction range shuffle (same cost class as a sort;
at 100 TB run it per shard/date-partition, which is how packing is done
in practice); mix_sample is a pushable filter that cuts the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import text as X
from .registry import register
from .tables import load_table

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+"
_PHONE_RE = "\\+1-555-[0-9]+"

_CHUNK_WINDOW = 40
_CHUNK_STRIDE = 30
_PACK_BUDGET = 256

# lang → keep-percent (deterministic md5 bucket < pct)
_MIX = {"en": 60, "fr": 30, "es": 30}
_MIX_DEFAULT = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "text_redact_pii",
    f"""WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.com or +1-555-0' || CAST(doc_id AS VARCHAR) AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '{_EMAIL_RE}'))
       + len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_redactions
FROM aug""",
    survey="ext: PII scrubbing (regexp_replace chain + match counting; "
    "fake contact synthesized from doc_id so the redaction is observable)",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.com or +1-555-0"),
        F.col("doc_id").cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    n = F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0)) + F.size(
        F.regexp_extract_all(aug, F.lit(_PHONE_RE), 0)
    )
    return d.select(
        "doc_id", redacted.alias("redacted"), n.cast("int").alias("n_redactions")
    )


@register(
    "corpus_chunk_windows",
    f"""WITH t AS (
  SELECT doc_id, {X.tokenize_sql('text')} AS toks FROM documents),
s AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), {_CHUNK_STRIDE}))
         AS chunk_start
  FROM t)
SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,
  array_to_string(toks[chunk_start + 1 : chunk_start + {_CHUNK_WINDOW}], ' ')
    AS chunk_text,
  CAST(len(toks[chunk_start + 1 : chunk_start + {_CHUNK_WINDOW}]) AS INT)
    AS n_tokens
FROM s""",
    survey="ext: overlapping token-window chunking (doc -> training "
    "samples; window 40 stride 30, sequence->explode->slice, all "
    "built-ins so the explosion stays in whole-stage codegen)",
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = X.tokenize(F.col("text"))
    t = d.select("doc_id", toks.alias("toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("toks") - 1, F.lit(0)),
        F.lit(_CHUNK_STRIDE),
    )
    s = t.select("doc_id", "toks", F.explode(starts).alias("chunk_start"))
    chunk = F.slice(F.col("toks"), F.col("chunk_start") + 1, _CHUNK_WINDOW)
    return s.select(
        "doc_id",
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_tokens"),
    )


@register(
    "corpus_pack_bins",
    f"""WITH t AS (
  SELECT doc_id, len({X.tokenize_sql('text')}) AS n_toks FROM documents),
c AS (
  SELECT doc_id, n_toks,
    sum(n_toks) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_toks AS prev_cum
  FROM t)
SELECT CAST(prev_cum // {_PACK_BUDGET} AS INT) AS bin_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS bin_tokens
FROM c GROUP BY 1""",
    survey="ext: sequence packing (concat-and-split bin assignment via "
    "ordered running token count; integer-exact on both engines)",
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n = F.size(X.tokenize(F.col("text"))).cast("long")
    t = d.select("doc_id", n.alias("n_toks"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    c = t.select(
        "doc_id",
        "n_toks",
        (F.sum("n_toks").over(w) - F.col("n_toks")).alias("prev_cum"),
    )
    return (
        c.groupBy(
            F.floor(F.col("prev_cum") / _PACK_BUDGET).cast("int").alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("bin_tokens"),
        )
    )


def _mix_case_sql() -> str:
    whens = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in _MIX.items())
    return f"CASE {whens} ELSE {_MIX_DEFAULT} END"


@register(
    "corpus_mix_sample",
    f"""SELECT doc_id, lang FROM documents
WHERE CAST('0x' || md5(CAST(doc_id AS VARCHAR))[1:8] AS BIGINT) % 100
      < ({_mix_case_sql()})""",
    survey="ext: stratified corpus mixing (per-language keep-fraction via "
    "deterministic md5 bucket — reproducible domain re-weighting as a "
    "pushable row predicate)",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 100
    )
    keep_pct = F.lit(_MIX_DEFAULT)
    for k, v in _MIX.items():
        keep_pct = F.when(F.col("lang") == k, v).otherwise(keep_pct)
    return d.select("doc_id", "lang").filter(bucket < keep_pct)
