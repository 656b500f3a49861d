"""Batch sources/sinks (SURVEY S5, S6, S8).

- :func:`read_training_csv` — the batch-prep CSV source with the
  reference's exact options (``ProcessingWorkSheet.sc:35-43``):
  explicit schema, header, multiline quoted records, ``"`` escape.
- :func:`write_single_parquet` — the ``coalesce(1)`` overwrite parquet
  sink (``ProcessingWorkSheet.sc:130-134``). Single-file output is a
  small-data convenience; at scale pass ``single_file=False`` (or a
  ``partition_by``) and let each task write its split.
- :func:`load_label_map` — the bundled JSON label dictionary
  (``TFInterface.scala:44-47`` + ``resources/encoder_classes.json``),
  loaded ONCE on the driver and broadcast — the reference re-read it
  from the classpath per row (``TFInterface.scala:70-71``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRAINING_CSV_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("discussions", T.StringType()),
        T.StructField("categories", T.StringType()),
    ]
)

_RESOURCE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


def read_training_csv(
    spark: SparkSession, path: str, schema: T.StructType = TRAINING_CSV_SCHEMA
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


def write_single_parquet(
    df: DataFrame,
    path: str,
    single_file: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def load_label_map(path: str | None = None) -> dict[int, str]:
    """index → label name (50 entries)."""
    path = path or os.path.join(_RESOURCE_DIR, "encoder_classes.json")
    with open(path) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def broadcast_label_map(spark: SparkSession, path: str | None = None):
    """Driver-side load + broadcast: executors get ONE copy per node."""
    return spark.sparkContext.broadcast(load_label_map(path))


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-enforced JSONL source (one JSON object per line — the
    interchange format of training corpora). The explicit schema skips
    Spark's inference pass (a full extra scan at 100 TB) and pins column
    types; corrupt lines land in ``_corrupt_record`` when the schema
    declares it rather than failing the job."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """JSONL sink; one file per task (never coalesce(1) at scale).
    ``compression`` e.g. 'gzip'/'zstd' trades CPU for the 3-5× size cut
    that usually wins at object-store bandwidth."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Range-clustered layout: rows are range-partitioned on
    ``cluster_col`` (one contiguous value range per output file) and
    sorted within each file. Parquet min/max footer stats then make any
    downstream range/point predicate on ``cluster_col`` skip whole files
    — the poor man's z-order, and the right layout for an ANN cell
    index, a time-keyed event table, or any column with hot range
    predicates. One range-exchange (sampling pass + shuffle), same cost
    class as a global sort."""
    out = df.repartitionByRange(n_files, cluster_col).sortWithinPartitions(
        cluster_col, *(sort_cols or [])
    )
    out.write.mode("overwrite").parquet(path)


def zorder_key(c1, c2, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into a
    Morton (z-order) key — alias of :func:`operators.layout.morton_key`,
    kept here next to :func:`write_clustered_parquet` (its single-column
    sibling). The full layout stack — coordinate normalization, the
    OPTIMIZE-style rewrite, and the row-group skip meter — lives in
    ``operators/layout.py``."""
    from ..operators.layout import morton_key

    return morton_key(c1, c2, bits)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink (extension beyond the reference's parquet/CSV surface —
    the other columnar format a Spark warehouse interoperates with;
    built into Spark, predicate pushdown and column pruning work the
    same as parquet's)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC source twin of :func:`write_orc`."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


EPOCH_SHUFFLE_SALT = ":epoch17"


def hash_bucket(col, mod: int, salt: str = ""):
    """Deterministic md5 bucket in [0, mod): THE sampling/splitting
    primitive (mix sample, keep list, temperature mix, train/val/test
    split all key on it). One definition so a recipe change cannot
    decorrelate the call sites; ``salt`` decorrelates independent
    decisions on the same id. SQL twin: :func:`hash_bucket_sql`."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)) if salt else c.cast("string"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % mod


def hash48(col):
    """48-bit md5-prefix hash as a BIGINT — the portable long-hash
    primitive behind shingle/fingerprint keys (join keys and verify
    arrays carry 8-byte longs instead of strings; 48 bits ≈ zero
    collision probability at per-doc set sizes, and cardinalities are
    preserved so Jaccard over hashed sets stays exact). ONE definition:
    dedup shingles, decontamination, and winnowing all derive from this
    expression, so a recipe change cannot decorrelate them. SQL twin:
    :func:`hash48_sql`."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def hash48_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash48` (same digest, same integer)."""
    return f"CAST('0x' || md5({expr})[1:12] AS BIGINT)"


def hash_bucket_sql(expr: str, mod: int, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket` (same digest, same bucket)."""
    inner = f"CAST({expr} AS VARCHAR)" + (f" || '{salt}'" if salt else "")
    return f"CAST('0x' || md5({inner})[1:8] AS BIGINT) % {mod}"


def epoch_shuffle_key(id_col="doc_id", salt: str = EPOCH_SHUFFLE_SALT):
    """The deterministic training-order key: salted md5 over the doc id.
    Single definition — the layout writer (:func:`write_training_shards`),
    the ``corpus_shuffle_shards`` report query, and the tests all derive
    shard/order from THIS expression, so a recipe change cannot
    desynchronize them."""
    from pyspark.sql import functions as F

    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(col.cast("string"), F.lit(salt)))


def shard_of(skey, n_shards: int):
    """Hash-shard assignment from the order key's top 32 bits."""
    from pyspark.sql import functions as F

    return (
        F.conv(F.substring(skey, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    salt: str = EPOCH_SHUFFLE_SALT,
    id_col: str = "doc_id",
) -> None:
    """Materialize the deterministic epoch-shuffle layout that
    ``corpus_shuffle_shards`` reports on: a salted md5 over ``id_col``
    is the global training-order key; its top 32 bits hash-assign a
    shard; rows land partitioned by shard and locally sorted by the
    key. Readers stream shards in any order and get a reproducible
    shuffled epoch; a new salt is a free re-shuffle. One range-exchange
    + per-task sort — the same cost class as writing the corpus once,
    with no global sort."""
    skey = epoch_shuffle_key(id_col, salt)
    shard = shard_of(skey, n_shards)
    (
        df.withColumn("skey", skey)
        .withColumn("shard", shard)
        # range-partition on the shard value: ~1 task per shard. A hash
        # repartition would birthday-collide the 64 values into ~40 tasks,
        # leaving a third idle and the busiest sorting 3-4x the mean
        .repartitionByRange(n_shards, "shard")
        # shard leads the sort so the dynamic-partition writer's required
        # ordering is already satisfied — otherwise it inserts its own
        # (non-stable) sort on shard and scrambles the skey order
        .sortWithinPartitions("shard", "skey")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
