"""Key-value table store — the Redis sink/source surface
(``RedisInterface.scala:9-59`` + sink usage ``SparkRunner.scala:140-158``)
behind a pluggable interface.

Semantics preserved from the reference:

- ``write(df, table, mode, ttl)`` — Overwrite = full-state snapshot per
  batch (``SaveMode.Overwrite``, ``SparkRunner.scala:143``) or Append
  (worksheet variant ``DStreamTests.sc:271-280``); per-table TTL
  (broadcast ``ttlMap``, ``SparkRunner.scala:55-61`` — including the
  reference's ttl-key typo bug, fixed here by construction: TTL is a
  plain argument).
- ``get_table(table, schema)`` — read with an explicit schema; ANY
  failure (missing table, expired TTL, corrupt dir) returns an EMPTY
  DataFrame of that schema (``Try(...).getOrElse`` fallback,
  ``RedisInterface.scala:43-45,52-55``) — the restore-state-on-start
  contract.

The default backend is a parquet directory per table (atomic enough via
overwrite; swap for Redis/JDBC by implementing the same three methods).
Parquet keeps the store itself scale-safe: a 1000-executor job writes
partitioned files, no driver bottleneck.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def checkpoint_lineage(checkpoint_dir: str) -> str:
    """Identity of a checkpoint INSTANCE: Structured Streaming writes a
    fresh query id into ``{checkpoint}/metadata`` when (and only when) a
    checkpoint directory is first used, so a wiped-and-recreated dir gets
    a new id while same-checkpoint restarts keep it. That id — not the
    path, which survives a wipe — is the epoch-numbering lineage the
    exactly-once guards key on."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return str(json.load(f)["id"])
    except Exception:
        return checkpoint_dir


class KVTableStore:
    def __init__(self, spark: SparkSession, root: str, clock=time.time):
        # ``clock`` (driver-side only: TTL anchor + expiry check) is
        # injectable so tests can advance time instead of sleeping
        self.spark = spark
        self.root = root
        self._clock = clock
        os.makedirs(root, exist_ok=True)

    def _table_root(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _meta(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.meta.json")

    def checkpoint_dir(self, table: str) -> str:
        """Streaming-checkpoint location co-located with the table (one
        checkpoint per sink table, the Structured Streaming contract)."""
        return os.path.join(self.root, "_checkpoints", table)

    def _load_meta(self, table: str) -> dict | None:
        try:
            with open(self._meta(table)) as f:
                return json.load(f)
        except Exception:
            return None

    def last_applied_epoch(self, table: str, lineage: str | None = None) -> int:
        """Highest micro-batch epoch recorded for ``table`` (-1 if none).
        The exactly-once guard for delta-merging foreachBatch sinks: a
        replayed epoch (failure between checkpoint commit and sink write)
        must not be merged twice.

        ``lineage`` names the epoch numbering (the query's checkpoint
        dir): foreachBatch epoch_ids restart at 0 under a FRESH
        checkpoint, so a recorded epoch from a different lineage must not
        mask genuinely new batches — a lineage mismatch reads as -1."""
        meta = self._load_meta(table)
        if not meta:
            return -1
        if lineage is not None and meta.get("lineage") != lineage:
            return -1
        return int(meta.get("epoch", -1))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        ttl: int | None = None,
        epoch: int | None = None,
        lineage: str | None = None,
    ) -> None:
        """Versioned write: each overwrite lands in a fresh ``v<N>`` subdir
        and the meta pointer flips afterwards. This makes snapshots atomic
        AND lets a sink read the current version while writing the next —
        a plain same-path overwrite deletes files under any still-lazy
        reader (Spark: FAILED_READ_FILE). ttl=0 → no expiry; ttl>0 →
        expires that many seconds after the write (reference raw/clean
        tables used ttl=1s, counts ttl=0 — ``SparkRunner.scala:55-61``)."""
        meta = self._load_meta(table)
        if mode == "append" and meta is not None:
            df.write.mode("append").parquet(
                os.path.join(self._table_root(table), meta["version"])
            )
            # ttl=None preserves the table's configured expiry — a bare
            # append must not silently clear a 1s-TTL raw table to
            # never-expires (and written_at only refreshes when the
            # caller re-states a ttl, keeping the original anchor)
            if ttl is not None:
                meta.update({"written_at": self._clock(), "ttl": ttl})
            new_meta = meta
        else:
            version = f"v{(int(meta['version'][1:]) + 1) if meta else 0}"
            df.write.mode("overwrite").parquet(
                os.path.join(self._table_root(table), version)
            )
            new_meta = {
                "written_at": self._clock(),
                "ttl": 0 if ttl is None else ttl,
                "version": version,
            }
        if epoch is not None:
            new_meta["epoch"] = int(epoch)
            if lineage is not None:
                new_meta["lineage"] = lineage
        tmp = self._meta(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_meta, f)
        os.replace(tmp, self._meta(table))
        # prune superseded versions (best effort; a concurrent lazy reader
        # of an OLD version should have been materialized by its sink)
        root = self._table_root(table)
        for d in os.listdir(root):
            if d != new_meta["version"]:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def get_table(self, table: str, schema: T.StructType) -> DataFrame:
        """Read with empty-DF-of-same-schema fallback on ANY failure."""
        try:
            meta = self._load_meta(table)
            if meta is None:
                raise LookupError(f"table {table} missing")
            ttl = meta.get("ttl", 0)
            if ttl and self._clock() > meta["written_at"] + ttl:
                raise LookupError(f"table {table} expired (ttl={ttl})")
            df = self.spark.read.schema(schema).parquet(
                os.path.join(self._table_root(table), meta["version"])
            )
            df.head(1)  # force failure NOW, not at first downstream action
            return df
        except Exception:
            return self.spark.createDataFrame([], schema)

    def delete(self, table: str) -> None:
        shutil.rmtree(self._table_root(table), ignore_errors=True)
        try:
            os.remove(self._meta(table))
        except FileNotFoundError:
            pass
