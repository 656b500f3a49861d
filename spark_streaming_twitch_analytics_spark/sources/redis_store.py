"""Redis-backed KV table store — the reference's actual deployment sink
(``RedisInterface.scala:9-59``: ``format("org.apache.spark.sql.redis")``,
table prefix, ``key.column``, per-table TTL, empty-schema fallback),
implemented over plain ``redis-py`` with NO hard dependency: the import
is deferred until construction, so the module loads (and the rest of the
package works) on hosts without the client library.

Data layout mirrors the spark-redis connector the reference uses: each
row is one Redis HASH at key ``{prefix}{table}:{key}``, fields = column
names, values = strings (arrays/structs as JSON). With ``key_column``
the row key is that column's value (the connector's ``key.column``
option — upserts by key); without it, a content digest (the connector
uses a random uuid; a digest keeps rewrites idempotent).

Scale notes (100 TB honesty): Redis state tables in the reference are
SMALL — running wordcount snapshots, label maps (``SparkRunner.scala:
140-158``) — not the corpus. The write path still goes executor-side
(``df.foreachPartition``, one pipelined connection per partition, no
driver collect); the read path scans keys and pipelines HGETALL from the
driver, bounded by state-table size. A corpus-sized table does not
belong in Redis under either this client or the reference's connector.

Interface-compatible with :class:`..kv_store.KVTableStore` (write /
get_table / delete / last_applied_epoch / checkpoint_dir) so every sink
helper in ``streaming/wordcount.py`` accepts either backend.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_META_SUFFIX = ":__meta__"


def _check_table_name(table: str) -> None:
    """':' is the key-space delimiter (``{prefix}{table}:{key}``): a table
    name containing it would make table ``a`` 's scan pattern ``a:*`` also
    match table ``a:b`` 's rows. Reject it up front, mirroring spark-redis'
    unambiguous table-prefix handling."""
    if ":" in table:
        raise ValueError(
            f"table name {table!r} must not contain ':' (key-space delimiter)"
        )


def _encode_cell(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, dict)):
        return json.dumps(v)
    return str(v)


def _decode_cell(s: str | None, dt: T.DataType):
    if s is None:
        return None
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(s)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(s)
    if isinstance(dt, T.BooleanType):
        return s == "true"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return json.loads(s)
    return s


def _write_partition(rows, schema_fields, client_factory, prefix, table, key_column, ttl):
    """Executor-side writer: one connection + one pipeline per partition.
    Factored out (instead of a closure) so it is unit-testable against a
    fake client without a Spark round-trip."""
    client = client_factory()
    pipe = client.pipeline(transaction=False)
    n = 0
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        if key_column is not None:
            key = _encode_cell(d[key_column])
        else:
            key = hashlib.md5(
                json.dumps(
                    {f: _encode_cell(d.get(f)) for f in schema_fields}, sort_keys=True
                ).encode()
            ).hexdigest()
        rkey = f"{prefix}{table}:{key}"
        mapping = {
            f: _encode_cell(d.get(f))
            for f in schema_fields
            if _encode_cell(d.get(f)) is not None
        }
        pipe.delete(rkey)  # stale fields from a prior row shape must not linger
        if mapping:
            pipe.hset(rkey, mapping=mapping)
        if ttl:
            pipe.expire(rkey, ttl)
        n += 1
        if n % 1000 == 0:
            pipe.execute()
    pipe.execute()


class RedisKVTableStore:
    """Drop-in alternative backend for :class:`..kv_store.KVTableStore`.

    ``client_factory`` (a zero-arg picklable callable returning a
    redis-py-compatible client) is injectable for tests; by default it
    connects with ``redis.Redis(host, port, decode_responses=True)`` and
    raises ImportError at CONSTRUCTION time if redis-py is absent.
    """

    def __init__(
        self,
        spark: SparkSession,
        host: str = "localhost",
        port: int = 6379,
        prefix: str = "",
        client_factory=None,
        checkpoint_root: str | None = None,
    ):
        self.spark = spark
        self.prefix = prefix
        self._checkpoint_root = checkpoint_root or os.path.join(
            os.getcwd(), "_redis_checkpoints"
        )
        if client_factory is None:
            import redis  # deferred: no hard dependency at module import

            def client_factory(host=host, port=port):
                return redis.Redis(host=host, port=port, decode_responses=True)

        self._client_factory = client_factory
        self._client = client_factory()

    # -- interface parity with KVTableStore --------------------------------

    def checkpoint_dir(self, table: str) -> str:
        return os.path.join(self._checkpoint_root, table)

    def last_applied_epoch(self, table: str, lineage: str | None = None) -> int:
        try:
            meta = self._client.hgetall(f"{self.prefix}{table}{_META_SUFFIX}")
        except Exception:
            return -1
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
        key_column: str | None = None,
        epoch: int | None = None,
        lineage: str | None = None,
    ) -> None:
        """Overwrite = delete the table's key space then write the
        snapshot (``SaveMode.Overwrite``); append = add/upsert rows.
        TTL is per Redis key, exactly the connector's ``option("ttl")``.
        """
        _check_table_name(table)
        if mode != "append":
            self.delete(table, keep_meta=True)
        fields = [f.name for f in df.schema.fields]
        factory, prefix, kc = self._client_factory, self.prefix, key_column
        eff_ttl = ttl or 0
        df.foreachPartition(
            lambda rows: _write_partition(
                rows, fields, factory, prefix, table, kc, eff_ttl
            )
        )
        meta = {"written_at": time.time()}
        if epoch is not None:
            meta["epoch"] = int(epoch)
            if lineage is not None:
                meta["lineage"] = lineage
        self._client.hset(f"{self.prefix}{table}{_META_SUFFIX}", mapping=meta)

    def get_table(
        self, table: str, schema: T.StructType, key_column: str | None = None
    ) -> DataFrame:
        """Read with empty-DF-of-same-schema fallback on ANY failure
        (server down, missing table, decode error) — the
        ``Try(...).getOrElse`` contract of ``RedisInterface.scala:43-55``.
        TTL expiry needs no store-side check: expired keys simply no
        longer match the scan."""
        _check_table_name(table)
        try:
            client = self._client
            pattern = f"{self.prefix}{table}:*"
            # SCAN is at-least-once (a concurrent rehash can yield the same
            # key twice), so dedupe; sorting keeps the row order — and
            # therefore createDataFrame's partition layout — deterministic.
            keys = sorted(
                {
                    k
                    for k in client.scan_iter(match=pattern, count=1000)
                    if not k.endswith(_META_SUFFIX)
                }
            )
            pipe = client.pipeline(transaction=False)
            for k in keys:
                pipe.hgetall(k)
            hashes = pipe.execute() if keys else []
            rows = []
            for k, h in zip(keys, hashes):
                if not h:  # expired between scan and fetch
                    continue
                vals = {f.name: _decode_cell(h.get(f.name), f.dataType) for f in schema.fields}
                if key_column is not None and vals.get(key_column) is None:
                    # key-only rows: recover the key from the Redis key
                    vals[key_column] = _decode_cell(
                        k[len(f"{self.prefix}{table}:") :],
                        schema[key_column].dataType,
                    )
                rows.append(tuple(vals[f.name] for f in schema.fields))
            return self.spark.createDataFrame(rows, schema)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def delete(self, table: str, keep_meta: bool = False) -> None:
        _check_table_name(table)
        try:
            client = self._client
            for k in list(client.scan_iter(match=f"{self.prefix}{table}:*", count=1000)):
                if keep_meta and k.endswith(_META_SUFFIX):
                    continue
                client.delete(k)
            if not keep_meta:
                client.delete(f"{self.prefix}{table}{_META_SUFFIX}")
        except Exception:
            pass
