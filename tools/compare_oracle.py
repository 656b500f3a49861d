"""Local stand-in for the driver's t2 correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB at a
given scale factor, then compares row count, column names, and an
order-insensitive value hash (rows sorted by their string rendering,
columns sorted by name — mirroring the driver contract's description).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.session import get_spark
from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--bare"]
    bare = "--bare" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if bare:
        # simulate the driver: a session with NONE of our factory configs
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("bare").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p  # dir = multi-part write
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    from spark_streaming_twitch_analytics_spark.cache import release_all

    failures = []
    for q in registry._REGISTRY:
        if only and q.name not in only:
            continue
        release_all()  # drop cached intermediates from the previous query
        t0 = time.time()
        sdf = q.fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        sh, sn = frame_hash(scols, srows)
        t1 = time.time()
        if q.sql is None:
            print(f"{q.name:28s} rows-only  n={sn:<7d} ({t1 - t0:.1f}s)")
            continue
        try:
            res = con.execute(q.sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{q.name:28s} ORACLE-SQL-ERROR: {e}")
            failures.append(q.name)
            continue
        dh, dn = frame_hash(dcols, drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok = ok_cols and sh == dh and sn == dn
        status = "OK " if ok else "FAIL"
        print(
            f"{q.name:28s} {status} n={sn}/{dn} hash={sh}/{dh} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"({t1 - t0:.1f}s)"
        )
        if not ok:
            failures.append(q.name)
            if sn and dn and sorted(scols) == sorted(dcols):
                # show a few differing rows for debugging
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {
                    "\x1f".join(norm_cell(r[i]) for i in order) for r in srows
                }
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = {
                    "\x1f".join(norm_cell(r[i]) for i in dorder) for r in drows
                }
                for x in list(sset - dset)[:2]:
                    print("   spark-only:", x.replace("\x1f", " | ")[:160])
                for x in list(dset - sset)[:2]:
                    print("   duck-only :", x.replace("\x1f", " | ")[:160])
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
