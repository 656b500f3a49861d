"""Full local re-certification sweep: every registered query vs its
DuckDB oracle (same comparison as tools/compare_oracle.py), written as
LOCAL_ORACLE_r{N}.json at the repo root — the per-round ritual from
VERDICT r6 task 8.

Usage: python tools/local_oracle_sweep.py <round_number> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.cache import release_all
from spark_streaming_twitch_analytics_spark.contract import non_atomic_fields
from spark_streaming_twitch_analytics_spark.session import get_spark
from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES
from tools.compare_oracle import frame_hash


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    out: dict[str, dict] = {}
    for q in registry._REGISTRY:
        release_all()
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            # the driver-canonicalizer contract (contract.py): streaming
            # queries aren't lintable lazily in tests/test_contract.py,
            # so the executed sweep enforces it for every query
            bad = non_atomic_fields(sdf.schema)
            if bad:
                out[q.name] = {
                    "status": "contract-error",
                    "err": f"non-atomic output columns {bad} — the "
                    "driver's pandas canonicalizer cannot hash these",
                }
                print(f"{q.name:28s} CONTRACT-ERROR {bad}", file=sys.stderr)
                continue
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            out[q.name] = {"status": "spark-error", "err": str(e)[:200]}
            print(f"{q.name:28s} SPARK-ERROR {e}", file=sys.stderr)
            continue
        sh, sn = frame_hash(scols, srows)
        if q.sql is None:
            out[q.name] = {"status": "rows_only", "spark_rows": sn}
            continue
        try:
            res = con.execute(q.sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            out[q.name] = {"status": "oracle-error", "err": str(e)[:200]}
            print(f"{q.name:28s} ORACLE-ERROR {e}", file=sys.stderr)
            continue
        dh, dn = frame_hash(dcols, drows)
        ok = sorted(scols) == sorted(dcols) and sh == dh and sn == dn
        out[q.name] = {
            "status": "ok" if ok else "fail",
            "hash_match": ok,
            "spark_rows": sn,
            "oracle_rows": dn,
            "sec": round(time.time() - t0, 1),
        }
        print(f"{q.name:28s} {'OK' if ok else 'FAIL'} n={sn}/{dn}", file=sys.stderr)

    n_ok = sum(1 for v in out.values() if v["status"] == "ok")
    n_fail = sum(1 for v in out.values() if v["status"] == "fail")
    n_rows_only = sum(1 for v in out.values() if v["status"] == "rows_only")
    doc = {
        "n_queries": len(out),
        "n_ok": n_ok,
        "n_fail": n_fail,
        "n_rows_only": n_rows_only,
        "sf_dir": sf_dir,
        "note": f"local re-certification sweep (round {rnd}): every "
        "registered query vs its DuckDB oracle via tools/local_oracle_sweep.py",
        "queries": dict(sorted(out.items())),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, f"LOCAL_ORACLE_r{rnd}.json")
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in doc.items() if k != "queries"}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
