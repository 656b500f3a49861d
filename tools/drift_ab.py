"""Drift attribution A/B (VERDICT r6 task 1): re-time the named queries
in a FRESH session, outside the full-suite loop, bracketed by the pinned
noise canary. If the drifters return to their r5 times here while their
r6 times were uniformly higher, the r6 drift was host crowding during
the suite run, not a plan regression (no drifter's plan changed in r6).

Usage: python tools/drift_ab.py [query ...]   (defaults to the r5->r6
worst drifters) — writes DRIFT_AB_r7.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary_time
from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.cache import release_all
from spark_streaming_twitch_analytics_spark.session import get_spark

# r5->r6 worst absolute drifters (bench_summary r5 vs r6, common set)
DEFAULT = [
    "corpus_bpe_merges",
    "q21_waiting_suppliers",
    "orders_basket_pairs",
    "ann_ivfpq_rerank",
    "ann_ivf_index_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_lsh_index_topk",
    "corpus_doc_novelty",
    "q18_large_orders",
    "q2_min_cost_supplier",
    "approx_sketches",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="drift_ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).selectExpr("count(*)").collect()

    canary = {"start": _canary_time(spark, sf_dir)}
    times: dict[str, float] = {}
    for name in names:
        fn = registry.get(name).fn

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm (bench protocol)
        release_all()
        best = float("inf")
        for _ in range(2):
            spark._jvm.System.gc()
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
            release_all()
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)
    canary["end"] = _canary_time(spark, sf_dir)

    out = {"sf_dir": sf_dir, "noise_canary": canary, "queries": times}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "DRIFT_AB_r7.json")
    doc = {"runs": []}
    if os.path.exists(path):  # append, never clobber earlier runs
        with open(path) as fh:
            prev = json.load(fh)
        doc = prev if "runs" in prev else {"runs": [prev]}
    doc["runs"].append(out)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
