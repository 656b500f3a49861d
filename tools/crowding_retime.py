"""Crowding-controlled re-timing (VERDICT r4 item 5).

Round 4 showed ~10-45% creep on 11 untouched queries vs round 3. The
hypothesis: session crowding — 39 extra queries sharing one JVM (GC
pressure, code-cache growth, shuffle-file dirs) — rather than plan
changes. This tool times the named queries in a FRESH session with the
exact bench.py protocol (warm + best-of-2 noop-sink writes) and prints a
comparison against the committed full-suite numbers in
bench_summary.json. If fresh-session times return to the r3 ballpark,
the creep is crowding; if they stay high, a plan change must be
bisected.

Usage: python tools/crowding_retime.py [query ...]   (default: the r4
regressed set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.cache import release_all
from spark_streaming_twitch_analytics_spark.session import get_spark

# the >=1.3x r3->r4 regressions (BENCH_r03 tail vs round-4 bench_summary)
R4_REGRESSED = [
    "ann_ivf_recall",
    "corpus_classifier_filter",
    "dedup_simhash64_hamming",
    "corpus_bloom_decontaminate",
    "corpus_tfidf_top_per_doc",
    "corpus_hll_distinct",
    "corpus_bm25_topk",
    "text_gopher_rules",
    "corpus_line_dedup",
    "bucketed_join_priority_revenue",
    "orders_rfm_segments",
    "corpus_temperature_mix",
    "events_anomaly_zscore",
]


def main() -> None:
    names = sys.argv[1:] or R4_REGRESSED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="crowding_retime")
    spark.range(1000).selectExpr("sum(id)").collect()
    from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).selectExpr("count(*)").collect()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        suite = json.load(open(os.path.join(here, "bench_summary.json")))["queries"]
    except Exception:
        suite = {}

    print("| query | full-suite s | fresh-session s | fresh/suite |")
    print("|---|---|---|---|")
    out = {}
    for name in names:
        fn = registry.get(name).fn

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()
        release_all()
        best = float("inf")
        for _ in range(2):
            spark._jvm.System.gc()
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
            release_all()
        out[name] = round(best, 3)
        s = suite.get(name)
        ratio = f"{best / s:.2f}" if s else "—"
        print(f"| {name} | {s if s is not None else '—'} | {out[name]} | {ratio} |")
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
