"""A/B the global AQE ``coalescePartitions.minPartitionSize`` floor
(VERDICT r11 task 1): run the FULL batch bench set (same protocol as
bench.py: warm + best-of-2 cold-cache noop-sink runs, eager persists
released inside the timed region) in ONE fresh session per floor value,
bracketed by the pinned noise canary.

Usage:
    python tools/ab_floor.py 64KB [query ...]  > /tmp/ab_64kb.json
    python tools/ab_floor.py 1MB  [query ...]  > /tmp/ab_1mb.json

With no query names the FULL batch set runs (~80 min wall per floor on
this host); the default subset below (~3 min/floor) covers (a) the
broad small-query drift signature the r11 verdict attributed to the
floor (TPC-H + events + wordcount family: the queries that slowed
+0.3-0.5 s in the committed r11 summary) and (b) the compute-dense
dedup/ANN verify paths the floor was introduced FOR (the r11-measured
winners). Each invocation is a separate process because the config is
session-level.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_MIN_PARTITION_SIZE"] = sys.argv[1]

from bench import _canary_time, bench_set  # noqa: E402
from spark_streaming_twitch_analytics_spark import registry  # noqa: E402
from spark_streaming_twitch_analytics_spark.cache import release_all  # noqa: E402
from spark_streaming_twitch_analytics_spark.session import get_spark  # noqa: E402
from spark_streaming_twitch_analytics_spark.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)


# (a) drift-signature sample: small-shuffle queries that rose +0.3-0.5 s
# in the r11 committed summary; (b) the floor's intended winners.
DEFAULT_SUBSET = [
    "flagship_wordcount",
    "wordcount",
    "wordcount_by_channel",
    "events_ab_test",
    "events_hourly",
    "events_funnel",
    "events_retention",
    "events_attribution",
    "sessionize",
    "session_window_agg",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "orders_monthly",
    "rollup_orders",
    "pivot_events",
    "semi_join_top_words",
    "topk_words_per_lang",
    "category_count",
    "training_prep",
    "update_table_merge",
    # floor winners (compute-dense verify stages)
    "dedup_ngram_topk",
    "dedup_ppjoin_pairs",
    "dedup_minhash_pairs",
    "dedup_containment_pairs",
    "ann_ivf_topk",
    "ann_brute_topk",
]


def main() -> None:
    floor = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_SUBSET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab_floor_{floor}")
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize")
        == floor
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).selectExpr("count(*)").collect()

    all_timed, _, _ = bench_set()
    timed_names = [n for n in all_timed if n in set(names)] if names else all_timed
    canary = {"start": _canary_time(spark, sf_dir)}
    times: dict[str, float] = {}
    for i, name in enumerate(timed_names):
        if i == len(timed_names) // 2:
            canary["mid"] = _canary_time(spark, sf_dir)
        fn = registry.get(name).fn

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm
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
    print(
        json.dumps(
            {
                "floor": floor,
                "total": round(sum(times.values()), 3),
                "noise_canary": canary,
                "queries": times,
                "sf_dir": sf_dir,
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
