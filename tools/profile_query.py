"""Per-query profiler (guide §1: measure first, §7.1: use the UI).

Runs named registry queries through the SAME noop-sink protocol as
bench.py, but with the Spark UI enabled, and reports where the time
goes: wall seconds, job/stage/task counts, and the per-stage breakdown
(executor run time, shuffle read/write bytes, python boundary) scraped
from the UI REST API. This is a DIAGNOSTIC tool — it never feeds the
round artifacts; bench.py stays the only source of recorded numbers.

Usage:
    python tools/profile_query.py q5_nation_revenue ann_ivf_topk
    python tools/profile_query.py --explain ann_ivf_topk   # plans only
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_twitch_analytics_spark import registry
from spark_streaming_twitch_analytics_spark.cache import release_all
from spark_streaming_twitch_analytics_spark.session import get_spark


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def profile(spark, sf_dir: str, name: str, runs: int = 2) -> dict:
    fn = registry.get(name).fn

    def run() -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription(f"profile:{name}")
    run()  # warm (codegen, shuffle files) — mirrors bench.py protocol
    release_all()
    tracker = spark.sparkContext.statusTracker()
    best, best_detail = float("inf"), None
    for _ in range(runs):
        jobs_before = set(tracker.getJobIdsForGroup())
        spark._jvm.System.gc()
        t0 = time.time()
        run()
        wall = time.time() - t0
        release_all()
        jobs_after = set(tracker.getJobIdsForGroup())
        new_jobs = sorted(jobs_after - jobs_before)
        if wall < best:
            best, best_detail = wall, new_jobs
    spark.sparkContext.setJobDescription(None)

    stages = []
    try:
        all_stages = {s["stageId"]: s for s in _rest(spark, "stages")}
        job_info = {j["jobId"]: j for j in _rest(spark, "jobs")}
        stage_ids: set[int] = set()
        for j in best_detail or []:
            stage_ids.update(job_info.get(j, {}).get("stageIds", []))
        for sid in sorted(stage_ids):
            s = all_stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            stages.append(
                {
                    "stage": sid,
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s.get("numCompleteTasks"),
                    "run_ms": s.get("executorRunTime"),
                    "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                    "sh_read_mb": round(
                        (s.get("shuffleReadBytes") or 0) / 1e6, 2
                    ),
                    "sh_write_mb": round(
                        (s.get("shuffleWriteBytes") or 0) / 1e6, 2
                    ),
                    "input_mb": round((s.get("inputBytes") or 0) / 1e6, 2),
                }
            )
    except Exception as e:  # REST scrape is best-effort
        stages = [{"error": str(e)[:120]}]
    return {
        "query": name,
        "wall_sec": round(best, 3),
        "n_jobs": len(best_detail or []),
        "n_stages_run": len([s for s in stages if "stage" in s]),
        "sum_stage_run_ms": sum(s.get("run_ms") or 0 for s in stages),
        "stages": stages,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain_only = "--explain" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1000).selectExpr("sum(id)").collect()
    from spark_streaming_twitch_analytics_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).selectExpr("count(*)").collect()

    for name in args:
        if explain_only:
            df = registry.get(name).fn(spark, sf_dir)
            print(f"==== {name} ====")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
            continue
        rep = profile(spark, sf_dir, name)
        print(json.dumps(rep, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
