"""Full-suite ×k-replica certification (VERDICT r8 task 5, extended to
every timed query by VERDICT r9 task 1).

SCALING.md carries per-shape replica probes; this tool runs the ENTIRE
bench timed set (every registered query except streaming_* and the
documented DEMONSTRATORS — the HEADLINE set is a subset) once at a ×k
replica of sf0.1 (≈ sf1 at the default k=10) with the exact bench.py
measurement protocol (noop sink over every column, warm + best-of-2),
and records per-query wall times plus the t(k×)/t(1×) ratio into one
JSON artifact — the strongest local evidence available for the 100 TB
design claims.

Flagging: a query is flagged super-linear when ratio > k·1.5 AND the
replica time exceeds 5 s (the absolute floor keeps fixed per-query
overhead — session, codegen, task launch on a 0.3 s query — from
producing meaningless ratios). Known quadratic-by-design rows (exact
meter sides and flat-scan demonstrators whose scale-safe twin is also
certified here) are annotated, and the tool HARD-FAILS on any flagged
row without an annotation (VERDICT r9 task 2) — so
``n_flagged_unannotated`` in the artifact is 0 by construction, and a
future regression cannot hide behind the by-design rows.

Usage: python tools/replica_cert.py [k] [out_json] [query ...]
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
from tools.scale_replica import SRC, build_replica

# Rows whose super-linear decade growth is the DESIGN, not a regression:
# exact meter sides and flat-scan capability demonstrators whose
# scale-safe twin is certified in the same artifact. Pair volume grows
# ~k² by construction; production samples the query set or serves the
# twin (documented in SCALING.md / VERDICT).
QUADRATIC_BY_DESIGN = {
    "ann_brute_topk": "exact brute meter: |Q|·|C| pairs, both grow k×",
    "ann_brute_topk_np": "same pair set, numpy matmul scale path",
    "dedup_semantic": "within-cell pair join: cell occupancy grows k×",
    "ann_sq8_topk": "flat SQ8 scan: |Q|·|C| pairs by construction — SQ8 "
    "compresses the scan, it does not prune it; scale path = "
    "ann_ivf_sq8_topk (cell-pruned, ~linear in the same artifact)",
    "ann_sq8_index_topk": "flat SQ8 scan served off the persisted codes "
    "layout — same |Q|·|C| pair set; scale path = ann_ivf_sq8_index_topk",
    "ann_pq_topk": "ADC over ALL codes: |Q|·|C| table lookups — PQ "
    "compresses the scan, it does not prune it; scale path = "
    "ann_ivfpq_topk (cell-pruned, ~linear in the same artifact)",
}


def _time_query(spark, name: str, sf_dir: str) -> float:
    qd = registry.get(name)

    def run() -> None:
        # noop sink materializes EVERY column (count() would let
        # Catalyst prune expensive expressions — bench.py's rule)
        qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    release_all()
    run()  # warm: codegen + any fingerprint-keyed artifact build
    best = float("inf")
    for _ in range(2):
        release_all()
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    import bench

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"SCALE_X{k}_FULL.json",
        )
    )
    # default: the FULL bench timed set (streaming_* and DEMONSTRATORS
    # excluded by bench_set's rule; HEADLINE is a subset)
    names = sys.argv[3:] or bench.bench_set()[0]
    rep_dir = f"/tmp/sf_replica_x{k}"
    spark = get_spark()
    if not os.path.exists(f"{rep_dir}/documents.parquet"):
        t0 = time.time()
        build_replica(spark, k, rep_dir)
        print(f"# replica x{k} built in {time.time() - t0:.1f}s -> {rep_dir}")

    rows: dict[str, dict] = {}
    for i, name in enumerate(names, 1):
        try:
            base = _time_query(spark, name, SRC)
            rep = _time_query(spark, name, rep_dir)
        except Exception as e:  # record, keep certifying the rest
            rows[name] = {"error": str(e)[:200]}
            print(f"[{i}/{len(names)}] {name:32s} ERROR {e}", flush=True)
            continue
        ratio = round(rep / base, 2) if base > 0 else None
        flagged = bool(rep > 5.0 and ratio is not None and ratio > k * 1.5)
        rows[name] = {
            "sec_base": base,
            f"sec_x{k}": rep,
            "ratio": ratio,
            "flagged_superlinear": flagged,
        }
        if name in QUADRATIC_BY_DESIGN:
            rows[name]["quadratic_by_design"] = QUADRATIC_BY_DESIGN[name]
        print(
            f"[{i}/{len(names)}] {name:32s} {base:7.2f}s -> {rep:7.2f}s "
            f"({ratio}x){' FLAG' if flagged else ''}",
            flush=True,
        )

    timed = [r for r in rows.values() if "ratio" in r]
    flagged = sorted(
        n for n, r in rows.items() if r.get("flagged_superlinear")
    )
    unannotated = [n for n in flagged if n not in QUADRATIC_BY_DESIGN]
    errored = sorted(n for n, r in rows.items() if "error" in r)
    doc = {
        "k": k,
        "src": SRC,
        "replica_dir": rep_dir,
        "n_queries": len(rows),
        "n_flagged_superlinear": len(flagged),
        "n_flagged_unannotated": len(unannotated),
        "flagged": flagged,
        "flagged_unannotated": unannotated,
        "errors": errored,
        "total_base_sec": round(sum(r["sec_base"] for r in timed), 1),
        f"total_x{k}_sec": round(sum(r[f"sec_x{k}"] for r in timed), 1),
        "protocol": "bench.py noop-sink, warm + best-of-2, one shared "
        "session; flag = ratio > k*1.5 AND replica time > 5 s; "
        "quadratic_by_design rows are exact meter sides / flat-scan "
        "demonstrators whose scale-safe twin is certified in this same "
        "artifact — annotated not failed; any UNannotated flag fails "
        "the tool (exit 1)",
        "queries": dict(sorted(rows.items())),
    }
    with open(out_json, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({kk: v for kk, v in doc.items() if kk != "queries"}))
    spark.stop()
    if unannotated:
        print(
            "FAIL: super-linear growth without a quadratic_by_design "
            f"annotation: {unannotated} — fix the plan or document why "
            "the growth is the design",
            file=sys.stderr,
        )
        sys.exit(1)
    if errored:
        print(f"FAIL: queries errored at base or replica: {errored}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
