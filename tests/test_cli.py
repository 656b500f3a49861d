"""End-to-end test of the CLI entry point (__main__.py) — the
reference's launch surface (TwitchStream.scala:27-35) — in file-source
mode with deterministic input."""

from __future__ import annotations

from pyspark.sql import types as T

from spark_streaming_twitch_analytics_spark.__main__ import main
from spark_streaming_twitch_analytics_spark.sources import irc


def test_cli_file_source_counts_words_and_categories(spark, tmp_path):
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    lines = [
        irc.format_privmsg(1000 + i, f"u{i % 3}", "testchan", "hello stream hello")
        for i in range(10)
    ]
    irc.write_batch_file(src, lines, 0)

    rc = main(
        [
            "testchan",
            "1",
            "english",
            "--source",
            "file",
            "--dir",
            src,
            "--store",
            store,
            "--max-batches",
            "3",
        ]
    )
    assert rc == 0

    # the CLI stopped its own session; read the store with the test session
    from spark_streaming_twitch_analytics_spark.sources.kv_store import KVTableStore

    kv = KVTableStore(spark, store)
    schema = T.StructType(
        [T.StructField("word", T.StringType()), T.StructField("cnt", T.LongType())]
    )
    words = {r["word"]: r["cnt"] for r in kv.get_table("testchan_wordcount", schema).collect()}
    # 10 messages × ("hello"×2 + "stream"×1); "hello"/"stream" are >3 chars
    assert words.get("hello") == 20
    assert words.get("stream") == 10
    cat_schema = T.StructType(
        [T.StructField("category", T.StringType()), T.StructField("cnt", T.LongType())]
    )
    cats = kv.get_table("testchan_categoryCount", cat_schema).collect()
    assert sum(r["cnt"] for r in cats) > 0


def test_bench_diff_flags_only_beyond_canary_envelope():
    """tools/bench_diff.py diff_summaries: host-speed drift (captured by
    the canary ratio) must NOT read as a regression; a genuine slowdown
    beyond the envelope AND the absolute floor must."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.bench_diff import diff_summaries

    prev = {
        "noise_canary": {"start": 0.2, "mid": 0.2, "end": 0.2},
        "queries": {"a": 1.0, "b": 1.0, "c": 0.2},
    }
    # host 2x slower uniformly: canary 0.4, every query 2x — no flags
    cur_drift = {
        "noise_canary": {"start": 0.4, "mid": 0.4, "end": 0.4},
        "queries": {"a": 2.0, "b": 2.0, "c": 0.4},
    }
    r = diff_summaries(prev, cur_drift)
    assert r["n_regressed_beyond_canary"] == 0
    assert r["canary_ratio"] == 2.0

    # same host speed, 'a' genuinely 3x slower; 'c' 3x slower but the
    # delta (0.4 s) is... above the 0.3 s floor -> both flag; 'b' 1.1x
    # (inside the 1.25 envelope) must not flag
    cur_reg = {
        "noise_canary": {"start": 0.2, "mid": 0.2, "end": 0.2},
        "queries": {"a": 3.0, "b": 1.1, "c": 0.6},
    }
    r = diff_summaries(prev, cur_reg)
    assert set(r["regressed"]) == {"a", "c"}
    assert r["n_regressed_beyond_canary"] == 2

    # sub-floor absolute deltas never flag even at a big ratio
    cur_tiny = {
        "noise_canary": {"start": 0.2, "mid": 0.2, "end": 0.2},
        "queries": {"a": 1.0, "b": 1.0, "c": 0.45},
    }
    assert diff_summaries(prev, cur_tiny)["n_regressed_beyond_canary"] == 0

    # missing canaries -> explicit error, never a silent 0
    assert diff_summaries({"queries": {}}, cur_tiny)["n_regressed_beyond_canary"] is None


def test_bench_diff_adjudication_crowding_vs_confirmed():
    """adjudicate_regressions (VERDICT r10 task 1): a flagged row whose
    FRESH-session retime lands back inside the canary envelope is
    stamped 'crowding' (not a regression); a row that reproduces the
    slowdown fresh stays loud as 'confirmed_regression'; a retime
    failure defaults loud, never silent."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.bench_diff import adjudicate_regressions

    def mk_diff():
        return {
            "envelope": 1.25,
            "n_regressed_beyond_canary": 2,
            "regressed": {
                "crowded_q": {
                    "prev_sec": 1.0, "expected_sec": 1.0,
                    "cur_sec": 3.0, "norm_slowdown": 3.0,
                },
                "real_q": {
                    "prev_sec": 1.0, "expected_sec": 1.0,
                    "cur_sec": 3.0, "norm_slowdown": 3.0,
                },
            },
        }

    # crowded_q retimes back to ~expected; real_q reproduces 3x fresh
    d = adjudicate_regressions(
        mk_diff(), "/root/repo",
        retime_fn=lambda names: {"crowded_q": 1.05, "real_q": 2.9},
    )
    assert d["regressed"]["crowded_q"]["verdict"] == "crowding"
    assert d["regressed"]["real_q"]["verdict"] == "confirmed_regression"
    assert d["n_confirmed_regressions"] == 1
    assert d["regressed"]["real_q"]["retime_sec"] == 2.9

    # retime blowing up must not demote anything: all stay confirmed
    d = adjudicate_regressions(
        mk_diff(), "/root/repo",
        retime_fn=lambda names: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    assert d["n_confirmed_regressions"] == 2
    assert "adjudication_error" in d

    # a missing per-row retime defaults loud
    d = adjudicate_regressions(
        mk_diff(), "/root/repo", retime_fn=lambda names: {"crowded_q": 1.0},
    )
    assert d["regressed"]["real_q"]["verdict"] == "confirmed_regression"

    # no flags -> no subprocess, zero confirmed
    d = adjudicate_regressions(
        {"regressed": {}, "envelope": 1.25}, "/root/repo",
        retime_fn=lambda names: (_ for _ in ()).throw(AssertionError),
    )
    assert d["n_confirmed_regressions"] == 0

    # sub-floor absolute retime delta is crowding even past the envelope
    # (0.2s expected, retime 0.3s: ratio 1.5 > envelope but delta 0.1s)
    d = adjudicate_regressions(
        {
            "envelope": 1.25,
            "regressed": {
                "tiny": {"prev_sec": 0.2, "expected_sec": 0.2,
                         "cur_sec": 0.9, "norm_slowdown": 4.5}
            },
        },
        "/root/repo",
        retime_fn=lambda names: {"tiny": 0.3},
    )
    assert d["regressed"]["tiny"]["verdict"] == "crowding"


def test_replica_cert_flag_annotations_cover_known_quadratic_rows():
    """Every row the r9/r10 artifacts showed super-linear by design must
    carry a QUADRATIC_BY_DESIGN annotation, so the cert tool's
    unannotated-flag hard-fail can never trip on a documented row."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.replica_cert import QUADRATIC_BY_DESIGN

    for name in (
        "ann_brute_topk",
        "ann_brute_topk_np",
        "ann_sq8_topk",
        "ann_sq8_index_topk",
        "ann_pq_topk",
        "dedup_semantic",
    ):
        assert name in QUADRATIC_BY_DESIGN, name
        assert len(QUADRATIC_BY_DESIGN[name]) > 20  # a real explanation
