"""Semantic invariants of the product-analytics family (values are
hash-gated against DuckDB elsewhere; these pin the PROPERTIES that make
the numbers meaningful)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark import registry

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return registry.get(name).fn(spark, SF)


def test_funnel_is_monotone(spark):
    rows = {r["step"]: r["n_users"] for r in q(spark, "events_funnel").collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"] >= 0


def test_retention_offset_zero_covers_every_user(spark):
    rows = q(spark, "events_retention").collect()
    assert all(r["week_offset"] >= 0 for r in rows)
    # offset 0 = the cohort itself: summed over cohorts it counts every user
    n0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    first = q(spark, "scd2_user_history").select("user_id").distinct().count()
    assert n0 == first


def test_markov_rows_sum_to_one(spark):
    rows = q(spark, "events_markov_transitions").collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["prob"]
    for prev, s in by_prev.items():
        # floor-quantized probs: the row sum can only undershoot 1, and by
        # at most one quantum per cell
        assert 1.0 - 5e-6 <= s <= 1.0 + 1e-9, (prev, s)


def test_rfm_scores_are_quartile_balanced(spark):
    rows = q(spark, "orders_rfm_segments").collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        vals = [r[col] for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
        # exact-percentile boundaries: no bucket may hold a majority
        # unless the metric is massively tied (f is integer-valued and
        # CAN tie heavily; r and m are near-continuous)
        if col != "f_score":
            for b in (1, 2, 3, 4):
                assert vals.count(b) <= 0.6 * n, (col, b)


def test_wilson_lower_bound_never_exceeds_rate(spark):
    for r in q(spark, "supplier_return_wilson").collect():
        assert r["wilson_lower"] <= r["rate"] + 1e-9
        assert 0.0 <= r["wilson_lower"] <= 1.0


def test_basket_lift_and_support_consistent(spark):
    rows = q(spark, "orders_basket_pairs").collect()
    for r in rows:
        assert r["p1"] < r["p2"]
        assert r["pair_cnt"] >= 1
        assert r["lift"] >= 0.0


def test_attribution_marks_only_window_hits(spark):
    rows = q(spark, "events_attribution").collect()
    for r in rows:
        assert (r["attributed_view_id"] is not None) == r["attributed"]


def test_exact_quantiles_match_global_sort(spark):
    """Histogram-select must return the SAME order statistic a global
    sort would, at any bin width (bin boundaries can't move the answer),
    including under heavy ties."""
    from pyspark.sql import functions as F

    from spark_streaming_twitch_analytics_spark.operators.quantiles import (
        DEFAULT_QS,
        exact_quantiles,
    )

    vals = [float(x) for x in [5, 1, 3, 3, 3, 250, 7, 999, 42, 42, 0.5]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    srt = sorted(vals)
    n = len(vals)
    for width in (100.0, 1.0, 1e9):
        got = {
            r["label"]: (r["k"], r["value"])
            for r in exact_quantiles(df, "v", bin_width=width).collect()
        }
        for label, num, den in DEFAULT_QS:
            k = -(-num * n // den)  # ceil
            assert got[label] == (k, srt[k - 1]), (label, width, got[label])


def test_exact_quantiles_registered_query_types(spark):
    out = q(spark, "exact_quantiles_histogram")
    assert [f.name for f in out.schema.fields] == ["label", "k", "value"]
    rows = out.collect()
    assert len(rows) == 4
    # ranks are ordered with the quantile levels
    byl = {r["label"]: r for r in rows}
    assert byl["p25"]["k"] <= byl["p50"]["k"] <= byl["p75"]["k"] <= byl["p95"]["k"]
    assert byl["p25"]["value"] <= byl["p95"]["value"]


def test_grouped_quantiles_match_per_group_sort(spark):
    from spark_streaming_twitch_analytics_spark.operators.quantiles import (
        DEFAULT_QS,
        grouped_exact_quantiles,
    )

    data = {
        "a": [5.0, 1.0, 3.0, 3.0, 250.0, 0.5],
        "b": [42.0, 42.0, 42.0, 7.0],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["label"]): (r["k"], r["value"])
        for r in grouped_exact_quantiles(df, "g", "v", bin_width=10.0).collect()
    }
    for g, vs in data.items():
        srt, n = sorted(vs), len(vs)
        for label, num, den in DEFAULT_QS:
            k = -(-num * n // den)
            assert got[(g, label)] == (k, srt[k - 1]), (g, label)
    # high-cardinality-group escape hatch: unhinted joins (SortMergeJoin
    # fallback) must produce the identical result — the hint is a
    # physical choice only, gated by the bounded-group contract
    unhinted = {
        (r["g"], r["label"]): (r["k"], r["value"])
        for r in grouped_exact_quantiles(
            df, "g", "v", bin_width=10.0, hint_broadcast=False
        ).collect()
    }
    assert unhinted == got


def test_mad_outliers_matches_pandas_recompute(spark):
    """Per-group median (rank ceil(n/2) order statistic), MAD, and the
    3·MAD outlier count recomputed in pandas from the raw parquet."""
    import pandas as pd

    out = {
        r["event_type"]: r.asDict()
        for r in registry.get("events_mad_outliers").fn(spark, SF).collect()
    }
    raw = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "value"]]
    raw = raw[raw["value"].notna()]
    for etype, grp in raw.groupby("event_type"):
        v = grp["value"].sort_values().to_numpy()
        n = len(v)
        med = v[(n + 1) // 2 - 1]  # lower median, 1-based rank ceil(n/2)
        dev = abs(grp["value"].to_numpy() - med)
        mad = sorted(dev)[(n + 1) // 2 - 1]
        got = out[etype]
        assert got["n"] == n
        assert got["med"] == med
        assert got["mad"] == mad
        assert got["n_outliers"] == int((dev > 3.0 * mad).sum())


def test_twap_hand_computed_series(spark):
    """2h at 10.00 then 1h at 20.00 → TWAP (10·2 + 20·1)/3 = 13.33…;
    the trailing event holds nothing. Single-event users are excluded."""
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        events_twap,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 7, "x", 10.0, None),
        (2, "2024-01-01 02:00:00", 7, "x", 20.0, None),
        (3, "2024-01-01 03:00:00", 7, "x", 99.0, None),  # trailing
        (4, "2024-01-01 05:00:00", 8, "x", 42.0, None),  # single event
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = events_twap(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_id"], r["n_events"]) == (7, 3)
    assert abs(r["twap"] - (10.0 * 2 + 20.0 * 1) / 3) < 1e-12


def test_periodicity_dft_finds_planted_12h_cycle(spark):
    """Events concentrated at hours {0, 12} → a pure 12h cycle: after
    DC (k=0), bin k=2 (period 24/2 = 12h) must dominate the spectrum,
    and odd bins vanish (the profile is symmetric under +12h)."""
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        events_periodicity_dft,
    )

    rows = []
    eid = 0
    for day in range(1, 11):
        for hour in (0, 12):
            for i in range(5):
                rows.append(
                    (eid, f"2024-01-{day:02d} {hour:02d}:10:{i:02d}", 1, "x", 1.0, None)
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        p = {r["k"]: r["power"] for r in events_periodicity_dft(spark, d).collect()}
    nonzero = {k: v for k, v in p.items() if k > 0 and v > 1e-6}
    assert max(nonzero, key=nonzero.get) == 2
    assert p[1] < 1e-6 and p[3] < 1e-6  # odd harmonics cancel


def test_cusum_closed_form_equals_naive_recurrence(spark):
    """The window-pass closed form must equal the sequential
    S_t = max(0, S_{t-1} + a_t) on the real data."""
    rows = sorted(
        q(spark, "events_cusum_changepoint").collect(), key=lambda r: r["day"]
    )
    cs = [r["c"] for r in rows]
    n, total = len(cs), sum(cs)
    s = 0
    for r, c in zip(rows, cs):
        s = max(0, s + n * c - total)
        assert r["s_scaled"] == s
        assert r["alarm"] == int(s > 2 * total)


def test_cusum_alarms_on_planted_level_shift(spark):
    """20 quiet days (2/day) then 10 loud days (40/day): the alarm must
    be off through the quiet regime and ON by the end of the shift."""
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        events_cusum_changepoint,
    )

    rows, eid = [], 0
    for day in range(1, 31):
        rate = 2 if day <= 20 else 40
        for i in range(rate):
            rows.append(
                (eid, f"2024-01-{day:02d} 03:00:{i % 60:02d}", 1, "x", 1.0, None)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = sorted(
            events_cusum_changepoint(spark, d).collect(), key=lambda r: r["day"]
        )
    assert all(r["alarm"] == 0 for r in out[:20])
    assert out[-1]["alarm"] == 1
