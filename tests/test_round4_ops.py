"""Round-4 operator units: SQ8 quantization, FastSS typo join, frontier
BFS, dyadic decay sums, Achlioptas projection, winsorized aggregation.

Each test pins semantics against a hand-computed or pure-Python
reference — the fuzz gate (test_fuzz_oracle) separately proves DuckDB
parity on adversarial data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.functions.vectors import (
    achlioptas_weights,
    as_double,
    int_dot,
    sq8_requant,
)
from spark_streaming_twitch_analytics_spark.operators.clusters import bfs_hops
from spark_streaming_twitch_analytics_spark.operators import similarity


# ---------------------------------------------------------------------------
# frontier BFS
# ---------------------------------------------------------------------------


def test_bfs_hops_chain_and_unreachable(spark):
    # chain 1-2-3-4-5-6 plus a disconnected pair {10, 11}; seed = min = 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)], "a long, b long"
    )
    got = {r.doc_id: r.hops for r in bfs_hops(edges, max_hops=4).collect()}
    # node 6 is 5 hops away -> cut by max_hops; 10/11 unreachable
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_hops_cycle_takes_min_distance(spark):
    # square 1-2-3-4-1: node 3 reachable both ways in 2 hops
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "a long, b long"
    )
    got = {r.doc_id: r.hops for r in bfs_hops(edges, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_hops_empty_graph(spark):
    edges = spark.createDataFrame([], "a long, b long")
    rows = bfs_hops(edges, max_hops=3).collect()
    # min() over no edges -> one NULL seed row, frontier never fires
    assert len(rows) == 1 and rows[0].doc_id is None and rows[0].hops == 0


# ---------------------------------------------------------------------------
# SQ8 requantization
# ---------------------------------------------------------------------------


def test_sq8_requant_error_bound_and_fixed_points(spark):
    dim = 4
    rows = [
        ([0.0, -3.0, 7.5, 2.25],),
        ([10.0, 3.0, -7.5, 2.25],),
        ([5.0, 0.0, 0.0, 2.25],),
    ]
    df = spark.createDataFrame(rows, "v array<double>")
    mns = [0.0, -3.0, -7.5, 2.25]
    mxs = [10.0, 3.0, 7.5, 2.25]
    out = df.select(
        sq8_requant(
            F.col("v"),
            F.array(*[F.lit(x) for x in mns]),
            F.array(*[F.lit(x) for x in mxs]),
            dim,
        ).alias("rq"),
        "v",
    ).collect()
    for r in out:
        for j in range(dim):
            rng = mxs[j] - mns[j]
            # half-step reconstruction error bound; constant dims exact
            assert abs(r.rq[j] - r.v[j]) <= rng / 510 + 1e-12
        # corpus min and max are exact fixed points (codes 0 and 255)
    first = out[0].rq
    assert first[0] == 0.0 and first[1] == -3.0 and first[3] == 2.25


def test_sq8_topk_matches_exact_on_separable_data(spark):
    # integer vectors spread widely: 8-bit codes lose < the gap between
    # neighbours, so the SQ8 ranking must equal the exact one
    import random

    rng = random.Random(7)
    rows = [
        (i, [float(rng.randint(-5, 5)) for _ in range(64)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = similarity.brute_force_topk(queries, emb, 5)
    sq8 = similarity.sq8_topk(queries, emb, 5)
    rec = similarity.recall_at_k(exact, sq8).collect()[0]
    assert rec.total == 30  # 6 queries x 5
    assert rec.recall >= 0.9


def test_sq8_index_matches_scan_and_shrinks_storage(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "sq8idx")
    similarity.build_sq8_index(emb, path)
    served = {
        (r.q_id, r.rn): (r.c_id, r.cos)
        for r in similarity.query_sq8_index(queries, path, 5).collect()
    }
    scan = {
        (r.q_id, r.rn): (r.c_id, r.cos)
        for r in similarity.sq8_topk(queries, emb, 5).collect()
    }
    assert served == scan and len(served) > 0
    # the point of SQ8: int8 codes on disk are much smaller than floats
    import os

    def du(p):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(p)
            for f in fs
        )

    raw = os.path.getsize(f"{sf}/embeddings.parquet") if os.path.isfile(
        f"{sf}/embeddings.parquet"
    ) else du(f"{sf}/embeddings.parquet")
    assert du(f"{path}/codes") < 0.6 * raw


# ---------------------------------------------------------------------------
# Achlioptas sparse projection
# ---------------------------------------------------------------------------


def test_achlioptas_weights_deterministic_and_sparse():
    w1 = achlioptas_weights(3, 64)
    w2 = achlioptas_weights(3, 64)
    assert w1 == w2 and set(w1) <= {-1, 0, 1}
    # ~5/8 zeros by construction; sanity-check the matrix isn't degenerate
    nz = sum(1 for x in w1 if x != 0)
    assert 5 <= nz <= 45


def test_int_dot_exact(spark):
    df = spark.createDataFrame([([3, -2, 7, 0],)], "xi array<bigint>")
    w = [1, -1, 0, 1]
    got = df.select(int_dot(F.col("xi"), w).alias("d")).collect()[0].d
    assert got == 3 * 1 + (-2) * (-1) + 7 * 0 + 0 * 1 == 5


def test_sparse_projection_is_exact_integer_map(spark):
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        _PROJ_DIM,
        _PROJ_OUT,
    )

    import random

    rng = random.Random(11)
    vec = [rng.uniform(-5, 5) for _ in range(_PROJ_DIM)]
    emb = spark.createDataFrame(
        [(0, [float(x) for x in vec])], "vec_id long, embedding array<float>"
    )
    # python reference: same milli-quantization + integer dots. float32
    # storage first (the table column is array<float>), then double.
    import struct

    as_f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
    xi = [math.floor(x * 1000.0 + 0.5) for x in as_f32]
    expect = [
        sum(a * b for a, b in zip(xi, achlioptas_weights(k, _PROJ_DIM)))
        for k in range(_PROJ_OUT)
    ]
    xi_col = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.floor(x * F.lit(1000.0) + F.lit(0.5)),
    )
    proj = F.array(
        *[
            int_dot(F.col("xi"), achlioptas_weights(k, _PROJ_DIM))
            for k in range(_PROJ_OUT)
        ]
    )
    got = (
        emb.select(xi_col.alias("xi"))
        .select(proj.alias("proj"))
        .collect()[0]
        .proj
    )
    assert list(got) == expect


# ---------------------------------------------------------------------------
# FastSS typo pairs
# ---------------------------------------------------------------------------


def test_typo_pairs_finds_known_distances(spark, tmp_path):
    docs = [
        # every word twice so freq >= 2 holds
        (0, "hello helo spark spork hello helo", "en", "s", 1),
        (1, "spark spork house horse house horse", "en", "s", 1),
        (2, "plant pants plant pants zebra zebra", "en", "s", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        import os

        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp_path}/{t}.parquet")
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        corpus_typo_pairs,
    )

    got = {
        (r.word_a, r.word_b): r.dist
        for r in corpus_typo_pairs(spark, str(tmp_path)).collect()
    }
    assert got[("hello", "helo")] == 1  # deletion
    assert got[("spark", "spork")] == 1  # substitution
    assert got[("horse", "house")] == 1
    assert got[("pants", "plant")] == 2  # two edits, caught by k=2 FastSS
    assert ("zebra", "zebra") not in got  # identity never pairs (a < b)
    for (a, b), d in got.items():
        assert a < b and 1 <= d <= 2


# ---------------------------------------------------------------------------
# conversion latency percentiles
# ---------------------------------------------------------------------------


def test_conversion_latency_matches_numpy_over_python_funnel(spark):
    import numpy as np

    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        _LAT_QS,
        events_conversion_latency,
    )

    sf = "/root/testdata/sf0.01"
    got = {r.label: r.value for r in events_conversion_latency(spark, sf).collect()}
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr("user_id", "event_type", "unix_micros(cast(ts as timestamp)) AS us")
        .collect()
    )
    first_click, purchases = {}, {}
    for r in ev:
        if r.event_type == "click":
            first_click[r.user_id] = min(first_click.get(r.user_id, r.us), r.us)
        elif r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append(r.us)
    lats = []
    for u, c in first_click.items():
        after = [p for p in purchases.get(u, []) if p >= c]
        if after:
            lats.append(min(after) - c)
    assert lats  # the funnel converts on this data
    for label, num, den in _LAT_QS:
        expect = float(np.percentile(lats, 100.0 * num / den, method="linear"))
        assert got[label] == pytest.approx(expect, rel=1e-12), label


# ---------------------------------------------------------------------------
# KMV sketch overlap
# ---------------------------------------------------------------------------


def test_kmv_estimates_track_truth_and_fall_back_exact(spark):
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        _KMV_K,
        corpus_kmv_overlap,
    )

    r = corpus_kmv_overlap(spark, "/root/testdata/sf0.01").collect()[0]
    for est, true in (
        (r.est_a, r.true_a),
        (r.est_b, r.true_b),
        (r.est_union, r.true_union),
    ):
        if true < _KMV_K:
            assert est == float(true)  # sketch IS the set -> exact
        else:
            # k=16 gives ~1/sqrt(k-1) ~ 26% relative error; allow 3 sigma
            assert abs(est - true) / true < 0.8, (est, true)
    # inclusion-exclusion intersection estimate must be sane
    inter = r.est_a + r.est_b - r.est_union
    true_inter = r.true_a + r.true_b - r.true_union
    assert true_inter >= 0 and inter >= -0.5 * max(r.true_union, 1)


# ---------------------------------------------------------------------------
# native recursive CTE: capped cumulative spend
# ---------------------------------------------------------------------------


def test_capped_cumsum_matches_python_fold_and_clamps(spark):
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        _CAP_CENTS,
        orders_capped_cumsum,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.o_custkey, r.rn): r.spent
        for r in orders_capped_cumsum(spark, sf).collect()
    }
    orders = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus",
            "o_totalprice",
        )
        .collect()
    )
    by_cust = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r)
    import math

    capped = floored = reopened = False
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: (r.o_orderdate, r.o_orderkey))
        spent = 0
        was_capped = False
        for i, r in enumerate(rows, start=1):
            cents = math.floor(r.o_totalprice * 100 + 0.5)
            delta = -(cents // 2) if r.o_orderstatus == "F" else cents
            spent = max(0, min(spent + delta, _CAP_CENTS))
            assert got[(cust, i)] == spent, (cust, i)
            if spent == _CAP_CENTS:
                capped = was_capped = True
            elif was_capped:
                reopened = True  # a refund re-opened headroom post-cap
            if spent == 0 and delta < 0:
                floored = True
    assert len(got) == len(orders)
    # all three non-linear behaviors must actually occur on this data —
    # otherwise the recurrence would collapse to a window prefix sum
    assert capped and floored and reopened


def test_capped_cumsum_fold_twin_is_row_identical(spark):
    """The one-shuffle associative-fold plan must produce exactly the
    recursive CTE's rows — same keys, same ranks, same clamped values."""
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        orders_capped_cumsum,
        orders_capped_cumsum_fold,
    )

    sf = "/root/testdata/sf0.001"
    rec = {
        (r.o_custkey, r.rn): r.spent
        for r in orders_capped_cumsum(spark, sf).collect()
    }
    fold = {
        (r.o_custkey, r.rn): r.spent
        for r in orders_capped_cumsum_fold(spark, sf).collect()
    }
    assert fold == rec and len(fold) > 0


# ---------------------------------------------------------------------------
# Z-order clustered layout
# ---------------------------------------------------------------------------


def test_zorder_layout_skips_more_rowgroups_than_time_sort(spark, tmp_path):
    import datetime as dt

    from spark_streaming_twitch_analytics_spark.operators.layout import (
        ensure_zordered_events,
        rowgroups_overlapping,
    )
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        events_zorder_scan,
    )
    from spark_streaming_twitch_analytics_spark.tables import load_table

    sf = "/root/testdata/sf0.1"  # enough rows for many row groups
    loc = ensure_zordered_events(spark, sf)
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 15)
    z_hit, z_total = rowgroups_overlapping(loc, 3, 9, lo, hi)
    assert z_total >= 20  # layout actually split into many row groups

    # baseline: single-dimension (time-sorted) layout, same file sizing
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    base = str(tmp_path / "tsorted")
    (
        load_table(spark, sf, "events")
        .repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 2000)
        .parquet(base)
    )
    t_hit, t_total = rowgroups_overlapping(base, 3, 9, lo, hi)
    # the 2-D curve must dominate the 1-D sort on a 2-D rectangle
    assert z_hit / z_total < t_hit / t_total
    assert z_hit / z_total < 0.3

    # and the layout never changes answers
    got = events_zorder_scan(spark, sf).collect()[0]
    raw = (
        load_table(spark, sf, "events")
        .filter(
            (F.col("user_id").between(3, 9))
            & (F.col("ts") >= "2024-01-10 00:00:00")
            & (F.col("ts") < "2024-01-15 00:00:00")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("cents"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(raw) and got.n > 0


# ---------------------------------------------------------------------------
# dyadic decay sum
# ---------------------------------------------------------------------------


def test_events_decay_sum_matches_python_reference(spark, tmp_path):
    import datetime as dt
    import os

    base = dt.datetime(2024, 1, 1)
    rows = []
    counts = {}  # (day_offset) -> count, one event type
    import random

    rng = random.Random(5)
    eid = 0
    for off in [0, 1, 2, 3, 5, 8, 13, 20, 21]:
        c = rng.randint(1, 9)
        counts[off] = c
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(days=off, minutes=eid % 60),
                         1, "click", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp_path}/{t}.parquet")

    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        _DECAY_DAYS,
        events_decay_sum,
    )

    got = {
        (r.day.toordinal() - base.date().toordinal()): (r.cnt, r.decay_sum)
        for r in events_decay_sum(spark, str(tmp_path)).collect()
    }
    for day, c in counts.items():
        expect = sum(
            pc / (1 << (day - pd))
            for pd, pc in counts.items()
            if 0 <= day - pd <= _DECAY_DAYS
        )
        assert got[day][0] == c
        assert got[day][1] == expect  # EXACT equality — dyadic terms


# ---------------------------------------------------------------------------
# interpolated quantiles (PERCENTILE_CONT / numpy-linear semantics)
# ---------------------------------------------------------------------------


def test_interpolated_quantiles_match_numpy_linear(spark):
    import numpy as np

    from spark_streaming_twitch_analytics_spark.operators.quantiles import (
        interpolated_quantiles,
    )

    rng = np.random.default_rng(23)
    vals = np.round(rng.uniform(-500, 2000, size=997), 4)  # odd n, ties rare
    df = spark.createDataFrame([(float(x),) for x in vals], "x double")
    qs = (("p10", 1, 10), ("p50", 1, 2), ("p66", 2, 3), ("p99", 99, 100))
    got = {
        r.label: r.value
        for r in interpolated_quantiles(df, "x", bin_width=37.0, qs=qs).collect()
    }
    for label, num, den in qs:
        expect = float(np.percentile(vals, 100.0 * num / den, method="linear"))
        # same type-7 definition; np's pos arithmetic may differ by 1 ulp
        assert got[label] == pytest.approx(expect, rel=1e-12), label


def test_grouped_interpolated_quantiles_match_numpy(spark):
    import numpy as np

    from spark_streaming_twitch_analytics_spark.operators.quantiles import (
        grouped_interpolated_quantiles,
    )

    rng = np.random.default_rng(31)
    rows = []
    data = {}
    for gi, g in enumerate(["a", "b", "c"]):
        n = [83, 1, 2][gi]  # one regular group + both degenerate sizes
        vals = np.round(rng.uniform(-100, 900, size=n), 3)
        data[g] = vals
        rows += [(g, float(x)) for x in vals]
    df = spark.createDataFrame(rows, "g string, x double")
    qs = (("p30", 3, 10), ("p50", 1, 2), ("p97", 97, 100))
    got = {
        (r.g, r.label): r.value
        for r in grouped_interpolated_quantiles(
            df, "g", "x", bin_width=41.0, qs=qs
        ).collect()
    }
    for g, vals in data.items():
        for label, num, den in qs:
            expect = float(np.percentile(vals, 100.0 * num / den, method="linear"))
            assert got[(g, label)] == pytest.approx(expect, rel=1e-12), (g, label)


def test_interpolated_quantiles_degenerate_sizes(spark):
    from spark_streaming_twitch_analytics_spark.operators.quantiles import (
        interpolated_quantiles,
    )

    one = spark.createDataFrame([(42.5,)], "x double")
    got = {r.label: r.value for r in interpolated_quantiles(one, "x").collect()}
    assert all(v == 42.5 for v in got.values())  # n=1: every q collapses
    two = spark.createDataFrame([(10.0,), (20.0,)], "x double")
    got2 = {
        r.label: r.value
        for r in interpolated_quantiles(
            two, "x", qs=(("p50", 1, 2), ("p75", 3, 4))
        ).collect()
    }
    assert got2["p50"] == 15.0 and got2["p75"] == 17.5


# ---------------------------------------------------------------------------
# chained streaming windows (two stateful operators, append mode)
# ---------------------------------------------------------------------------


def test_streaming_chained_windows_equals_batch(spark):
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        streaming_chained_windows,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.hour_start, r.event_type): (r.n_buckets, r.max_5min, r.total)
        for r in streaming_chained_windows(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    w5 = ev.groupBy(
        F.window("ts", "5 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    batch = w5.groupBy(
        F.date_format(
            F.window(F.window_time("w"), "1 hour").start, "yyyy-MM-dd HH:mm:ss"
        ).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_5min"),
        F.sum("n").alias("total"),
    )
    expect = {
        (r.hour_start, r.event_type): (r.n_buckets, r.max_5min, r.total)
        for r in batch.collect()
    }
    assert got == expect and len(got) > 0
    # the flush sentinel must never leak into the sink
    assert not any(t == "__flush__" for _, t in got)


def test_streaming_outer_interval_join_equals_batch(spark):
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        _OUTER_WITHIN,
        streaming_interval_join_outer,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.event_id, r.event_id_r)
        for r in streaming_interval_join_outer(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    l = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    r = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("event_id_r"),
        F.col("user_id").alias("uid_r"),
        F.col("ts").alias("ts_r"),
    )
    batch = l.join(
        r,
        (F.col("user_id") == F.col("uid_r"))
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr(f"INTERVAL {_OUTER_WITHIN}")),
        "left",
    )
    expect = {(x.event_id, x.event_id_r) for x in batch.collect()}
    assert got == expect and len(got) > 0
    # outer rows (NULL right side) must actually occur, and no sentinel leaks
    assert any(rid is None for _, rid in got)
    assert not any(eid is not None and eid < 0 for eid, _ in got)


# ---------------------------------------------------------------------------
# winsorized aggregation
# ---------------------------------------------------------------------------


def test_winsorized_revenue_bounds_and_sum(spark):
    from spark_streaming_twitch_analytics_spark.registry_analytics import (
        lineitem_winsorized_revenue,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    rows = {r.flag: r for r in lineitem_winsorized_revenue(spark, sf).collect()}
    prices = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        prices.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    assert set(rows) == set(prices)
    for flag, vals in prices.items():
        vals.sort()
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1]  # type-1 order statistic
        hi = vals[math.ceil(0.95 * n) - 1]
        r = rows[flag]
        assert r.lo == lo and r.hi == hi and r.n == n
        cents = sum(math.floor(min(max(v, lo), hi) * 100 + 0.5) for v in vals)
        assert r.winsorized_sum == pytest.approx(round(cents / 100.0, 2))
        # winsorizing cannot raise the max-clipped total above the raw sum
        # of hi-clipped values; sanity: sum sits between n*lo and n*hi
        assert n * lo <= r.winsorized_sum <= n * hi
