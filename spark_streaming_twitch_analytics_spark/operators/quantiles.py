"""Exact distributed quantiles by histogram-select (two passes).

``percentile_approx`` answers most quantile questions, but audits and
SLA cuts need the EXACT order statistic — and a naive global sort of
100 TB to read four rows is absurd. The classic scalable form is
two-pass histogram selection:

1. one aggregate pass bins every value (``floor(v / bin_width)``) into
   a bin-count table whose size is bounded by the VALUE RANGE, not the
   row count — map-side partial counts, one tiny shuffle;
2. cumulative counts over that tiny table locate, for each target rank
   k = ⌈q·n⌉, the bin holding the k-th smallest value and the residual
   offset within it;
3. a second pass touches ONLY the selected bins' rows (a broadcast
   semi-join the scan can push down) and picks the offset-th smallest
   within each — per-bin sorts over 1/|bins| of the data.

Rank arithmetic is all integers (q as a rational num/den, k computed
with integer ceil-division) and the output value is selected, never
computed — so the result is bit-identical on any engine and the DuckDB
twin (a plain global ``row_number``) hashes exactly.

Skew note: a single bin holding a huge fraction of rows (constant-heavy
columns) makes step 3's per-bin sort large; production re-bins the
selected bin recursively. One level is right for price-like columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bin_cum_window():
    """Cumulative-count window over the BIN HISTOGRAM — bounded by the
    value range / bin_width, never by row count, so one partition is the
    intended plan. Partitioned by a constant (not left unpartitioned) so
    the deliberate single partition doesn't emit WindowExec's "No
    Partition Defined" warning — keeping that warning a true signal for
    accidental per-row global windows (the corpus_pack_bins class of
    bug). The constant must be ``bin - bin``, not a literal (folded out
    of the spec outright) and not ``bin * 0`` (folded too when the
    window input is an aggregate): Catalyst keeps the subtraction, the
    value is still one constant partition."""
    return (
        Window.partitionBy(F.col("bin") - F.col("bin"))
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )


# (label, numerator, denominator): q = num/den, exact rationals so the
# target rank k = ceil(q*n) never touches a float
DEFAULT_QS: tuple[tuple[str, int, int], ...] = (
    ("p25", 1, 4),
    ("p50", 1, 2),
    ("p75", 3, 4),
    ("p95", 19, 20),
)


def exact_quantiles(
    values: DataFrame,
    value_col: str,
    bin_width: float = 100.0,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
) -> DataFrame:
    """(label, k, value): for each q the exact k-th smallest value,
    k = ⌈q·n⌉ (type-1 / lower order statistic)."""
    spark = values.sparkSession
    # NULLs are excluded (standard aggregate semantics) — and necessarily
    # so: Spark windows sort NULL first, DuckDB last, so counting them
    # would shift ranks differently per engine
    v = (
        values.select(F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("bin", F.floor(F.col("v") / F.lit(bin_width)).cast("long"))
    )

    # pass 1: bin histogram — size bounded by value range / bin_width
    bins = v.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = _bin_cum_window()  # bounded bin table; constant-partitioned
    cum = bins.select(
        "bin",
        "c",
        F.sum("c").over(w).alias("cum"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_prev"),
    )
    total = bins.agg(F.sum("c").cast("long").alias("n"))

    # target ranks: k = ceil(num*n / den) via integer arithmetic
    q_rows = spark.createDataFrame(list(qs), "label string, num long, den long")
    targets = q_rows.crossJoin(F.broadcast(total)).select(
        "label",
        ((F.col("num") * F.col("n") + F.col("den") - 1) / F.col("den"))
        .cast("long")
        .alias("k"),
    )

    # locate each rank's bin + residual offset (tiny × tiny join)
    chosen = (
        targets.join(
            F.broadcast(cum),
            (F.col("cum_prev") < F.col("k")) & (F.col("k") <= F.col("cum")),
        )
        .select("label", "k", "bin", (F.col("k") - F.col("cum_prev")).alias("off"))
    )

    # pass 2: only the selected bins' rows are sorted (per-bin window)
    sel_bins = chosen.select("bin").distinct()
    cand = v.join(F.broadcast(sel_bins), "bin")
    rn = F.row_number().over(Window.partitionBy("bin").orderBy("v"))
    ranked = cand.select("bin", "v", rn.alias("rn"))
    # chosen is |qs| rows — broadcast it so the candidate stream never
    # re-shuffles for this join
    return (
        F.broadcast(chosen)
        .join(ranked, (chosen.bin == ranked.bin) & (chosen.off == ranked.rn))
        .select("label", "k", F.col("v").alias("value"))
    )


def grouped_exact_quantiles(
    values: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float = 100.0,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
    hint_broadcast: bool = True,
    bin_col: str | None = None,
) -> DataFrame:
    """(group, label, k, value): the exact per-group order statistics —
    p99-latency-per-service / p50-price-per-segment shape. Identical
    algorithm with the group key threaded through every stage: the bin
    table is |groups| × |bins| (still range-bounded, not row-bounded),
    cumulative counts and rank location partition by group, and pass 2
    sorts each group's selected bins independently — so a skewed group
    slows only its own bins' sorts.

    BOUNDED-GROUP CONTRACT: the broadcast hints assume |groups|·|qs| is
    driver-broadcast-small (≤ ~1M rows). That holds for every in-repo
    caller (event types, languages, calendar buckets — class-bounded
    dimensions). For a HIGH-CARDINALITY group column (user_id-shaped),
    pass ``hint_broadcast=False``: the rank tables then join unhinted —
    Catalyst/AQE falls back to SortMergeJoin, which is the safe shape
    when the per-group side itself needs a shuffle.

    MONOTONE-BIN CONTRACT (``bin_col`` path): the caller's precomputed
    bin must be a NON-DECREASING function of the value within each
    group — e.g. ``floor(v / width_g)`` with a per-group width, the
    multiplexed-signals form this path exists for. The rank location
    walks cumulative bin counts in bin order and assumes every value in
    bin b sorts ≤ every value in bin b+1 of the same group; a
    non-monotone assignment (hash buckets, category codes) returns
    wrong order statistics WITHOUT an error. The default path
    (``bin_col=None``) satisfies the contract by construction."""
    g = F.col(group_col).alias("g")
    if bin_col is None:
        v = (
            values.select(g, F.col(value_col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())  # see exact_quantiles NULL note
            .withColumn(
                "bin", F.floor(F.col("v") / F.lit(bin_width)).cast("long")
            )
        )
    else:
        # caller supplies precomputed bins — the multiplexed-signals
        # form: different bin widths per group through ONE shared pass
        v = values.select(
            g,
            F.col(value_col).cast("double").alias("v"),
            F.col(bin_col).cast("long").alias("bin"),
        ).filter(F.col("v").isNotNull())

    bins = v.groupBy("g", "bin").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = (
        Window.partitionBy("g")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.select(
        "g",
        "bin",
        F.sum("c").over(w).alias("cum"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_prev"),
    )
    totals = bins.groupBy("g").agg(F.sum("c").cast("long").alias("n"))

    spark = values.sparkSession
    q_rows = spark.createDataFrame(list(qs), "label string, num long, den long")
    targets = totals.crossJoin(F.broadcast(q_rows)).select(
        "g",
        "label",
        ((F.col("num") * F.col("n") + F.col("den") - 1) / F.col("den"))
        .cast("long")
        .alias("k"),
    )
    # targets is |groups|·|qs| rows — broadcast under the bounded-group
    # contract (see docstring). Unhinted, Catalyst falls back to
    # SortMergeJoin when the input's size estimate is unknown (e.g. the
    # MAD second pass over a derived frame), shuffling the bin table
    # for a join against a handful of rank rows.
    hint = F.broadcast if hint_broadcast else (lambda d: d)
    chosen = (
        hint(targets.alias("t"))
        .join(
            cum.alias("m"),
            (F.col("t.g") == F.col("m.g"))
            & (F.col("m.cum_prev") < F.col("t.k"))
            & (F.col("t.k") <= F.col("m.cum")),
        )
        .select(
            F.col("t.g").alias("g"),
            "label",
            "k",
            "bin",
            (F.col("t.k") - F.col("m.cum_prev")).alias("off"),
        )
    )

    sel = chosen.select("g", "bin").distinct()
    cand = v.join(hint(sel), ["g", "bin"])
    rn = F.row_number().over(Window.partitionBy("g", "bin").orderBy("v"))
    ranked = cand.select("g", "bin", "v", rn.alias("rn"))
    # chosen is |groups|·|qs| rows — broadcast (same contract) so the
    # candidate stream never re-shuffles for this join
    return (
        hint(chosen.alias("c"))
        .join(
            ranked.alias("r"),
            (F.col("c.g") == F.col("r.g"))
            & (F.col("c.bin") == F.col("r.bin"))
            & (F.col("c.off") == F.col("r.rn")),
        )
        .select(
            F.col("c.g").alias(group_col),
            "label",
            "k",
            F.col("r.v").alias("value"),
        )
    )


def grouped_exact_quantiles_sql(
    values_rel: str,
    group_col: str,
    value_col: str,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
) -> str:
    """DuckDB twin of :func:`grouped_exact_quantiles` via per-group
    row_number selection."""
    q_vals = ", ".join(f"('{lb}', {num}, {den})" for lb, num, den in qs)
    return f"""WITH v AS (SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v
  FROM ({values_rel}) WHERE {value_col} IS NOT NULL),
t AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
q(label, num, den) AS (VALUES {q_vals}),
k AS (SELECT g, label, CAST((num * n + den - 1) // den AS BIGINT) AS k FROM q, t),
r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM v)
SELECT k.g AS {group_col}, label, k, r.v AS value
FROM k JOIN r ON r.g = k.g AND r.rn = k.k"""


def exact_quantiles_sql(
    values_rel: str,
    value_col: str,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
    cte_prefix: str = "",
) -> str:
    """DuckDB twin: the same order statistics by one global row_number —
    fine at oracle scale, and value-identical to the histogram-select
    path because both SELECT the k-th smallest, computing nothing.

    ``cte_prefix`` uniquifies the internal CTE names so the block can be
    NESTED inside an outer WITH more than once (DuckDB's binder reports
    a circular reference when sibling subqueries re-define the same
    nested CTE name)."""
    p = cte_prefix
    q_vals = ", ".join(f"('{lb}', {num}, {den})" for lb, num, den in qs)
    return f"""WITH {p}v AS (SELECT CAST({value_col} AS DOUBLE) AS v FROM ({values_rel})
  WHERE {value_col} IS NOT NULL),
{p}t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {p}v),
{p}q(label, num, den) AS (VALUES {q_vals}),
{p}k AS (SELECT label, CAST((num * n + den - 1) // den AS BIGINT) AS k
  FROM {p}q, {p}t),
{p}r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM {p}v)
SELECT label, k, v AS value FROM {p}k JOIN {p}r ON {p}r.rn = {p}k.k"""


def interpolated_quantiles(
    values: DataFrame,
    value_col: str,
    bin_width: float = 100.0,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
) -> DataFrame:
    """(label, value): PERCENTILE_CONT semantics (type-7 interpolation,
    the SQL-standard / numpy default): pos = q·(n−1) on the 0-based
    sorted values, value = v⌊pos⌋ + frac·(v⌊pos⌋₊₁ − v⌊pos⌋).

    Same two-pass histogram-select engine as :func:`exact_quantiles` —
    only the rank arithmetic differs: each q needs the TWO bracketing
    order statistics, fetched through the same selected-bin second pass
    (≤ 2·|qs| bins ever sorted). All rank math is integer (t = num·(n−1),
    k_lo = t div den, frac = (t mod den)/den is one exact division), and
    the final lerp ``lo + frac·(hi − lo)`` evaluates in one fixed order —
    identical IEEE on both engines, so even interpolated (computed, not
    selected) quantiles hash exactly."""
    spark = values.sparkSession
    v = (
        values.select(F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())  # see exact_quantiles NULL note
        .withColumn("bin", F.floor(F.col("v") / F.lit(bin_width)).cast("long"))
    )
    bins = v.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = _bin_cum_window()  # bounded bin table; constant-partitioned
    cum = bins.select(
        "bin",
        "c",
        F.sum("c").over(w).alias("cum"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_prev"),
    )
    total = bins.agg(F.sum("c").cast("long").alias("n"))

    q_rows = spark.createDataFrame(list(qs), "label string, num long, den long")
    t_expr = F.col("num") * (F.col("n") - 1)
    targets = q_rows.crossJoin(F.broadcast(total)).select(
        "label",
        (F.expr("num * (n - 1) DIV den") + 1).cast("long").alias("k_lo"),
        F.least(F.expr("num * (n - 1) DIV den") + 2, F.col("n"))
        .cast("long")
        .alias("k_hi"),
        ((t_expr % F.col("den")).cast("double") / F.col("den")).alias("frac"),
    )
    fetch = targets.select(
        "label",
        "frac",
        F.explode(
            F.array(
                F.struct(F.lit("lo").alias("which"), F.col("k_lo").alias("k")),
                F.struct(F.lit("hi").alias("which"), F.col("k_hi").alias("k")),
            )
        ).alias("f"),
    ).select("label", "frac", F.col("f.which").alias("which"), F.col("f.k").alias("k"))

    chosen = fetch.join(
        F.broadcast(cum),
        (F.col("cum_prev") < F.col("k")) & (F.col("k") <= F.col("cum")),
    ).select(
        "label", "frac", "which", "k", "bin", (F.col("k") - F.col("cum_prev")).alias("off")
    )
    sel_bins = chosen.select("bin").distinct()
    cand = v.join(F.broadcast(sel_bins), "bin")
    rn = F.row_number().over(Window.partitionBy("bin").orderBy("v"))
    ranked = cand.select("bin", "v", rn.alias("rn"))
    picked = (
        F.broadcast(chosen)
        .join(ranked, (chosen.bin == ranked.bin) & (chosen.off == ranked.rn))
        .select("label", "frac", "which", "v")
    )
    return (
        picked.groupBy("label", "frac")
        .agg(
            F.max(F.when(F.col("which") == "lo", F.col("v"))).alias("lo"),
            F.max(F.when(F.col("which") == "hi", F.col("v"))).alias("hi"),
        )
        .select(
            "label",
            (F.col("lo") + F.col("frac") * (F.col("hi") - F.col("lo"))).alias(
                "value"
            ),
        )
    )


def interpolated_quantiles_sql(
    values_rel: str,
    value_col: str,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
) -> str:
    """DuckDB twin of :func:`interpolated_quantiles` — the same integer
    rank arithmetic and the same one-order lerp over a global
    row_number (fine at oracle scale), NOT DuckDB's quantile_cont
    builtin (whose position definition needn't match bit-for-bit)."""
    q_vals = ", ".join(f"('{lb}', {num}, {den})" for lb, num, den in qs)
    return f"""WITH v AS (SELECT CAST({value_col} AS DOUBLE) AS v FROM ({values_rel})
  WHERE {value_col} IS NOT NULL),
t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
q(label, num, den) AS (VALUES {q_vals}),
k AS (SELECT label,
        CAST(num * (n - 1) // den + 1 AS BIGINT) AS k_lo,
        CAST(least(num * (n - 1) // den + 2, n) AS BIGINT) AS k_hi,
        CAST((num * (n - 1)) % den AS DOUBLE) / den AS frac
      FROM q, t),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
SELECT label, (lo.v + frac * (hi.v - lo.v)) AS value
FROM k JOIN r lo ON lo.rn = k.k_lo JOIN r hi ON hi.rn = k.k_hi"""


def grouped_interpolated_quantiles(
    values: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float = 100.0,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
) -> DataFrame:
    """(group, label, value): per-group PERCENTILE_CONT — the grouped
    twin of :func:`interpolated_quantiles`, same histogram-select engine
    with the group key threaded through every stage (as in
    :func:`grouped_exact_quantiles`). Each (group, q) fetches its two
    bracketing ranks; the lerp's fixed evaluation order keeps computed
    values engine-exact."""
    g = F.col(group_col).alias("g")
    v = (
        values.select(g, F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("bin", F.floor(F.col("v") / F.lit(bin_width)).cast("long"))
    )
    bins = v.groupBy("g", "bin").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = (
        Window.partitionBy("g")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.select(
        "g",
        "bin",
        F.sum("c").over(w).alias("cum"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_prev"),
    )
    totals = bins.groupBy("g").agg(F.sum("c").cast("long").alias("n"))

    spark = values.sparkSession
    q_rows = spark.createDataFrame(list(qs), "label string, num long, den long")
    targets = totals.crossJoin(F.broadcast(q_rows)).select(
        "g",
        "label",
        (F.expr("num * (n - 1) DIV den") + 1).cast("long").alias("k_lo"),
        F.least(F.expr("num * (n - 1) DIV den") + 2, F.col("n"))
        .cast("long")
        .alias("k_hi"),
        (
            (F.col("num") * (F.col("n") - 1) % F.col("den")).cast("double")
            / F.col("den")
        ).alias("frac"),
    )
    fetch = targets.select(
        "g",
        "label",
        "frac",
        F.explode(
            F.array(
                F.struct(F.lit("lo").alias("which"), F.col("k_lo").alias("k")),
                F.struct(F.lit("hi").alias("which"), F.col("k_hi").alias("k")),
            )
        ).alias("f"),
    ).select(
        "g", "label", "frac", F.col("f.which").alias("which"), F.col("f.k").alias("k")
    )
    chosen = (
        fetch.alias("t")
        .join(
            cum.alias("m"),
            (F.col("t.g") == F.col("m.g"))
            & (F.col("m.cum_prev") < F.col("t.k"))
            & (F.col("t.k") <= F.col("m.cum")),
        )
        .select(
            F.col("t.g").alias("g"),
            "label",
            "frac",
            "which",
            "bin",
            (F.col("t.k") - F.col("m.cum_prev")).alias("off"),
        )
    )
    sel = chosen.select("g", "bin").distinct()
    cand = v.join(F.broadcast(sel), ["g", "bin"])
    rn = F.row_number().over(Window.partitionBy("g", "bin").orderBy("v"))
    ranked = cand.select("g", "bin", "v", rn.alias("rn"))
    picked = (
        F.broadcast(chosen.alias("c"))
        .join(
            ranked.alias("r"),
            (F.col("c.g") == F.col("r.g"))
            & (F.col("c.bin") == F.col("r.bin"))
            & (F.col("c.off") == F.col("r.rn")),
        )
        .select(F.col("c.g").alias("g"), "label", "frac", "which", "v")
    )
    return (
        picked.groupBy("g", "label", "frac")
        .agg(
            F.max(F.when(F.col("which") == "lo", F.col("v"))).alias("lo"),
            F.max(F.when(F.col("which") == "hi", F.col("v"))).alias("hi"),
        )
        .select(
            F.col("g").alias(group_col),
            "label",
            (F.col("lo") + F.col("frac") * (F.col("hi") - F.col("lo"))).alias(
                "value"
            ),
        )
    )


def grouped_interpolated_quantiles_sql(
    values_rel: str,
    group_col: str,
    value_col: str,
    qs: tuple[tuple[str, int, int], ...] = DEFAULT_QS,
) -> str:
    """DuckDB twin of :func:`grouped_interpolated_quantiles` via
    per-group row_number and the same fixed-order lerp."""
    q_vals = ", ".join(f"('{lb}', {num}, {den})" for lb, num, den in qs)
    return f"""WITH v AS (SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v
  FROM ({values_rel}) WHERE {value_col} IS NOT NULL),
t AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
q(label, num, den) AS (VALUES {q_vals}),
k AS (SELECT g, label,
        CAST(num * (n - 1) // den + 1 AS BIGINT) AS k_lo,
        CAST(least(num * (n - 1) // den + 2, n) AS BIGINT) AS k_hi,
        CAST((num * (n - 1)) % den AS DOUBLE) / den AS frac
      FROM q, t),
r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM v)
SELECT k.g AS {group_col}, label, (lo.v + frac * (hi.v - lo.v)) AS value
FROM k JOIN r lo ON lo.g = k.g AND lo.rn = k.k_lo
       JOIN r hi ON hi.g = k.g AND hi.rn = k.k_hi"""
