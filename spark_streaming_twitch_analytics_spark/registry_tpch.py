"""Remaining TPC-H query shapes (Q2, Q7-Q11, Q13, Q15, Q17, Q20-Q22).

Together with Q1/Q3/Q4/Q5/Q6/Q12/Q14/Q16/Q18/Q19 in ``registry.py`` this
completes all 22 TPC-H shapes, each adapted to the driver's TPC-H-ish
testdata (no ``partsupp`` table, no comment/phone/commitdate columns):

- Q2/Q11/Q20 derive a partsupp-like relation from ``lineitem`` (distinct
  (partkey, suppkey) pairs with per-unit cost / shipped quantity);
- Q21's "late" predicate becomes ``l_shipdate > o_orderdate + 90 days``
  (no l_commitdate/l_receiptdate in the testdata);
- Q22's phone country code becomes ``c_nationkey % 5``.

The *shapes* are what matter for engine coverage: correlated min
subquery (Q2), self-joined dimension pairs (Q7), market-share
conditional aggregation (Q8), derived-cost profit (Q9), group-filtered
top-K (Q10), global-scalar HAVING (Q11), left-outer count distribution
(Q13), scalar-max equality (Q15), per-group scalar threshold (Q17),
nested semi-joins (Q20), EXISTS + NOT EXISTS over the same derived
relation (Q21), anti-join + scalar avg threshold (Q22).

Determinism: every cross-row float accumulation is rounded (2 dp) before
any comparison/equality; per-row arithmetic (division, CASE) is
identical IEEE on both engines; min/max folds are order-invariant, so
float equality against a min/max of the *same* computed set is safe.

Scale notes (100 TB): every dimension join below broadcasts (part /
supplier / nation / region are tiny); the fact-fact joins (lineitem x
orders) shuffle on the join key only after scan-level pushdown of the
date/flag filters. The derived-partsupp aggregations are partial-agg
friendly (map-side combine on (partkey, suppkey)). Q21's EXISTS/NOT
EXISTS both key on l_orderkey, so AQE plans them as a pair of shuffled
semi/anti joins over the same exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated min subquery over derived partsupp)
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2),
best AS (SELECT partkey, min(cost) AS min_cost FROM ps GROUP BY 1)
SELECT p_partkey, s_name, n_name, round(s_acctbal, 2) AS acctbal,
       floor(ps.cost * 10000 + 0.5) / 10000.0 AS unit_cost
FROM ps
JOIN best ON ps.partkey = best.partkey AND ps.cost = best.min_cost
JOIN part ON p_partkey = ps.partkey
JOIN supplier ON s_suppkey = ps.suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE p_size <= 15 AND r_name = 'EUROPE'
ORDER BY acctbal DESC, p_partkey ASC, s_name ASC LIMIT 100""",
    survey="ext: Q2 shape (correlated-min subquery; partsupp derived from "
    "lineitem as min unit price per (part, supplier))",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    # min() folds are order-invariant and the division is identical IEEE on
    # both engines, so equality against the per-part min is exact.
    best = (
        ps.groupBy("partkey")
        .agg(F.min("cost").alias("min_cost"))
        .withColumnRenamed("partkey", "best_partkey")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        ps.join(
            best,
            (F.col("partkey") == F.col("best_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .drop("best_partkey")
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            # floor(x*10^4 + 0.5)/10^4 instead of round(x, 4): Spark rounds
            # double ties half-even, DuckDB half-away — floor has no
            # rounding mode, so exact .xxxx5 quotients agree on both engines
            (
                F.floor(F.col("cost") * 10000 + F.lit(0.5)).cast("double")
                / F.lit(10000.0)
            ).alias("unit_cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between nation pairs (double dimension self-join)
# --------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3""",
    survey="ext: Q7 shape (same dimension joined twice under different "
    "roles + cross-nation predicate + year bucketing)",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            # integer-cents accumulation: floor(x*100 + 0.5) is pure IEEE
            # arithmetic (no rounding-mode dependence, unlike round() or a
            # decimal cast at a tie), the BIGINT sum is exact and
            # order-invariant, so the result is engine- and
            # partitioning-independent
            F.round(
                F.sum(
                    F.floor(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                        * 100
                        + F.lit(0.5)
                    )
                ).cast("double")
                / F.lit(100.0),
                2,
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q8 — market share (conditional aggregation over a 6-way join)
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    """WITH all_nations AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
SELECT o_year,
  round(round(sum(CASE WHEN supp_nation = 'NATION_13' THEN volume ELSE 0 END), 2)
        / round(sum(volume), 2), 6) AS mkt_share
FROM all_nations GROUP BY o_year""",
    survey="ext: Q8 shape (market share — CASE-gated sum over total sum; "
    "both sums rounded before the ratio so the quotient is bit-identical "
    "across engines)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_13", F.col("volume"))
                    .otherwise(F.lit(0.0))
                ),
                2,
            )
            / F.round(F.sum("volume"), 2),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit (derived supply cost; LIKE filter on part name)
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                  - p_retailprice * 0.1 * l_quantity) * 100 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2""",
    survey="ext: Q9 shape (profit by supplier nation x year; supply cost "
    "derived as 10% of retail price — no partsupp in the testdata)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        # integer-cents accumulation — order-invariant exact sum (see Q7)
        .agg(
            F.round(
                F.sum(F.floor(profit * 100 + F.lit(0.5))).cast("double")
                / F.lit(100.0),
                2,
            ).alias("sum_profit")
        )
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (join + group + top-K with full tiebreak)
# --------------------------------------------------------------------------


@register(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    survey="ext: Q10 shape (lost-revenue ranking: date-window + flag "
    "pushdown, join, group, top-20)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 — important stock (HAVING against a global scalar aggregate)
# --------------------------------------------------------------------------


@register(
    "q11_important_parts",
    """WITH v AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13'))
SELECT l_partkey AS partkey, round(sum(val), 2) AS value
FROM v GROUP BY 1
HAVING round(sum(val), 2) >
  (SELECT round(sum(val), 2) * 1.5 / count(DISTINCT l_partkey) FROM v)""",
    survey="ext: Q11 shape (group HAVING vs global scalar subquery — the "
    "scalar broadcasts; both sides rounded before the comparison so the "
    "boundary is engine-identical)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
    )
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).alias("val"),
        )
    )
    grouped = v.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.round(F.sum("val"), 2).alias("value")
    )
    # threshold = 1.5x the average per-part value: scale-invariant (a fixed
    # fraction of the total selects nothing once the part count grows), and
    # deterministic because the total is rounded before the arithmetic
    total = v.agg(
        (
            F.round(F.sum("val"), 2) * F.lit(1.5) / F.countDistinct("l_partkey")
        ).alias("threshold")
    )
    # scalar threshold joins as a broadcast nested-loop of one row
    return grouped.join(F.broadcast(total)).filter(
        F.col("value") > F.col("threshold")
    ).select("partkey", "value")


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join + double group)
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count""",
    survey="ext: Q13 shape (left outer join with a join-side predicate, "
    "count of nullable key, then a histogram of the counts)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier (scalar-max equality over a derived revenue view)
# --------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    """WITH rev AS (
  SELECT l_suppkey AS suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",
    survey="ext: Q15 shape (view + scalar max subquery; revenue rounded "
    "before the max so float equality is engine-exact)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    best = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.max_revenue)
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-group scalar threshold)
# --------------------------------------------------------------------------


@register(
    "q17_small_quantity",
    """WITH pa AS (
  SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY 1)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty""",
    survey="ext: Q17 shape (correlated per-group average threshold — "
    "avg(l_quantity) is exact on both engines because quantities are "
    "integer-valued, so the < comparison has no float ambiguity)",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, F.col("pk") == li.l_partkey)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-joins over derived supply)
# --------------------------------------------------------------------------


@register(
    "q20_part_promotion",
    """WITH pk AS (SELECT p_partkey FROM part WHERE p_name LIKE 'large%'),
sq AS (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM pk)
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM sq)""",
    survey="ext: Q20 shape (two nested IN subqueries -> chained left-semi "
    "joins; shipped-quantity HAVING replaces availqty — integer-exact sums)",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_keys = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("large%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    qualified = (
        li.join(F.broadcast(part_keys), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return supp.join(
        qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    """WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name""",
    survey="ext: Q21 shape (EXISTS -> left-semi and NOT EXISTS -> "
    "left-anti, both with an extra non-equi conjunct; 'late' adapted to "
    "l_shipdate > o_orderdate + 90 days — the testdata has no "
    "commit/receipt dates)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # EXISTS/NOT EXISTS as per-order aggregates instead of self-joins:
    # `late` holds DISTINCT (order, supplier) pairs, so "NOT EXISTS another
    # late supplier in the order" ⟺ the order has exactly ONE late pair —
    # one groupBy over `late` (computed once; the semi/anti form would
    # re-evaluate the whole join+distinct subtree for each self-reference).
    # "EXISTS another supplier in lineitem" ⟺ the order has >1 distinct
    # suppliers — one aggregate over lineitem's two join columns.
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.max("l_suppkey").alias("l_suppkey"),
        )
        .filter(F.col("n_late") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        sole_late.join(multi_supp, "l_orderkey", "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + scalar average threshold)
# --------------------------------------------------------------------------


@register(
    "q22_global_sales_opportunity",
    """WITH avgbal AS (
  SELECT round(avg(c_acctbal), 2) AS a FROM customer WHERE c_acctbal > 0)
SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avgbal
WHERE c_acctbal > a
  AND c_nationkey % 5 IN (0, 1, 3)
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY 1""",
    survey="ext: Q22 shape (scalar avg threshold + NOT IN -> left-anti "
    "join; phone country code adapted to c_nationkey % 5)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    avgbal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("a"))
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1998-01-01")
        .select("o_custkey")
    )
    code = (F.col("c_nationkey") % 5).cast("int")
    return (
        cust.filter(code.isin(0, 1, 3))
        .join(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# CUBE + grouping_id, and ranking-function windows (relational breadth)
# --------------------------------------------------------------------------


@register(
    "cube_orders",
    """SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    survey="ext: CUBE with grouping_id (all 2^k aggregation levels in one "
    "pass — Spark expands to an ExpandExec, still one shuffle)",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@register(
    "grouping_sets_orders",
    """SELECT o_orderstatus, strftime(o_orderdate, '%Y') AS year,
       CAST(GROUPING(o_orderstatus, strftime(o_orderdate, '%Y')) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, strftime(o_orderdate, '%Y')),
                        (o_orderstatus), (strftime(o_orderdate, '%Y')))""",
    survey="ext: explicit GROUPING SETS (chosen aggregation levels, not "
    "the full cube — one ExpandExec + one shuffle regardless of how many "
    "sets are requested)",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("year", F.date_format("o_orderdate", "yyyy"))
        .groupingSets(
            [["o_orderstatus", "year"], ["o_orderstatus"], ["year"]],
            "o_orderstatus",
            "year",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "year", "gid", "n", "total")
    )


@register(
    "window_rank_funcs",
    """SELECT o_custkey, o_orderkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       lead(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC)""",
    survey="ext: ranking window functions (rank / dense_rank / ntile / "
    "lead) over a per-customer total order",
)
def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.round("o_totalprice", 2)), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )
