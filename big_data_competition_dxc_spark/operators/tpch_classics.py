"""Canonical decision-support join/agg shapes (TPC-H q3/q4/q7/q14/q16/q18
adapted to the fixture star schema).

The reference exercises fact⟕dim SQL joins and chained snowflakes
(流行音乐趋势预测.md:45, M:989-993); these six queries widen that surface
with the remaining canonical shapes a warehouse engine must run well:
join→group→global-top-k (q3), EXISTS semi-join with a non-equi residual
(q4), a six-way snowflake with two roles for the same dimension (q7), a
conditional-aggregate ratio (q14), distinct-count with a NOT-IN
exclusion (q16), and agg-then-self-join HAVING (q18).

100 TB posture: every dimension that fits (nation, supplier, the
negative-balance supplier exclusion list, the q18 having-survivor key
set) is broadcast so the lineitem/orders fact sides shuffle at most
once on their join key; aggregates are partial (map-side combine) by
construction; date predicates reach the parquet scan for row-group
pruning. Revenue sums use the order-independent decimal-units path
(functions/rounding.py) so results are bit-identical across engines and
partition layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fixed_sum, round_to, sql_fixed_sum, sql_round
from ..plans.registry import query
from ..sources import load

# l_extendedprice (2dp) x (1 - l_discount) (2dp) sits on an exact 4dp
# grid; both engines compute the identical IEEE product, so dec=4 units
# make every revenue sum order-independent and cross-engine exact.
_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS o_orderkey,
       {sql_fixed_sum(f'l.{_REV}', 4, 2)} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    tags=("J4", "A4", "O1"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 shape: filtered 3-way join -> grouped revenue -> global top-10.
    The segment filter shrinks customer before its (broadcastable) join;
    the two date predicates push to the orders/lineitem scans. TakeOrdered
    (limit+sort) keeps only 10 rows per partition in flight — no global
    sort materialization. Tie-break on o_orderkey for determinism."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"), "o_orderdate", "o_orderpriority"
        )
        .agg(fixed_sum(rev, 4, 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q4_late_shipment_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""",
    tags=("J8", "A1"),
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: EXISTS decorrelated to a left-semi join whose condition
    is equi (l_orderkey = o_orderkey) plus a non-equi residual
    (shipped >30 days after order). Catalyst extracts the equi key for
    the shuffle and evaluates the residual post-match, so the semi join
    still hash-partitions on orderkey — no broadcast of the fact side."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q7_nation_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {sql_fixed_sum(f'l.{_REV}', 4, 2)} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7')
  AND n2.n_name IN ('NATION_3', 'NATION_7')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
""",
    tags=("J4", "A1"),
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: six-way snowflake where nation joins twice under two
    roles (supplier's vs customer's). Both nation copies and the
    pre-filtered supplier dim broadcast; lineitem⋈orders is the only
    large shuffle pair. The nation filters apply BEFORE the fact joins
    (supplier/customer shrink to 2/25 of rows), so the fact side is
    pruned by broadcast-hash probe, never scanned twice."""
    n1 = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n2 = n1.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("cust_nation")
    )
    supplier = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    customer = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_nationkey")
    ).select("c_custkey", "cust_nation")
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(fixed_sum(rev, 4, 2).alias("revenue"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT {sql_round(
        "100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN "
        "CAST(floor((l." + _REV + ") * 10000.0 + 0.5) AS DECIMAL(38,0)) "
        "ELSE 0 END) AS DOUBLE) / CAST(SUM(CAST(floor((l." + _REV + ") "
        "* 10000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE))", 6)} AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-09-01'
  AND l.l_shipdate <  TIMESTAMP '1998-10-01'
""",
    tags=("A4", "P11"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: conditional-aggregate ratio (promo revenue share of one
    ship-month). Both the numerator and denominator accumulate as exact
    DECIMAL(38,0) 4dp units, so the final double division is the only
    inexact step — identical in both engines regardless of row order.
    part broadcasts; the month predicate prunes the lineitem scan."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-10-01")))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    units = F.floor(rev * F.lit(10000.0) + F.lit(0.5)).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    joined = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        round_to(
            F.lit(100.0)
            * (
                F.sum(F.when(F.col("p_type") == "PROMO", units).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(units).cast("double")
            ),
            6,
        ).alias("promo_pct")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("A8", "J8", "P9"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: distinct-count per (brand, type, size) with a NOT-IN
    supplier exclusion. The exclusion list (negative-balance suppliers)
    is a tiny frame -> broadcast left-anti join, which is the safe
    decorrelation because s_suppkey is non-null (NOT IN's three-valued
    NULL trap doesn't apply, and the fixture guarantees it). distinct
    count shuffles once on the grouped keys with partial distinct
    aggregation map-side."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    lineitem = load(spark, sf_dir, "lineitem")
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        lineitem.join(
            F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 140
)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
    tags=("A4", "J4"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: aggregate lineitem per order, HAVING-filter the heavy
    tail (>140 units), then join the small survivor set back to orders
    and customer. SUM(l_quantity) is a sum of integer-grid doubles
    (each <= 50, far below 2^53), so the cast to BIGINT is exact and
    order-independent without the decimal-units detour. The survivor
    aggregate (few % of orders) broadcasts into the orders join, so the
    orders/customer path never full-shuffles on this query."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 140)
        .select("l_orderkey", F.col("qty").cast("bigint").alias("total_qty"))
    )
    return (
        F.broadcast(big)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


@query(
    "q2_min_cost_part_per_group",
    oracle="""
SELECT p.p_partkey, p.p_name, p.p_type, p.p_size, p.p_retailprice
FROM part p
WHERE p.p_size IN (2, 11, 24, 37)
  AND p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                         WHERE p2.p_type = p.p_type AND p2.p_size = p.p_size)
""",
    tags=("A4", "J2"),
)
def q2_min_cost_part_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: correlated per-group MIN subquery ("the cheapest part of
    its (type, size) group"), decorrelated the way Catalyst does it —
    aggregate the group mins once, broadcast them back, filter on
    equality. Price equality is exact (both sides are the same parquet
    double, no arithmetic). Ties all qualify, same as the SQL."""
    part = load(spark, sf_dir, "part").filter(F.col("p_size").isin(2, 11, 24, 37))
    mins = part.groupBy(
        F.col("p_type").alias("m_type"), F.col("p_size").alias("m_size")
    ).agg(F.min("p_retailprice").alias("m_price"))
    return (
        part.join(
            F.broadcast(mins),
            (F.col("p_type") == F.col("m_type"))
            & (F.col("p_size") == F.col("m_size"))
            & (F.col("p_retailprice") == F.col("m_price")),
        )
        .select("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")
    )


@query(
    "q11_part_revenue_share",
    oracle=f"""
WITH pr AS (
  SELECT l_partkey,
         SUM(CAST(floor(({_REV}) * 10000.0 + 0.5) AS DECIMAL(38,0))) AS units
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, {sql_round("CAST(units AS DOUBLE) / 10000.0", 2)} AS revenue
FROM pr
WHERE CAST(units AS DOUBLE) > 0.0008 * (SELECT CAST(SUM(units) AS DOUBLE) FROM pr)
""",
    tags=("A4", "P8"),
)
def q11_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: keep groups whose measure exceeds a fraction of the
    GLOBAL total — the global total is a 1-row aggregate broadcast back
    over the per-part frame (scalar-subquery decorrelation). The share
    threshold is scale-invariant: the same 0.08% cut works at any SF
    because both sides grow together. Units accumulate as exact
    DECIMAL(38,0); only the final compare/round are double."""
    lineitem = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    units = F.floor(rev * F.lit(10000.0) + F.lit(0.5)).cast("decimal(38,0)")
    pr = lineitem.groupBy("l_partkey").agg(F.sum(units).alias("units"))
    total = pr.agg(F.sum("units").cast("double").alias("t"))
    return (
        pr.join(F.broadcast(total))
        .filter(F.col("units").cast("double") > F.lit(0.0008) * F.col("t"))
        .select(
            "l_partkey",
            round_to(F.col("units").cast("double") / F.lit(10000.0), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "q15_top_revenue_supplier",
    oracle=f"""
WITH sr AS (
  SELECT l_suppkey,
         SUM(CAST(floor(({_REV}) * 10000.0 + 0.5) AS DECIMAL(38,0))) AS units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '1999-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       {sql_round("CAST(sr.units AS DOUBLE) / 10000.0", 2)} AS total_revenue
FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
WHERE sr.units = (SELECT MAX(units) FROM sr)
""",
    tags=("A4", "J1", "O1"),
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: the argmax group ("supplier(s) with the maximum
    3-month revenue"), with ties kept. The equality test runs on the
    exact DECIMAL units — never on a rounded double — so Spark and
    DuckDB select identical winners even when two suppliers differ in
    the last cent. The 1-row max broadcasts; supplier is a broadcast
    dim."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-04-01")))
    )
    supplier = load(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    units = F.floor(rev * F.lit(10000.0) + F.lit(0.5)).cast("decimal(38,0)")
    sr = lineitem.groupBy("l_suppkey").agg(F.sum(units).alias("units"))
    mx = sr.agg(F.max("units").alias("mx"))
    return (
        sr.join(F.broadcast(mx))
        .filter(F.col("units") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            round_to(F.col("units").cast("double") / F.lit(10000.0), 2).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q20_heavy_part_suppliers",
    oracle="""
WITH sp AS (
  SELECT l_suppkey, l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM sp JOIN supplier s ON sp.l_suppkey = s.s_suppkey
WHERE CAST(sp.qty AS DOUBLE) > 2.0 * (SELECT AVG(CAST(qty AS DOUBLE)) FROM sp)
""",
    tags=("A5", "J8", "P8"),
)
def q20_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: nested aggregate threshold — per-(supplier, part)
    year quantities, a global average over THOSE aggregates, and the
    suppliers holding any pair above 2x that average. Quantity sums are
    integer-exact in double, and AVG divides two identical exact values,
    so the threshold is bit-identical cross-engine. The 1-row average
    broadcasts; DISTINCT collapses suppliers after the (tiny) survivor
    join."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-01-01")))
    )
    supplier = load(spark, sf_dir, "supplier")
    sp = (
        lineitem.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qtyd"))
        .select("l_suppkey", "l_partkey", F.col("qtyd").cast("bigint").alias("qty"))
    )
    avg1 = sp.agg(F.avg(F.col("qty").cast("double")).alias("avg_qty"))
    return (
        sp.join(F.broadcast(avg1))
        .filter(F.col("qty").cast("double") > F.lit(2.0) * F.col("avg_qty"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
