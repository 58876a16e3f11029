"""Semi-structured + collection functions: JSON extraction, array
aggregation, and the remaining join/grouping variants.

Beyond the reference surface (it has no JSON/array/map functions,
SURVEY §2.8), but required for engine completeness: the events fixture
carries a JSON ``props`` column that a real pipeline would mine.

Scale notes: get_json_object is a per-row JVM expression (codegen'd,
no shuffle); for hot paths at 100 TB, parse ONCE with from_json into a
struct column and prune fields — repeated get_json_object calls
re-parse the document per call. collect_list aggregations move the
grouped values; bounded here by per-user event-type cardinality, but
list-of-everything aggregations over raw events are the anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import fixed_avg, fixed_sum, round_to, sql_fixed_avg, sql_fixed_sum, sql_round
from ..plans.registry import query
from ..sources import load


@query(
    "json_props_extract",
    oracle=f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_fixed_avg('value', 2, 4)} AS avg_value
FROM events
GROUP BY 1
""",
    tags=("json", "A1"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column (schema-on-read):
    parse once with from_json into a typed struct (the scale path —
    get_json_object would re-parse per extraction), bucket and
    aggregate."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    )
    return (
        parsed.groupBy((F.col("p.k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            fixed_avg(F.col("value"), 2, 4).alias("avg_value"),
        )
    )


@query(
    "semi_join_active_parts",
    oracle="""
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p.p_brand
""",
    tags=("J8", "U2"),
)
def semi_join_active_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (the EXISTS shape): parts with at least one sale,
    counted per brand — the dual of the anti-join; planned as a
    broadcast/shuffled hash semi with no row duplication."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


@query(
    "full_outer_daily_activity",
    oracle=f"""
WITH clicks AS (
  SELECT CAST(ts AS DATE) AS ds, user_id, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
purchases AS (
  SELECT CAST(ts AS DATE) AS ds, user_id, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT COALESCE(c.ds, p.ds) AS ds,
       COALESCE(c.user_id, p.user_id) AS user_id,
       CAST(COALESCE(c.n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases
FROM clicks c FULL OUTER JOIN purchases p
  ON c.ds = p.ds AND c.user_id = p.user_id
""",
    tags=("J2",),
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join on a composite key: daily click vs purchase
    activity, keeping days where a user did only one of the two."""
    ev = load(spark, sf_dir, "events")
    daily = lambda etype, out: (  # noqa: E731
        ev.filter(F.col("event_type") == etype)
        .groupBy(F.to_date("ts").alias("ds"), "user_id")
        .agg(F.count("*").alias(out))
    )
    c = daily("click", "n_clicks")
    p = daily("purchase", "n_purchases")
    return (
        c.join(p, ["ds", "user_id"], "full_outer")
        .select(
            "ds",
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


@query(
    "rollup_region_nation",
    oracle=f"""
SELECT r.r_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_fixed_sum('c.c_acctbal', 2, 2)} AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("A4", "cube"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (region -> nation -> grand total) over the
    customer dimension snowflake — the drill-down companion to CUBE."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        fixed_sum(F.col("c_acctbal"), 2, 2).alias("total_balance"),
    )


@query(
    "array_agg_user_types",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
FROM events
GROUP BY user_id
""",
    tags=("A8", "array"),
)
def array_agg_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: each user's distinct event types as a SORTED
    array (collect_set order is nondeterministic — always sort before
    comparing or storing), rendered as a comma-joined string in the
    final projection (event types contain no commas) — top-level array
    columns break the driver's pandas canonicalizer, so the query
    surface is scalar-only (asserted registry-wide in
    test_registry_scalar_outputs)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.size(F.collect_set("event_type")).cast("int").alias("n_types"),
    )


@query(
    "correlation_stats",
    oracle=f"""
SELECT l_returnflag,
       {sql_round('corr(l_quantity, l_extendedprice)', 6)} AS qty_price_corr,
       {sql_round('covar_samp(l_quantity, l_extendedprice)', 4)} AS qty_price_cov
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("A9",),
)
def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance per group (the df.stat
    surface as aggregate expressions — groupable, unlike df.stat.corr
    which returns a driver-side scalar)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_to(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        round_to(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_cov"),
    )


@query(
    "map_roundtrip_user_counts",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type, n FROM counts
""",
    tags=("A6", "array"),
)
def map_roundtrip_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: per-user counts -> map<event_type, n> via
    map_from_entries -> exploded back to rows. The map is the natural
    storage shape for sparse per-key features; exploding (and sorting
    where order matters) is how it re-enters relational land — the
    round-trip must be lossless (the oracle is the pre-map counts)."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id", F.explode("type_counts").alias("event_type", "n")
    )


@query(
    "struct_nested_select",
    oracle=f"""
SELECT o_orderkey,
       o_custkey AS cust,
       CAST(year(o_orderdate) AS INT) AS order_year,
       {sql_round('o_totalprice', 2)} AS price
FROM orders
WHERE o_orderstatus = 'O'
""",
    tags=("P1", "P2"),
)
def struct_nested_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType nesting (the reference's LabelsPoint(prop, labels,
    features) shape, 流行音乐趋势预测.md:171-174): pack columns into a
    nested struct, then select back through the dotted path — the
    pack/unpack must be lossless and prunable (Catalyst pushes nested
    field extraction into the scan)."""
    o = load(spark, sf_dir, "orders")
    packed = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.struct(
                F.year("o_orderdate").cast("int").alias("order_year"),
                F.col("o_totalprice").alias("price"),
            ).alias("meta"),
        ).alias("info"),
    )
    return packed.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.col("info.cust").alias("cust"),
        F.col("info.meta.order_year").alias("order_year"),
        round_to(F.col("info.meta.price"), 2).alias("price"),
    )


@query(
    "variant_props_extract",
    oracle="""
SELECT CAST(TRY_CAST(props ->> '$.k' AS BIGINT) % 7 AS BIGINT) AS k_mod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(TRY_CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(TRY_CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY 1
""",
    tags=("semistructured", "variant"),
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-flexible JSON via the VARIANT type (parse_json ->
    variant_get) — the open-schema alternative to json_props_extract's
    fixed from_json struct: VARIANT parses once into a binary-encoded
    tree and serves typed path extraction without declaring the schema
    up front, which is what an evolving event-properties column needs.
    At 100 TB the parse cost is paid once per row either way; VARIANT
    additionally survives fields the struct schema never declared
    (shredding into parquet keeps pushdown on hot paths). The oracle
    mirrors try_variant_get's NULL-on-type-mismatch with TRY_CAST so a
    fixture with heterogeneous props degrades to a visible hash
    mismatch instead of an oracle crash."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 7).alias("k_mod"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
