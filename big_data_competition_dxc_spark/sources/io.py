"""Sources & sinks (SURVEY §2.1, S1–S9).

The reference ingests everything as ``sc.textFile → split(",") → arity
filter → case class`` (流行音乐趋势预测.md:29-31,38-40) and re-registers a
temp table per block (M:36). Here: schema-typed ``spark.read`` and one
``register_views`` call. Text round-trips between pipeline stages
(M:98→106 etc.) are deliberately absent — a single lazy Catalyst plan
replaces them (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Schema of the reference's raw CSV inputs (流行音乐趋势预测.md:38-40 /
# FIXTURES.md §1), for the CSV ingestion path. DROPMALFORMED reproduces the
# reference's arity filter (M:40 `e.length==5`): short/long rows vanish.
USER_ACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("song_id", T.StringType(), False),
        T.StructField("gmt_create", T.StringType(), True),
        T.StructField("action_type", T.IntegerType(), True),
        T.StructField("ds", T.StringType(), True),
    ]
)

SONGS_SCHEMA = T.StructType(
    [
        T.StructField("song_id", T.StringType(), False),
        T.StructField("artist_id", T.StringType(), False),
        T.StructField("publish_time", T.StringType(), True),
        T.StructField("song_init_plays", T.IntegerType(), True),
        T.StructField("language", T.IntegerType(), True),
        T.StructField("gender", T.IntegerType(), True),
    ]
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one fixture table. Columnar + predicate pushdown:
    filters/projections composed on top reach the scan (checked in
    tests/test_plans.py).

    ``events.parquet`` is written with TIMESTAMP(NANOS), which Spark's
    parquet reader rejects; read nanos as long and convert to a proper
    timestamp (integer ns->us division — the fixture's values are
    microsecond-precision, so this is lossless and matches DuckDB)."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV ingestion with the reference's malformed-row-drop semantics
    (S1: arity filter M:31,40 → DROPMALFORMED)."""
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S5: one temp view per table (replaces registerTempTable, M:36)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
