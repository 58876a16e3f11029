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
# FIXTURES.md §1), for the CSV ingestion path (read_csv reproduces the
# reference's arity filter M:40 `e.length==5`: short/long rows vanish).
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

    ``events.parquet`` has been written with TIMESTAMP(NANOS) (which
    Spark's parquet reader rejects — read nanos as long, divide to us)
    in some driver generations and plain TIMESTAMP(US, no tz) in
    others. Both are normalized here to the session-tz TIMESTAMP type:
    the session time zone is pinned to UTC (session.py), so casting
    TIMESTAMP_NTZ -> TIMESTAMP is value-identical to DuckDB's
    naive-as-UTC reading of the same file, and downstream epoch math
    (unix_micros) type-checks regardless of which variant the fixture
    carries."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Scope the legacy conf to the schema resolution: spark.read
        # .parquet resolves the footer schema EAGERLY, and the reader's
        # hadoop conf is captured with the relation, so restoring the
        # session value immediately afterwards is safe (later actions on
        # the returned DataFrame still decode nanos as long — pinned by
        # tests/test_plans.py::test_load_scopes_nanos_conf). Without the
        # restore, every unrelated parquet read in the session would
        # silently decode TIMESTAMP(NANOS) as bigint instead of failing
        # loudly.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _tz_normalize(df)
    return _tz_normalize(spark.read.parquet(path))


def _tz_normalize(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to the session-tz TIMESTAMP type.

    With the session zone pinned to UTC this is a pure type-level
    normalization (no value shift), and it keeps every epoch function
    (unix_micros and friends require TIMESTAMP, not NTZ) working no
    matter which physical timestamp flavor the fixture writer used."""
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV ingestion with the reference's malformed-row-drop semantics
    (S1/P6/P14): text lines → split(",") → arity filter → typed
    try_cast, with rows failing a non-nullable cast dropped.

    NOT the builtin csv reader with DROPMALFORMED: modern Spark's
    DROPMALFORMED only drops type-cast failures — wrong-arity rows are
    padded/truncated permissively (proven in
    sources/roundtrip.py:csv_roundtrip_malformed, which pins the same
    shape against a DuckDB oracle). The explicit filter reproduces the
    reference's `e.length==n` semantics (M:31, M:40) exactly."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), ",")
    fields = schema.fields
    parsed = lines.filter(F.size(parts) == len(fields)).select(
        *[parts[i].try_cast(f.dataType).alias(f.name) for i, f in enumerate(fields)]
    )
    for f in fields:
        if not f.nullable:
            parsed = parsed.filter(F.col(f.name).isNotNull())
    return parsed


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S5: one temp view per table (replaces registerTempTable, M:36)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
