"""Regression pipelines (SURVEY §2.10 ML4–ML6, ML11, ML13).

The reference's forecasting core: linear regression (流行音乐趋势预测.md:
186-221), random forest (M:327-352), GBDT with 1-/2-period-ahead labels
blended (M:682-745), evaluated by train/held-out MSE (M:354-387,
747-762). Feature engineering reuses the engine's own operators (daily
rollup + window lags) — the same plan shapes the reference built with
shifted-date joins.

Config parity vs reference: RF numTrees=50/maxDepth=10/maxBins=100
(M:332-352) kept as-is; GBT maxIter downscaled 330 -> 20 (M:692-698;
330 boosting rounds on fixture-scale data would dominate the driver's
whole verify run for no extra coverage — documented deviation).
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to
from ..plans.registry import query
from ..sources import load

SEED = 42


_FEATURES_CACHE: dict[tuple[str, str], DataFrame] = {}


def daily_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) features with lag/lead labels — the reference's
    feature table shape (M:968-1001) built with ONE window instead of
    three shifted-date joins.

    Memoized + cached per (session, sf_dir): five ML queries consume
    this table; without the memo each rebuilt the rollup+window plan
    from the raw events scan. Only the latest entry is kept — stale
    keys would pin DataFrames of stopped sessions for process life."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _FEATURES_CACHE.get(key)
    if cached is not None:
        return cached
    _FEATURES_CACHE.clear()
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("ds"), "user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
        F.sum("value").alias("total_value"),
    )
    w = Window.partitionBy("user_id").orderBy("ds")
    out = (
        daily.withColumn("dow", F.dayofweek("ds").cast("double"))
        .withColumn("prev_events", F.coalesce(F.lag("n_events").over(w), F.lit(0)).cast("double"))
        .withColumn("prev2_events", F.coalesce(F.lag("n_events", 2).over(w), F.lit(0)).cast("double"))
        .withColumn("label_next", F.lead("n_events").over(w).cast("double"))
        .withColumn("label_next2", F.lead("n_events", 2).over(w).cast("double"))
    ).cache()
    _FEATURES_CACHE[key] = out
    return out


FEATURES = ("n_events", "n_click", "n_purchase", "total_value", "dow", "prev_events", "prev2_events")


def _train_test(df: DataFrame, label: str):
    """Date-based split mirroring M:643-644 (train < Jan 22, test after)."""
    df = df.filter(F.col(label).isNotNull())
    assembled = VectorAssembler(
        inputCols=[c for c in FEATURES], outputCol="features"
    ).transform(df.select(*FEATURES, label, "ds", "user_id"))
    train = assembled.filter(F.col("ds") < "2024-01-22")
    test = assembled.filter(F.col("ds") >= "2024-01-22")
    return train, test


def _mse(df: DataFrame, label: str, pred: str = "prediction") -> float:
    return RegressionEvaluator(
        labelCol=label, predictionCol=pred, metricName="mse"
    ).evaluate(df)


@query("ml_linear_regression", tags=("ML4", "ML13"))
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML4 (M:186-221): linear regression on the daily feature table.
    modern `ml` LR (normal-equation/L-BFGS) replaces the deprecated SGD
    trainer whose step-size misconfiguration made the reference's fit
    collapse to ~0 weights (M:223-234)."""
    train, test = _train_test(daily_features(spark, sf_dir), "label_next")
    model = LinearRegression(featuresCol="features", labelCol="label_next").fit(train)
    mse_train = model.summary.meanSquaredError
    mse_test = _mse(model.transform(test), "label_next")
    return spark.createDataFrame(
        [
            (
                int(train.count()),
                int(test.count()),
                round(float(mse_train), 4),
                round(float(mse_test), 4),
                round(float(model.intercept), 4),
            )
        ],
        "n_train bigint, n_test bigint, mse_train double, mse_test double, intercept double",
    )


@query("ml_random_forest", tags=("ML5", "ML13"))
def ml_random_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML5 (M:327-352): RF regressor, reference config (50 trees, depth
    10, 100 bins), next-day label. Returns test MSE + per-feature
    importances (rounded) — the reference eyeballed train MSE only."""
    train, test = _train_test(daily_features(spark, sf_dir), "label_next")
    rf = RandomForestRegressor(
        featuresCol="features",
        labelCol="label_next",
        numTrees=50,
        maxDepth=10,
        maxBins=100,
        seed=SEED,
    )
    model = rf.fit(train)
    mse_test = _mse(model.transform(test), "label_next")
    imps = [round(float(x), 4) for x in model.featureImportances.toArray()]
    rows = [
        (feat, imp, round(float(mse_test), 4))
        for feat, imp in zip(FEATURES, imps)
    ]
    return spark.createDataFrame(
        rows, "feature string, importance double, mse_test double"
    )


@query("ml_gbt_horizon_blend", tags=("ML6", "ML11", "F18", "ML13"))
def ml_gbt_horizon_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML6+ML11 (M:682-745): two GBDTs — 1-step and 2-step-ahead labels —
    blended (p1+p2)/2 (F18, M:739-744). Returns the three test MSEs
    (h1, h2, blend); the blend beating either horizon alone is the
    reference's attempt-3 result (M:764-765)."""
    feats = daily_features(spark, sf_dir)
    train1, test1 = _train_test(feats, "label_next")
    train2, _ = _train_test(feats, "label_next2")
    gbt = dict(featuresCol="features", maxIter=20, maxDepth=5, seed=SEED)
    m1 = GBTRegressor(labelCol="label_next", **gbt).fit(train1)
    m2 = GBTRegressor(labelCol="label_next2", **gbt).fit(train2)
    p1 = m1.transform(test1).select(
        "user_id", "ds", "label_next", F.col("prediction").alias("p1")
    )
    p2 = m2.transform(test1).select("user_id", "ds", F.col("prediction").alias("p2"))
    both = p1.join(p2, ["user_id", "ds"]).withColumn(
        "blend", (F.col("p1") + F.col("p2")) / 2
    )
    mse = both.agg(
        round_to(F.avg(F.pow(F.col("label_next") - F.col("p1"), 2)), 4).alias("mse_h1"),
        round_to(F.avg(F.pow(F.col("label_next") - F.col("p2"), 2)), 4).alias("mse_h2"),
        round_to(F.avg(F.pow(F.col("label_next") - F.col("blend"), 2)), 4).alias("mse_blend"),
        F.count("*").alias("n_test"),
    )
    return mse
