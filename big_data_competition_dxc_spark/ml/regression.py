"""Regression pipelines (SURVEY §2.10 ML4–ML6, ML11, ML13).

The reference's forecasting core: a 3-target linear-regression battery
(one model per action type, 流行音乐趋势预测.md:186-221), a 5-target
random-forest battery (play/down/collect/morning/afternoon,
M:327-352), GBDT with 1-/2-period-ahead labels blended (M:682-745) and
categorical features declared via categoricalFeaturesInfo {(0,4),(1,8)}
(M:697), evaluated by train/held-out MSE (M:354-387, 747-762). Feature
engineering reuses the engine's own operators (daily rollup + window
lags) — the same plan shapes the reference built with shifted-date
joins.

Config parity vs reference: RF numTrees=50/maxDepth=10/maxBins=100
(M:332-352) kept as-is; GBT maxIter downscaled 330 -> 20 (M:692-698;
330 boosting rounds on fixture-scale data would dominate the driver's
whole verify run for no extra coverage — documented deviation).
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler, VectorIndexer
from pyspark.ml.regression import GBTRegressor, LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to
from ..plans.registry import query
from ..sources import load
from .concurrency import run_concurrently

SEED = 42


_FEATURES_CACHE: dict[tuple[str, str], DataFrame] = {}


def daily_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) features with lag/lead labels — the reference's
    feature table shape (M:968-1001) built with ONE window instead of
    three shifted-date joins. Carries one lead label per battery target
    (M:327-352 trains one model per measure) plus the user's market
    segment (broadcast dim join) as a categorical feature for the GBT.

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
        F.sum(F.when(F.hour("ts") < 12, 1).otherwise(0)).alias("n_morning"),
        F.sum(F.when(F.hour("ts") >= 12, 1).otherwise(0)).alias("n_afternoon"),
        F.sum("value").alias("total_value"),
    )
    seg = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    daily = daily.join(F.broadcast(seg), "user_id", "left").withColumn(
        "segment", F.coalesce("c_mktsegment", F.lit("NONE"))
    ).drop("c_mktsegment")
    w = Window.partitionBy("user_id").orderBy("ds")
    out = (
        daily.withColumn("dow", F.dayofweek("ds").cast("double"))
        .withColumn("prev_events", F.coalesce(F.lag("n_events").over(w), F.lit(0)).cast("double"))
        .withColumn("prev2_events", F.coalesce(F.lag("n_events", 2).over(w), F.lit(0)).cast("double"))
        .withColumn("label_next", F.lead("n_events").over(w).cast("double"))
        .withColumn("label_next2", F.lead("n_events", 2).over(w).cast("double"))
        .withColumn("label_click", F.lead("n_click").over(w).cast("double"))
        .withColumn("label_purchase", F.lead("n_purchase").over(w).cast("double"))
        .withColumn("label_morning", F.lead("n_morning").over(w).cast("double"))
        .withColumn("label_afternoon", F.lead("n_afternoon").over(w).cast("double"))
    ).cache()
    _FEATURES_CACHE[key] = out
    return out


FEATURES = ("n_events", "n_click", "n_purchase", "total_value", "dow", "prev_events", "prev2_events")
# battery models also see the daypart measures they forecast
BATTERY_FEATURES = FEATURES + ("n_morning", "n_afternoon")

# target name -> lead label column; the reference's five RF measures
# play/down/collect/morning/afternoon (M:327-352) map onto the fixture's
# events/clicks/purchases/morning/afternoon counts, and its three LR
# targets play/down/collect (M:186-221) are the first three.
RF_TARGETS = {
    "events": "label_next",
    "clicks": "label_click",
    "purchases": "label_purchase",
    "morning": "label_morning",
    "afternoon": "label_afternoon",
}
LR_TARGETS = {k: RF_TARGETS[k] for k in ("events", "clicks", "purchases")}


def _train_test(df: DataFrame, label: str, features: tuple[str, ...] = FEATURES):
    """Date-based split mirroring M:643-644 (train < Jan 22, test after)."""
    df = df.filter(F.col(label).isNotNull())
    assembled = VectorAssembler(
        inputCols=list(features), outputCol="features"
    ).transform(df.select(*features, label, "ds", "user_id"))
    train = assembled.filter(F.col("ds") < "2024-01-22")
    test = assembled.filter(F.col("ds") >= "2024-01-22")
    return train, test


def _mse(df: DataFrame, label: str, pred: str = "prediction") -> float:
    return RegressionEvaluator(
        labelCol=label, predictionCol=pred, metricName="mse"
    ).evaluate(df)


def _naive_train_mse(train: DataFrame, label: str) -> float:
    """MSE of predicting the train-label mean — the baseline every
    fitted model must beat (a model losing to the mean has learned
    nothing; the reference never checked this)."""
    [r] = train.agg(F.var_pop(label).alias("v")).collect()
    return float(r["v"] or 0.0)


@query("ml_linear_regression", tags=("ML4", "ML13"))
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML4 (M:186-221): the reference's 3-model linear-regression
    battery — one LR per action-type target — as per-target MSE rows.
    Modern `ml` LR (normal-equation/L-BFGS) replaces the deprecated SGD
    trainer whose step-size misconfiguration made the reference's fit
    collapse to ~0 weights (M:223-234); mse_naive (train-mean baseline)
    is reported so that collapse class is machine-checkable."""
    feats = daily_features(spark, sf_dir)

    # One thunk per target, submitted concurrently (guide §2.6 via
    # ml/concurrency.py): the three fits are independent and each is
    # driver-latency-bound at this scale; results are bit-identical to
    # the serial loop (same rows, same closed-form solver, no seed).
    def _battery(target: str, label: str):
        train, test = _train_test(feats, label, BATTERY_FEATURES)
        model = LinearRegression(featuresCol="features", labelCol=label).fit(train)
        return (
            target,
            int(train.count()),
            int(test.count()),
            round(float(model.summary.meanSquaredError), 4),
            round(float(_mse(model.transform(test), label)), 4),
            round(_naive_train_mse(train, label), 4),
            round(float(model.intercept), 4),
        )

    rows = run_concurrently(
        [lambda t=t, l=l: _battery(t, l) for t, l in LR_TARGETS.items()]
    )
    # audited determinism scalar (r10, the ML8/ML10/ML12 treatment):
    # the battery's test MSEs summed in 4-decimal integer units. LR is
    # closed-form deterministic; any split/feature/solver regression
    # changes it. tests/test_ml.py pins it identical across two runs.
    audit = sum(int(round(r[4] * 10_000)) for r in rows)
    return spark.createDataFrame(
        [(*r, audit) for r in rows],
        "target string, n_train bigint, n_test bigint, mse_train double, "
        "mse_test double, mse_naive double, intercept double, "
        "audit_mse_units bigint",
    )


@query("ml_random_forest", tags=("ML5", "ML13"))
def ml_random_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML5 (M:327-352): the reference's 5-model RF battery
    (play/down/collect/morning/afternoon ~ events/clicks/purchases/
    morning/afternoon), reference config (50 trees, depth 10, 100
    bins). One row per (target, feature) with the importance, plus the
    target's train/test MSE and the train-mean baseline."""
    feats = daily_features(spark, sf_dir)

    # Concurrent battery (guide §2.6 via ml/concurrency.py): the five
    # seeded fits are independent; per-model rows are assembled in
    # RF_TARGETS order afterwards, so the output is row-for-row the
    # serial loop's.
    def _battery(target: str, label: str):
        train, test = _train_test(feats, label, BATTERY_FEATURES)
        rf = RandomForestRegressor(
            featuresCol="features",
            labelCol=label,
            numTrees=50,
            maxDepth=10,
            maxBins=100,
            seed=SEED,
        )
        model = rf.fit(train)
        mse_train = round(float(_mse(model.transform(train), label)), 4)
        mse_test = round(float(_mse(model.transform(test), label)), 4)
        mse_naive = round(_naive_train_mse(train, label), 4)
        return [
            (target, feat, round(float(imp), 4), mse_train, mse_test, mse_naive)
            for feat, imp in zip(BATTERY_FEATURES, model.featureImportances.toArray())
        ]

    rows = [
        row
        for per_model in run_concurrently(
            [lambda t=t, l=l: _battery(t, l) for t, l in RF_TARGETS.items()],
            max_workers=len(RF_TARGETS),
        )
        for row in per_model
    ]
    # audited determinism scalar (r10): every feature importance across
    # the 5-model battery summed in 4-decimal units — a seed/bagging/
    # split regression reshuffles the importances and changes it.
    audit = sum(int(round(r[2] * 10_000)) for r in rows)
    return spark.createDataFrame(
        [(*r, audit) for r in rows],
        "target string, feature string, importance double, mse_train double, "
        "mse_test double, mse_naive double, audit_importance_units bigint",
    )


GBT_MAX_CATEGORIES = 8


def _gbt_split(feats: DataFrame, label: str):
    """Assembly for the GBT with CATEGORICAL features declared, the
    modern equivalent of the reference's mllib
    ``categoricalFeaturesInfo {(0,4),(1,8)}`` (M:697, M:1031):

    - ``segment`` (5 market segments + NONE) is StringIndexer-encoded —
      the (0,4)-style low-cardinality slot;
    - ``dow`` (7 values) plays the (1,8) slot;
    - VectorIndexer(maxCategories={GBT_MAX_CATEGORIES}) attaches nominal
      metadata to every assembled slot with <= {GBT_MAX_CATEGORIES}
      distinct values, so the tree learner splits them as UNORDERED
      category sets exactly as categoricalFeaturesInfo did (an indexed
      category treated as continuous would invent a meaningless
      ordering over segments). maxBins=32 >= the largest category count,
      the same constraint mllib enforced.

    Indexers fit on the full feature table (dictionary building is
    unsupervised; fitting on train-only would crash on unseen test
    categories), the model itself only ever sees train rows."""
    df = feats.filter(F.col(label).isNotNull())
    cols = list(BATTERY_FEATURES) + ["segment_ix"]
    df = StringIndexer(
        inputCol="segment", outputCol="segment_ix", handleInvalid="keep"
    ).fit(df).transform(df)
    assembled = VectorAssembler(inputCols=cols, outputCol="raw_features").transform(
        df.select(*cols, label, "ds", "user_id")
    )
    assembled = VectorIndexer(
        inputCol="raw_features",
        outputCol="features",
        maxCategories=GBT_MAX_CATEGORIES,
        handleInvalid="keep",
    ).fit(assembled).transform(assembled)
    # One eager materialization per horizon (guide §5): the GBT fit's
    # internal conversion AND the blend's two transform passes each
    # replayed the StringIndexer->assembler->VectorIndexer chain over
    # the features cache otherwise. Same rows, same partitioning ->
    # identical seeded fits (A/B row-equality pinned); blocks are swept
    # by the bench's between-query state release.
    assembled = assembled.localCheckpoint(eager=True)
    train = assembled.filter(F.col("ds") < "2024-01-22")
    test = assembled.filter(F.col("ds") >= "2024-01-22")
    return train, test


@query("ml_gbt_horizon_blend", tags=("ML6", "ML11", "F18", "ML13"))
def ml_gbt_horizon_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML6+ML11 (M:682-745): two GBDTs — 1-step and 2-step-ahead labels —
    blended (p1+p2)/2 (F18, M:739-744), with the reference's categorical
    features declared via indexer metadata (see _gbt_split). Returns the
    three test MSEs (h1, h2, blend); the blend beating either horizon
    alone is the reference's attempt-3 result (M:764-765)."""
    feats = daily_features(spark, sf_dir)
    gbt = dict(featuresCol="features", maxIter=20, maxDepth=5, maxBins=32, seed=SEED)

    # The two horizons are independent end-to-end (indexer fits + 20
    # boosting iterations each); overlap them (guide §2.6 via
    # ml/concurrency.py). Same splits, same seeds — identical models.
    def _horizon(label: str):
        train, test = _gbt_split(feats, label)
        return GBTRegressor(labelCol=label, **gbt).fit(train), test

    (m1, test1), (m2, _) = run_concurrently(
        [lambda: _horizon("label_next"), lambda: _horizon("label_next2")]
    )
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
    # audited determinism scalar (r10): the three horizon MSEs summed
    # in 4-decimal units — one row, so the collect is free, and any
    # boosting/indexing/blend regression changes it.
    [r] = mse.collect()
    audit = int(round((r["mse_h1"] + r["mse_h2"] + r["mse_blend"]) * 10_000))
    return spark.createDataFrame(
        [(r["mse_h1"], r["mse_h2"], r["mse_blend"], r["n_test"], audit)],
        "mse_h1 double, mse_h2 double, mse_blend double, n_test bigint, "
        "audit_mse_units bigint",
    )
