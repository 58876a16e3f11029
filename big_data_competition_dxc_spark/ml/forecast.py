"""Autoregressive multi-step forecast (SURVEY §2.10 ML12).

The reference's final deliverable (流行音乐趋势预测.md:407-522): collect
the last observed day per artist to the driver, then loop day-by-day
for the forecast horizon, feeding each prediction back in as the next
day's lag feature, and emit (entity, day, plays) rows (the driver-side
CSV writer, M:428-436/482-518).

The loop is inherently sequential per day (loop-carried dependency,
SURVEY §4/§7.7) but the STATE is tiny — one row per entity — so the
reference's driver-loop design is legitimate even at 100 TB: the big
data builds the feature table and trains the model (distributed); the
rollout iterates over a ~per-entity-sized frame in plain Python. We
collect LR coefficients once and evaluate the linear model driver-side
per step (the reference called model.predict on driver-local vectors
the same way, M:470-471). Non-lag features copy forward, as in the
reference (it even bumped a constant per simulated day, F20 M:472).

Rows-only check (model-dependent values; SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query

HORIZON = 7


@query("ml_autoregressive_forecast", tags=("ML12", "S6", "S7", "S9", "F20"))
def ml_autoregressive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML12 (M:407-522): train LR on the daily feature table, collect
    the final-day state per user (small), roll {HORIZON} days forward on
    the driver feeding predictions back as lags, return the forecast
    rows (the reference wrote them to CSV; we return the frame)."""
    from .regression import FEATURES, daily_features

    feats = daily_features(spark, sf_dir)
    train = feats.filter(F.col("label_next").isNotNull())
    assembled = VectorAssembler(inputCols=list(FEATURES), outputCol="features").transform(
        train.select(*FEATURES, "label_next")
    )
    model = LinearRegression(featuresCol="features", labelCol="label_next").fit(assembled)
    coefs = [float(c) for c in model.coefficients]
    intercept = float(model.intercept)

    # Last observed row per user — tiny driver state (M:455: collect()).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ds"))
    last = (
        feats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ds", *FEATURES)
        .collect()
    )

    idx = {c: i for i, c in enumerate(FEATURES)}
    out_rows: list[tuple[int, int, str, float]] = []
    import datetime

    for row in last:
        state = [float(row[c]) for c in FEATURES]
        ds = row["ds"]
        for h in range(1, HORIZON + 1):
            pred = intercept + sum(c * x for c, x in zip(coefs, state))
            pred = max(0.0, pred)
            ds = ds + datetime.timedelta(days=1)
            out_rows.append((int(row["user_id"]), h, ds.isoformat(), round(pred, 2)))
            # Feed the prediction back (M:470-472): lags shift, the
            # predicted count becomes "today", dow advances, the rest
            # copies forward.
            state[idx["prev2_events"]] = state[idx["prev_events"]]
            state[idx["prev_events"]] = state[idx["n_events"]]
            state[idx["n_events"]] = pred
            state[idx["dow"]] = float(ds.isoweekday() % 7 + 1)  # Sunday=1 (F5)
            # F20 (M:472): the reference bumped a cumulative feature by
            # a constant per simulated day; total_value accrues likewise.
            state[idx["total_value"]] += 5.0
    # audited scalar (r7): the whole-horizon forecast total in integer
    # cents is seed/model-stable (deterministic LR fit on a fixed
    # frame + pure-Python rollout), so repeating it on every row turns
    # the driver's rows/schema check into a determinism pin —
    # tests/test_ml.py asserts it is identical across two runs.
    audit_cents = int(round(sum(r[3] for r in out_rows) * 100))
    return spark.createDataFrame(
        [(*r, audit_cents) for r in out_rows],
        "user_id bigint, horizon int, ds string, predicted_events double, "
        "audit_forecast_cents bigint",
    ).orderBy("user_id", "horizon")
