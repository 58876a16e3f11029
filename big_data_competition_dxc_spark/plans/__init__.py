from .registry import QUERIES, QueryEntry, query  # noqa: F401


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from ..operators import rollup  # noqa: F401

    # Widened per phase; each import populates QUERIES via @query.
    for modpath in (
        "big_data_competition_dxc_spark.operators.joins",
        "big_data_competition_dxc_spark.operators.lags",
        "big_data_competition_dxc_spark.operators.aggregates",
        "big_data_competition_dxc_spark.operators.filters",
        "big_data_competition_dxc_spark.operators.setops",
        "big_data_competition_dxc_spark.operators.topk",
        "big_data_competition_dxc_spark.sources.roundtrip",
        "big_data_competition_dxc_spark.operators.bucketing",
        "big_data_competition_dxc_spark.operators.sql_pipeline",
        "big_data_competition_dxc_spark.operators.sampling",
        "big_data_competition_dxc_spark.operators.subqueries",
        "big_data_competition_dxc_spark.operators.asof",
        "big_data_competition_dxc_spark.operators.timeseries",
        "big_data_competition_dxc_spark.functions.datequeries",
        "big_data_competition_dxc_spark.functions.stringqueries",
        "big_data_competition_dxc_spark.functions.semistructured",
        "big_data_competition_dxc_spark.dedup.exact",
        "big_data_competition_dxc_spark.dedup.minhash",
        "big_data_competition_dxc_spark.dedup.simhash",
        "big_data_competition_dxc_spark.dedup.jaccard",
        "big_data_competition_dxc_spark.similarity.cosine",
        "big_data_competition_dxc_spark.similarity.ivf",
        "big_data_competition_dxc_spark.textops.quality",
        "big_data_competition_dxc_spark.textops.langid",
        "big_data_competition_dxc_spark.textops.fingerprint",
        "big_data_competition_dxc_spark.multimodal.binary_ops",
        "big_data_competition_dxc_spark.ml.features",
        "big_data_competition_dxc_spark.ml.regression",
        "big_data_competition_dxc_spark.ml.clustering",
        "big_data_competition_dxc_spark.ml.recommend",
        "big_data_competition_dxc_spark.ml.forecast",
        "big_data_competition_dxc_spark.streaming.rollup_stream",
        "big_data_competition_dxc_spark.streaming.sessionize",
        "big_data_competition_dxc_spark.streaming.stateful",
    ):
        # every listed module exists — a failed import is a broken build
        # and must surface, not silently shrink the registry
        __import__(modpath)
