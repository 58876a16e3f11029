"""PySpark-native analytics engine with the workload surface of
wlwgcdxc/big-data-competition_dxc.

The reference (see /root/reference, surveyed in SURVEY.md) is two
Spark-1.x-era competition notebooks — Tianchi music play forecasting
(流行音乐趋势预测.md) and a Douban ALS/KNN book recommender
(豆瓣图书推荐.md). This package re-expresses that surface Spark-first:

- ``sources``   — schema-typed parquet/CSV ingestion + temp-view registry
- ``functions`` — the reference's Convert-object date/string library as
  Catalyst builtins (SURVEY §2.8, zero Python UDFs)
- ``operators`` — relational operators: rollups, pivots, lag features
  (both shifted-date-join and window forms), joins, set ops, top-k
- ``dedup`` / ``similarity`` / ``textops`` / ``multimodal`` — the
  large-scale training-data-pipeline extensions (exact + MinHash/SimHash
  near-dup, ANN cosine, text quality/lang-id, binary-column plumbing)
- ``ml``        — pyspark.ml pipelines mirroring SURVEY §2.10
- ``streaming`` — Structured Streaming daily rollup (flagged extension)
- ``plans``     — the query registry consumed by ``__spark_entry__``
"""

__version__ = "0.1.0"
