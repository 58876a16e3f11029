"""SparkSession factory tuned for local[N] testing and cluster-safe defaults.

Replaces the reference's per-notebook ``sqlContext`` (流行音乐趋势预测.md:36)
with one configured session: AQE on (runtime partition coalescing + skew-join
splitting), UTC session time zone (date/timestamp determinism vs the DuckDB
oracle), Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bdc-dxc-spark") -> SparkSession:
    """Build (or fetch) the session.

    Local parallelism follows ``SPARK_GRAFT_CPUS`` (driver contract);
    shuffle partitions match cores in local mode — on a real cluster this
    would be sized to ~2-3x total executor cores, with AQE coalescing
    handling the long tail.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Scan-split sizing for MB-scale local fixtures (r10): the 128MB
        # default packs a whole fixture table into ONE scan task, so a
        # CPU-heavy projection (tokenize/stopword-score/shingle-explode
        # over documents) ran single-threaded on a 32-core local[N] —
        # e.g. corpus_curation's scoring stage was 1 task at every sf.
        # 1MB splits give the fixture scans the multi-task shape a real
        # cluster gets for free (a 100 TB input has ~10^6 row groups);
        # parallelism stays bounded by the file's row-group count, so
        # single-group driver fixtures are unaffected. On a real
        # cluster this conf should be LEFT AT DEFAULT — it is a
        # local-fixture-scale setting, like shuffle.partitions above.
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # JVM unified-logging writes to the process stdout, which the
        # bench/driver contract reserves for exactly one JSON line — an
        # r8 run saw "[warning][gc,alloc] ... GCLocker ..." land on
        # stdout ahead of the payload. Route JVM log output to stderr
        # instead of silencing it (warnings stay visible, stdout stays
        # machine-parseable).
        .config(
            "spark.driver.extraJavaOptions",
            "-Xlog:all=warning:stderr:uptime,level,tags",
        )
        .getOrCreate()
    )
