"""Frequent-pattern mining (FP-growth) over order baskets.

The MLlib counterpart of the SQL market-basket pair join
(operators/joins.py::part_affinity_pairs): FP-growth mines ALL frequent
itemsets distributively (conditional FP-trees per partition suffix, no
candidate-pair shuffle), which is the path to 3-item-and-larger sets a
pair self-join can't reach. Restricted to size-2 itemsets its output
must EQUAL the SQL pair counts — so this ML query carries a full
DuckDB oracle, pinning the library against the relational engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import _AFFINITY_ORACLE, MIN_SUPPORT
from ..plans.registry import query
from ..sources import load


@query("fpgrowth_pair_itemsets", oracle=_AFFINITY_ORACLE, tags=("ML", "affinity"))
def fpgrowth_pair_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FP-growth with min support count {MIN_SUPPORT}, projected to its
    size-2 itemsets — must reproduce part_affinity_pairs exactly (same
    schema, same counts). minSupport is a FRACTION in the API; passing
    (count - 0.5)/n makes the internal ceil() land on the integer
    count regardless of basket cardinality, so the oracle threshold
    and the model threshold cannot drift apart."""
    op = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    baskets = op.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    n_baskets = baskets.count()

    from pyspark.ml.fpm import FPGrowth

    model = FPGrowth(
        itemsCol="items",
        minSupport=(MIN_SUPPORT - 0.5) / n_baskets,
        minConfidence=0.5,
    ).fit(baskets)
    pairs = model.freqItemsets.filter(F.size("items") == 2).select(
        F.array_sort("items").alias("pair"), F.col("freq").alias("n_orders")
    )
    return pairs.select(
        F.col("pair")[0].alias("part_a"),
        F.col("pair")[1].alias("part_b"),
        "n_orders",
    )
