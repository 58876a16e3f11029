"""Oracle-checked queries exercising string functions (SURVEY §2.8
F11–F15): substring/split/trim/regex — the reference's paren-strip and
tokenize idioms (流行音乐趋势预测.md:108, 250, 1128; 豆瓣图书推荐.md:32-33)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load


@query(
    "string_funcs_docs",
    oracle="""
SELECT doc_id,
       upper(substr(text, 1, 10)) AS head10,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       CAST(array_length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         AS n_tokens,
       string_split_regex(trim(text), '\\s+')[1] AS first_token,
       CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END
         AS src_ok
FROM documents
""",
    tags=("F11", "F12", "F14", "F15"),
)
def string_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 substring, F12 split, F14 trim, F15 regex-match over the
    documents table — the reference's split("::") / substring paren-strip
    / matches("[0-9]*") trio on a real text column."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.when(F.col("source").rlike("^src[0-9]+$"), 1).otherwise(0).alias("src_ok"),
    )


@query(
    "levenshtein_part_names",
    oracle="""
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 8
""",
    tags=("F15", "dedup"),
)
def levenshtein_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup part names WITHIN a brand (the blocking
    key): candidates come from the brand equi-join, only survivors pay
    the O(len^2) levenshtein — the classic blocked fuzzy-match shape.
    At 100 TB the blocking key is the knob; never run edit distance on
    an unblocked cross product."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= 8)
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )
