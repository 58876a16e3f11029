"""PII scrubbing / pseudonymization for training-data pipelines.

Before text reaches a training corpus, identifier-bearing fields are
(a) masked — digit runs replaced with a fixed glyph so formats stay
recognizable but values are gone — and (b) pseudonymized — replaced by
a stable one-way surrogate so joins still work after scrubbing. Both
are pure JVM ``regexp_replace`` / ``md5`` expressions: single scan, no
shuffle beyond the final audit aggregate, whole-stage codegen at
100 TB.

The fixture has no synthetic emails/phones, so the scrub target is the
digit-run identifier embedded in ``c_name`` ("Customer#000000042") —
the regexes (``[0-9]+`` runs) are exactly what a phone/SSN masker
uses. DuckDB's ``regexp_replace`` needs the explicit ``'g'`` flag to
match Spark's replace-all semantics — that asymmetry is the kind of
cross-engine trap this oracle pins.

No reference-repo counterpart (SURVEY §2 extension: training-data
pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

_SCRUB_ORACLE = """
WITH t AS (
  SELECT c_custkey,
         regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name,
         substr(md5(c_name), 1, 12) AS pseudonym,
         length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g'))
           AS n_masked
  FROM customer
)
SELECT c_custkey, masked_name, pseudonym, CAST(n_masked AS BIGINT) AS n_masked
FROM t
"""


@query("pii_scrub_pseudonymize", oracle=_SCRUB_ORACLE, tags=("textops", "scrub"))
def pii_scrub_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask digit runs in the identifying field and derive a stable
    md5 surrogate per identity: the masked value is safe to train on,
    the pseudonym keeps referential joins alive. Pure narrow
    expressions — no shuffle."""
    cust = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.regexp_replace(name, "[0-9]", "X").alias("masked_name"),
        F.substring(F.md5(name), 1, 12).alias("pseudonym"),
        (
            F.length(name) - F.length(F.regexp_replace(name, "[0-9]", ""))
        )
        .cast("bigint")
        .alias("n_masked"),
    )


_AUDIT_ORACLE = """
WITH t AS (
  SELECT c_name,
         substr(md5(c_name), 1, 12) AS pseudonym,
         regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name
  FROM customer
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_identities,
       CAST(COUNT(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
       CAST(COUNT(DISTINCT masked_name) AS BIGINT) AS n_masked_forms,
       CAST(SUM(CASE WHEN masked_name ~ '[0-9]' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaks
FROM t
"""


@query("pii_scrub_audit", oracle=_AUDIT_ORACLE, tags=("textops", "scrub", "audit"))
def pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub-quality audit in one aggregate: pseudonymization must be
    injective (distinct pseudonyms == distinct identities), masking
    must collapse formats (few masked shapes), and ZERO digits may
    survive (n_leaks = 0) — the gate a redaction job must pass before
    its output ships to training."""
    cust = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    t = cust.select(
        name.alias("c_name"),
        F.substring(F.md5(name), 1, 12).alias("pseudonym"),
        F.regexp_replace(name, "[0-9]", "X").alias("masked_name"),
    )
    return t.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_name").alias("n_identities"),
        F.countDistinct("pseudonym").alias("n_pseudonyms"),
        F.countDistinct("masked_name").alias("n_masked_forms"),
        F.sum(
            F.when(F.col("masked_name").rlike("[0-9]"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_leaks"),
    )
