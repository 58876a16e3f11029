"""Language identification via stopword-hit scoring — the classic
cheap n-gram/stopword heuristic, expressed entirely in builtin
higher-order functions (JVM-side; no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that"),
    "es": ("el", "la", "de", "y", "que", "los", "en", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "ist"),
}
_LANGS = tuple(sorted(LANG_STOPWORDS))  # deterministic argmax order


def _oracle() -> str:
    score_cols = ",\n       ".join(
        "CAST(len(list_filter(l, t -> t IN ({words}))) AS BIGINT) AS score_{lang}".format(
            words=", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]), lang=lang
        )
        for lang in _LANGS
    )
    greatest = "greatest(" + ", ".join(f"score_{la}" for la in _LANGS) + ")"
    pick = "CASE " + " ".join(
        f"WHEN score_{la} = {greatest} THEN '{la}'" for la in _LANGS
    ) + " END"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS l
  FROM documents
),
scored AS (
  SELECT doc_id,
       {score_cols}
  FROM toks
)
SELECT doc_id, {", ".join(f"score_{la}" for la in _LANGS)},
       {pick} AS lang_pred
FROM scored
"""


@query("lang_id_heuristic", oracle=_oracle(), tags=("textops", "langid"))
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID: score each language's stopword hits
    over the lowercased token list, argmax with first-in-alphabetical
    tie-break (deterministic). The fixture corpus is synthetic word-salad,
    so scores are near-zero — the operator's contract (deterministic
    scoring + argmax), not fixture realism, is what the oracle pins."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    def scorer(lang: str):
        words = LANG_STOPWORDS[lang]
        return lambda t: t.isin(*words)

    scored = docs.select(
        "doc_id",
        *[
            F.size(F.filter(toks, scorer(lang))).cast("bigint").alias(f"score_{lang}")
            for lang in _LANGS
        ],
    )
    best = F.greatest(*[F.col(f"score_{la}") for la in _LANGS])
    expr = None
    for la in _LANGS:
        cond = F.col(f"score_{la}") == best
        expr = F.when(cond, la) if expr is None else expr.when(cond, la)
    return scored.select(
        "doc_id", *[f"score_{la}" for la in _LANGS], expr.alias("lang_pred")
    )
