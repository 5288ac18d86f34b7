"""Text-analysis column functions for training-data pipelines.

All pure Column expressions (JVM, codegen-friendly): language-ID via marker
tokens, quality scoring, token counting (whitespace + regex word model),
document fingerprinting (min-hash-of-shingles, a winnowing-lite scheme).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from schemamap_spark.operators.dedup import shingles

# Marker tokens per language. Deterministic heuristic: the language with the
# most marker hits wins; ties (incl. zero hits) resolve alphabetically-first
# among the tied, else 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}

WORD_REGEX = r"[a-zA-Z]+|[0-9]+"  # BPE-ish pre-tokenizer word model

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def token_count(col: str = "text") -> Column:
    return F.size(F.split(F.col(col), " "))


def word_count(col: str = "text") -> Column:
    return F.size(F.regexp_extract_all(F.col(col), F.lit(WORD_REGEX), F.lit(0)))


def _marker_hits(col: str, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(F.split(F.col(col), " "), lambda t: F.array_contains(arr, t)))


def lang_id(col: str = "text") -> Column:
    """Predicted language code. Deterministic argmax over marker-token hits:
    build (hits, lang) structs, take array_max with lang as DESC tiebreak
    inverted to get alphabetic preference, require >0 hits."""
    langs = sorted(LANG_MARKERS)
    # struct comparison: (hits asc, neg-alpha) — array_max picks highest hits,
    # and among ties the lexicographically LAST struct; invert lang via a rank
    # so alphabetically-first wins ties.
    entries = [
        F.struct(
            _marker_hits(col, LANG_MARKERS[lang]).alias("hits"),
            F.lit(len(langs) - i).alias("pref"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def stopword_ratio(col: str = "text") -> Column:
    toks = F.split(F.col(col), " ")
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("double") / F.size(toks).cast("double")


def distinct_token_ratio(col: str = "text") -> Column:
    toks = F.split(F.col(col), " ")
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def quality_score(col: str = "text") -> Column:
    """Composite [0,1] quality heuristic: length saturation (100 tokens),
    lexical diversity, and a mild stopword-presence prior. Deterministic,
    portable arithmetic (exercised against the DuckDB oracle)."""
    length_component = F.least(token_count(col).cast("double") / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.5 * length_component
        + 0.4 * distinct_token_ratio(col)
        + 0.1 * F.least(stopword_ratio(col) * 5.0, F.lit(1.0)),
        6,
    )


def doc_fingerprint(col: str = "text", k: int = 3) -> Column:
    """Winnowing-lite fingerprint: minimum md5 digest over k-token shingles.
    Stable under permutation-free edits elsewhere in the doc; portable
    (md5 is identical everywhere)."""
    return F.array_min(F.transform(shingles(col, k), lambda s: F.md5(s)))
