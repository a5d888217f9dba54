"""Text-analysis operators for large-scale training-data pipelines.

All implemented as JVM-side pyspark.sql.functions column expressions
(whole-stage codegen, no Python in the hot path), so each has an exact
ANSI-SQL oracle:

- token_count        whitespace tokenization
- quality_score      length + punctuation-ratio heuristic (stopword_ratio
                     is a separate column, not part of the score)
- lang_id            n-gram/stopword-hit heuristic over a fixed marker table
- fingerprint        md5 document fingerprint of normalized text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny public stopword markers per language (heuristic language-ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "las"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def token_count_col(text: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    trimmed = F.trim(text)
    return F.when(text.isNull(), F.lit(None).cast("bigint")).otherwise(
        F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
            F.size(F.split(trimmed, r"\s+")).cast("bigint")
        )
    )


#: BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation —
#: the classic GPT-2-style split shape, without the library dependency
SUBTOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subtoken_count_col(text: Column) -> Column:
    """BPE-ish subtoken count (regexp_count of SUBTOKEN_PATTERN);
    null-safe. Complements the whitespace token count the way production
    pipelines track both word and BPE token budgets."""
    return F.when(text.isNull(), F.lit(None).cast("bigint")).otherwise(
        F.regexp_count(text, F.lit(SUBTOKEN_PATTERN)).cast("bigint")
    )


def punct_ratio_col(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\p{L}\p{N}\s]", "")
    return F.when(F.length(text) > 0,
                  (F.length(text) - F.length(no_punct)) / F.length(text)).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column) -> Column:
    tokens = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in STOPWORDS])))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """[0,1] doc-quality heuristic: length band + low punctuation noise.

    Deliberately un-rounded: every term is IEEE-deterministic and written
    identically in the SQL oracle, so values match bit-for-bit.
    """
    n = F.length(F.coalesce(text, F.lit("")))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio_col(F.coalesce(text, F.lit(""))) * 2.0, F.lit(1.0))
    return len_score * (F.lit(1.0) - punct_penalty * F.lit(0.5))


def lang_marker_score(text: Column, lang: str) -> Column:
    """Number of distinct marker words of ``lang`` present in the text."""
    tokens = F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+")
    return F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])))


def lang_id_col(text: Column) -> Column:
    """Argmax language by marker-word hits; deterministic priority chain
    en > de > es > fr on ties; 'und' when nothing hits."""
    s = {lang: lang_marker_score(text, lang) for lang in LANG_MARKERS}
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"])
               & (s["en"] >= 1), F.lit("en"))
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= 1), F.lit("de"))
        .when((s["es"] >= s["fr"]) & (s["es"] >= 1), F.lit("es"))
        .when(s["fr"] >= 1, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def fingerprint_col(text: Column) -> Column:
    """md5 of whitespace-normalized lowercase text — exact-dup fingerprint."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    return F.md5(norm)


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count_col(t).alias("n_tokens"),
        quality_score_col(t).alias("quality"),
        lang_id_col(t).alias("lang_guess"),
        fingerprint_col(t).alias("fingerprint"),
    )
