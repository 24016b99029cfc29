"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.  All JVM built-ins."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: alnum runs OR single non-alnum-non-space marks.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Stopword marker sets for the language heuristic (argmax of hits;
# deterministic tiebreak by the CASE order: en > de > es).  Genuine
# high-frequency function words per language, chosen to be mutually
# exclusive across the three sets (e.g. Spanish "es"/German "es" and
# English "die"/German "die" ambiguities are avoided by not relying on
# any single collision-prone token dominating a set).
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to", "was", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "que", "los", "las", "una", "por", "con"],
}


def _marker_count(text: Column, marker: str) -> Column:
    return F.regexp_count(F.lower(text), F.lit(rf"\b{marker}\b"))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang): stopword-hit argmax heuristic."""
    scores = {
        lang: sum(
            (_marker_count(F.col("text"), m) for m in ms), start=F.lit(0)
        )
        for lang, ms in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["es"]), "en"
        )
        .when(scores["de"] >= scores["es"], "de")
        .otherwise("es")
    )
    return docs.select("doc_id", pred.alias("predicted_lang"))


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens): BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(TOKEN_PATTERN)).cast("long").alias("n_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_uniq_tokens, len_chars, quality): integer
    quality features + 0-3 bucket (length / vocabulary-diversity gates)."""
    w = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    d = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_uniq_tokens"),
        F.length("text").cast("long").alias("len_chars"),
    )
    quality = (
        F.when(F.col("n_tokens") < 10, 0)
        .when(F.col("n_uniq_tokens") * 2 < F.col("n_tokens"), 1)
        .when(F.col("len_chars") < 200, 2)
        .otherwise(3)
    )
    return d.withColumn("quality", quality.cast("long"))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 of the first 64 chars of the
    whitespace-normalized lowered text — a cheap prefix fingerprint for
    boilerplate detection."""
    norm = F.regexp_replace(F.lower("text"), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(F.substring(norm, 1, 64).cast("binary")).alias("fingerprint"),
    )
