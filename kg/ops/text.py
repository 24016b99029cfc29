"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.  All JVM built-ins."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg.extract import ASCII_WS_RE

# BPE-ish token pattern: alnum runs OR single non-alnum-non-space marks.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"  # \s spelled out (ADVICE r4)

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
    quality features + 0-3 bucket (length / vocabulary-diversity gates).

    r6 (guide §1.2 per-task work): the words array is materialized in
    its OWN projection before size()/array_distinct() consume it —
    inlining it evaluates the split+filter twice per row (plan showed
    the duplicated expression, and the HOF filter makes that projection
    interpreted, not codegen).  CollapseProject keeps the split because
    the attribute is non-cheap and referenced twice."""
    d = (
        docs.withColumn(
            "_w", F.filter(F.split(F.lower("text"), ASCII_WS_RE), lambda x: x != "")
        )
        .select(
            "doc_id",
            F.size("_w").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("_w")).cast("long").alias("n_uniq_tokens"),
            F.length("text").cast("long").alias("len_chars"),
        )
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
    norm = F.regexp_replace(F.lower("text"), ASCII_WS_RE, " ")
    return docs.select(
        "doc_id",
        F.md5(F.substring(norm, 1, 64).cast("binary")).alias("fingerprint"),
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_uniq_words, rep_word_frac, top_bigram_share):
    C4/Gopher-style repetition filters — repeated-word fraction and the
    share of the single most frequent word bigram.

    Shape: the per-doc word stats are pure array expressions (map-only);
    only the bigram mode needs an explode + one map-combined groupBy, and
    the per-doc share rides a second small agg on doc_id.  Both shuffles
    key on doc_id — uniform, skew-free at any corpus size.
    """
    # materialize the words column once: Catalyst does not CSE inside HOFs
    w = F.filter(F.split(F.lower("text"), ASCII_WS_RE), lambda x: x != "")
    base = docs.withColumn("w", w).select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_uniq_words"),
        "w",
    )
    bigrams = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat(
                F.element_at("w", i), F.lit(" "), F.element_at("w", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # explode_outer + null filter: plain explode would let
    # InferFiltersFromGenerate clone the bigram transform into a pushed
    # filter evaluated a second time below the Generate
    counts = (
        base.select("doc_id", F.explode_outer(bigrams).alias("b"))
        .where(F.col("b").isNotNull())
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tops = counts.groupBy("doc_id").agg(
        F.max("c").alias("mx"), F.sum("c").alias("tot")
    )
    return (
        base.drop("w")
        .join(tops, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_uniq_words",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    1 - F.col("n_uniq_words") / F.col("n_words").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("rep_word_frac"),
            F.round(
                F.coalesce(F.col("mx") / F.col("tot").cast("double"), F.lit(0.0)), 6
            ).alias("top_bigram_share"),
        )
    )


# PII patterns written to the Java-regex ∩ RE2 common subset so the
# DuckDB oracle executes the identical expressions.
PII_PATTERNS = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
_PII_ORDER = ["url", "email", "ip"]  # urls first: they can contain '@' and dots


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_urls, n_emails, n_ips, clean_text): count and redact
    URLs / emails / IPv4s.  Counts are per-pattern over the ORIGINAL
    text; redaction applies in _PII_ORDER so an address inside a URL is
    swallowed by the <URL> token.  Pure regexp built-ins — map-only."""
    clean = F.col("text")
    for kind in _PII_ORDER:
        clean = F.regexp_replace(clean, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return docs.select(
        "doc_id",
        *[
            F.regexp_count("text", F.lit(PII_PATTERNS[k])).cast("long")
            .alias(f"n_{k}s")
            for k in _PII_ORDER
        ],
        clean.alias("clean_text"),
    )
