"""Deduplication operators over a document corpus.

All four flavors stay entirely in JVM-side built-ins (whole-stage
codegen; no Python in the hot path):

- exact:          md5 content hash → groupBy (one shuffle, map-combined)
- minhash + LSH:  word-3-shingles → per-band min(md5) signature →
                  band-bucket self-join → candidate pairs
- simhash:        32-bit parity fingerprint from token md5 hex digits
- n-gram Jaccard: blocked shingle self-join → |∩| / |∪|

Scale notes (10^8+ docs): the shingle arrays are computed per-row with
array expressions (no explode until the join that needs it); the
Jaccard self-join is blocked on (lang, source) — at production scale the
block key would be an LSH band from the minhash signature, which is
exactly what minhash_lsh_pairs produces; the exact-dedup groupBy is a
single hash shuffle on a 128-bit key (uniform, no skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
SHINGLE_K = 3


def words(text: Column) -> Column:
    """lower → split on whitespace → drop empties (matches the DuckDB
    oracle's list_filter(string_split_regex(...)))."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def shingles_of(w: Column, k: int = SHINGLE_K) -> Column:
    """Word k-shingles from a WORDS COLUMN (1-based element_at, mirroring
    DuckDB 1-based list indexing so the oracle SQL is a transliteration).

    Takes a materialized column, not the raw text: Catalyst does NOT
    common-subexpression-eliminate inside higher-order functions, so
    inlining words(text) here would re-split the text once per shingle
    element — O(len²) per row (observed 75s vs <1s at sf0.1)."""
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Convenience wrapper for tests/small inputs — see shingles_of for
    the hot-path version that avoids re-splitting per element."""
    return shingles_of(words(text), k)


def with_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """docs + materialized `sh` column, fanned out across cores.

    The explicit repartition matters locally AND at scale: a handful of
    big parquet files under-parallelizes payload-heavy array work, and
    the shingle/minhash map is CPU-bound — fan out to the full
    parallelism before it, not after."""
    spark = docs.sparkSession
    return (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("w", words(F.col("text")))
        .withColumn("sh", shingles_of(F.col("w"), k))
        .drop("w")
    )


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """(content_hash, keeper_doc_id, n_dups) per distinct content."""
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Documents with exact duplicates removed (keep min doc_id)."""
    keep = exact_dedup_groups(docs).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def minhash_signatures(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): per-band minhash = min(md5(band|shingle)).

    Computed with array expressions only — no explode, so signature cost
    is O(shingles) per row with zero shuffle.
    """
    def _band_min(b: int) -> Column:
        # NB: the transform lambda must take exactly ONE parameter — a
        # two-arg lambda would receive the array index as its second arg.
        prefix = f"{b}|"
        return F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.md5(F.concat(F.lit(prefix), s).cast("binary")),
            )
        ).alias(f"mh{b}")

    return with_shingles(docs).select(
        "doc_id", *[_band_min(b) for b in range(n_bands)]
    )


def minhash_lsh_pairs(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any band bucket.

    band-bucket join is the LSH trick: at 10^8 docs the self-join is on
    (band, minhash) — high-cardinality uniform keys, shuffle-friendly;
    hot buckets (boilerplate docs) are exactly the pairs we want.
    """
    sig = minhash_signatures(docs, n_bands)
    buckets = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"mh{b}").alias("mh"))
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.mh").where(F.col("mh").isNotNull())
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mh") == F.col("b.mh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash32(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit parity simhash.

    bit_j(token) = parity of the j-th hex digit of md5(token); the doc
    fingerprint sets bit j iff Σ_tokens (±1) > 0.  One explode + one
    map-combined groupBy; the 32 sums ride a single aggregation.
    """
    spark = docs.sparkSession
    toks = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
        .withColumn("h", F.md5(F.col("tok").cast("binary")))
    )
    digit = lambda j: (  # noqa: E731
        F.instr(F.lit("0123456789abcdef"), F.substring("h", j + 1, 1)) - 1
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(digit(j) % 2 == 1, 1).otherwise(-1)).alias(f"b{j}")
            for j in range(32)
        ]
    )
    fp = None
    for j in range(32):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.05,
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """(doc_a, doc_b, jaccard): word-3-shingle Jaccard over blocked pairs.

    Pure relational: explode distinct shingles, self-join inside blocks,
    count |∩|, derive |∪| = na + nb − |∩|.  Blocking bounds the pair
    count; at scale swap block_cols for an LSH band key.
    """
    sh = (
        with_shingles(docs)
        .select("doc_id", *block_cols, F.explode("sh").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    common = (
        a.join(b, cond)
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
