"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline.  Dot products run
  as F.aggregate over F.zip_with — a sequential JVM fold, deterministic
  (bitwise-reproducible, unlike a shuffled sum), codegen'd, no Python.
- LSH-bucketed variant (sign random projection): the scale path — at
  10^9 vectors the cross join is impossible; hyperplanes are derived
  deterministically from xxhash64 so every executor materializes the
  same planes with zero coordination, probes only join their bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential fold — index order, no shuffle reorder."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """(probe_id, neighbor_id, rank, cos_sim): exact cosine top-k.

    probes × corpus via broadcast of the (tiny) probe side — the corpus
    is scanned once, no shuffle of the big side; ranking is a window on
    probe_id (reuses the broadcast-join partitioning under AQE).
    Ties broken on neighbor_id after rounding to 6dp so results are
    engine-independent.
    """
    e = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    probes = e.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    scored = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("pv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cos_sim")
    )


def _hyperplane(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a splitmix-style hash —
    pure arithmetic, identical on every executor and run."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = (p * 1_000_003 + d) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 31)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 29)) & 0xFFFFFFFFFFFFFFFF
            row.append((x / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit p = sign(dot(v, plane_p))."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, plane_col) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket,
    then exact cosine re-rank.  2^n_planes buckets ⇒ the candidate join
    touches ~1/2^n_planes of the corpus per probe."""
    planes = _hyperplane(dim, n_planes)
    e = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    probes = e.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("bucket").alias("pbucket"),
    )
    cand = e.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("pbucket")) & (F.col("vec_id") != F.col("probe_id")),
    )
    scored = cand.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("pv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    block_col: str | None = None,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """(vec_a, vec_b, cos_sim): embedding-cosine near-duplicate pairs.

    The dedup flavor of similarity search: pairs above a cosine threshold
    are duplicate candidates.  DEFAULT blocking (block_col=None) is the
    sign-random-projection bucket from lsh_bucket — an actual geometric
    quantization whose bucket population shrinks as ~1/2^n_planes of the
    corpus, so the per-block self-join stays bounded at any scale.  A
    metadata column (label/source) is an explicit opt-in only: one label
    value can be corpus-sized, which re-creates the quadratic join.
    """
    if block_col is None:
        planes = _hyperplane(dim, n_planes)
        e = embeddings.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        ).withColumn("_blk", lsh_bucket(F.col("v"), planes))
    else:
        e = embeddings.select(
            "vec_id",
            F.col(block_col).alias("_blk"),
            as_double(F.col("embedding")).alias("v"),
        )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a._blk") == F.col("b._blk")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
