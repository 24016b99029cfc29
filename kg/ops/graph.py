"""Graph utility operators beyond CC (SURVEY.md §2.3 J7, §4 "iterative
transitive closure").

Reference analog: pathwayContainsProcessNode (GKInstanceHelper.java:23-46)
recursively expands a pathway's containment set, and the encapsulated-
events computation (ReactomeBatchImporter.java:314-339) anti-joins the
diagram set against it.  Spark has no recursive CTE, so the closure is a
driver-side fixpoint of semi-naive iteration: each round joins the
frontier against the edge table, keeps only newly discovered pairs, and
localCheckpoints to truncate lineage — O(diameter) rounds, each a single
hash join on dst/src.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """edges(src, dst) → all reachability pairs (src, dst), src ≠ dst.

    Semi-naive: only the frontier (pairs found last round) is re-joined,
    so total work is O(|closure|), not O(rounds × |closure|).
    """
    closure = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    closure = closure.localCheckpoint()
    frontier = closure
    e = edges.select(F.col("src").alias("_m"), F.col("dst").alias("_d"))
    for _ in range(max_iter):
        new_pairs = (
            frontier.join(e, frontier["dst"] == e["_m"])
            .select("src", F.col("_d").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(closure, ["src", "dst"], "left_anti")
            .localCheckpoint()
        )
        if new_pairs.isEmpty():
            return closure
        closure = closure.unionByName(new_pairs).localCheckpoint()
        frontier = new_pairs
    raise RuntimeError(f"transitive_closure did not converge in {max_iter} rounds")


def reachable_pairs(
    roots: DataFrame,
    edges: DataFrame,
    root_col: str = "root",
    max_iter: int = 30,
) -> DataFrame:
    """Roots-restricted closure: (src=root, dst=node reachable from root),
    src ≠ dst, for the given root set ONLY.

    Same semi-naive fixpoint as transitive_closure, but the frontier is
    seeded from the roots' direct out-edges, so intermediate and final
    cardinality is O(Σ reach(root)) — bounded by what the consumer
    actually joins against — instead of the full O(V·avg-reach) pair
    explosion on deep/dense graphs.
    """
    e = edges.select(F.col("src").alias("_m"), F.col("dst").alias("_d"))
    seed = roots.select(F.col(root_col).alias("src")).distinct()
    closure = (
        seed.join(e, seed["src"] == e["_m"])
        .select("src", F.col("_d").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    frontier = closure
    for _ in range(max_iter):
        if frontier.isEmpty():
            return closure
        new_pairs = (
            frontier.join(e, frontier["dst"] == e["_m"])
            .select("src", F.col("_d").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(closure, ["src", "dst"], "left_anti")
            .localCheckpoint()
        )
        if new_pairs.isEmpty():
            return closure
        closure = closure.unionByName(new_pairs).localCheckpoint()
        frontier = new_pairs
    raise RuntimeError(f"reachable_pairs did not converge in {max_iter} rounds")


def encapsulated_set(
    candidates: DataFrame,
    containment_edges: DataFrame,
    root_col: str = "root",
    node_col: str = "node",
    max_iter: int = 30,
) -> DataFrame:
    """J7 (ReactomeBatchImporter.java:314-339): candidates(root, node)
    minus nodes already reachable from their root via containment edges —
    left_anti against the closure RESTRICTED to the candidate roots
    (identical result to anti-joining the full closure, since only pairs
    rooted at candidates can match, with bounded intermediates)."""
    closure = reachable_pairs(
        candidates.select(F.col(root_col).alias("root")),
        containment_edges,
        max_iter=max_iter,
    )
    return candidates.join(
        closure,
        (candidates[root_col] == closure["src"])
        & (candidates[node_col] == closure["dst"]),
        "left_anti",
    )


__all__ = ["transitive_closure", "reachable_pairs", "encapsulated_set"]
