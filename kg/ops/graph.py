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


def encapsulated_set(
    candidates: DataFrame,
    containment_edges: DataFrame,
    root_col: str = "root",
    node_col: str = "node",
) -> DataFrame:
    """J7 (ReactomeBatchImporter.java:314-339): candidates(root, node)
    minus nodes already reachable from their root via containment edges —
    left_anti against the transitive closure."""
    closure = transitive_closure(containment_edges)
    return candidates.join(
        closure,
        (candidates[root_col] == closure["src"])
        & (candidates[node_col] == closure["dst"]),
        "left_anti",
    )


__all__ = ["transitive_closure", "encapsulated_set"]
