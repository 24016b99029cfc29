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


PR_SCALE = 10**12  # fixed-point unit: 1.0 of rank mass == 10^12


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping_pct: int = 85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over edges(src, dst) →
    (node, pr_scaled, pagerank).

    **Fixed-point integer arithmetic end-to-end**: ranks live as BIGINT
    multiples of 1/PR_SCALE.  Every step is integer division (`div`) and
    an exact integer sum, so the result is bitwise identical across
    partitionings, retries, engines, and shuffle orders — a double-based
    PageRank is NOT (float addition is order-sensitive, and 10 iterations
    amplify the divergence).  That's what makes the DuckDB oracle an
    exact value-hash match, and what a resumable 100-TB pipeline needs
    from any iterative kernel it re-runs.

    Semantics: r_0 = PR_SCALE div N;
    r_{i+1}(v) = base + (damping_pct · Σ_{u→v} r_i(u) div outdeg(u)) div 100
    with base = ((100-damping_pct) · PR_SCALE) div (100·N).  Mass from
    dangling nodes (no out-edges) is dropped, not redistributed — the
    classic simplified formulation (Spark's own PageRank example does the
    same); totals therefore sum to slightly under PR_SCALE on graphs with
    sinks.

    Scale shape: the edge table is hash-partitioned on src ONCE and
    persisted; each iteration re-joins ranks on that same key (one
    shuffle of the small rank table per round, the big edge table never
    moves again), then aggregates contributions map-combined on dst.
    Lineage is truncated every `checkpoint_every` rounds.
    """
    spark = edges.sparkSession
    parts = spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .repartition(parts, "src")
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # degree rides the same src partitioning; joining it onto the edges
    # once keeps the per-iteration plan to a single rank join
    ed = e.join(deg, "src").select("src", "dst", "od").persist()
    ed.count()  # eager fill (broadcast/lazy-persist race, see kg/link.py)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        ed.unpersist()
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("pr_scaled"),
            F.lit(0.0).alias("pagerank"),
        )
    base = ((100 - damping_pct) * PR_SCALE) // (100 * n)
    ranks = nodes.select("node", F.lit(PR_SCALE // n).cast("long").alias("r"))
    for i in range(n_iter):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("r div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
            ).cast("long").alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
    out = ranks.select(
        "node",
        F.col("r").alias("pr_scaled"),
        F.round(F.col("r") / F.lit(float(PR_SCALE)), 12).alias("pagerank"),
    )
    e.unpersist()
    ed.unpersist()
    nodes.unpersist()
    return out


def pagerank_sql(
    edges_cte: str,
    n_iter: int = 10,
    damping_pct: int = 85,
    emit_double: bool = True,
) -> str:
    """DuckDB transliteration of pagerank(): chained CTEs r0..r{n} (no
    recursion needed for a FIXED iteration count), same integer ops.
    ``edges_cte`` must define a relation named ``e`` with (src, dst).
    emit_double=False omits the derived double column — the fixed-point
    BIGINT is the engine-exact value; a 12dp double round can differ in
    the last digit between rounding implementations."""
    scale = PR_SCALE
    base = (
        f"(({100 - damping_pct} * {scale}::BIGINT)"
        f" // (100 * (SELECT count(*) FROM pr_nodes)))"
    )
    ctes = [
        edges_cte,
        """pr_nodes AS (SELECT DISTINCT node FROM (
             SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "pr_deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1)",
        "pr_ed AS (SELECT e.src, e.dst, d.od FROM e JOIN pr_deg d ON d.src = e.src)",
        f"""r0 AS (SELECT node,
               ({scale}::BIGINT // (SELECT count(*) FROM pr_nodes)) AS r
             FROM pr_nodes)""",
    ]
    for i in range(n_iter):
        ctes.append(f"""r{i + 1} AS (
          SELECT n.node,
                 CAST({base} + ({damping_pct} * coalesce(s.s, 0)) // 100
                      AS BIGINT) AS r
          FROM pr_nodes n
          LEFT JOIN (SELECT dst, sum(r.r // ed.od) AS s
                     FROM pr_ed ed JOIN r{i} r ON r.node = ed.src
                     GROUP BY 1) s ON s.dst = n.node)""")
    tail = (
        f", round(r / {float(scale)!r}, 12) AS pagerank" if emit_double else ""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS pr_scaled{tail} FROM r{n_iter}"
    )


__all__ = [
    "transitive_closure",
    "reachable_pairs",
    "encapsulated_set",
    "pagerank",
    "pagerank_sql",
]
