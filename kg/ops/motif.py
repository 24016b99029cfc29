"""Graph motif operators over the edge table (graphframes-style patterns
expressed as plain relational joins — no library, no RDDs).

Reference contact: the reference's only graph analytics are containment
walks (GKInstanceHelper.java:23-46); motifs generalize that to pattern
matching on the materialized kg.edges table, the natural follow-on query
surface for a knowledge graph.

Scale notes: every motif below is a sequence of equi-joins on node ids —
shuffle-partitioned by the join key, AQE-skew-splittable, no driver
state.  Triangle counting uses the standard degree-ordered orientation
trick: orient each undirected edge from the lower-degree endpoint to the
higher (ties by id), which bounds every node's out-degree by O(√m) and
keeps the wedge join near-linear even on skewed (power-law) graphs —
the same reasoning as the salted-join treatment of Zipfian keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (least, greatest), no self-loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """(n_triangles): number of distinct triangles in the undirected graph.

    Degree-ordered orientation: e⁺ = edges oriented low-degree → high-
    degree endpoint; wedges = e⁺ ⋈ e⁺ on the middle node; a wedge closes
    iff its (u, w) pair is itself an oriented edge — one semi-join.  Each
    triangle is counted exactly once.
    """
    # the undirected set feeds 3 consumers and the oriented set 3 more;
    # without materialization Catalyst re-executes the whole upstream
    # lineage (incl. the caller's edge derivation) once per consumer —
    # measured 40 shuffles vs 7 on the lineitem co-occurrence graph
    und = undirect(edges).localCheckpoint()
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint()
    )
    w1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = w1.join(w2, "y").select("x", "z")
    closed = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("z")).unionByName(
            e.select(F.col("v").alias("x"), F.col("u").alias("z"))
        ),
        ["x", "z"],
        "inner",
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def two_hop_counts(edges: DataFrame) -> DataFrame:
    """(src, n_two_hop): distinct nodes reachable in exactly two directed
    hops (a)->(b)->(c), a ≠ c — the graphframes motif
    (a)-[]->(b); (b)-[]->(c)."""
    e1 = edges.select(F.col("src"), F.col("dst").alias("mid")).distinct()
    e2 = edges.select(F.col("src").alias("mid"), F.col("dst")).distinct()
    return (
        e1.join(e2, "mid")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("n_two_hop"))
    )


__all__ = ["undirect", "triangle_count", "two_hop_counts"]
