"""Transitive closure / encapsulated-set tests (J7 + the iterative-closure
row of SURVEY §4)."""

from __future__ import annotations

from kg.ops.graph import encapsulated_set, reachable_pairs, transitive_closure


def _tc(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {(r["src"], r["dst"]) for r in transitive_closure(df).collect()}


def test_chain_closure(spark):
    got = _tc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "c"), ("b", "d"), ("c", "d")}


def test_dag_with_diamond(spark):
    got = _tc(spark, [("r", "x"), ("r", "y"), ("x", "z"), ("y", "z")])
    assert got == {("r", "x"), ("r", "y"), ("r", "z"), ("x", "z"), ("y", "z")}


def test_cycle_terminates(spark):
    got = _tc(spark, [("a", "b"), ("b", "a")])
    assert got == {("a", "b"), ("b", "a")}  # self-pairs excluded


def test_encapsulated_set_anti_join(spark):
    # diagram references (root, node); containment: r contains x contains y.
    containment = spark.createDataFrame(
        [("r", "x"), ("x", "y")], "src string, dst string"
    )
    candidates = spark.createDataFrame(
        [("r", "y"),   # already contained (transitively) → dropped
         ("r", "q")],  # not contained → encapsulated
        "root string, node string",
    )
    got = {(r["root"], r["node"])
           for r in encapsulated_set(candidates, containment).collect()}
    assert got == {("r", "q")}


def test_reachable_pairs_restricted_to_roots(spark):
    """Roots-restricted closure = full closure filtered to src ∈ roots."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "d")]
    e = spark.createDataFrame(edges, "src string, dst string")
    roots = spark.createDataFrame([("a",), ("x",)], "root string")
    got = {(r["src"], r["dst"]) for r in reachable_pairs(roots, e).collect()}
    full = {(r["src"], r["dst"]) for r in transitive_closure(e).collect()}
    assert got == {p for p in full if p[0] in ("a", "x")}


def test_encapsulated_on_deep_chain_bounded(spark):
    """Deep chain (60 nodes): the restricted closure stays linear in the
    root's reach (N-1 pairs) where the full closure is quadratic
    (N·(N-1)/2) — identical encapsulated output either way."""
    n = 60
    chain = [(f"v{i:02d}", f"v{i+1:02d}") for i in range(n - 1)]
    e = spark.createDataFrame(chain, "src string, dst string")
    candidates = spark.createDataFrame(
        [("v00", f"v{n-1:02d}"),   # reachable → dropped
         ("v00", "zz")],           # not contained → encapsulated
        "root string, node string",
    )
    got = {(r["root"], r["node"])
           for r in encapsulated_set(candidates, e, max_iter=n + 5).collect()}
    assert got == {("v00", "zz")}
    roots = candidates.select("root").distinct()
    restricted = reachable_pairs(roots, e, max_iter=n + 5).count()
    assert restricted == n - 1                     # linear, not n*(n-1)/2
    assert transitive_closure(e, max_iter=n + 5).count() == n * (n - 1) // 2


def test_pagerank_two_node_cycle_is_stationary(spark):
    from kg.ops.graph import PR_SCALE, pagerank

    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = {r["node"]: r["pr_scaled"] for r in pagerank(e, n_iter=10).collect()}
    # uniform 1/2 is the stationary distribution; integer arithmetic keeps
    # it exactly (base + 85% of half == half)
    assert got == {"a": PR_SCALE // 2, "b": PR_SCALE // 2}


def test_pagerank_sink_absorbs_rank(spark):
    from kg.ops.graph import pagerank

    # star into a sink: the sink must outrank every spoke
    e = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        "src string, dst string",
    )
    got = {r["node"]: r["pr_scaled"] for r in pagerank(e, n_iter=10).collect()}
    assert got["hub"] > got["s2"] and got["hub"] > got["s3"]
    # total mass stays positive and ≤ 1.0 (dangling mass is dropped)
    from kg.ops.graph import PR_SCALE

    assert 0 < sum(got.values()) <= PR_SCALE


def test_pagerank_partitioning_invariant(spark):
    import random

    from kg.ops.graph import pagerank

    rng = random.Random(3)
    edges = [(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(200)]
    e = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, pagerank(e, n_iter=8).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13), n_iter=8).collect()))
    assert a == b  # bitwise identical: fixed-point arithmetic, no float sums
