"""Stage-3 CC unit tests (SURVEY.md §5: CC on known graphs — chain, star,
two components, symmetric duplicate, self-loop)."""

from __future__ import annotations

from kg.canonicalize import connected_components
from kg.oracle import oracle_components


def _cc(spark, pairs):
    df = spark.createDataFrame([(a, b, "sameAs") for a, b in pairs],
                               "src string, dst string, kind string")
    return {r["node"]: r["canonical_id"] for r in connected_components(df).collect()}


def test_chain(spark):
    m = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert m == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_star(spark):
    m = _cc(spark, [("k", "a"), ("k", "b"), ("k", "c")])
    assert m == {"k": "a", "a": "a", "b": "a", "c": "a"}


def test_two_components(spark):
    m = _cc(spark, [("a", "b"), ("x", "y")])
    assert m == {"a": "a", "b": "a", "x": "x", "y": "x"}


def test_symmetric_duplicate_pair(spark):
    m = _cc(spark, [("a", "b"), ("b", "a")])
    assert m == {"a": "a", "b": "a"}


def test_self_loop_only(spark):
    m = _cc(spark, [("z", "z")])
    assert m == {"z": "z"}


def test_long_path_converges_logarithmically(spark):
    # path of 40 nodes: min-label propagation would need ~40 rounds;
    # large-star/small-star must do it within the 25-iteration cap.
    nodes = [f"n{i:03d}" for i in range(40)]
    m = _cc(spark, list(zip(nodes, nodes[1:])))
    assert set(m.values()) == {"n000"}


def test_matches_oracle_on_synthetic(spark, alias_pairs_df, alias_pairs_pdf):
    got = {r["node"]: r["canonical_id"]
           for r in connected_components(alias_pairs_df).collect()}
    assert got == oracle_components(alias_pairs_pdf)
