"""Transitive closure / encapsulated-set tests (J7 + the iterative-closure
row of SURVEY §4)."""

from __future__ import annotations

from kg.ops.graph import encapsulated_set, transitive_closure


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
