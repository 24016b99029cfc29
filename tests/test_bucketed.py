"""Bucketed stage writes: co-located joins read pre-hashed files and skip
the shuffle entirely (SURVEY.md §4 scale path; Iceberg bucket(N, col)
analog).  Catalog entries are namespaced per out_dir so concurrent
pipelines sharing a metastore can't clobber each other."""

from __future__ import annotations

import pandas as pd

from kg.lineage import write_stage_bucketed


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    a = spark.createDataFrame(
        pd.DataFrame({"src": [f"n{i % 50}" for i in range(2000)],
                      "v": range(2000)})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"src": [f"n{i % 60}" for i in range(1200)],
                      "w": range(1200)})
    )
    ma = write_stage_bucketed(a, str(tmp_path), "kgtest_bx_a", "snap", ["src"], 4)
    mb = write_stage_bucketed(b, str(tmp_path), "kgtest_bx_b", "snap", ["src"], 4)
    assert ma["n_buckets"] == mb["n_buckets"] == 4
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ma["table"]).join(spark.table(mb["table"]), "src")
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides are bucket scans: SortMergeJoin with ZERO exchanges
        assert "Exchange" not in plan, plan
        assert n == a.join(b, "src").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {ma['table']}")
        spark.sql(f"DROP TABLE IF EXISTS {mb['table']}")


def test_bucketed_manifest_and_resume_marker(spark, tmp_path):
    from kg.lineage import stage_is_complete

    df = spark.createDataFrame(pd.DataFrame({"src": ["a", "b"], "v": [1, 2]}))
    m = write_stage_bucketed(df, str(tmp_path), "kgtest_bx_c", "snapX", ["src"], 2)
    try:
        assert m["rows"] == 2 and m["bucket_by"] == ["src"]
        assert stage_is_complete(str(tmp_path), "kgtest_bx_c", "snapX")
        assert not stage_is_complete(str(tmp_path), "kgtest_bx_c", "snapY")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {m['table']}")


def test_bucketed_two_out_dirs_dont_clobber(spark, tmp_path):
    """Same stage name into two out_dirs → two distinct catalog entries,
    each still readable with its own data (the un-namespaced version
    repointed one shared entry and silently dropped the first table)."""
    d1, d2 = tmp_path / "run1", tmp_path / "run2"
    a = spark.createDataFrame(pd.DataFrame({"src": ["a"], "v": [1]}))
    b = spark.createDataFrame(pd.DataFrame({"src": ["b", "c"], "v": [2, 3]}))
    m1 = write_stage_bucketed(a, str(d1), "kgtest_bx_ns", "s1", ["src"], 2)
    m2 = write_stage_bucketed(b, str(d2), "kgtest_bx_ns", "s2", ["src"], 2)
    try:
        assert m1["table"] != m2["table"]
        assert spark.table(m1["table"]).count() == 1
        assert spark.table(m2["table"]).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {m1['table']}")
        spark.sql(f"DROP TABLE IF EXISTS {m2['table']}")
