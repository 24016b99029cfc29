"""Skew-handling tests: targeted salting preserves semantics and actually
spreads the hot key (SURVEY.md §7 risk 6: the salting path must be
exercised by genuinely Zipfian data, not dead code)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kg.skew import (
    explode_hot_build,
    key_frequency_sketch,
    salt_hot_keys,
    salted_aggregate_counts,
    skew_join,
)


def _zipf_df(spark, n=20000, hot_share=0.4, seed=0):
    """One brutally hot key (40% of rows) + a uniform tail."""
    rng = np.random.RandomState(seed)
    keys = np.where(
        rng.rand(n) < hot_share, "HOT", rng.randint(0, 500, n).astype(str)
    )
    pdf = pd.DataFrame({"k": keys, "v": rng.randint(0, 100, n)})
    return spark.createDataFrame(pdf)


def test_frequency_sketch_finds_hot_key(spark):
    df = _zipf_df(spark)
    hot = key_frequency_sketch(df, "k", min_share=0.05)
    assert hot == ["HOT"]


def test_skew_join_equals_plain_join(spark):
    probe = _zipf_df(spark)
    build = spark.createDataFrame(
        pd.DataFrame({"k": ["HOT"] + [str(i) for i in range(500)],
                      "label": ["h"] + [f"l{i}" for i in range(500)]})
    )
    plain = probe.join(build, "k").groupBy("k", "label").count()
    salted = skew_join(probe, build, "k").groupBy("k", "label").count()
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_hot_key_actually_spreads(spark):
    probe = _zipf_df(spark)
    hot = key_frequency_sketch(probe, "k", min_share=0.05)
    salted = salt_hot_keys(probe, "k", hot, n_salts=16)
    per_salt = (
        salted.where(F.col("k") == "HOT").groupBy("_salt").count().collect()
    )
    assert len(per_salt) == 16  # all salt buckets used
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts) * 0.25  # no bucket owns the key
    # cold keys stay unsalted (no shuffle inflation for the tail)
    assert salted.where((F.col("k") != "HOT") & (F.col("_salt") != 0)).count() == 0


def test_build_replication_bounded(spark):
    build = spark.createDataFrame(
        pd.DataFrame({"k": ["HOT"] + [str(i) for i in range(500)],
                      "label": ["h"] + [f"l{i}" for i in range(500)]})
    )
    exploded = explode_hot_build(build, "k", ["HOT"], n_salts=16)
    # only the single hot row is replicated ×16; 500 cold rows stay ×1
    assert exploded.count() == 16 + 500


def test_salted_aggregate_matches_direct(spark):
    df = _zipf_df(spark)
    direct = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"]
              for r in salted_aggregate_counts(df, "k", min_share=0.05).collect()}
    assert direct == salted


def test_skew_join_rejects_build_preserving(spark):
    """right/full outer would duplicate unmatched hot build rows ×n_salts."""
    import pytest

    probe = _zipf_df(spark, n=200)
    build = spark.createDataFrame(pd.DataFrame({"k": ["HOT"], "label": ["h"]}))
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError):
            skew_join(probe, build, "k", how=how)


def test_skew_join_left_anti_matches_plain(spark):
    probe = _zipf_df(spark)
    build = spark.createDataFrame(
        pd.DataFrame({"k": ["HOT", "7", "13"], "label": ["h", "a", "b"]})
    )
    plain = probe.join(build.select("k"), "k", "left_anti")
    salted = skew_join(probe, build.select("k"), "k", how="left_anti")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
