"""Explicit skew handling (north_rule: "partitioning / shuffle / skew
handled explicitly"; SURVEY.md §4 "custom: salted join for hot keys").

AQE's skew-join splitting is the first line of defense (enabled in
kg/session.py).  This module is the second line for the cases AQE can't
fix — aggregations and joins where one key carries a Zipfian head so
heavy that a single reducer would own it:

- key_frequency_sketch: one cheap pass (map-side-combined count) that
  returns keys above a frequency threshold — the "hot set".
- salted_aggregate: two-phase count aggregation; ONLY hot keys get a
  salt (pmod of xxhash64 over the whole row), cold keys keep salt 0, so
  the pre-aggregation shuffle stays minimal and the second phase
  re-aggregates at most |hot| × n_salts rows.
- salt_hot_keys / explode_hot_build: the join-side primitives — probe
  rows of hot keys get a random-ish deterministic salt; the build side
  replicates ONLY its hot-key rows ×K (cold rows keep salt 0), so
  memory overhead is |hot ∩ build| × K, not |build| × K.

Everything is deterministic (hash-derived salts), so results are
reproducible across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_frequency_sketch(
    df: DataFrame, key_col: str, min_share: float = 0.001, max_keys: int = 1000
) -> list:
    """Keys whose frequency exceeds min_share of the table (bounded list).

    ONE full scan (r6): the r5 form paid a df.count() pass for the total
    and then a second full scan for the per-key counts; the total is the
    sum of the grouped counts, so both actions now read the same
    persisted per-key aggregate (size = |distinct keys|, already the
    r5 shuffle's size) and the input is scanned once.  The result stays
    driver-sized by construction (≤ 1/min_share keys can exceed the
    share); the aggregate is unpersisted before returning."""
    grouped = (
        df.groupBy(key_col).agg(F.count(F.lit(1)).alias("count")).persist()
    )
    try:
        total = grouped.agg(F.sum("count").alias("t")).collect()[0]["t"] or 0
        if total == 0:
            return []
        threshold = max(1, int(total * min_share))
        rows = (
            grouped.where(F.col("count") >= threshold)
            .orderBy(F.desc("count"))
            .limit(max_keys)
            .collect()
        )
    finally:
        grouped.unpersist()
    return [r[key_col] for r in rows]


def _salt_col(df_cols: list[str], n_salts: int) -> Column:
    """Deterministic per-row salt from the full row content."""
    return F.pmod(F.xxhash64(*df_cols), F.lit(n_salts)).cast("int")


def salt_hot_keys(
    df: DataFrame,
    key_col: str,
    hot_keys: list,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Probe side: hot-key rows get salt ∈ [0, n_salts); cold rows salt 0.
    ``salt_cols`` narrows the columns the salt hashes (default: whole
    row) so column pruning can reach the scan — any deterministic
    derivation yields the same join/aggregate RESULTS, only the row→salt
    assignment differs."""
    is_hot = F.col(key_col).isin(hot_keys) if hot_keys else F.lit(False)
    return df.withColumn(
        "_salt",
        F.when(is_hot, _salt_col(salt_cols or df.columns, n_salts)).otherwise(
            F.lit(0)
        ),
    )


def explode_hot_build(
    build: DataFrame, key_col: str, hot_keys: list, n_salts: int = 16
) -> DataFrame:
    """Build side: replicate ONLY hot-key rows across all salts."""
    is_hot = F.col(key_col).isin(hot_keys) if hot_keys else F.lit(False)
    salts = F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
        F.array(F.lit(0))
    )
    # generators can't nest in expressions — explode first, cast after
    return build.withColumn("_salt", F.explode(salts)).withColumn(
        "_salt", F.col("_salt").cast("int")
    )


def skew_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    how: str = "inner",
    min_share: float = 0.001,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join on key_col with targeted hot-key salting.

    Result is identical to probe.join(build, key_col, how) — asserted in
    tests — but no reducer receives more than ~1/n_salts of any hot key.

    Only probe-side-preserving join types are valid: build-side-preserving
    shapes (right/full outer) would replicate unmatched hot BUILD rows
    n_salts times (explode_hot_build copies them per salt), yielding
    n_salts duplicate null-extended rows instead of one.
    """
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"skew_join supports probe-preserving joins only {sorted(allowed)}, got {how!r}"
        )
    hot = key_frequency_sketch(probe, key_col, min_share)
    p = salt_hot_keys(probe, key_col, hot, n_salts)
    b = explode_hot_build(build, key_col, hot, n_salts)
    return p.join(b, [key_col, "_salt"], how).drop("_salt")


def salted_aggregate_counts(
    df: DataFrame,
    key_col: str,
    min_share: float = 0.001,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """groupBy(key).count() with two-phase aggregation over salted hot
    keys: phase 1 aggregates (key, salt), phase 2 sums per key.  Same
    result as the direct groupBy — the point is that phase 1 spreads a
    hot key over n_salts reducers (for count, Spark's own partial
    aggregation already achieves this; the pattern matters for
    high-cardinality payload aggs like collect_list/distinct sets).

    ``salt_cols`` (r6): columns the deterministic salt hashes.  The
    default (all columns) forces the scan to read the FULL row just to
    derive a salt the result does not depend on — the r5 plan's
    ReadSchema listed every column.  Passing a narrow high-variance
    subset (an id column) prunes the scan to key + salt inputs; the
    counts are identical for ANY deterministic salt derivation.
    """
    hot = key_frequency_sketch(df, key_col, min_share)
    salted = salt_hot_keys(df, key_col, hot, n_salts, salt_cols)
    phase1 = salted.groupBy(key_col, "_salt").agg(F.count(F.lit(1)).alias("c"))
    return phase1.groupBy(key_col).agg(F.sum("c").cast("long").alias("count"))


__all__ = [
    "key_frequency_sketch",
    "salt_hot_keys",
    "explode_hot_build",
    "skew_join",
    "salted_aggregate_counts",
]
