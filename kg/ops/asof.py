"""Event-time AS-OF join (the temporal join training-data pipelines use
to attach the latest-known dimension state to each event: features as of
interaction time, catalog version as of transcript time — see
kg/ops/merge.scd2_as_of for the snapshot flavor).

Spark has no ASOF JOIN operator; the scalable formulation is the
union-and-carry trick, NOT a range join:

    tag left/right → union on (by, ts) → one window per `by` ordered by
    (ts, tag) carrying last(right-row STRUCT, ignoreNulls) → keep left
    (one struct per right row, so null right attributes stay null and all
    attributes come from the same right row)

Cost: ONE shuffle on `by` + one sort — same plan shape as any windowed
aggregation, no O(|L|·|R|) candidate pairs, no per-key skew beyond what
AQE handles.  A broadcast-range join (each left row probes all right
rows of its key) blows up on hot keys; the carry is linear in |L|+|R|.

Tie semantics match DuckDB/kdb ASOF: right.ts <= left.ts (inclusive) —
right rows sort BEFORE left rows at equal ts.  Right must be unique per
(by, ts); pre-aggregate it if not (asof_join asserts nothing — dedup is
the caller's statement of which row wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Left as-of join: every left row + the right row's attributes with
    the greatest right.ts <= left.ts within the same `by` keys (nulls
    where no right row precedes).  Right attribute columns must not
    collide with left's (rename before calling)."""
    from pyspark.sql import types as T

    val_cols = [c for c in right.columns if c not in (*by, ts_col)]
    # carry ONE struct of all right value columns, not each column
    # independently: per-column last(ignorenulls) would resurrect a stale
    # value when a right row's attribute is genuinely NULL (and could mix
    # attributes from different right rows).  The struct is non-null for
    # every right row, so the carry picks whole rows — row-level ASOF
    # semantics matching pandas merge_asof / DuckDB even with null attrs.
    rv_type = T.StructType([right.schema[c] for c in val_cols])
    lt = left.select(
        *left.columns, F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rt = right.select(
        *by, F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (*by, ts_col)],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in val_cols]).alias("_rv"),
    ).select(*lt.columns)  # align column order for the union
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col("_rv")[c].alias(c) for c in val_cols],
    )


__all__ = ["asof_join"]
