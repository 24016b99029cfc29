"""Bounded driver-side row-count probes (r6).

Several operators dispatch on input size (extract auto impl, the CC
driver/distributed split, broadcast gates).  The r5 probe was always a
``df.limit(thr + 1).count()`` job — bounded, but a full Spark job with
scheduler latency, measured as a visible slice of the pipeline wall at
bench scale (~0.3s per probe).  Two cases need no job at all:

- a PLAIN parquet scan (optimized plan is a bare LogicalRelation, so no
  filter/projection can change the row count): sum the parquet FOOTER
  row counts driver-side, early-exiting once past the threshold;
- a LOCAL relation (e.g. a mapping built by the driver union-find): the
  row count is already in the plan.

Anything else — or any error — falls back to the bounded limit+count
job, so the probe is never wrong, only sometimes cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rows_at_most(df: DataFrame, thr: int) -> bool:
    """True iff df has at most ``thr`` rows (bounded probe)."""
    try:
        jplan = df._jdf.queryExecution().optimizedPlan()
        kind = jplan.getClass().getSimpleName()
        if kind == "LocalRelation":
            return jplan.data().size() <= thr
        if kind == "LogicalRelation":
            files = df.inputFiles()
            if files and all(f.endswith(".parquet") for f in files):
                import pyarrow.parquet as pq

                total = 0
                for f in files:
                    local = f[len("file:"):] if f.startswith("file:") else f
                    total += pq.read_metadata(local).num_rows
                    if total > thr:
                        return False
                return True
    except Exception:
        pass
    return df.limit(thr + 1).count() <= thr


__all__ = ["rows_at_most"]
