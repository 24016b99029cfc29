"""Live progress counters (A6): StatusTracker polling during real jobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg.progress import ProgressReporter


def test_reporter_observes_stages_and_counts(spark):
    lines: list[str] = []
    df = spark.range(0, 2_000_000, 1, 16).withColumn(
        "h", F.md5(F.col("id").cast("string").cast("binary"))
    )
    with ProgressReporter(spark, interval=0.02, sink=lines.append) as rep:
        df.groupBy(F.substring("h", 1, 2)).count().count()
        df.agg(F.max("h")).collect()
    assert rep.snapshots, "no snapshots captured during a multi-stage job"
    seen_tasks = {
        (s.stage_id, s.num_tasks) for snap in rep.snapshots for s in snap.stages
    }
    assert any(n > 0 for _, n in seen_tasks)
    assert rep.total_tasks_seen() > 0
    # rendered lines look like the reference's bar (ProgressBarUtils.java)
    assert lines and all("|" in ln and "%" in ln for ln in lines)
    # counters are monotone per stage across snapshots
    last: dict[int, int] = {}
    for snap in rep.snapshots:
        for s in snap.stages:
            assert s.num_completed >= last.get(s.stage_id, 0)
            last[s.stage_id] = s.num_completed


def test_reporter_stop_is_idempotent_and_restartable(spark):
    rep = ProgressReporter(spark, interval=0.05)
    rep.start()
    rep.stop()
    rep.stop()
    rep.start()
    spark.range(1000).count()
    rep.stop()
