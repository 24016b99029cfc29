"""Incremental / streaming ingestion (SURVEY.md §2.9).

The reference is strictly one-shot batch (ReactomeBatchImporter.importAll,
RBI:138-175).  This module adds what its architecture cannot: incremental
graph construction over an append-only transcript feed, using Structured
Streaming:

- transcript_stream: file-source stream over a growing parquet directory
  (stand-in for Kafka/Iceberg-CDC at deployment).
- windowed_mention_counts: a native streaming aggregation — watermarked
  event-time windows over mention counts (late turns beyond the watermark
  are dropped, exactly the at-most-once-per-window semantics wanted for
  monitoring dashboards).
- run_incremental: foreachBatch pipeline — each micro-batch runs the
  batch stages (extract → link → canonicalize) and appends canonical
  triples partitioned by epoch; edges are (re)built by build_edges over
  the accumulated triples (stoichiometry/order are corpus-global
  aggregates, so the final agg is a batch compaction — same shape as the
  reference's deferred-constraints phase).  foreachBatch + epoch-keyed
  overwrite gives exactly-once per micro-batch on retry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.canonicalize import apply_canonical_map, connected_components
from kg.extract import extract_triples
from kg.link import link_triples
from kg.materialize import build_edges
from kg.schema import TRANSCRIPTS_SCHEMA


def transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def windowed_mention_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked event-time windowed mention counts (pure built-ins —
    regexp_extract_all is streaming-safe, no Python)."""
    m = (
        stream.withWatermark("ts", watermark)
        .select(
            "ts",
            F.explode(
                F.regexp_extract_all("text", F.lit(r"\[\[(.*?)\]\]"), 1)
            ).alias("surface"),
        )
        .where(F.trim("surface") != "")
    )
    return m.groupBy(F.window("ts", window), "surface").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    catalog: DataFrame,
    alias_pairs: DataFrame,
    out_dir: str,
) -> dict:
    """Drain everything currently in input_dir through the pipeline
    incrementally (availableNow trigger), then compact to edges.

    Returns {"epochs": n, "edges": DataFrame}.  A restarted run resumes
    from the checkpoint (offsets) — unprocessed files only.
    """
    triples_dir = os.path.join(out_dir, "canonical_triples_stream")
    checkpoint = os.path.join(out_dir, "_checkpoint")
    mapping = connected_components(alias_pairs)
    epochs: list[int] = []

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        raw = extract_triples(batch_df)
        linked = link_triples(raw, catalog)
        canonical = apply_canonical_map(linked, mapping)
        # epoch-keyed dynamic-partition overwrite ⇒ idempotent on retry
        (canonical.withColumn("epoch", F.lit(epoch_id))
         .write.mode("overwrite")
         .partitionBy("epoch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(triples_dir))
        epochs.append(int(epoch_id))

    q = (
        transcript_stream(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    triples = spark.read.parquet(triples_dir).drop("epoch")
    return {"epochs": len(epochs), "edges": build_edges(triples)}


__all__ = ["transcript_stream", "windowed_mention_counts", "run_incremental"]
