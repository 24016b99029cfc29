"""Streaming/incremental tests: availableNow drain ≡ batch pipeline;
watermarked windowed agg; checkpoint resume picks up only new files."""

from __future__ import annotations

import os

import pandas as pd

from kg.pipeline import run_pipeline
from kg.streaming import run_incremental, transcript_stream, windowed_mention_counts


def _edges_key(df) -> pd.DataFrame:
    key = ["src", "dst", "rel_type", "stoichiometry", "order"]
    return df.toPandas()[key].sort_values(key).reset_index(drop=True)


def _write_chunks(transcripts_pdf, path, n_chunks=3):
    os.makedirs(path, exist_ok=True)
    convs = sorted(transcripts_pdf["conv_id"].unique())
    per = len(convs) // n_chunks + 1
    for i in range(n_chunks):
        chunk_convs = set(convs[i * per:(i + 1) * per])
        chunk = transcripts_pdf[transcripts_pdf["conv_id"].isin(chunk_convs)]
        if len(chunk):
            chunk.to_parquet(
                os.path.join(path, f"chunk_{i}.parquet"), index=False,
                coerce_timestamps="us", allow_truncated_timestamps=True,
            )


def test_incremental_equals_batch(
    spark, transcripts_pdf, transcripts_df, catalog_df, alias_pairs_df, tmp_path
):
    stream_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "out")
    _write_chunks(transcripts_pdf, stream_dir)

    inc = run_incremental(spark, stream_dir, catalog_df, alias_pairs_df, out_dir)
    assert inc["epochs"] >= 1
    batch = run_pipeline(spark, transcripts_df, catalog_df, alias_pairs_df)
    assert _edges_key(inc["edges"]).equals(_edges_key(batch["edges"]))


def test_incremental_resume_processes_only_new_files(
    spark, transcripts_pdf, catalog_df, alias_pairs_df, tmp_path
):
    stream_dir = str(tmp_path / "feed2")
    out_dir = str(tmp_path / "out2")
    half = transcripts_pdf[transcripts_pdf["conv_id"] < "conv-000030"]
    rest = transcripts_pdf[transcripts_pdf["conv_id"] >= "conv-000030"]
    _write_chunks(half, stream_dir, n_chunks=1)
    first = run_incremental(spark, stream_dir, catalog_df, alias_pairs_df, out_dir)
    n_first = first["edges"].count()

    # new file arrives; restart drains ONLY it (checkpoint offsets)
    rest.to_parquet(os.path.join(stream_dir, "late.parquet"), index=False,
                    coerce_timestamps="us", allow_truncated_timestamps=True)
    second = run_incremental(spark, stream_dir, catalog_df, alias_pairs_df, out_dir)
    assert second["edges"].count() > n_first


def test_windowed_mention_counts_memory_sink(spark, transcripts_pdf, tmp_path):
    stream_dir = str(tmp_path / "feed3")
    _write_chunks(transcripts_pdf, stream_dir, n_chunks=2)
    agg = windowed_mention_counts(transcript_stream(spark, stream_dir))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("mention_counts").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.sql("SELECT sum(n_mentions) AS n FROM mention_counts").collect()[0]["n"]
    import re
    exp = sum(
        1
        for t in transcripts_pdf["text"]
        for m in re.findall(r"\[\[(.*?)\]\]", t)
        if m.strip()
    )
    assert out == exp
