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


def test_incremental_alias_dir_refreshes_between_batches(spark, tmp_path):
    """Path-based alias source: a pair appended between two incremental
    runs must merge from the next batch on (the static-DataFrame variant
    would keep linking against the stale mapping)."""
    import datetime as dt

    def _t(conv, idx, text):
        return (conv, idx, "user", text, None, dt.datetime(2025, 1, 1))

    tcols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def _write_turns(rows, path):
        pdf = pd.DataFrame(rows, columns=tcols)
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["tool"] = pdf["tool"].astype("string")
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)

    feed = tmp_path / "afeed"; feed.mkdir()
    adir = tmp_path / "aliases"; adir.mkdir()
    out = str(tmp_path / "aout")
    catalog = spark.createDataFrame(
        [], "entity_id string, canonical_name string, aliases array<string>, "
            "blocking_key string, prefix string, entity_type string, freq_hint double",
    )
    _write_turns([_t("c1", 0, "link [[X]] and [[Y]] here")], str(feed / "b1.parquet"))
    pd.DataFrame([("p", "q", "seed")], columns=["src", "dst", "kind"]).to_parquet(
        str(adir / "a1.parquet"), index=False)

    first = run_incremental(spark, str(feed), catalog, str(adir), out)
    e1 = {(r["src"], r["dst"]) for r in first["edges"].collect()
          if r["rel_type"] == "co_occurs_with"}
    assert ("new:x", "new:y") in e1

    # alias arrives merging new:y into new:x; later transcripts mention Y
    pd.DataFrame([("new:x", "new:y", "alias")], columns=["src", "dst", "kind"]
                 ).to_parquet(str(adir / "a2.parquet"), index=False)
    _write_turns([_t("c2", 0, "then [[Y]] with [[W]]")], str(feed / "b2.parquet"))
    second = run_incremental(spark, str(feed), catalog, str(adir), out)
    e2 = {(r["src"], r["dst"]) for r in second["edges"].collect()
          if r["rel_type"] == "co_occurs_with"}
    assert ("new:w", "new:x") in e2     # Y canonicalized via the NEW pair
    assert ("new:w", "new:y") not in e2  # the stale-mapping symptom


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


def test_stateful_extract_spans_microbatches(spark, tmp_path):
    """A conversation split ACROSS micro-batches must still chain R2
    (followed_by) through the kept state — batch-equivalent output."""
    import datetime as dt
    import pandas as pd

    from kg.extract import extract_conversation
    from kg.streaming import stateful_extract, transcript_stream

    rows = [
        ("c1", 0, "user", "Start with [[Alpha]].", None),
        ("c1", 1, "assistant", "Then [[Beta]] and [[Gamma]].", None),
        ("c1", 2, "tool", "found [[Delta]]", "search"),
        ("c1", 3, "user", "Finally [[Alpha]] again.", None),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    pdf["ts"] = dt.datetime(2025, 1, 1)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["tool"] = pdf["tool"].astype("string")  # all-null slices stay string-typed
    feed = str(tmp_path / "sfeed")
    os.makedirs(feed, exist_ok=True)
    # one file per turn + maxFilesPerTrigger=1-ish (4 files, default trigger
    # reads up to 4 per trigger; force separation with availableNow + 1 file)
    for i in range(4):
        pdf.iloc[[i]].to_parquet(os.path.join(feed, f"f{i}.parquet"), index=False,
                                 coerce_timestamps="us", allow_truncated_timestamps=True)

    stream = (spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(feed))
    q = (stateful_extract(stream).writeStream.outputMode("append")
         .format("memory").queryName("stateful_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql(
        "SELECT conv_id, turn_idx, span_start, subj_surface, pred, obj_surface "
        "FROM stateful_out").toPandas()
    exp = extract_conversation(pdf[["conv_id", "turn_idx", "role", "text", "tool"]])
    key = list(exp.columns)
    assert sorted(map(tuple, got[key].values.tolist())) == \
           sorted(map(tuple, exp[key].values.tolist()))
    assert ("Delta", "followed_by", "Alpha") in set(
        zip(got.subj_surface, got.pred, got.obj_surface))


def test_incremental_empty_input_dir(spark, catalog_df, alias_pairs_df, tmp_path):
    """No input files ⇒ zero epochs + an empty, correctly-typed edge table
    (was: PATH_NOT_FOUND on the post-drain read)."""
    from kg.streaming import run_incremental

    in_dir = tmp_path / "in_empty"
    in_dir.mkdir()
    res = run_incremental(
        spark, str(in_dir), catalog_df, alias_pairs_df, str(tmp_path / "out")
    )
    assert res["epochs"] == 0
    assert res["edges"].count() == 0
    assert "rel_type" in res["edges"].columns


def test_streaming_exact_dedup(spark, tmp_path):
    """Identical payloads re-delivered across files are emitted once;
    distinct payloads all pass."""
    import datetime as dt

    from kg.streaming import streaming_exact_dedup, transcript_stream

    stream_dir = str(tmp_path / "dedup_feed")
    os.makedirs(stream_dir, exist_ok=True)
    ts = dt.datetime(2025, 3, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "hello [[Spark]]", None, ts),
        ("c1", 1, "assistant", "hi there", None, ts),
        # exact re-delivery of c1/0's payload under a different key
        ("c2", 0, "user", "hello [[Spark]]", None, ts),
        ("c2", 1, "user", "something else", None, ts),
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["tool"] = pdf["tool"].astype("string")  # all-None would write INT32
    pdf.to_parquet(os.path.join(stream_dir, "a.parquet"), index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)

    out = streaming_exact_dedup(transcript_stream(spark, stream_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text FROM dedup_sink").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["hello [[Spark]]", "hi there", "something else"]

    # key_cols scopes the dedup (ADVICE r3: the param was declared but
    # unused): per-conv_id scoping keeps one copy of the duplicate text
    # in EACH conversation
    out2 = streaming_exact_dedup(
        transcript_stream(spark, stream_dir), key_cols=("conv_id",)
    )
    q2 = (
        out2.writeStream.format("memory")
        .queryName("dedup_sink_scoped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.sql(
        "SELECT conv_id, text FROM dedup_sink_scoped"
    ).collect()
    assert sorted((r["conv_id"], r["text"]) for r in got2) == [
        ("c1", "hello [[Spark]]"),
        ("c1", "hi there"),
        ("c2", "hello [[Spark]]"),
        ("c2", "something else"),
    ]


def test_incremental_cc_work_is_delta_proportional(
    spark, transcripts_pdf, catalog_df, tmp_path
):
    """With a directory alias source, only the FIRST micro-batch pays for
    the alias history; later batches with no new alias files do zero CC
    work (cc_stats n_delta_edges == 0) — the old code re-ran the full
    fixpoint every batch (VERDICT r3 item 5)."""
    import numpy as np

    stream_dir = str(tmp_path / "dfeed")
    out_dir = str(tmp_path / "dout")
    adir = tmp_path / "daliases"
    adir.mkdir()
    # 200 alias pairs in the directory up front
    pd.DataFrame(
        {"src": [f"new:e{i}" for i in range(200)],
         "dst": [f"new:e{i + 1}" for i in range(200)],
         "kind": "alias"}
    ).to_parquet(str(adir / "a0.parquet"), index=False)
    # 8 feed files at maxFilesPerTrigger=4 ⇒ exactly 2 micro-batches
    _write_chunks(transcripts_pdf[transcripts_pdf["conv_id"] < "conv-000040"],
                  stream_dir, n_chunks=8)
    res = run_incremental(spark, stream_dir, catalog_df, str(adir), out_dir)
    stats = res["cc_stats"]
    assert res["epochs"] == 2 and len(stats) == 2
    assert stats[0]["n_new_alias_files"] == 1
    assert stats[0]["n_delta_edges"] == 200      # history paid once
    assert stats[1]["n_new_alias_files"] == 0
    assert stats[1]["n_delta_edges"] == 0        # later batches: delta only


def test_incremental_edge_compaction_is_delta_proportional(
    spark, transcripts_pdf, catalog_df, alias_pairs_df, tmp_path
):
    """Edge compaction reads ONLY the epoch's delta triples + the prior
    edge-state snapshot (VERDICT r4 item 3): the final edges' plan scans
    the edge-state parquet, not the accumulated triple history, and the
    merged table equals a full build_edges rebuild over everything."""
    from kg.materialize import build_edges, provenance_edges

    stream_dir = str(tmp_path / "efeed")
    out_dir = str(tmp_path / "eout")
    # 8 files at maxFilesPerTrigger=4 ⇒ exactly 2 micro-batches
    _write_chunks(transcripts_pdf, stream_dir, n_chunks=8)
    res = run_incremental(spark, stream_dir, catalog_df, alias_pairs_df, out_dir)
    assert res["epochs"] == 2 and len(res["edge_stats"]) == 2
    for st in res["edge_stats"]:
        assert st["n_delta_partials"] > 0

    # (a) merged state ≡ full rebuild over the accumulated triples
    triples = spark.read.parquet(
        os.path.join(out_dir, "canonical_triples_stream")
    ).drop("epoch")
    full = build_edges(triples).unionByName(provenance_edges(spark))
    assert _edges_key(res["edges"]).equals(_edges_key(full))

    # (b) the returned edges read the edge STATE, never the triple history
    files = res["edges"].inputFiles()
    assert files and all("edge_state_stream" in f for f in files)
    assert not any("canonical_triples_stream" in f for f in files)

    # (c) a later drain with one new file merges just that delta: state
    # grows, and the epoch-3 merge input is the delta + prior snapshot
    late = transcripts_pdf.copy()
    late["conv_id"] = late["conv_id"] + "-late"
    late[late["conv_id"] < "conv-000005-late"].to_parquet(
        os.path.join(stream_dir, "late.parquet"), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    res2 = run_incremental(spark, stream_dir, catalog_df, alias_pairs_df, out_dir)
    assert res2["epochs"] == 1 and len(res2["edge_stats"]) == 1
    triples2 = spark.read.parquet(
        os.path.join(out_dir, "canonical_triples_stream")
    ).drop("epoch")
    full2 = build_edges(triples2).unionByName(provenance_edges(spark))
    assert _edges_key(res2["edges"]).equals(_edges_key(full2))
    # the new epoch's delta is far smaller than the accumulated state
    st = res2["edge_stats"][0]
    assert 0 < st["n_delta_partials"] < st["n_state_edges"]


def test_incremental_composes_alias_delta_with_new_transcripts(spark, tmp_path):
    """r6 (VERDICT r5 item 6): one drain that delivers BOTH a new alias
    file and new transcripts must compose the contracted-delta CC update
    with the edge-partial merge: the epoch's alias work reads only the
    NEW alias file (delta-sized cc_stats), the epoch's edge work reads
    only the epoch's triples + prior snapshot, and the final edges equal
    a full batch rebuild over everything."""
    import datetime as dt

    from kg.schema import ALIAS_PAIRS_SCHEMA, TRANSCRIPTS_SCHEMA

    def _t(conv, idx, text):
        return (conv, idx, "user", text, None, dt.datetime(2025, 1, 1))

    tcols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def _write_turns(rows, path):
        pdf = pd.DataFrame(rows, columns=tcols)
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["tool"] = pdf["tool"].astype("string")
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        return rows

    feed = tmp_path / "cfeed"; feed.mkdir()
    adir = tmp_path / "caliases"; adir.mkdir()
    out = str(tmp_path / "cout")
    catalog = spark.createDataFrame(
        [], "entity_id string, canonical_name string, aliases array<string>, "
            "blocking_key string, prefix string, entity_type string, freq_hint double",
    )
    all_turns = []
    all_pairs = [("new:p", "new:q", "seed")]
    all_turns += _write_turns(
        [_t("c1", 0, "link [[A]] and [[B]] here")], str(feed / "b1.parquet"))
    pd.DataFrame(all_pairs, columns=["src", "dst", "kind"]).to_parquet(
        str(adir / "a1.parquet"), index=False)
    run_incremental(spark, str(feed), catalog, str(adir), out)

    # BOTH arrive before the second drain: transcripts mentioning C1/C2/D
    # and the alias pair that merges C1 and C2 (entities unseen in epoch 1,
    # so the full-rebuild comparison is exact).  The new transcripts span
    # 5 files (maxFilesPerTrigger=4 => 2 micro-batches), so the drain has
    # one epoch that pays the alias catch-up and one that must do ZERO
    # alias work while still composing through the updated mapping.
    all_turns += _write_turns(
        [_t("c2", 0, "now [[C1]] visits [[C2]]")], str(feed / "b2.parquet"))
    for i in range(3):
        all_turns += _write_turns(
            [_t(f"cx{i}", 0, f"filler [[F{i}]] next [[G{i}]]")],
            str(feed / f"b3_{i}.parquet"))
    all_turns += _write_turns(
        [_t("c3", 0, "and [[C2]] meets [[D]]")], str(feed / "b4.parquet"))
    new_pairs = [("new:c1", "new:c2", "alias")]
    all_pairs += new_pairs
    pd.DataFrame(new_pairs, columns=["src", "dst", "kind"]).to_parquet(
        str(adir / "a2.parquet"), index=False)

    second = run_incremental(spark, str(feed), catalog, str(adir), out)
    # first epoch of the restarted drain pays the alias catch-up once
    # (seen-file tracking is per drain); the NEXT epoch does zero alias
    # work — delta-proportional within the drain — while its triples
    # still canonicalize through the composed mapping
    assert second["epochs"] == 2 and len(second["cc_stats"]) == 2
    assert second["cc_stats"][0]["n_new_alias_files"] == 2
    assert second["cc_stats"][1]["n_new_alias_files"] == 0
    assert second["cc_stats"][1]["n_delta_edges"] == 0
    # edge work per epoch = the epoch's partials merged into state
    assert all(0 < est["n_delta_partials"] for est in second["edge_stats"])
    files = second["edges"].inputFiles()
    assert files and all("edge_state_stream" in f for f in files)
    assert not any("canonical_triples_stream" in f for f in files)

    # composed result == full batch rebuild over all transcripts + aliases
    tr_pdf = pd.DataFrame(all_turns, columns=tcols)
    tr_pdf["turn_idx"] = tr_pdf["turn_idx"].astype("int32")
    tr_pdf["tool"] = tr_pdf["tool"].astype("string")
    tr = spark.createDataFrame(tr_pdf, schema=TRANSCRIPTS_SCHEMA)
    ap = spark.createDataFrame(
        pd.DataFrame(all_pairs, columns=["src", "dst", "kind"]),
        schema=ALIAS_PAIRS_SCHEMA,
    )
    batch = run_pipeline(spark, tr, catalog, ap)
    assert _edges_key(second["edges"]).equals(_edges_key(batch["edges"]))
    # the C1/C2 merge actually happened through the composed mapping
    merged = {(r["src"], r["dst"]) for r in second["edges"].collect()
              if r["rel_type"] == "co_occurs_with"}
    assert ("new:c1", "new:d") in merged
