"""Sequence packing — mapping documents into fixed-token training chunks.

Pretraining consumes fixed-length token sequences, not documents: the
corpus is concatenated (in a stable order) and split at chunk_tokens
boundaries, with documents straddling chunk edges (GPT-style
concat-and-chunk).  The operator that matters at 10^12 docs is the
ASSIGNMENT — which chunk(s) each document lands in — because it must be
deterministic across runs/retries/engines (a resumed job must pack the
same chunks) and computable without a global sequential pass.

Shape: a single global concatenation order is inherently sequential (a
corpus-wide running sum is a one-partition window), so the corpus is
first split into ``n_buckets`` independent streams by a stable hash of
the doc key — each bucket is packed on its own, in parallel, and a
training shard is (bucket, chunk_idx).  Within a bucket the order is
(md5(salt|doc_id), doc_id): deterministic, uncorrelated with document
length or insertion order (adjacent long docs scatter), and identical in
any engine.  The per-bucket running sum is one window over that order —
the only exchange in the whole operator — and every downstream quantity
(chunk span, offsets) is arithmetic on the cumsum.  Adding documents
never re-packs existing buckets' prefixes deterministically (appends
re-sort within a bucket), so snapshot packing is pinned by (salt,
n_buckets, chunk_tokens) + the doc set — record those in the manifest.

Reference anchor: none (the reference imports a graph, it does not
shard training data); this is part of the training-data surface the
engine adds, like kg/ops/sample.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count (same rule as kg/ops/text.py quality_score,
    and the DuckDB oracle's len(list_filter(string_split_regex(...)))):
    split on an ASCII-whitespace run, drop empties.  The class is spelled
    explicitly (kg.extract.ASCII_WS_RE) in both engines — ADVICE r4."""
    from kg.extract import ASCII_WS_RE

    return F.size(F.filter(F.split(text, ASCII_WS_RE), lambda t: t != ""))


def pack_chunks(
    docs: DataFrame,
    chunk_tokens: int = 2048,
    n_buckets: int = 1024,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, bucket, n_tokens, start_offset, start_chunk, end_chunk,
    n_chunks): concat-and-chunk packing assignment.

    Within its bucket's deterministic concatenation order, a document
    occupies token interval [start_offset, start_offset + n_tokens); it
    therefore appears in chunks floor(start/L) .. floor((end-1)/L) of
    that bucket (possibly straddling — standard pretraining packing
    keeps fragments rather than padding).  Zero-token documents are
    excluded (they occupy no interval).

    One exchange (hash on bucket for the cumsum window); token counting
    and all chunk arithmetic are map-side built-ins.  Pass
    ``n_tokens_col`` to reuse a precomputed token count (e.g. a real
    BPE count materialized by a prior stage) instead of the whitespace
    default.
    """
    key = F.col(key_col).cast("string")
    order_key = F.md5(F.concat(F.lit(salt + "|"), key).cast("binary"))
    n_tok = (
        F.col(n_tokens_col)
        if n_tokens_col
        else whitespace_token_count(F.col(text_col))
    ).cast("long")
    d = docs.select(
        F.col(key_col),
        n_tok.alias("n_tokens"),
        # bucket = int(first 4 hex of md5('bkt|'|key)) % n_buckets — the
        # same engine-portable hash family as kg/ops/sample.py (DuckDB
        # has no crc32; conv/hex arithmetic reproduces identically)
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("bkt|"), key).cast("binary")), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % n_buckets
        )
        .cast("int")
        .alias("bucket"),
        order_key.alias("_ok"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy("_ok", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_cum", F.sum("n_tokens").over(w))
    start = F.col("_cum") - F.col("n_tokens")
    end_chunk = F.floor((F.col("_cum") - 1) / chunk_tokens).cast("long")
    start_chunk = F.floor(start / chunk_tokens).cast("long")
    return d.select(
        key_col,
        "bucket",
        "n_tokens",
        start.cast("long").alias("start_offset"),
        start_chunk.alias("start_chunk"),
        end_chunk.alias("end_chunk"),
        (end_chunk - start_chunk + 1).cast("long").alias("n_chunks"),
    )


def chunk_manifest(packed: DataFrame, chunk_tokens: int) -> DataFrame:
    """(bucket, chunk_idx, n_docs, n_tokens): per-chunk occupancy report
    derived from a pack_chunks assignment — the shard manifest a training
    loader consumes, and the QA view that every chunk except each
    bucket's last holds exactly chunk_tokens tokens.

    Documents straddling a boundary contribute their token overlap to
    each chunk they touch; the explode fans a doc out to its (usually 1,
    occasionally 2+) chunks, so the exchange carries (bucket, chunk)
    partials, not documents.
    """
    span = F.explode(F.sequence("start_chunk", "end_chunk")).alias("chunk_idx")
    x = packed.select(
        "bucket", "n_tokens", "start_offset", span
    )
    chunk_start = F.col("chunk_idx") * chunk_tokens
    chunk_end = chunk_start + chunk_tokens
    doc_end = F.col("start_offset") + F.col("n_tokens")
    overlap = (
        F.least(doc_end, chunk_end) - F.greatest(F.col("start_offset"), chunk_start)
    )
    return (
        x.withColumn("tok_in_chunk", overlap)
        .groupBy("bucket", "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tok_in_chunk").cast("long").alias("n_tokens"),
        )
    )


__all__ = ["pack_chunks", "chunk_manifest", "whitespace_token_count"]
