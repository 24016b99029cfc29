"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as `binary` columns; decode / feature
extraction runs as Arrow-batched pandas UDFs over mapInPandas.  The
decode itself is STUBBED (no image/audio libs in this container — see
decode_image_stub), but the Spark-side plumbing is real and tested:
schema, batch iteration, partition sizing, and the deterministic fake
featureizer that stands in for a real decoder.

At scale: binary payloads dominate partition size, so the operator
repartitions by payload-size budget before the UDF (maxRecordsPerBatch
bounds Arrow batch memory; spark.sql.files.maxPartitionBytes bounds the
scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, fake_width long, fake_height long, checksum long"
)


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Placeholder for a real image decode (PIL/libvips not installed).

    Deterministic fake: derives a (width, height) from payload content so
    tests exercise real data flow.  A production build replaces this body
    with e.g. PIL.Image.open(io.BytesIO(payload)).size.
    """
    if payload is None:
        raise NotImplementedError("real decoder not available in this environment")
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (here: utf-8 text bytes standing in
    for an image payload) + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("payload_size"),
        F.lit("image/fake").alias("mime"),
    )


def decode_features(binary_df: DataFrame, batch_budget_rows: int = 1024) -> DataFrame:
    """mapInPandas featureizer: binary payload batches → feature rows.

    The iterator shape is the real contract: each Arrow batch arrives as
    a pandas DataFrame; we never materialize the whole partition.
    """

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # bound per-yield memory for jumbo payload batches
            for start in range(0, len(pdf), batch_budget_rows):
                chunk = pdf.iloc[start : start + batch_budget_rows]
                dims = chunk["payload"].map(decode_image_stub)
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].values,
                        "n_bytes": chunk["payload"].map(len).values,
                        "fake_width": [d[0] for d in dims],
                        "fake_height": [d[1] for d in dims],
                        "checksum": chunk["payload"]
                        .map(lambda b: sum(b[:64]) % 1_000_003)
                        .values,
                    }
                )

    return binary_df.mapInPandas(_decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width long, height long, out_width long, out_height long"
)


def resize_images(binary_df: DataFrame, max_dim: int = 256) -> DataFrame:
    """mapInPandas resize: decode (stub) → clamp longest side to max_dim.

    The resize arithmetic is INTEGER (w·max_dim // max(w,h)) so the
    result is engine-exact and the oracle can recompute it; a production
    build swaps the stub decode + the PIL `Image.resize` call into the
    same batch loop.  1 row in → 1 row out, no shuffle.
    """

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(decode_image_stub)
            w = pd.Series([d[0] for d in dims], index=pdf.index)
            h = pd.Series([d[1] for d in dims], index=pdf.index)
            mx = pd.concat([w, h], axis=1).max(axis=1)
            scale_needed = mx > max_dim
            ow = w.where(~scale_needed, (w * max_dim) // mx)
            oh = h.where(~scale_needed, (h * max_dim) // mx)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": w.values,
                    "height": h.values,
                    "out_width": ow.astype("int64").values,
                    "out_height": oh.astype("int64").values,
                }
            )

    return binary_df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_fp string"
FRAME_BYTES = 1024  # stub: one fake frame per KiB of payload


def sample_frames(binary_df: DataFrame, every_n: int = 4) -> DataFrame:
    """mapInPandas frame sampler: each payload fans out to one row per
    sampled frame (indices 0, every_n, 2·every_n, …).

    Demonstrates the 1→N batch contract (output rows ≠ input rows —
    the shape a real video decoder needs); the per-frame fingerprint is
    md5(payload ‖ ':' ‖ idx), computable by the SQL oracle since the
    stub payload is the utf-8 text.  A production build decodes real
    frames in the same loop and emits them as a binary column.
    """
    import hashlib

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_idx, out_fp = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) // FRAME_BYTES) + 1
                for idx in range(0, n_frames, every_n):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_fp.append(
                        hashlib.md5(
                            payload + b":" + str(idx).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_fp": out_fp}
            )

    return binary_df.mapInPandas(_frames, schema=FRAMES_SCHEMA)
