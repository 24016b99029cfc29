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
