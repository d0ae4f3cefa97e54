"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so payload
bytes never round-trip through Python row objects.

The actual media decode is STUBBED (image/audio libraries are not in this
container): ``decode_features`` computes deterministic fake features from
the payload bytes, and ``decode_features(real=True)`` raises
NotImplementedError where a Pillow/ffmpeg call would slot in.  The
Spark-side plumbing — schema, Arrow batch shape, partitioning — is real and
tested, and the fake features are engine-portable for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, width int, height int, frames int"


def attach_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + media-type meta.

    In production this column is real image/audio bytes from the lakehouse;
    everything downstream only sees ``binary`` + metadata.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame, real: bool = False) -> DataFrame:
    """payload -> (doc_id, n_bytes, width, height, frames) via mapInPandas.

    Fake decode: width = 64 + n_bytes % 64, height = 64 + (7*n_bytes) % 64,
    frames = 1 + n_bytes % 5 — a deterministic stand-in with the exact
    Arrow/batch shape a real decoder (Pillow / torchvision / ffmpeg) uses.
    """

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real media decode needs Pillow/ffmpeg — not in this "
                    "container; plug the decoder in here")
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": (64 + n % 64).astype("int32"),
                "height": (64 + (7 * n) % 64).astype("int32"),
                "frames": (1 + n % 5).astype("int32"),
            })

    return media.select("doc_id", "payload").mapInPandas(decode, FEATURE_SCHEMA)
