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


RESIZE_SCHEMA = ("doc_id long, width int, height int, out_bytes binary, "
                 "out_sig string")


def resize_images(media: DataFrame, width: int = 64,
                  height: int = 64, real: bool = False) -> DataFrame:
    """Fake resize with REAL binary-in/binary-out Arrow plumbing: the output
    payload is the input bytes tiled/truncated to width*height/8 bytes (a
    real Pillow resize slots into the marked spot); ``out_sig`` is the md5
    of the output so the transform is oracle-checkable without shipping the
    binary through the driver compare."""
    target = max(1, width * height // 8)

    def resize(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real image resize needs Pillow — plug it in here")
            outs, sigs = [], []
            for payload in pdf["payload"]:
                # fake "resize": tile the decoded text to `target` chars
                # (char, not byte, semantics — reproducible as SQL
                # repeat+substring for the oracle), re-encode to bytes
                t = bytes(payload).decode("utf-8")
                out = (t * (target // max(len(t), 1) + 1))[:target]
                outs.append(out.encode("utf-8"))
                sigs.append(hashlib.md5(out.encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": width, "height": height,
                "out_bytes": outs, "out_sig": sigs,
            })

    return media.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_sig string, frame_bytes binary"


def sample_frames(media: DataFrame, stride: int = 2,
                  real: bool = False) -> DataFrame:
    """Fake video frame sampling with the REAL fan-out batch shape: each
    input row explodes into one output row per sampled frame (indices
    0, stride, 2*stride, ... below the fake frame count 1 + n_bytes % 5).
    Frame bytes are deterministic (md5-keyed), so the per-frame signature is
    reproducible in SQL for the driver oracle."""

    def sample(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real frame extraction needs ffmpeg — plug it in here")
            rows = {"doc_id": [], "frame_idx": [], "frame_sig": [],
                    "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                frames = 1 + len(b) % 5
                for i in range(0, frames, stride):
                    sig = hashlib.md5(b + f":{i}".encode()).hexdigest()
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_sig"].append(sig)
                    rows["frame_bytes"].append(bytes.fromhex(sig) * 4)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)
