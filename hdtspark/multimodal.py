"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so payload
bytes never round-trip through Python row objects.

Two decode tiers (Pillow/ffmpeg are not in this container — verified):

* default (``real=False``): deterministic FAKE features from the payload
  bytes — engine-portable, so the DuckDB oracle can re-derive them; the
  Arrow batch shape is identical to a real decoder's.
* ``real=True``: a dependency-free pure-Python 24-bit BMP codec
  (``bmp_encode`` / ``bmp_decode`` / ``bmp_resize``) runs INSIDE the same
  Arrow batch path, so decode / nearest-neighbor resize / frame sampling
  execute end-to-end on real pixels ("video" = concatenated BMPs, each
  header's file-size field delimiting the next frame).  Full formats
  (JPEG/PNG/mp4) remain the declared Pillow/ffmpeg plug-in point — the
  codec raises ValueError on anything that is not a BMP.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F


# --- toy real format: 24-bit uncompressed BMP (pure Python) -----------------

def bmp_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB bytes (len = w*h*3) -> BMP file bytes (bottom-up BGR,
    rows padded to 4 bytes, BITMAPINFOHEADER)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):        # bottom-up storage order
        row = rgb[y * width * 3:(y + 1) * width * 3]
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]   # RGB -> BGR
        rows.append(bytes(bgr) + pad)
    pixel_data = b"".join(rows)
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                           len(pixel_data), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + pixel_data


def bmp_decode(data: bytes) -> tuple[int, int, bytes]:
    """BMP bytes -> (width, height, top-down RGB bytes).  Supports the
    24-bit uncompressed subset ``bmp_encode`` emits (the toy 'real' format;
    other media formats are the Pillow/ffmpeg plug-in point)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (toy real decoder: BMP only; "
                         "plug Pillow/ffmpeg in for full formats)")
    _, file_size, _, _, data_offset = struct.unpack_from("<2sIHHI", data, 0)
    (hdr_size, width, height, _planes, bitcount,
     compression) = struct.unpack_from("<IiiHHI", data, 14)
    if bitcount != 24 or compression != 0:
        raise ValueError("toy BMP decoder supports 24-bit uncompressed only")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[data_offset + src_y * row_size:
                   data_offset + src_y * row_size + width * 3]
        rgb = bytearray(row)
        rgb[0::3], rgb[2::3] = row[2::3], row[0::3]   # BGR -> RGB
        out[y * width * 3:(y + 1) * width * 3] = rgb
    return width, height, bytes(out)


def bmp_size(data: bytes, offset: int = 0) -> int:
    """Byte length of the BMP starting at ``offset`` (the file-size header
    field) — delimits frames in a concatenated-BMP 'video'."""
    if data[offset:offset + 2] != b"BM":
        raise ValueError("not a BMP at offset")
    return struct.unpack_from("<I", data, offset + 2)[0]


def split_bmp_frames(data: bytes) -> list[bytes]:
    """Concatenated BMPs -> list of single-BMP byte strings."""
    frames, off = [], 0
    while off < len(data):
        n = bmp_size(data, off)
        if n <= 0 or off + n > len(data):
            raise ValueError("truncated BMP frame")
        frames.append(data[off:off + n])
        off += n
    return frames


def bmp_resize(data: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of a BMP, re-encoded as BMP."""
    w, h, rgb = bmp_decode(data)
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = min(h - 1, y * h // new_h)
        row_off = sy * w * 3
        for x in range(new_w):
            sx = min(w - 1, x * w // new_w)
            i, j = (y * new_w + x) * 3, row_off + sx * 3
            out[i:i + 3] = rgb[j:j + 3]
    return bmp_encode(new_w, new_h, bytes(out))

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
                # toy real decode: BMP header fields; frames = number of
                # concatenated BMPs (non-BMP media: Pillow/ffmpeg plug-in)
                ws, hs, fs = [], [], []
                for payload in pdf["payload"]:
                    b = bytes(payload)
                    frames = split_bmp_frames(b)
                    w, h, _ = bmp_decode(frames[0])
                    ws.append(w)
                    hs.append(h)
                    fs.append(len(frames))
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "frames": pd.Series(fs, dtype="int32"),
                })
                continue
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
                # toy real resize: nearest-neighbor BMP resample (Pillow
                # plug-in point for full formats)
                outs, sigs = [], []
                for payload in pdf["payload"]:
                    out = bmp_resize(bytes(payload), width, height)
                    outs.append(out)
                    sigs.append(hashlib.md5(out).hexdigest())
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "width": width, "height": height,
                    "out_bytes": outs, "out_sig": sigs,
                })
                continue
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
            rows = {"doc_id": [], "frame_idx": [], "frame_sig": [],
                    "frame_bytes": []}
            if real:
                # toy real sampling: the 'video' is concatenated BMPs —
                # every stride-th frame is emitted verbatim (ffmpeg
                # plug-in point for real containers)
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    frames = split_bmp_frames(bytes(payload))
                    for i in range(0, len(frames), stride):
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(i)
                        rows["frame_sig"].append(
                            hashlib.md5(frames[i]).hexdigest())
                        rows["frame_bytes"].append(frames[i])
                yield pd.DataFrame(rows)
                continue
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
