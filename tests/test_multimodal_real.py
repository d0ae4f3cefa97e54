"""real=True multimodal path on the dependency-free toy BMP format
(VERDICT r3 next #8): decode / nearest-neighbor resize / frame sampling
run end-to-end on real pixels through the same Arrow batch plumbing the
fake path uses."""

from __future__ import annotations

import hashlib

import pytest

from hdtspark import multimodal as mm


def _pixels(w: int, h: int, seed: int) -> bytes:
    return bytes((seed * 31 + i * 7) % 256 for i in range(w * h * 3))


def test_bmp_codec_roundtrip():
    for w, h, seed in [(1, 1, 0), (3, 2, 1), (16, 16, 2), (5, 7, 3)]:
        rgb = _pixels(w, h, seed)
        data = mm.bmp_encode(w, h, rgb)
        assert data[:2] == b"BM"
        assert mm.bmp_size(data) == len(data)
        w2, h2, rgb2 = mm.bmp_decode(data)
        assert (w2, h2, rgb2) == (w, h, rgb)


def test_bmp_codec_rejects_non_bmp():
    with pytest.raises(ValueError, match="not a BMP"):
        mm.bmp_decode(b"\x89PNG----not-a-bmp-----------------------------"
                      b"----------------")


def test_bmp_resize_nearest_neighbor():
    # 2x2 distinct-color image upscaled 2x: each source pixel becomes a
    # 2x2 block under nearest neighbor
    px = [b"\xff\x00\x00", b"\x00\xff\x00", b"\x00\x00\xff", b"\xff\xff\x00"]
    rgb = px[0] + px[1] + px[2] + px[3]
    out = mm.bmp_resize(mm.bmp_encode(2, 2, rgb), 4, 4)
    w, h, big = mm.bmp_decode(out)
    assert (w, h) == (4, 4)

    def at(x, y):
        return big[(y * 4 + x) * 3:(y * 4 + x) * 3 + 3]

    assert at(0, 0) == at(1, 1) == px[0]
    assert at(2, 0) == at(3, 1) == px[1]
    assert at(0, 2) == at(1, 3) == px[2]
    assert at(2, 2) == at(3, 3) == px[3]


def _bmp_media(spark):
    """(doc_id, payload, meta) with payload = doc_id+1 concatenated BMPs."""
    rows = []
    for doc_id in range(6):
        frames = b"".join(
            mm.bmp_encode(4 + doc_id, 3, _pixels(4 + doc_id, 3, doc_id * 10 + f))
            for f in range(doc_id + 1))
        rows.append((doc_id, frames))
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_features_real(spark):
    got = {r["doc_id"]: r for r in
           mm.decode_features(_bmp_media(spark), real=True).collect()}
    assert len(got) == 6
    for doc_id, r in got.items():
        assert (r["width"], r["height"]) == (4 + doc_id, 3)
        assert r["frames"] == doc_id + 1


def test_resize_images_real(spark):
    got = mm.resize_images(
        _bmp_media(spark).filter("doc_id = 0"), width=8, height=6,
        real=True).collect()
    (r,) = got
    w, h, rgb = mm.bmp_decode(bytes(r["out_bytes"]))
    assert (w, h) == (8, 6)
    # spark-side result == driver-side reference resample, sig included
    src = mm.bmp_encode(4, 3, _pixels(4, 3, 0))
    want = mm.bmp_resize(src, 8, 6)
    assert bytes(r["out_bytes"]) == want
    assert r["out_sig"] == hashlib.md5(want).hexdigest()


def test_sample_frames_real(spark):
    got = mm.sample_frames(_bmp_media(spark), stride=2, real=True).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc_id d has d+1 frames -> ceil((d+1)/2) sampled at stride 2
    for d in range(6):
        rows = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(0, d + 1, 2))
        for r in rows:
            frame = bytes(r["frame_bytes"])
            w, h, rgb = mm.bmp_decode(frame)
            assert (w, h) == (4 + d, 3)
            assert rgb == _pixels(4 + d, 3, d * 10 + r["frame_idx"])
            assert r["frame_sig"] == hashlib.md5(frame).hexdigest()
