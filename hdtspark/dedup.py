"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB regime:
- exact dedup is a hash-groupBy (one shuffle, map-side partial agg);
- MinHash signatures are ONE groupBy over exploded shingles with N min()
  aggregates (no per-hash passes); LSH banding turns the quadratic pair
  search into an equi-join on (band_idx, band_value) — only colliding
  buckets are joined, and the verify step computes exact Jaccard on the
  candidate pairs only;
- SimHash is a vectorized pandas/Arrow UDF (numpy bit ops per Arrow batch)
  with chunk-LSH (JVM bit ops) for Hamming-neighbor candidate pairs.

Hash functions are md5-derived so DuckDB reproduces MinHash/Jaccard exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

SHINGLE_K = 5
NUM_HASHES = 8
BANDS = 4  # rows per band = NUM_HASHES // BANDS = 2


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(text_hash, cnt, keep_id): md5-exact duplicate groups, keep min id."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("cnt") > 1)
    )


def _shingles_expr(k: int = SHINGLE_K) -> str:
    toks = "split(lower(trim(text)), '\\\\s+')"
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {k} + 1, 1)), "
        f"i -> concat_ws(' ', slice({toks}, i, {k}))))"
    )


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) — distinct token k-grams per document."""
    return docs.select(
        "doc_id", F.explode(F.expr(_shingles_expr(k))).alias("shingle"))


def minhash_signatures(docs: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}) — one groupBy, n min() aggregates.

    h_j(shingle) = md5('<j>|' || shingle); min over the doc's shingles.
    Hex-string min == 128-bit numeric min (fixed-width lowercase hex).
    """
    sh = doc_shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(sigs: DataFrame, num_hashes: int = NUM_HASHES,
              bands: int = BANDS) -> DataFrame:
    """(doc_id, band_idx, band_val) — band value = md5 of its rows' sigs."""
    r = num_hashes // bands
    rows = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * r + i}") for i in range(r)]
        rows.append(F.struct(F.lit(b).alias("band_idx"),
                             F.md5(F.concat_ws("|", *cols)).alias("band_val")))
    return sigs.select(
        "doc_id", F.explode(F.array(*rows)).alias("bd")
    ).select("doc_id", "bd.band_idx", "bd.band_val")


def candidate_pairs(docs: DataFrame) -> DataFrame:
    """(a, b) candidate near-dup pairs: docs sharing >=1 LSH band."""
    bands = lsh_bands(minhash_signatures(docs))
    left = bands.select(F.col("doc_id").alias("a"), "band_idx", "band_val")
    right = bands.select(F.col("doc_id").alias("b"), "band_idx", "band_val")
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """(a, b, jaccard): LSH candidates verified by exact shingle Jaccard.

    Jaccard runs only on candidate pairs (join-pruned), not all O(n²) pairs.
    """
    cands = candidate_pairs(docs)
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a_sh = sh.select(F.col("doc_id").alias("a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cands.join(a_sh, "a").join(b_sh, ["b", "shingle"])
        .groupBy("a", "b").agg(F.count("*").alias("n_inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("n_b")), "b")
        .select(
            "a", "b",
            F.round(F.col("n_inter") /
                    (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4)
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        k: int = 3) -> DataFrame:
    """(a, b, jaccard) by shared-shingle join (no LSH): exact n-gram Jaccard
    over pairs sharing at least one k-gram.  The non-approximate baseline —
    quadratic in the worst case; use near_duplicates_minhash at scale."""
    sh = doc_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a_sh.join(b_sh, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count("*").alias("n_inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("n_b")), "b")
        .select("a", "b",
                F.round(F.col("n_inter") /
                        (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4)
                .alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.99,
                              id_col: str = "vec_id",
                              emb_col: str = "embedding") -> DataFrame:
    """(a, b, cosine) — embedding-cosine near-dup pairs, sign-LSH pruned.

    Candidates = pairs sharing the sign-LSH bucket (dims 1..3); exact cosine
    (JVM aggregate/zip_with, double) verifies.  At scale the bucket is a
    partition key, so the self-join is bucket-local.
    """
    from .simsearch import _cosine_expr, bucket_expr

    with_b = embeddings.select(
        F.col(id_col).alias("vid"), F.col(emb_col).alias("emb"), bucket_expr(emb_col))
    left = with_b.select(F.col("vid").alias("a"), F.col("emb").alias("emb_a"), "bucket")
    right = with_b.select(F.col("vid").alias("b"), F.col("emb").alias("emb_b"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.expr(_cosine_expr("emb_a", "emb_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# --- SimHash -----------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit long


def simhash_py(text: str) -> int:
    """Reference SimHash (python oracle; same math as the pandas UDF)."""
    acc = [0] * SIMHASH_BITS
    toks = text.lower().split()
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for b in range(SIMHASH_BITS):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(SIMHASH_BITS):
        if acc[b] > 0:
            out |= 1 << b
    return out


@F.pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched SimHash: numpy bit unpacking per doc."""
    out = np.zeros(len(text), dtype="int64")
    for i, t in enumerate(text):
        toks = (t or "").lower().split()
        if not toks:
            continue
        hs = np.array(
            [int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) for tok in toks],
            dtype="uint64",
        )
        bits = ((hs[:, None] >> np.arange(SIMHASH_BITS, dtype="uint64")) & 1)
        acc = (2 * bits.astype("int64") - 1).sum(axis=0)
        out[i] = int(((acc > 0).astype("uint64") <<
                      np.arange(SIMHASH_BITS, dtype="uint64")).sum())
    return pd.Series(out)


def simhashes(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) via the Arrow-batched UDF."""
    return docs.select("doc_id", simhash_udf(F.col("text")).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a, b, hamming) — chunk-LSH: split the 60-bit hash into 4×15-bit
    chunks (JVM shiftright/mask); pairs matching on >=1 chunk are candidates
    (any pair within Hamming<=3 must agree on one of 4 chunks), then exact
    Hamming via bit_count(xor) filter."""
    sh = simhashes(docs)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk_idx"),
                     (F.shiftright("simhash", c * 15) % (1 << 15)).alias("chunk_val"))
            for c in range(4)
        ])).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_idx", "ch.chunk_val")
    left = chunks.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
                         "chunk_idx", "chunk_val")
    right = chunks.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
                          "chunk_idx", "chunk_val")
    return (
        left.join(right, ["chunk_idx", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
