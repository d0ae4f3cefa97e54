"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB regime:
- exact dedup is a hash-groupBy (one shuffle, map-side partial agg);
- MinHash signatures are ONE groupBy over exploded shingles with N min()
  aggregates (no per-hash passes); LSH banding turns the quadratic pair
  search into an equi-join on (band_idx, band_value) — only colliding
  buckets are joined, and the verify step computes exact Jaccard on the
  candidate pairs only;
- SimHash is pure JVM builtins (md5 -> conv -> per-bit sum aggregates) with
  chunk-LSH (JVM bit ops) for Hamming-neighbor candidate pairs — no Python
  anywhere in the path, and the same math runs as SQL in the DuckDB oracle.

Hash functions are md5-derived so DuckDB reproduces MinHash/Jaccard exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

SHINGLE_K = 5
# Production LSH defaults: 128 hashes / 16 bands (r = 8 rows per band).
# Candidate probability is the standard S-curve 1-(1-s^r)^b with its knee at
# t* = (1/b)^(1/r) = (1/16)^(1/8) ~ 0.71: pairs with true Jaccard 0.8 are
# banded with p ~ 0.95, 0.9 with p ~ 0.999, while 0.5-pairs stay below 0.06
# — so a 0.7+ threshold keeps high recall with few spurious candidates.
# (Round 2 shipped 8/4, which has its knee at 0.5 but only ~61% recall at
# s = 0.7 — fine for the small-sf oracle, undersized for production.)
# Both pipeline and DuckDB oracle take these as parameters; the driver
# checks BOTH the toy and the production setting.
NUM_HASHES = 128
BANDS = 16


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


def candidate_pairs(docs: DataFrame, num_hashes: int = NUM_HASHES,
                    bands_n: int = BANDS) -> DataFrame:
    """(a, b) candidate near-dup pairs: docs sharing >=1 LSH band."""
    bands = lsh_bands(minhash_signatures(docs, num_hashes), num_hashes, bands_n)
    left = bands.select(F.col("doc_id").alias("a"), "band_idx", "band_val")
    right = bands.select(F.col("doc_id").alias("b"), "band_idx", "band_val")
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.7,
                            num_hashes: int = NUM_HASHES,
                            bands_n: int = BANDS) -> DataFrame:
    """(a, b, jaccard): LSH candidates verified by exact shingle Jaccard.

    Jaccard runs only on candidate pairs (join-pruned), not all O(n²) pairs.
    Recall is the banding S-curve (see NUM_HASHES above): with the 128/16
    default, >= 95% of pairs at true Jaccard 0.8 become candidates.
    """
    cands = candidate_pairs(docs, num_hashes, bands_n)
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
                              emb_col: str = "embedding",
                              bands: int | None = None,
                              bits: int | None = None,
                              dim: int | None = None) -> DataFrame:
    """(a, b, cosine) — embedding-cosine near-dup pairs, hyperplane-LSH pruned.

    Candidates = pairs sharing >=1 banded random-hyperplane signature
    (simsearch.lsh_band_rows: integer-exact sign bits; production default
    4 bands x 16 bits, see simsearch.LSH_BANDS — an unrelated pair collides
    on a band with probability ~2^-16, so the bucket-local self-join stays
    bucket-sized at web scale); exact cosine (JVM aggregate/zip_with,
    double) verifies candidates only.  (band_idx, band_val) is the
    equi-join key — bucket-local self-join at scale.
    """
    from . import simsearch
    from .simsearch import _cosine_expr, lsh_band_rows

    bands = simsearch.LSH_BANDS if bands is None else bands
    bits = simsearch.LSH_BITS if bits is None else bits
    dim = simsearch.LSH_DIM if dim is None else dim
    band_rows = lsh_band_rows(embeddings, id_col=id_col, emb_col=emb_col,
                              bands=bands, bits=bits, dim=dim)
    left = band_rows.select(F.col(id_col).alias("a"),
                            F.col(emb_col).alias("emb_a"),
                            "band_idx", "band_val")
    right = band_rows.select(F.col(id_col).alias("b"),
                             F.col(emb_col).alias("emb_b"),
                             "band_idx", "band_val")
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "emb_a", "emb_b")
        .dropDuplicates(["a", "b"])
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


def simhashes(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — entirely JVM-side (whole-stage codegen, no Python).

    explode tokens -> md5 -> 60-bit int (conv base16) -> one groupBy with 60
    per-bit sum() aggregates (map-side partial agg) -> bit b of the hash is
    set iff more than half the tokens have bit b set (same math as
    ``simhash_py``, which remains the unit-test reference).  Being pure
    builtins, the identical computation runs as plain SQL in DuckDB — the
    driver oracle for ``dd_simhash``.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    bit_sums = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = (
        toks.select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_n"), *bit_sums)
    )
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(
            F.col(f"_b{b}") * 2 > F.col("_n"), F.lit(1 << b)).otherwise(F.lit(0))
    hashed = agg.select("doc_id", sim.cast("long").alias("simhash"))
    # Token-less docs never reach the groupBy; the reference math gives 0.
    return (
        docs.select("doc_id").join(hashed, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


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
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                .cast("long").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
