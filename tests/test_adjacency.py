"""Bitmap-Triples-like adjacency layout vs oracle (reference
src/triples.rs:213-274)."""

from __future__ import annotations

from hdtspark import bitmap_triples


def test_adjacency_matches_oracle(kg, golden_oracle):
    got = sorted(
        (r["s"], list(r["preds"]), list(r["obj_offsets"]), list(r["objs"]))
        for r in kg.adj.collect()
    )
    assert got == golden_oracle.adjacency()


def test_salted_adjacency_identical(kg, golden_oracle):
    """The two-phase salted build produces the exact same layout."""
    got = sorted(
        (r["s"], list(r["preds"]), list(r["obj_offsets"]), list(r["objs"]))
        for r in bitmap_triples.adjacency(kg.spo, salt_buckets=8).collect()
    )
    assert got == golden_oracle.adjacency()


def test_auto_salting_triggers_and_is_identical(kg, golden_oracle):
    """The default 'auto' path salts when max degree crosses the threshold
    and still produces the exact same layout."""
    got = sorted(
        (r["s"], list(r["preds"]), list(r["obj_offsets"]), list(r["objs"]))
        for r in bitmap_triples.adjacency(kg.spo, salt_buckets="auto",
                                          skew_threshold=2).collect()
    )
    assert got == golden_oracle.adjacency()


def test_adjacency_covers_all_subjects(kg):
    n_subj = kg.dict.n_shared + kg.dict.n_subjects
    assert kg.adj.count() == n_subj


def test_bitmap_y_layer(kg, golden_oracle):
    """pos_y ordering + last-of-subject flags reproduce bitmap_y."""
    rows = sorted(
        (r["pos_y"], r["s"], r["p"], r["last_of_subject"])
        for r in bitmap_triples.bitmap_y(kg.adj).collect()
    )
    exp = []
    pos = 0
    for s, preds, _, _ in golden_oracle.adjacency():
        for i, p in enumerate(preds):
            exp.append((pos, s, p, i == len(preds) - 1))
            pos += 1
    assert rows == exp


def test_adjacency_stats(kg, golden_oracle):
    got = sorted(tuple(r) for r in bitmap_triples.adjacency_stats(kg.adj).collect())
    exp = sorted((s, len(preds), len(objs)) for s, preds, _, objs in golden_oracle.adjacency())
    assert got == exp


def test_degree_capped_chunking(spark):
    """A subject over the degree cap splits into bounded, contiguous chunk
    rows; exploding them back reproduces the exact triple set, and
    adjacency_stats over the chunked layout equals a direct computation
    (VERDICT r3 next #7)."""
    from pyspark.sql import functions as F

    # subject 1: degree 5000 (hot, 5 predicates x 1000 objects);
    # subjects 2..41: degree 25 each (cold)
    hot = spark.range(5000).select(
        F.lit(1).alias("s"), (F.col("id") % 5 + 1).alias("p"),
        (F.col("id") + 100).alias("o"))
    cold = spark.range(1000).select(
        (F.col("id") % 40 + 2).alias("s"), (F.col("id") % 5 + 1).alias("p"),
        (F.col("id") + 7000).alias("o"))
    spo = hot.unionAll(cold)

    adj = bitmap_triples.adjacency_chunked(spo, degree_cap=1000)
    rows = adj.collect()

    hot_chunks = sorted((r for r in rows if r["s"] == 1),
                        key=lambda r: r["chunk"])
    assert len(hot_chunks) >= 3                      # actually split
    assert [r["chunk"] for r in hot_chunks] == list(range(len(hot_chunks)))
    # bounded: no chunk row holds a dataset-scale array (sample-estimated
    # boundaries -> allow 3x slack over the cap)
    assert all(len(r["objs"]) <= 3000 for r in hot_chunks)
    # contiguity: chunks are (p, o)-sorted slices in chunk order
    seq = []
    for r in hot_chunks:
        offs = list(r["obj_offsets"]) + [len(r["objs"])]
        for i, p_ in enumerate(r["preds"]):
            for o_ in r["objs"][offs[i]:offs[i + 1]]:
                seq.append((p_, o_))
    assert seq == sorted(seq)
    # reconstruction: chunked layout == exact triple set
    assert sorted(seq) == sorted((r["p"], r["o"]) for r in hot.collect())
    # cold subjects: single chunk-0 rows
    assert all(r["chunk"] == 0 for r in rows if r["s"] != 1)
    assert {r["s"] for r in rows} == set(range(1, 42))

    # stats across chunks == direct groupBy on the raw triples
    got = {(r["s"], r["n_preds"], r["n_objs"])
           for r in bitmap_triples.adjacency_stats(adj).collect()}
    want = {(r["s"], r["np"], r["no"]) for r in
            spo.groupBy("s").agg(
                F.countDistinct("p").alias("np"),
                F.count("*").alias("no")).collect()}
    assert got == want


def test_degree_cap_no_hot_subjects(spark):
    """With no subject over the cap the chunked layout degenerates to the
    plain one (all chunk=0) and stats still agree."""
    from pyspark.sql import functions as F

    spo = spark.range(200).select(
        (F.col("id") % 20).alias("s"), (F.col("id") % 3).alias("p"),
        F.col("id").alias("o"))
    adj = bitmap_triples.adjacency_chunked(spo, degree_cap=1000)
    assert adj.filter(F.col("chunk") != 0).count() == 0
    got = {(r["s"], r["n_preds"], r["n_objs"])
           for r in bitmap_triples.adjacency_stats(adj).collect()}
    want = {(r["s"], r["np"], r["no"]) for r in
            spo.groupBy("s").agg(
                F.countDistinct("p").alias("np"),
                F.count("*").alias("no")).collect()}
    assert got == want
