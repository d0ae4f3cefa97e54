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
