"""Extraction correctness: Spark (pandas-UDF and native paths) vs oracle.

Model: the reference's golden-fixture + metamorphic strategy (reference
src/hdt.rs:460-520, src/triples.rs:451-507).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from hdtspark import extract, rules


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_raw_triples_match_oracle(transcripts, golden_oracle):
    got = _multiset(extract.extract_triples(transcripts))
    exp = Counter(golden_oracle.triples_str)
    assert got == exp


def test_native_path_matches_pandas_udf_path(transcripts):
    a = _multiset(extract.extract_triples(transcripts, use_pandas_udf=True))
    b = _multiset(extract.extract_triples(transcripts, use_pandas_udf=False))
    assert a == b


def test_per_turn_text_equality(transcripts, golden_rows):
    """input_hint invariant: every turn's text appears verbatim as the
    lexical form of its P_TEXT literal, under stable (conv_id, turn_idx)."""
    tri = extract.extract_triples(transcripts)
    texts = (
        tri.filter(F.col("p") == rules.P_TEXT)
        .select("conv_id", "turn_idx", "o")
        .collect()
    )
    got = {(r["conv_id"], r["turn_idx"]): r["o"] for r in texts}
    for row in golden_rows:
        key = (row["conv_id"], row["turn_idx"])
        assert got[key] == f'"{row["text"]}"'
    assert len(got) == len(golden_rows)


def test_unicode_term_present(golden_oracle):
    """The Cyrillic filler word must flow through as a literal (sort-order
    canary, cf. reference src/hdt.rs:513-515)."""
    assert any("хобби" in t for t in golden_oracle.objects + golden_oracle.shared)
