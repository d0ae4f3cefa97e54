"""Edge cases: empty graph (reference src/nt.rs:298-303), single turn,
term-list matchers (Q10)."""

from __future__ import annotations

from hdtspark import pipeline, query, rules, synth


def test_empty_corpus(spark):
    t = spark.createDataFrame([], synth.TRANSCRIPTS_SCHEMA)
    kg = pipeline.build_kg(t, cache=False)
    assert kg.dict.n_shared == 0
    assert kg.dict.n_predicates == 0
    assert kg.spo.count() == 0
    assert query.triples_with_pattern(kg, p=rules.P_ROLE).count() == 0


def test_single_turn(spark):
    rows = [{"conv_id": "c", "turn_idx": 0, "role": "user",
             "text": "no mentions here", "tool": None, "ts": None}]
    t = spark.createDataFrame(rows, synth.TRANSCRIPTS_SCHEMA)
    kg = pipeline.build_kg(t, cache=False)
    got = sorted(tuple(r) for r in query.triples_with_pattern(kg).collect())
    turn = rules.turn_iri("c", 0)
    assert got == sorted([
        (rules.conv_iri("c"), rules.P_HASTURN, turn),
        (turn, rules.P_INDEX, rules.typed_lit("0", rules.XSD_INTEGER)),
        (turn, rules.P_ROLE, rules.lit("user")),
        (turn, rules.P_TEXT, rules.lit("no mentions here")),
    ])
    # sections: conv subject-only; turn shared; 4 predicates; 3 literals
    assert kg.dict.n_shared == 1
    assert kg.dict.n_subjects == 1
    assert kg.dict.n_predicates == 4
    assert kg.dict.n_objects == 3


def test_q10_term_lists(kg, golden_oracle):
    ents = ["http://ex.org/e/apache-spark", "http://ex.org/e/sql-table"]
    got = sorted(tuple(r) for r in query.triples_matching(
        kg, p_terms=[rules.P_MENTIONS], o_terms=ents).collect())
    exp = sorted(t for t in golden_oracle.spo_str()
                 if t[1] == rules.P_MENTIONS and t[2] in ents)
    assert got == exp


def test_q10_unknown_terms_empty(kg):
    assert query.triples_matching(kg, o_terms=["http://ex.org/e/nope"]).count() == 0
