"""ID-level BGP compiler tests: equivalence with the string-level fallback
on every join-space shape, plus plan locks (no string-level work per
pattern — the reference evaluates BGPs as repeated ID-level quad lookups,
src/sparql.rs:45-68)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from hdtspark import rules, sparql


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_same(kg, patterns):
    a = _rows(sparql.bgp(kg, patterns))
    b = _rows(sparql.bgp_strings(kg, patterns))
    assert a == b
    return a


def test_bgp_same_space_join(kg):
    # ?ent at o-position then s-position... no: mentions o = ent, type s = ent
    rows = _assert_same(kg, [
        ("?turn", rules.P_MENTIONS, "?ent"),
        ("?ent", rules.P_TYPE, rules.C_ENTITY),
    ])
    assert rows  # non-empty on the golden corpus


def test_bgp_cross_space_var(kg):
    # ?t is an OBJECT of hasTurn and a SUBJECT of role: only shared-section
    # terms can match (ids guarded <= n_shared on both sides)
    rows = _assert_same(kg, [
        ("?c", rules.P_HASTURN, "?t"),
        ("?t", rules.P_ROLE, "?r"),
    ])
    assert rows


def test_bgp_three_patterns_chain(kg):
    rows = _assert_same(kg, [
        ("?c", rules.P_HASTURN, "?t"),
        ("?t", rules.P_MENTIONS, "?e"),
        ("?e", rules.P_TYPE, rules.C_ENTITY),
    ])
    assert rows


def test_bgp_unknown_constant_short_circuits_empty(kg):
    df = sparql.bgp(kg, [("?s", "http://nope/p", "?o")])
    assert df.columns == ["o", "s"]
    assert df.count() == 0


def test_bgp_predicate_space_var_falls_back(kg):
    # ?v spans the predicate and subject ID spaces: disjoint — must fall
    # back to string-level joins, not produce bogus numeric matches
    pats = [("?s", "?v", "?o"), ("?v", rules.P_TYPE, "?c")]
    a = _rows(sparql.bgp(kg, pats))
    b = _rows(sparql.bgp_strings(kg, pats))
    assert a == b


def test_bgp_same_var_twice_in_pattern(kg):
    # ?x as both subject and object of one pattern: only shared terms where
    # s-id == o-id (never true on the golden corpus -> empty, but must not
    # produce cross-space numeric collisions)
    pats = [("?x", rules.P_MENTIONS, "?x")]
    a = _rows(sparql.bgp(kg, pats))
    b = _rows(sparql.bgp_strings(kg, pats))
    assert a == b


def _tiny_kg(spark):
    """A lineage-free KG (literal DataFrames, no cached build plan) so
    explain() output reflects ONLY the BGP compiler's own operators."""
    from hdtspark.hdt_binary import HdtData, hdt_data_to_kg

    # subject space: s_and_o=1, subj1=2; object space: s_and_o=1, obj1=2
    return hdt_data_to_kg(spark, HdtData(
        shared=["s_and_o"], subjects=["subj1"],
        predicates=["p1", "p2"], objects=["obj1"],
        triples=[(1, 2, 2), (2, 1, 1)],   # s_and_o p2 obj1 ; subj1 p1 s_and_o
    ))


def test_bgp_ids_plan_is_id_level(spark, kg):
    """Plan lock: the ID-level join sub-plan touches no dictionary term
    column and no string-typed join keys — translation happens once,
    outside bgp_ids (r2 joined patterns on full term strings)."""
    tiny = _tiny_kg(spark)
    compiled = sparql.bgp_ids(tiny, [("?x", "p1", "?y"), ("?y", "p2", "?z")])
    assert compiled is not None
    ids_df, space = compiled
    # ?y is an object in pattern 1 and a subject in pattern 2 -> shared
    assert space == {"x": "s", "y": "shared", "z": "o"}
    buf = io.StringIO()
    with redirect_stdout(buf):
        ids_df.explain("formatted")
    plan = buf.getvalue()
    assert "term" not in plan, plan
    # all projected columns are ids (bigint): joins run on 8-byte keys
    assert all(t == "bigint" for _, t in ids_df.dtypes)
    # end-to-end through translation: the cross-space var resolves correctly
    assert _rows(sparql.bgp(tiny, [("?x", "p1", "?y"), ("?y", "p2", "?z")])) \
        == [("subj1", "s_and_o", "obj1")]
    # real-corpus space classification too
    compiled2 = sparql.bgp_ids(kg, [
        ("?turn", rules.P_MENTIONS, "?ent"),
        ("?ent", rules.P_TYPE, rules.C_ENTITY),
    ])
    assert compiled2 is not None
    assert compiled2[1] == {"turn": "s", "ent": "shared"}
