"""NT export round-trip + SQL/BGP layer tests (reference src/hdt.rs:401-411
round-trip pattern and src/sparql.rs:114-120 query shapes)."""

from __future__ import annotations

from hdtspark import export, rules, sparql
from hdtspark.query import ids_to_strings


def test_nt_export_roundtrip(kg, golden_oracle, tmp_path):
    path = str(tmp_path / "out.nt")
    export.write_nt(kg, path)
    spark = kg.spo.sparkSession
    lines = [r["value"] for r in spark.read.text(path).collect()]
    assert len(lines) == len(golden_oracle.spo)

    def armor(t):
        return t if t[0] in '"_' else f"<{t}>"

    expected = {
        f"{armor(s)} {armor(p)} {armor(o)} ."
        for s, p, o in golden_oracle.spo_str()
    }
    assert set(lines) == expected


def test_sql_views(spark, kg, golden_oracle):
    sparql.register_views(spark, kg)
    n = spark.sql("SELECT COUNT(*) AS n FROM hdt_triples").first()["n"]
    assert n == len(golden_oracle.spo)
    # ORDER BY / LIMIT (reference sparql test shape, src/sparql.rs:118-119)
    row = spark.sql(
        f"SELECT s FROM hdt_triples WHERE p = '{rules.P_HASTURN}' "
        "ORDER BY s LIMIT 1").first()
    expected = min(t[0] for t in golden_oracle.pattern(None, rules.P_HASTURN, None))
    assert row["s"] == expected
    # UNION + CONCAT
    n2 = spark.sql(
        f"SELECT CONCAT(s, '|', o) AS x FROM hdt_triples WHERE p = '{rules.P_TYPE}' "
        f"UNION SELECT s AS x FROM hdt_triples WHERE p = '{rules.P_HASTURN}'"
    ).count()
    assert n2 > 0


def test_bgp_two_patterns(kg, golden_oracle):
    """?turn mentions ?ent . ?ent type Entity  — a join through ?ent."""
    res = sparql.bgp(kg, [
        ("?turn", rules.P_MENTIONS, "?ent"),
        ("?ent", rules.P_TYPE, rules.C_ENTITY),
    ])
    got = sorted((r["ent"], r["turn"]) for r in res.collect())
    mentions = golden_oracle.pattern(None, rules.P_MENTIONS, None)
    typed = {t[0] for t in golden_oracle.pattern(None, rules.P_TYPE, rules.C_ENTITY)}
    exp = sorted((o, s) for s, _, o in mentions if o in typed)
    assert got == exp


def test_bgp_three_hop(kg, golden_oracle):
    """conv hasTurn ?t . ?t prev ?prev — chained join."""
    conv = "http://ex.org/conv/conv-000003"
    res = sparql.bgp(kg, [
        (conv, rules.P_HASTURN, "?t"),
        ("?t", rules.P_PREV, "?prev"),
    ])
    got = sorted((r["prev"], r["t"]) for r in res.collect())
    turns = {t[2] for t in golden_oracle.pattern(conv, rules.P_HASTURN, None)}
    prevs = golden_oracle.pattern(None, rules.P_PREV, None)
    exp = sorted((o, s) for s, _, o in prevs if s in turns)
    assert got == exp
    assert got  # non-empty: every conv has >= 3 turns
