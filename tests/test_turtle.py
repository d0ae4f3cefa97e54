"""Turtle sink/source tests: grammar-level parser units, pretty-form
properties, and the full write->parse-back round-trip with hostile
literals (reference convert-to-ttl, src/main.rs:142-152)."""

from __future__ import annotations

import pytest

from hdtspark import rules, turtle

X = "http://x.org/"


def test_parse_prefix_a_semicolon_comma():
    got = turtle.parse_ttl(f"""
@prefix ex: <{X}> .
ex:s a ex:T ;
     ex:p ex:o1, ex:o2 .
""")
    assert sorted(got) == sorted([
        (f"{X}s", turtle.RDF_TYPE, f"{X}T"),
        (f"{X}s", f"{X}p", f"{X}o1"),
        (f"{X}s", f"{X}p", f"{X}o2"),
    ])


def test_parse_literals_and_escapes():
    got = turtle.parse_ttl(f"""
@prefix ex: <{X}> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:s ex:p "line\\nbreak \\"q\\" \\\\ \\u0041"@en .
ex:s ex:p "5"^^xsd:integer .
ex:s ex:p 7 .
ex:s ex:p 'single' .
""")
    objs = {o for _, _, o in got}
    assert '"line\nbreak "q" \\ A"@en' in objs
    assert '"5"^^<http://www.w3.org/2001/XMLSchema#integer>' in objs
    assert '"7"^^<http://www.w3.org/2001/XMLSchema#integer>' in objs
    assert '"single"' in objs


def test_parse_base_and_errors():
    got = turtle.parse_ttl("@base <http://b.org/> . <s> <p> <o> .")
    assert got == [("http://b.org/s", "http://b.org/p", "http://b.org/o")]
    with pytest.raises(ValueError):
        turtle.parse_ttl("ex:s ex:p ex:o .")  # unknown prefix
    with pytest.raises(ValueError):
        turtle.parse_ttl(f"@prefix ex: <{X}> . ex:s ex:p ex:o")  # missing .


def test_ttl_roundtrip_golden_kg(kg, golden_oracle, tmp_path):
    path = str(tmp_path / "out.ttl")
    prefixes = {**turtle.default_prefixes(), "ex": rules.BASE + "/"}
    turtle.write_ttl(kg, path, prefixes)
    text = open(path, encoding="utf-8").read()
    # pretty-form properties: prefix header, compaction, 'a' for rdf:type
    assert text.startswith("@prefix")
    assert "ex:" in text
    assert " a ex:" in text or " a <" in text
    got = sorted(turtle.parse_ttl(text))
    assert got == sorted(golden_oracle.spo_str())


def test_ttl_roundtrip_hostile_literals(spark, tmp_path):
    """Literals with quotes/newlines/backslashes/unicode survive the
    write->parse cycle byte-exact (canonical term strings)."""
    from hdtspark import pipeline

    hostile = [
        ("http://x.org/s1", "http://x.org/p", '"plain"'),
        ("http://x.org/s1", "http://x.org/p", '"with \\" quote"'.replace("\\", "")),
        ("http://x.org/s2", "http://x.org/p", '"tab\there\nand\rnewline"'),
        ("http://x.org/s2", "http://x.org/p", '"back\\slash"'),
        ("http://x.org/s3", "http://x.org/p", '"кирилица ünïcode"@de'),
        ("http://x.org/s3", "http://x.org/p",
         '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ]
    df = spark.createDataFrame(hostile, "s string, p string, o string")
    kg = pipeline.build_kg_from_triples(df, with_adjacency=False)
    path = str(tmp_path / "hostile.ttl")
    turtle.write_ttl(kg, path)
    got = sorted(turtle.parse_ttl(open(path, encoding="utf-8").read()))
    assert got == sorted(set(hostile))
    kg.unpersist()


def test_parse_anonymous_blank_nodes():
    got = turtle.parse_ttl(f"""
@prefix ex: <{X}> .
ex:s ex:knows [ ex:name "Ann" ; ex:age 7 ], [ ex:name "Bo" ] .
ex:t ex:empty [] .
""")
    by_p = {}
    for s, p, o in got:
        by_p.setdefault(p, []).append((s, o))
    knows = by_p[f"{X}knows"]
    assert len(knows) == 2 and all(o.startswith("_:anon") for _, o in knows)
    names = dict((s, o) for s, o in by_p[f"{X}name"])
    anns = [s for s, o in by_p[f"{X}name"] if o == '"Ann"']
    assert len(anns) == 1
    # the nested triples hang off the same fresh label the object refers to
    assert anns[0] in {o for _, o in knows}
    assert by_p[f"{X}age"][0][0] == anns[0]
    assert by_p[f"{X}empty"][0][1].startswith("_:anon")


def test_parse_pname_trailing_dot_and_bad_chars():
    """ADVICE r3: `ex:o.` (no space before the statement dot) must split
    into the pname and the terminator; bytes no token rule matches must
    raise instead of being silently skipped."""
    got = turtle.parse_ttl(f"@prefix ex: <{X}> . ex:s ex:p ex:o.")
    assert got == [(f"{X}s", f"{X}p", f"{X}o")]
    # dots INSIDE a local name still belong to it
    got = turtle.parse_ttl(f"@prefix ex: <{X}> . ex:s ex:p ex:v1.2 .")
    assert got == [(f"{X}s", f"{X}p", f"{X}v1.2")]
    with pytest.raises(ValueError, match="unexpected character"):
        turtle.parse_ttl(f"@prefix ex: <{X}> . ex:s ex:p ~broken .")
