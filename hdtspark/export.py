"""Serialization sinks (reference S5: N-Triples/Turtle export,
src/hdt.rs:92-98, src/main.rs:139-167).

N-Triples terms are re-armored from the canonical HDT string encoding
(IRIs bare, literals quoted — src/hdt_graph.rs:90-103): IRIs get <>,
blank nodes pass through, and literal LEXICAL FORMS are escaped per the
N-Triples grammar (backslash, double-quote, newline, carriage return, tab)
— the canonical in-memory form holds raw characters, a serialized file
must not.  ``unescape_nt`` is the exact inverse used by the NT source
(sources.read_nt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .query import KG

# Greedy (?s) lexical match: the LAST quote that leaves a valid suffix ends
# the lexical form, so raw inner quotes parse correctly.
_LIT_RE = r'^"((?s).*)"((\^\^<[^>]*>)|(@[A-Za-z0-9\-]*))?$'

# Sentinel for order-safe unescaping ('\\' first, restored last).  U+0000 is
# forbidden in N-Triples source, so it cannot occur in valid input.
_SENTINEL = "\x00"


def escape_nt(c: F.Column) -> F.Column:
    """Raw lexical form -> NT-escaped (backslash FIRST, then the rest)."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def unescape_nt(c: F.Column) -> F.Column:
    """NT-escaped lexical form -> raw: single-pass-safe via a sentinel
    (plain replace chains would corrupt '\\\\n' = escaped-backslash + n)."""
    c = F.replace(c, F.lit("\\\\"), F.lit(_SENTINEL))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    return F.replace(c, F.lit(_SENTINEL), F.lit("\\"))


def _armor(col: str) -> F.Column:
    c = F.col(col)
    first = F.substring(c, 1, 1)
    lex = F.regexp_extract(c, _LIT_RE, 1)
    suffix = F.regexp_extract(c, _LIT_RE, 2)
    literal = F.concat(F.lit('"'), escape_nt(lex), F.lit('"'), suffix)
    return (
        F.when(first == '"', literal)
        .when(first == "_", c)          # blank node
        .otherwise(F.concat(F.lit("<"), c, F.lit(">")))  # IRI
    )


def nt_lines(triples_str: DataFrame) -> DataFrame:
    """(s,p,o) canonical strings -> one N-Triples line per row."""
    return triples_str.select(
        F.concat_ws(" ", _armor("s"), _armor("p"), _armor("o"), F.lit(".")).alias("value")
    )


def write_nt_triples(triples_str: DataFrame, path: str) -> None:
    """Write any (s, p, o) canonical-string DataFrame as N-Triples text
    (e.g. a CONSTRUCT result graph)."""
    nt_lines(triples_str).write.mode("overwrite").text(path)


def write_nt(kg: KG, path: str) -> None:
    """Enumerate the whole graph in SPO order and write N-Triples text."""
    write_nt_triples(kg.str_enum(), path)
