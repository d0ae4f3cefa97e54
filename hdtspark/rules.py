"""Canonical transcript -> RDF-triple extraction rules.

Terms use the HDT canonical string encoding (reference
src/hdt_graph.rs:49-103): IRIs are bare (no ``<>``), blank nodes start with
``_``, literals start with ``"`` and may carry ``@lang`` or ``^^<datatype>``
suffixes; ``xsd:string`` is the unstored default.

These pure functions are the single source of truth for the extraction
semantics; the Spark extractor (extract.py), the pure-Python oracle
(oracle.py) and the DuckDB oracle SQL (__spark_entry__.py) all implement
exactly these rules.
"""

from __future__ import annotations

from datetime import datetime

from .vocab import best_link, find_mentions

BASE = "http://ex.org"

P_HASTURN = f"{BASE}/p/hasTurn"
P_INDEX = f"{BASE}/p/index"
P_ROLE = f"{BASE}/p/role"
P_TEXT = f"{BASE}/p/text"
P_TOOL = f"{BASE}/p/tool"
P_TS = f"{BASE}/p/ts"
P_PREV = f"{BASE}/p/prev"
P_MENTIONS = f"{BASE}/p/mentions"
P_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
C_ENTITY = f"{BASE}/c/Entity"

XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"

TS_FORMAT = "%Y-%m-%dT%H:%M:%SZ"


def conv_iri(conv_id: str) -> str:
    return f"{BASE}/conv/{conv_id}"


def turn_iri(conv_id: str, turn_idx: int) -> str:
    return f"{BASE}/conv/{conv_id}/t/{turn_idx}"


def ent_iri(slug: str) -> str:
    return f"{BASE}/e/{slug}"


def lit(value: str) -> str:
    return f'"{value}"'


def typed_lit(value: str, datatype: str) -> str:
    return f'"{value}"^^<{datatype}>'


def turn_triples(
    conv_id: str,
    turn_idx: int,
    role: str,
    text: str,
    tool: str | None,
    ts: datetime | None,
) -> list[tuple[str, str, str]]:
    """All (s, p, o) string triples emitted for one transcript turn.

    Per-turn text equality invariant: the raw turn text appears verbatim as
    the lexical form of the P_TEXT literal (input_hint requirement).
    """
    conv = conv_iri(conv_id)
    turn = turn_iri(conv_id, turn_idx)
    out: list[tuple[str, str, str]] = [
        (conv, P_HASTURN, turn),
        (turn, P_INDEX, typed_lit(str(turn_idx), XSD_INTEGER)),
        (turn, P_ROLE, lit(role)),
        (turn, P_TEXT, lit(text)),
    ]
    if tool:
        out.append((turn, P_TOOL, lit(tool)))
    if ts is not None:
        out.append((turn, P_TS, typed_lit(ts.strftime(TS_FORMAT), XSD_DATETIME)))
    if turn_idx > 0:
        out.append((turn, P_PREV, turn_iri(conv_id, turn_idx - 1)))
    # Mentions: distinct surfaces (closed vocab, word-boundary, lower-cased),
    # entity-linked by argmax(prior + context bonus), tie-break slug.
    mentions = find_mentions(text)
    for surface in sorted(mentions):
        ent = ent_iri(best_link(surface, mentions[surface]))
        out.append((turn, P_MENTIONS, ent))
        # Entity typing: duplicated across every mentioning turn — exercises
        # dedup (E2) and object-skew handling (C_ENTITY is the hot object).
        out.append((ent, P_TYPE, C_ENTITY))
    return out
