"""Serialization sinks (reference S5: N-Triples/Turtle export,
src/hdt.rs:92-98, src/main.rs:139-167).

N-Triples terms are re-armored from the canonical HDT string encoding
(IRIs bare, literals quoted — src/hdt_graph.rs:90-103): IRIs get <>,
blank nodes and literals pass through, matching the reference's
``term_string`` inverse mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .query import KG, ids_to_strings


def _armor(col: str) -> F.Column:
    c = F.col(col)
    first = F.substring(c, 1, 1)
    return (
        F.when(first == '"', c)        # literal: already N-Triples-shaped
        .when(first == "_", c)          # blank node
        .otherwise(F.concat(F.lit("<"), c, F.lit(">")))  # IRI
    )


def nt_lines(triples_str: DataFrame) -> DataFrame:
    """(s,p,o) canonical strings -> one N-Triples line per row."""
    return triples_str.select(
        F.concat_ws(" ", _armor("s"), _armor("p"), _armor("o"), F.lit(".")).alias("value")
    )


def write_nt(kg: KG, path: str) -> None:
    """Enumerate the whole graph in SPO order and write N-Triples text."""
    nt_lines(ids_to_strings(kg, kg.spo)).write.mode("overwrite").text(path)
