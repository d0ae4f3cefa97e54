"""Generic file sources (reference S3: the N-Triples conversion entry,
``Hdt::read_nt`` src/nt.rs:28-43 with the line parser at src/nt.rs:165-219).

``read_nt`` closes the reference's main conversion path: an ``.nt`` file
parses straight into the canonical ``(s, p, o)`` string schema that
``dict_builder.build_dict`` + ``encode.encode_triples`` already consume, so
``spark.read.text -> read_nt -> build_kg`` is the full file-to-HDT pipeline.

Parsing is one JVM regexp pass per line (no Python): a single anchored
regex splits subject / predicate / object, then terms are de-armored back
to the canonical in-memory encoding (IRIs bare, literal lexical forms
NT-unescaped — the exact inverse of export.nt_lines, round-trip-tested the
way the reference round-trips write_nt/read_nt in src/nt.rs:280-304).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .export import _LIT_RE, unescape_nt

# One capture per term.  Object alternatives: IRI | blank node | literal
# with escaped chars and an optional ^^<dt> / @lang suffix.
_NT_LINE = (
    r'^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+'
    r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9\-]+)?)\s*\.\s*$'
)


def _dearmor(col: F.Column) -> F.Column:
    first = F.substring(col, 1, 1)
    lex = F.regexp_extract(col, _LIT_RE, 1)
    suffix = F.regexp_extract(col, _LIT_RE, 2)
    literal = F.concat(F.lit('"'), unescape_nt(lex), F.lit('"'), suffix)
    return (
        F.when(first == "<", F.regexp_extract(col, r"^<(.*)>$", 1))
        .when(first == '"', literal)
        .otherwise(col)                 # blank node
    )


def parse_nt_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """(value: one NT line) -> (s, p, o) canonical strings.

    Blank lines and ``#`` comments are skipped (src/nt.rs:173-176);
    malformed lines are dropped (the scan stays a single filter+project —
    count them separately if ingestion QC is needed).
    """
    v = F.col(value_col)
    parsed = (
        lines.filter(~F.trim(v).rlike(r"^(#.*)?$"))
        .select(
            F.regexp_extract(v, _NT_LINE, 1).alias("s_raw"),
            F.regexp_extract(v, _NT_LINE, 2).alias("p_raw"),
            F.regexp_extract(v, _NT_LINE, 3).alias("o_raw"),
        )
        .filter((F.col("s_raw") != "") & (F.col("p_raw") != "")
                & (F.col("o_raw") != ""))
    )
    return parsed.select(
        _dearmor(F.col("s_raw")).alias("s"),
        _dearmor(F.col("p_raw")).alias("p"),
        _dearmor(F.col("o_raw")).alias("o"),
    )


def read_nt(spark: SparkSession, path: str) -> DataFrame:
    """Read an N-Triples file (or directory of part files) into (s, p, o)."""
    return parse_nt_lines(spark.read.text(path))
