"""Turtle sink + source (reference S5 convert-to-ttl, src/main.rs:142-152,
and ttl input for `info`, src/main.rs:96-101).

The sink emits prefix-compacted, subject-grouped pretty Turtle:

    @prefix ex: <http://ex.org/> .

    ex:s ex:p1 ex:o1, ex:o2 ;
        ex:p2 "lit" .

Block construction is fully JVM-side (two aggregations over the string
enumeration: objects per (s,p), then predicates per s — ``concat_ws`` /
``array_join`` / ``sort_array``); the driver only streams finished blocks
to the file (``toLocalIterator``, one partition at a time).  Turtle — like
HDT binary — is a sequential single-file interop format; the distributed
sink for bulk data remains N-Triples (export.write_nt), which is
line-splittable.

The source is a driver-side recursive-descent parser for the subset the
sink emits plus common hand-written Turtle (@prefix/@base, prefixed names,
``a``, ``;``/``,`` continuation, quoted literals with language tags or
datatypes, the five NT escapes and \\uXXXX) — Turtle is stateful (prefix
table, multi-line blocks), so it cannot be line-parallelized the way the
NT source is; parsed triples become a normal DataFrame.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# conservative local-name grammar: only compact when the remainder is safe
_PN_LOCAL = re.compile(r"^[A-Za-z0-9_]([A-Za-z0-9_\-]*[A-Za-z0-9_])?$")


def default_prefixes() -> dict[str, str]:
    return {"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#"}


# --- term rendering (Spark-side) ---------------------------------------------

def _escape_ttl(c: F.Column) -> F.Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


_LIT_RE = r'^"((?s).*)"((\^\^<[^>]*>)|(@[A-Za-z0-9\-]*))?$'


def _render(col: str, prefixes: dict[str, str], predicate: bool = False) -> F.Column:
    """Canonical term string -> Turtle token (prefix-compacted IRI,
    escaped literal, blank node, or ``a`` for rdf:type in P position)."""
    c = F.col(col)
    first = F.substring(c, 1, 1)
    lex = F.regexp_extract(c, _LIT_RE, 1)
    suffix = F.regexp_extract(c, _LIT_RE, 2)
    literal = F.concat(F.lit('"'), _escape_ttl(lex), F.lit('"'), suffix)

    iri: F.Column = F.concat(F.lit("<"), c, F.lit(">"))
    # longest-prefix-first so nested namespaces compact correctly
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        local = F.substring(c, len(ns) + 1, 1_000_000)
        ok = c.startswith(ns) & local.rlike(_PN_LOCAL.pattern)
        iri = F.when(ok, F.concat(F.lit(pfx + ":"), local)).otherwise(iri)
    if predicate:
        iri = F.when(c == RDF_TYPE, F.lit("a")).otherwise(iri)
    return (
        F.when(first == '"', literal)
        .when(first == "_", c)
        .otherwise(iri)
    )


def ttl_blocks(triples_str: DataFrame,
               prefixes: dict[str, str] | None = None) -> DataFrame:
    """(s,p,o) canonical strings -> (s, value): one pretty subject block per
    row, objects comma-grouped per predicate, predicates ';'-chained."""
    prefixes = default_prefixes() if prefixes is None else prefixes
    po = triples_str.select(
        F.col("s"),
        _render("p", prefixes, predicate=True).alias("pt"),
        _render("o", prefixes).alias("ot"),
    )
    per_pred = (
        po.groupBy("s", "pt")
        .agg(F.array_join(F.array_sort(F.collect_list("ot")), ", ").alias("objs"))
        .select("s", F.concat_ws(" ", "pt", "objs").alias("pline"))
    )
    return (
        per_pred.groupBy("s")
        .agg(F.array_join(F.array_sort(F.collect_list("pline")), " ;\n    ")
             .alias("body"))
        .select(
            "s",
            F.concat(_render("s", prefixes), F.lit(" "), F.col("body"),
                     F.lit(" .")).alias("value"))
    )


def write_ttl(kg, path: str, prefixes: dict[str, str] | None = None) -> None:
    """S5 Turtle sink: prefix header + subject blocks streamed to one file
    (blocks are built distributed; the driver holds one partition)."""
    prefixes = default_prefixes() if prefixes is None else prefixes
    blocks = ttl_blocks(kg.str_enum(), prefixes).orderBy("s")
    with open(path, "w", encoding="utf-8") as fh:
        for pfx, ns in sorted(prefixes.items()):
            fh.write(f"@prefix {pfx}: <{ns}> .\n")
        fh.write("\n")
        for r in blocks.toLocalIterator():
            fh.write(r["value"])
            fh.write("\n")


# --- Turtle source (driver-side parser) ---------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<comment> \#[^\n]* )
  | (?P<iri> <[^>]*> )
  | (?P<lit> "(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^(?:<[^>]*>|[A-Za-z_][\w\-]*:[\w\-]*))?
           | '(?:[^'\\]|\\.)*'(?:@[A-Za-z0-9\-]+|\^\^(?:<[^>]*>|[A-Za-z_][\w\-]*:[\w\-]*))? )
  | (?P<blank> _:[\w\-]+ )
  | (?P<directive> @[A-Za-z]+ )
  | (?P<pname> [A-Za-z_][\w\-]*:(?:[\w\.\-]*[\w\-])? | :(?:[\w\.\-]*[\w\-])? )
  | (?P<num> [+-]?\d+(\.\d+)?([eE][+-]?\d+)? )
  | (?P<kw> [Aa](?![\w:]) )
  | (?P<punct> [.;,\[\]] )
  | (?P<other> \S )
    """,
    re.VERBOSE,
)
# pname local parts may contain dots but not END with one (Turtle PN_LOCAL),
# so `ex:o.` splits into a pname and the statement dot; the catch-all
# 'other' class turns bytes no rule matches into a hard parse error instead
# of finditer silently skipping them.

_UNESCAPE = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
    "\\'": "'",
}


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            two = body[i:i + 2]
            if two in ("\\u", "\\U"):
                width = 4 if two == "\\u" else 8
                out.append(chr(int(body[i + 2:i + 2 + width], 16)))
                i += 2 + width
                continue
            out.append(_UNESCAPE.get(two, two[1]))
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


class _TtlParser:
    def __init__(self, text: str):
        self.toks = []
        for m in _TOKEN.finditer(text):
            if m.lastgroup == "comment":
                continue
            if m.lastgroup == "other":
                raise ValueError(
                    f"unexpected character {m.group()!r} at offset "
                    f"{m.start()} in Turtle input")
            self.toks.append((m.lastgroup, m.group()))
        self.i = 0
        self.base = ""
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[str, str, str]] = []
        self._anon = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def term(self, kind: str, v: str, predicate: bool = False) -> str:
        if kind == "iri":
            iri = v[1:-1]
            return self.base + iri if self.base and "://" not in iri else iri
        if kind == "pname":
            pfx, local = v.split(":", 1)
            if pfx not in self.prefixes:
                raise ValueError(f"unknown prefix {pfx!r}")
            return self.prefixes[pfx] + local
        if kind == "blank":
            return v
        if kind == "kw" and v in ("a", "A"):
            return RDF_TYPE
        if kind == "lit":
            quote = v[0]
            body_end = v.rfind(quote)
            body = _unescape(v[1:body_end])
            suffix = v[body_end + 1:]
            if suffix.startswith("^^") and not suffix.startswith("^^<"):
                # prefixed datatype -> canonical <iri> form
                suffix = "^^<" + self.term("pname", suffix[2:]) + ">"
            # canonical KG form: raw lexical body, "-quoted, suffix verbatim
            return '"' + body + '"' + suffix
        if kind == "num":
            xsd = ("http://www.w3.org/2001/XMLSchema#decimal"
                   if "." in v or "e" in v.lower()
                   else "http://www.w3.org/2001/XMLSchema#integer")
            return f'"{v}"^^<{xsd}>'
        raise ValueError(f"unexpected term {v!r}")

    def parse(self) -> list[tuple[str, str, str]]:
        while self.peek()[0] != "eof":
            k, v = self.peek()
            if k == "directive":
                self.next()
                d = v.lower()
                if d == "@prefix":
                    kp, vp = self.next()
                    assert kp == "pname" and vp.endswith(":"), "@prefix pfx:"
                    ki, vi = self.next()
                    assert ki == "iri", "@prefix needs <iri>"
                    self.prefixes[vp[:-1]] = vi[1:-1]
                elif d == "@base":
                    ki, vi = self.next()
                    assert ki == "iri", "@base needs <iri>"
                    self.base = vi[1:-1]
                else:
                    raise ValueError(f"unsupported directive {v}")
                kd, vd = self.next()
                assert (kd, vd) == ("punct", "."), "directive needs final ."
                continue
            self._statement()
        return self.triples

    def _node(self) -> str:
        """A subject/object node: plain term or anonymous blank node
        '[ p o ; ... ]' (fresh _:anonN label; inner triples recorded)."""
        if self.peek() == ("punct", "["):
            self.next()
            self._anon += 1
            label = f"_:anon{self._anon}"
            if self.peek() != ("punct", "]"):
                end = self._pred_obj_list(label)
                if end != ("punct", "]"):
                    raise ValueError("unterminated [ ] blank node")
            else:
                self.next()
            return label
        return self.term(*self.next())

    def _pred_obj_list(self, s: str):
        """predicate-object list for subject ``s``; consumes and returns the
        terminating token ('.' or ']')."""
        while True:
            p = self.term(*self.next(), predicate=True)
            while True:
                o = self._node()
                self.triples.append((s, p, o))
                k, v = self.next()
                if (k, v) == ("punct", ","):
                    continue
                break
            if (k, v) == ("punct", ";"):
                # allow trailing ';' before the terminator
                if self.peek() in (("punct", "."), ("punct", "]")):
                    return self.next()
                continue
            return (k, v)

    def _statement(self) -> None:
        s = self._node()
        end = self._pred_obj_list(s)
        if end != ("punct", "."):
            raise ValueError(f"statement must end with '.', got {end[1]!r}")


def parse_ttl(text: str) -> list[tuple[str, str, str]]:
    """Turtle text -> canonical (s, p, o) term strings (IRIs bare, literals
    quoted with @lang/^^<dt> suffixes — the KG's internal encoding)."""
    return _TtlParser(text).parse()


def read_ttl(spark, path: str) -> DataFrame:
    """S3/ttl: parse a Turtle file into a raw string-triples DataFrame
    (driver-side parse — Turtle is stateful and not line-splittable; use
    the NT source for bulk distributed ingestion)."""
    with open(path, encoding="utf-8") as fh:
        triples = parse_ttl(fh.read())
    return spark.createDataFrame(triples or [("", "", "")],
                                 "s string, p string, o string").filter(
        F.col("s") != "")
