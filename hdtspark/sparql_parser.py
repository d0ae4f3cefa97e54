"""SPARQL string entry point (reference src/sparql.rs:79-83).

The reference hands the query text to an external parser (spargebra) and
evaluator (spareval) and only provides quad-pattern lookup; the relational
work is delegated.  This module is the same shape Spark-first: a small
recursive-descent parser extracts the STRUCTURE (select list, BGPs, UNION,
ORDER BY / LIMIT / OFFSET, BASE/PREFIX), BGPs compile through the existing
``sparql.bgp`` join compiler, and PROJECTION EXPRESSIONS (e.g.
``(CONCAT(?y,'123') AS ?x)``) are delegated to Catalyst by rewriting
``?var`` -> column name and evaluating ``spark.sql`` over a temp view —
exactly the subset the reference's tests exercise (src/sparql.rs:114-120:
the three single-pattern selects, expression projection with ORDER BY /
LIMIT, and BASE + UNION).

Grammar (case-insensitive keywords)::

    query  := (BASE <iri> | PREFIX pfx: <iri>)*
              ( SELECT DISTINCT? proj | ASK )
              WHERE? { group } (GROUP BY ?var+)? (HAVING '(' expr ')')*
              (ORDER BY ord+)? (LIMIT n)? (OFFSET n)?
    proj   := '*' | ( ?var | '(' expr AS ?var ')' )+
    group  := (bgp | FILTER '(' expr ')' | OPTIONAL { bgp })*
            | { group } (UNION { group })*
    term   := <iri> | ?var | "lit"(@lang|^^<iri>)? | _:b | pfx:name | a

FILTER expressions are re-serialized to Spark SQL (?var -> `var`,
REGEX -> regexp_like, STRSTARTS/STRENDS/CONTAINS/UCASE/LCASE/STRLEN,
&&/||/! -> AND/OR/NOT) and evaluated by Catalyst per UNION arm.  Caveat:
comparisons operate on the canonical TERM STRINGS (typed-literal semantics
are the full engine's job — the reference delegates them to spareval the
same way, src/sparql.rs:45-83).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .query import KG

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(
    r"""
    (?P<iri>  <[^>\s]*> )   # no whitespace inside: a bare '<' comparison
                            # in FILTER can never be swallowed as an IRI
  | (?P<lit>  "(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?
            | '(?:[^'\\]|\\.)*'(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)? )
  | (?P<var>  \?[A-Za-z_]\w* )
  | (?P<blank> _:\w+ )
  | (?P<lbrace> \{ ) | (?P<rbrace> \} )
  | (?P<lparen> \( ) | (?P<rparen> \) )
  | (?P<dot> \. )
  | (?P<word> [A-Za-z_][\w\-]*(:[\w\-]*)? )
  | (?P<num>  \d+ )
  | (?P<other> [^\s] )
    """,
    re.VERBOSE,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out = []
    for m in _TOKEN.finditer(q):
        kind = m.lastgroup
        if kind == "word" and ":" in m.group():
            kind = "pname"
        out.append((kind, m.group()))
    return out


@dataclass
class Query:
    select: list[tuple[str, str | None]]  # (var, sql_expr or None) ; [("*", None)] = all
    groups: list[list[tuple[str, str, str]]]  # UNION of BGPs
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    offset: int | None = None
    # per-arm FILTER expressions (Spark SQL strings), aligned with groups
    filters: list[list[str]] = field(default_factory=list)
    # per-arm OPTIONAL pattern groups (left joins), aligned with groups
    optionals: list[list[list[tuple[str, str, str]]]] = field(default_factory=list)
    distinct: bool = False
    group_by: list[str] = field(default_factory=list)   # var names
    having: list[str] = field(default_factory=list)     # Spark SQL strings
    form: str = "select"                                # 'select' | 'ask'


# SPARQL builtin -> Spark SQL function (the FILTER subset; expressions are
# delegated to Catalyst like projection expressions are)
_SPARQL_FN = {
    "REGEX": "regexp_like",
    "STRSTARTS": "startswith",
    "STRENDS": "endswith",
    "CONTAINS": "contains",
    "UCASE": "upper",
    "LCASE": "lower",
    "STRLEN": "length",
}


class _Parser:
    def __init__(self, q: str):
        self.toks = _tokenize(q)
        self.i = 0
        self.base: str | None = None
        self.prefixes: dict[str, str] = {}

    # -- token helpers ------------------------------------------------------
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_word(self, word: str):
        k, v = self.next()
        if v.upper() != word:
            raise ValueError(f"expected {word}, got {v!r}")

    def at_word(self, word: str) -> bool:
        k, v = self.peek()
        return k in ("word", "pname") and v.upper() == word

    # -- term mapping -------------------------------------------------------
    def _resolve_iri(self, raw: str) -> str:
        iri = raw[1:-1]
        if self.base and ":" not in iri.split("/")[0]:
            return self.base.rstrip("/") + "/" + iri.lstrip("/")
        return iri

    def term(self, kind: str, v: str) -> str:
        if kind == "iri":
            return self._resolve_iri(v)
        if kind == "lit":
            if v.startswith("'"):  # normalize to the canonical "-delimited form
                body_end = v.rfind("'")
                body = v[1:body_end].replace("\\'", "'").replace('"', '\\"')
                v = f'"{body}"' + v[body_end + 1:]
            return v
        if kind in ("var", "blank"):
            return v
        if kind == "pname":
            pfx, local = v.split(":", 1)
            if pfx not in self.prefixes:
                raise ValueError(f"unknown prefix {pfx!r}")
            return self.prefixes[pfx] + local
        if kind == "word" and v == "a":
            return RDF_TYPE
        raise ValueError(f"unexpected term {v!r}")

    # -- grammar ------------------------------------------------------------
    def parse(self) -> Query:
        while True:
            if self.at_word("BASE"):
                self.next()
                k, v = self.next()
                assert k == "iri", "BASE needs an <iri>"
                self.base = v[1:-1]
            elif self.at_word("PREFIX"):
                self.next()
                k, v = self.next()
                assert k == "pname" and v.endswith(":"), "PREFIX needs pfx:"
                k2, v2 = self.next()
                assert k2 == "iri", "PREFIX needs an <iri>"
                self.prefixes[v[:-1]] = v2[1:-1]
            else:
                break
        form = "select"
        if self.at_word("ASK"):
            self.next()
            select = [("*", None)]
            form = "ask"
        else:
            self.expect_word("SELECT")
        distinct = False
        if form == "select":
            if self.at_word("DISTINCT"):
                self.next()
                distinct = True
            select = self._select_list()
        if self.at_word("WHERE"):
            self.next()
        arms = self._group()
        q = Query(select=select, groups=[patterns for patterns, _, _ in arms],
                  filters=[flt for _, flt, _ in arms],
                  optionals=[opt for _, _, opt in arms], distinct=distinct,
                  form=form)
        while self.peek()[0] != "eof":
            if self.at_word("GROUP"):
                self.next()
                self.expect_word("BY")
                while self.peek()[0] == "var":
                    q.group_by.append(self.next()[1][1:])
                if not q.group_by:
                    raise ValueError("GROUP BY needs at least one ?var")
            elif self.at_word("HAVING"):
                self.next()
                sql, _ = self._read_paren_sql()
                q.having.append(sql)
            elif self.at_word("ORDER"):
                self.next()
                self.expect_word("BY")
                while True:
                    k, v = self.peek()
                    if k == "var":
                        self.next()
                        q.order_by.append((v[1:], False))
                    elif k in ("word",) and v.upper() in ("ASC", "DESC"):
                        desc = v.upper() == "DESC"
                        self.next()
                        assert self.next()[0] == "lparen"
                        kv, vv = self.next()
                        assert kv == "var"
                        assert self.next()[0] == "rparen"
                        q.order_by.append((vv[1:], desc))
                    else:
                        break
            elif self.at_word("LIMIT"):
                self.next()
                q.limit = int(self.next()[1])
            elif self.at_word("OFFSET"):
                self.next()
                q.offset = int(self.next()[1])
            else:
                raise ValueError(f"unexpected trailing token {self.peek()[1]!r}")
        return q

    def _select_list(self) -> list[tuple[str, str | None]]:
        out: list[tuple[str, str | None]] = []
        while True:
            k, v = self.peek()
            if k == "var":
                self.next()
                out.append((v[1:], None))
            elif k == "other" and v == "*":
                self.next()
                return [("*", None)]
            elif k == "lparen":
                out.append(self._expr_as())
            else:
                break
        if not out:
            raise ValueError("empty SELECT list")
        return out

    def _expr_as(self) -> tuple[str, str]:
        """( expr AS ?var ) — expr is re-serialized as Spark SQL with
        ?var -> var; Catalyst parses/evaluates it (CONCAT, arithmetic...)."""
        sql, var = self._read_paren_sql(allow_as=True)
        if var is None:
            raise ValueError("projection expression missing AS ?var")
        return (var, sql)

    def _read_paren_sql(self, allow_as: bool = False) -> tuple[str, str | None]:
        """Read a balanced '(...)' group and re-serialize it as Spark SQL:
        ?var -> `var`, SPARQL builtins mapped (_SPARQL_FN), &&/||/! ->
        AND/OR/NOT.  Shared by projection expressions, FILTER and BIND.

        Operator mapping happens PER TOKEN while serializing — multi-char
        operators ('&&', '!=', '<=', '>=') arrive as consecutive single-char
        'other' tokens and are merged by peeking the next token.  Literal
        token bodies are never rewritten, so a constant like
        ``"hello!"`` or ``"a && b"`` survives verbatim (string replacement
        over the joined SQL mangled exactly these).
        """
        assert self.next()[0] == "lparen"
        depth, parts = 1, []
        var = None
        while depth > 0:
            k, v = self.next()
            if k == "eof":
                raise ValueError("unbalanced ( in expression")
            if k == "lparen":
                depth += 1
                parts.append("(")
            elif k == "rparen":
                depth -= 1
                if depth > 0:
                    parts.append(")")
            elif allow_as and k in ("word", "pname") and v.upper() == "AS" and depth == 1:
                kv, vv = self.next()
                assert kv == "var", "AS needs ?var"
                var = vv[1:]
            elif k == "var":
                parts.append(f"`{v[1:]}`")
            elif k == "lit":
                if v.startswith('"'):  # Spark SQL string literals are '-quoted
                    body_end = v.rfind('"')
                    body = v[1:body_end].replace("'", "\\'")
                    v = f"'{body}'" + v[body_end + 1:]
                parts.append(v)
            elif k == "word" and v.upper() in _SPARQL_FN:
                parts.append(_SPARQL_FN[v.upper()])
            elif k == "dot":
                parts.append(".")
            elif k == "other":
                nk, nv = self.peek()
                if v in ("&", "|") and (nk, nv) == ("other", v):
                    self.next()
                    parts.append("AND" if v == "&" else "OR")
                elif v in ("!", "<", ">") and (nk, nv) == ("other", "="):
                    self.next()
                    parts.append(v + "=")
                elif v == "!":
                    parts.append("NOT")
                else:
                    parts.append(v)
            else:
                parts.append(v)
        return " ".join(parts), var

    def _group(self):
        """-> list of UNION arms, each (patterns, filter_sqls, optionals)."""
        assert self.next()[0] == "lbrace", "expected {"
        if self.peek()[0] == "lbrace":  # { group } UNION { group } ...
            arms = self._group()
            while self.at_word("UNION"):
                self.next()
                arms += self._group()
            assert self.next()[0] == "rbrace", "expected }"
            return arms
        patterns, filters, optionals = [], [], []
        while self.peek()[0] != "rbrace":
            if self.at_word("FILTER"):
                self.next()
                sql, _ = self._read_paren_sql()
                filters.append(sql)
                if self.peek()[0] == "dot":
                    self.next()
                continue
            if self.at_word("OPTIONAL"):
                self.next()
                inner = self._group()
                if len(inner) != 1 or inner[0][1] or inner[0][2]:
                    raise ValueError(
                        "OPTIONAL supports a plain pattern group (no nested "
                        "UNION/FILTER/OPTIONAL)")
                optionals.append(inner[0][0])
                if self.peek()[0] == "dot":
                    self.next()
                continue
            s = self.term(*self.next())
            p = self.term(*self.next())
            o = self.term(*self.next())
            patterns.append((s, p, o))
            if self.peek()[0] == "dot":
                self.next()
        self.next()  # rbrace
        return [(patterns, filters, optionals)]


def parse(q: str) -> Query:
    return _Parser(q).parse()


def query_df(kg: KG, q: str) -> DataFrame:
    """Evaluate a SPARQL SELECT string over the KG; one column per
    projected variable (the reference's QueryResults::Solutions analog)."""
    from . import sparql as bgp_mod

    from pyspark.sql import functions as F

    ast = parse(q)
    arms = []
    for i, patterns in enumerate(ast.groups):
        arm = bgp_mod.bgp(kg, patterns)
        # OPTIONAL = left outer join on the shared variables (unmatched
        # rows keep nulls for the optional-only variables)
        for opt_patterns in (ast.optionals[i] if i < len(ast.optionals) else []):
            odf = bgp_mod.bgp(kg, opt_patterns)
            common = [c for c in arm.columns if c in odf.columns]
            arm = (arm.join(odf, on=common, how="left") if common
                   else arm.join(odf, F.lit(True), "left"))
        # FILTER scopes to its group: apply per arm, before the UNION.
        # Expressions are Spark SQL (translated by the parser) — Catalyst
        # evaluates them over the arm's variable columns.
        for fsql in (ast.filters[i] if i < len(ast.filters) else []):
            arm = arm.where(F.expr(fsql))
        arms.append(arm)
    df = arms[0]
    for other in arms[1:]:
        df = df.unionByName(other, allowMissingColumns=True)

    if ast.form == "ask":
        # boolean result as a 1-row DataFrame (true iff any solution)
        return df.limit(1).groupBy().agg(
            (F.count("*") > 0).alias("ask"))

    spark = df.sparkSession
    view = "hdt_sparql_tmp"
    df.createOrReplaceTempView(view)
    if ast.select == [("*", None)]:
        proj = "*"
    else:
        proj = ", ".join(
            f"{expr} AS `{var}`" if expr else f"`{var}`"
            for var, expr in ast.select)
    sql = f"SELECT {'DISTINCT ' if ast.distinct else ''}{proj} FROM {view}"
    if ast.group_by:
        sql += " GROUP BY " + ", ".join(f"`{v}`" for v in ast.group_by)
    if ast.having:
        # SPARQL HAVING = SQL HAVING (post-aggregation filter)
        sql += " HAVING " + " AND ".join(f"({h})" for h in ast.having)
    if ast.order_by:
        sql += " ORDER BY " + ", ".join(
            f"`{v}`{' DESC' if d else ''}" for v, d in ast.order_by)
    if ast.limit is not None:
        sql += f" LIMIT {ast.limit}"
    if ast.offset is not None:
        sql += f" OFFSET {ast.offset}"
    return spark.sql(sql)
