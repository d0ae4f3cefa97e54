"""SQL / basic-graph-pattern query surface (reference §2.5: the
experimental SPARQL feature, src/sparql.rs:45-83).

The reference plugs its quad-pattern lookup into an external SPARQL
evaluator; everything relational (BGP joins, projection, expressions,
ORDER BY / LIMIT / UNION) is delegated.  Here the delegation target is
Catalyst: ``register_views`` exposes the KG as SQL views and
``bgp`` compiles a basic graph pattern (list of triple patterns with
shared variables) into self-joins of the triples view — nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .query import KG, ids_to_strings


def query(kg: KG, q: str) -> DataFrame:
    """Evaluate a SPARQL SELECT string (the reference's string entry point,
    ``sparql::query`` src/sparql.rs:79-83) — parse, compile BGPs through
    ``bgp``, delegate expressions/modifiers to Catalyst."""
    from .sparql_parser import query_df

    return query_df(kg, q)


def register_views(spark: SparkSession, kg: KG, prefix: str = "hdt") -> None:
    """Expose string-level triples + dictionary sections as SQL temp views.

    ``{prefix}_triples(s, p, o)`` is the string-level full enumeration;
    ``{prefix}_spo`` the ID-level projection; four ``{prefix}_dict_*``
    views carry (term, id).
    """
    kg.str_enum().createOrReplaceTempView(f"{prefix}_triples")
    kg.spo.createOrReplaceTempView(f"{prefix}_spo")
    kg.dict.shared.createOrReplaceTempView(f"{prefix}_dict_shared")
    kg.dict.subjects.createOrReplaceTempView(f"{prefix}_dict_subjects")
    kg.dict.predicates.createOrReplaceTempView(f"{prefix}_dict_predicates")
    kg.dict.objects.createOrReplaceTempView(f"{prefix}_dict_objects")


def bgp(kg: KG, patterns: list[tuple[str, str, str]]) -> DataFrame:
    """Evaluate a basic graph pattern: each element is (s, p, o) where a
    leading '?' marks a variable; constants are canonical term strings.

    Compiles to conjunctive self-joins over the string-level triples
    (Catalyst reorders/broadcasts as it sees fit); returns one column per
    distinct variable, named without the '?'.
    """
    enum = kg.str_enum()

    def is_var(t: str) -> bool:
        return t.startswith("?")

    result: DataFrame | None = None
    bound_vars: dict[str, str] = {}  # var -> column name in result

    for i, (s, p, o) in enumerate(patterns):
        t = enum.alias(f"t{i}")
        cols, filters, joins = {}, [], []
        for pos, term in (("s", s), ("p", p), ("o", o)):
            col = F.col(f"t{i}.{pos}")
            if is_var(term):
                v = term[1:]
                if v in cols:           # same variable twice in one pattern
                    filters.append(col == cols[v])
                elif v in bound_vars:
                    joins.append((bound_vars[v], col))
                else:
                    cols[v] = col
            else:
                filters.append(col == term)
        step = t
        for f in filters:
            step = step.filter(f)
        proj = step.select(
            *[c.alias(v) for v, c in cols.items()],
            *[c.alias(f"_join_{j}") for j, (_, c) in enumerate(joins)],
        )
        if result is None:
            result = proj
            bound_vars.update({v: v for v in cols})
        else:
            if joins:
                cond = None
                for j, (existing, _) in enumerate(joins):
                    e = F.col(f"_l.{existing}") == F.col(f"_r._join_{j}")
                    cond = e if cond is None else (cond & e)
                result = result.alias("_l").join(proj.alias("_r"), cond, "inner")
                result = result.drop(*[f"_join_{j}" for j in range(len(joins))])
            else:
                result = result.crossJoin(proj)
            bound_vars.update({v: v for v in cols})
    assert result is not None, "empty BGP"
    return result.select(*sorted(bound_vars))
