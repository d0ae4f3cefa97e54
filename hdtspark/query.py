"""Triple-pattern query dispatch (reference src/hdt.rs:266-314).

``triples_with_pattern(kg, s, p, o)`` mirrors the reference's 8-arm
dispatch: constants are looked up in the dictionary first; any unknown
constant short-circuits to an empty result before launching a scan
(reference src/hdt.rs:270-274).  Bound patterns route to the projection
whose sort order makes the filter a pruned scan:

    s bound           -> SPO   (reference SubjectIter, subject_iter.rs)
    o bound (s free)  -> OPS   (reference ObjectIter / PredicateObjectIter
                                 over the OP index, object_iter.rs)
    p bound only      -> PSO   (reference PredicateIter over the wavelet
                                 tree, predicate_iter.rs)
    none bound        -> SPO full scan (reference SubjectIter::new)

Results are translated back to strings by dictionary joins (the set-based
analog of the reference's per-position TripleCache, src/hdt.rs:349-384).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .dict_builder import FourSectDict


@dataclass
class KG:
    """The materialized knowledge graph: dictionary + sorted projections."""

    dict: FourSectDict
    spo: DataFrame
    ops: DataFrame
    pso: DataFrame
    adj: DataFrame | None = None
    triples_str: DataFrame | None = None
    stats: dict = field(default_factory=dict)


def _lookup_ids(kg: KG, s: str | None, p: str | None, o: str | None):
    """All bound-constant lookups in ONE Spark job (a union of the three
    dictionary point-filters), mirroring the reference's three
    ``string_to_id`` calls (src/hdt.rs:269) without three scheduler
    round-trips.  Missing constant -> 0 (the reference's sentinel)."""
    parts = []
    if s is not None:
        parts.append(kg.dict.subj_global.filter(F.col("term") == s)
                     .select(F.lit("s").alias("k"), "id"))
    if p is not None:
        parts.append(kg.dict.predicates.filter(F.col("term") == p)
                     .select(F.lit("p").alias("k"), "id"))
    if o is not None:
        parts.append(kg.dict.obj_global.filter(F.col("term") == o)
                     .select(F.lit("o").alias("k"), "id"))
    found: dict[str, int] = {}
    if parts:
        u = parts[0]
        for df in parts[1:]:
            u = u.unionAll(df)
        for row in u.collect():
            found[row["k"]] = row["id"]
    sid = (found.get("s", 0)) if s is not None else None
    pid = (found.get("p", 0)) if p is not None else None
    oid = (found.get("o", 0)) if o is not None else None
    return sid, pid, oid


def _empty_result(spark) -> DataFrame:
    return spark.createDataFrame([], "s string, p string, o string")


def triple_ids_with_pattern(kg: KG, s: str | None, p: str | None,
                            o: str | None) -> DataFrame | None:
    """ID-level pattern query; None means the empty short-circuit fired."""
    sid, pid, oid = _lookup_ids(kg, s, p, o)
    if 0 in (sid, pid, oid):
        return None

    if sid is not None:
        df = kg.spo.filter(F.col("s") == sid)
        if pid is not None:
            df = df.filter(F.col("p") == pid)
        if oid is not None:
            df = df.filter(F.col("o") == oid)
    elif oid is not None:
        df = kg.ops.filter(F.col("o") == oid)
        if pid is not None:
            df = df.filter(F.col("p") == pid)
    elif pid is not None:
        df = kg.pso.filter(F.col("p") == pid)
    else:
        df = kg.spo
    return df.select("s", "p", "o")


def ids_to_strings(kg: KG, ids: DataFrame) -> DataFrame:
    """(s,p,o ids) -> (s,p,o strings) via three dictionary joins.

    Each dict side is broadcast while its exact term count (known from the
    build) fits executor memory, so translation never shuffles the result
    set; huge dictionaries fall back to shuffle joins with AQE.
    """
    from .encode import BROADCAST_DICT_MAX_TERMS

    def maybe_b(df: DataFrame, n_terms: int) -> DataFrame:
        return F.broadcast(df) if n_terms < BROADCAST_DICT_MAX_TERMS else df

    sd = maybe_b(kg.dict.subj_global.select(
        F.col("id").alias("s"), F.col("term").alias("s_term")),
        kg.dict.n_shared + kg.dict.n_subjects)
    pd_ = maybe_b(kg.dict.predicates.select(
        F.col("id").alias("p"), F.col("term").alias("p_term")),
        kg.dict.n_predicates)
    od = maybe_b(kg.dict.obj_global.select(
        F.col("id").alias("o"), F.col("term").alias("o_term")),
        kg.dict.n_shared + kg.dict.n_objects)
    return (
        ids.join(sd, "s").join(pd_, "p").join(od, "o")
        .select(F.col("s_term").alias("s"), F.col("p_term").alias("p"),
                F.col("o_term").alias("o"))
    )


def triples_with_pattern(kg: KG, s: str | None = None, p: str | None = None,
                         o: str | None = None) -> DataFrame:
    """String-level pattern query — the reference's main public API."""
    ids = triple_ids_with_pattern(kg, s, p, o)
    if ids is None:
        return _empty_result(kg.spo.sparkSession)
    return ids_to_strings(kg, ids)


def triples_matching(kg: KG, s_terms: list[str] | None = None,
                     p_terms: list[str] | None = None,
                     o_terms: list[str] | None = None) -> DataFrame:
    """Q10: multi-constant matchers (reference src/hdt_graph.rs:138-202).

    Each position may carry a term LIST; the reference routes singletons to
    the indexed paths and evaluates lists as residual post-filters — here a
    singleton becomes the projection-routing constant and lists become
    Catalyst ``isin`` filters (pushed down to the scan).
    """
    def ids_for(dict_df: DataFrame, terms: list[str]) -> list[int]:
        rows = dict_df.filter(F.col("term").isin(terms)).select("id").collect()
        return [r["id"] for r in rows]

    sids = ids_for(kg.dict.subj_global, s_terms) if s_terms else None
    pids = ids_for(kg.dict.predicates, p_terms) if p_terms else None
    oids = ids_for(kg.dict.obj_global, o_terms) if o_terms else None
    if (s_terms and not sids) or (p_terms and not pids) or (o_terms and not oids):
        return _empty_result(kg.spo.sparkSession)

    # Route to the projection matching the most selective single-bound slot;
    # EVERY other bound slot (singleton or list) remains a residual isin
    # filter — dropping a non-routed singleton returns wrong supersets.
    routed = None
    if sids and len(sids) == 1:
        df, routed = kg.spo.filter(F.col("s") == sids[0]), "s"
    elif oids and len(oids) == 1:
        df, routed = kg.ops.filter(F.col("o") == oids[0]), "o"
    elif pids and len(pids) == 1:
        df, routed = kg.pso.filter(F.col("p") == pids[0]), "p"
    else:
        df = kg.spo
    if sids and routed != "s":
        df = df.filter(F.col("s").isin(sids))
    if pids and routed != "p":
        df = df.filter(F.col("p").isin(pids))
    if oids and routed != "o":
        df = df.filter(F.col("o").isin(oids))
    return ids_to_strings(kg, df.select("s", "p", "o"))


def subjects_with_po(kg: KG, p: str, o: str) -> DataFrame:
    """?PO projection to subjects only (reference src/hdt.rs:236-253)."""
    ids = triple_ids_with_pattern(kg, None, p, o)
    if ids is None:
        return kg.spo.sparkSession.createDataFrame([], "s string")
    sd = kg.dict.subj_global.select(F.col("id").alias("s"), F.col("term").alias("s_term"))
    return ids.select("s").join(sd, "s").select(F.col("s_term").alias("s"))
