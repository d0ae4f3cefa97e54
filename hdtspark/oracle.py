"""Single-threaded pure-Python reference implementation (test oracle).

Mirrors the reference construction lifecycle (reference src/nt.rs:28-162,
SURVEY.md §3.3 steps 2-7): extract string triples, build the four-section
dictionary by set intersection/difference + lexicographic sort (reference
src/nt.rs:245-266, src/dict_sect_pfc.rs:351-386), re-encode triples to dense
1-based IDs with the shared-section offset routing (reference
src/four_sect_dict.rs:98-150), sort + dedup SPO (src/nt.rs:131-135), and
build the adjacency (Bitmap-Triples-like) layout (src/triples.rs:213-274).

This is the source of truth for P/R and ID-layout equality in pytest.
Intentionally simple and non-distributed (~150 LoC).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .rules import turn_triples


@dataclass
class OracleKG:
    triples_str: list[tuple[str, str, str, str, int]]  # s,p,o,conv_id,turn_idx
    shared: list[str] = field(default_factory=list)
    subjects: list[str] = field(default_factory=list)   # subject-only terms
    predicates: list[str] = field(default_factory=list)
    objects: list[str] = field(default_factory=list)    # object-only terms
    spo: list[tuple[int, int, int]] = field(default_factory=list)
    subj_id: dict[str, int] = field(default_factory=dict)  # global subject ids
    pred_id: dict[str, int] = field(default_factory=dict)
    obj_id: dict[str, int] = field(default_factory=dict)   # global object ids

    @property
    def n_shared(self) -> int:
        return len(self.shared)

    # --- id <-> string routing (reference src/four_sect_dict.rs:98-150) ---
    def subject_str(self, sid: int) -> str:
        if sid <= self.n_shared:
            return self.shared[sid - 1]
        return self.subjects[sid - self.n_shared - 1]

    def object_str(self, oid: int) -> str:
        if oid <= self.n_shared:
            return self.shared[oid - 1]
        return self.objects[oid - self.n_shared - 1]

    def predicate_str(self, pid: int) -> str:
        return self.predicates[pid - 1]

    def spo_str(self) -> list[tuple[str, str, str]]:
        return [
            (self.subject_str(s), self.predicate_str(p), self.object_str(o))
            for s, p, o in self.spo
        ]

    # --- pattern enumeration: filter over the full scan (the metamorphic
    # baseline the reference tests use, src/triples.rs:451-507) ---
    def pattern(self, s: str | None, p: str | None, o: str | None):
        sid = self.subj_id.get(s, 0) if s is not None else None
        pid = self.pred_id.get(p, 0) if p is not None else None
        oid = self.obj_id.get(o, 0) if o is not None else None
        if 0 in (sid, pid, oid):  # unknown constant -> empty (hdt.rs:270-274)
            return []
        return [
            t for t in self.spo_str()
            if (s is None or t[0] == s)
            and (p is None or t[1] == p)
            and (o is None or t[2] == o)
        ]

    # --- adjacency layout (reference src/triples.rs:213-274 semantics) ---
    def adjacency(self) -> list[tuple[int, list[int], list[int], list[int]]]:
        """Per subject: (s, preds, obj_offsets, objs) in SPO order.

        obj_offsets[i] = index into objs where preds[i]'s objects start
        (cumulative-count replacement for bitmap_z rank/select).
        """
        out = []
        by_s: dict[int, list[tuple[int, int]]] = {}
        for s, p, o in self.spo:
            by_s.setdefault(s, []).append((p, o))
        for s in sorted(by_s):
            pairs = by_s[s]  # already SPO-sorted
            preds: list[int] = []
            offsets: list[int] = []
            objs: list[int] = []
            for p, o in pairs:
                if not preds or preds[-1] != p:
                    preds.append(p)
                    offsets.append(len(objs))
                objs.append(o)
            out.append((s, preds, offsets, objs))
        return out


def build(transcript_rows: list[dict]) -> OracleKG:
    """transcripts rows -> OracleKG (the full reference pipeline)."""
    triples: list[tuple[str, str, str, str, int]] = []
    for r in sorted(transcript_rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        for s, p, o in turn_triples(
            r["conv_id"], r["turn_idx"], r["role"], r["text"],
            r.get("tool"), r.get("ts"),
        ):
            triples.append((s, p, o, r["conv_id"], r["turn_idx"]))

    kg = OracleKG(triples_str=triples)

    subj_terms = {t[0] for t in triples}
    obj_terms = {t[2] for t in triples}
    # Section split (reference src/nt.rs:245-266)
    kg.shared = sorted(subj_terms & obj_terms)
    kg.subjects = sorted(subj_terms - obj_terms)
    kg.objects = sorted(obj_terms - subj_terms)
    kg.predicates = sorted({t[1] for t in triples})

    n_shared = kg.n_shared
    kg.subj_id = {t: i + 1 for i, t in enumerate(kg.shared)}
    kg.subj_id.update({t: n_shared + i + 1 for i, t in enumerate(kg.subjects)})
    kg.obj_id = {t: i + 1 for i, t in enumerate(kg.shared)}
    kg.obj_id.update({t: n_shared + i + 1 for i, t in enumerate(kg.objects)})
    kg.pred_id = {t: i + 1 for i, t in enumerate(kg.predicates)}

    # Encode, dedup, SPO-sort (reference src/nt.rs:131-159)
    kg.spo = sorted(
        {(kg.subj_id[s], kg.pred_id[p], kg.obj_id[o]) for s, p, o, _, _ in triples}
    )
    return kg
