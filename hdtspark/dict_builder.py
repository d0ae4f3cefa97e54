"""Four-section dictionary build (reference src/four_sect_dict.rs semantics).

Section split is the set-algebra of reference src/nt.rs:245-266 —
shared = subjects ∩ objects, subject-only = S \\ O, object-only = O \\ S —
expressed as semi/anti joins.  Dense 1-based IDs are assigned per section by
global lexicographic (byte) order via ranking.dense_ids (the distributed
zipWithIndex-equivalent), matching reference src/dict_sect_pfc.rs:351-386
(BTreeSet sort) + :116,126 (id = rank + 1).

Global ID routing (reference src/four_sect_dict.rs:98-150): shared terms
keep their section id in both the subject and object ID spaces; overflow
sections add ``n_shared``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .ranking import dense_ids


@dataclass
class FourSectDict:
    shared: DataFrame      # (term, id)   1..n_shared
    subjects: DataFrame    # (term, id)   1..n_subj   (section-local)
    predicates: DataFrame  # (term, id)   1..n_pred
    objects: DataFrame     # (term, id)   1..n_obj    (section-local)
    n_shared: int
    n_subjects: int
    n_predicates: int
    n_objects: int

    @property
    def subj_global(self) -> DataFrame:
        """(term, id) over the full subject ID space 1..n_shared+n_subj."""
        return self.shared.unionAll(
            self.subjects.select("term", (F.col("id") + self.n_shared).alias("id"))
        )

    @property
    def obj_global(self) -> DataFrame:
        """(term, id) over the full object ID space 1..n_shared+n_obj."""
        return self.shared.unionAll(
            self.objects.select("term", (F.col("id") + self.n_shared).alias("id"))
        )

    def sections_df(self) -> DataFrame:
        """All four sections as (section, term, id) — for tests/export."""
        return (
            self.shared.select(F.lit("shared").alias("section"), "term", "id")
            .unionAll(self.subjects.select(F.lit("subjects").alias("section"), "term", "id"))
            .unionAll(self.predicates.select(F.lit("predicates").alias("section"), "term", "id"))
            .unionAll(self.objects.select(F.lit("objects").alias("section"), "term", "id"))
        )


def _count_and_ids(terms: DataFrame) -> tuple[DataFrame, int]:
    with_ids = dense_ids(terms, "term")
    # dense_ids persisted its ranked intermediate; this count reuses it.
    return with_ids, with_ids.count()


def build_dict(triples_str: DataFrame) -> FourSectDict:
    """Raw string triples -> four-section dictionary with dense IDs."""
    s_terms = triples_str.select(F.col("s").alias("term")).distinct()
    o_terms = triples_str.select(F.col("o").alias("term")).distinct()
    p_terms = triples_str.select(F.col("p").alias("term")).distinct()

    shared_t = s_terms.join(o_terms, "term", "left_semi")
    subj_t = s_terms.join(o_terms, "term", "left_anti")
    obj_t = o_terms.join(s_terms, "term", "left_anti")

    shared, n_shared = _count_and_ids(shared_t)
    subjects, n_subj = _count_and_ids(subj_t)
    predicates, n_pred = _count_and_ids(p_terms)
    objects, n_obj = _count_and_ids(obj_t)

    return FourSectDict(
        shared=shared, subjects=subjects, predicates=predicates, objects=objects,
        n_shared=n_shared, n_subjects=n_subj, n_predicates=n_pred, n_objects=n_obj,
    )
