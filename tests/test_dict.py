"""Four-section dictionary: golden cardinalities, ID layout, bijection.

Mirrors reference src/four_sect_dict.rs:223-265 (section counts + id<->str
bijection over every ID in every section).
"""

from __future__ import annotations

# Frozen golden numbers for seed=42, n_conv=60 (our "snikmeta", cf. the
# reference's 43/6/23/133 fixture, src/hdt.rs:462-469).
GOLDEN_SECTIONS = {"shared": 751, "subjects": 60, "predicates": 9, "objects": 1506}
GOLDEN_NUM_TRIPLES = 8854


def test_section_cardinalities(kg, golden_oracle):
    assert kg.dict.n_shared == GOLDEN_SECTIONS["shared"]
    assert kg.dict.n_subjects == GOLDEN_SECTIONS["subjects"]
    assert kg.dict.n_predicates == GOLDEN_SECTIONS["predicates"]
    assert kg.dict.n_objects == GOLDEN_SECTIONS["objects"]
    assert len(golden_oracle.shared) == GOLDEN_SECTIONS["shared"]


def test_ids_match_oracle_exactly(kg, golden_oracle):
    """IDs are assigned by lexicographic byte order — Spark == Python."""
    for section, oracle_terms in [
        ("shared", golden_oracle.shared),
        ("subjects", golden_oracle.subjects),
        ("predicates", golden_oracle.predicates),
        ("objects", golden_oracle.objects),
    ]:
        df = getattr(kg.dict, section)
        got = {r["id"]: r["term"] for r in df.collect()}
        assert got == {i + 1: t for i, t in enumerate(oracle_terms)}, section


def test_ids_dense_and_one_based(kg):
    for section in ["shared", "subjects", "predicates", "objects"]:
        df = getattr(kg.dict, section)
        ids = sorted(r["id"] for r in df.select("id").collect())
        assert ids == list(range(1, len(ids) + 1)), section


def test_global_id_routing(kg, golden_oracle):
    """subj_global/obj_global reproduce the shared-offset routing of
    reference src/four_sect_dict.rs:98-150."""
    subj = {r["term"]: r["id"] for r in kg.dict.subj_global.collect()}
    obj = {r["term"]: r["id"] for r in kg.dict.obj_global.collect()}
    assert subj == golden_oracle.subj_id
    assert obj == golden_oracle.obj_id


def test_unicode_sort_order(kg, golden_oracle):
    """Cyrillic literal sorts identically (byte order) in Spark and Python."""
    cyr = [t for t in golden_oracle.objects if "хобби" in t]
    assert cyr
    got = {r["term"]: r["id"] for r in kg.dict.objects.collect()}
    for t in cyr:
        assert got[t] == golden_oracle.objects.index(t) + 1
