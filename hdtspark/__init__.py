"""hdtspark — a PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the capabilities of the Rust ``hdt`` crate
(reference at /root/reference): ingest multi-turn conversation/agent
transcripts, extract (s, p, o) triples, entity-link and canonicalize terms
into an HDT-style four-section dictionary (shared / subjects / predicates /
objects, cf. reference src/four_sect_dict.rs:35-44) with dense 1-based IDs
assigned by global lexicographic sort, dictionary-encode + dedup + SPO-sort
the triples, materialize a Bitmap-Triples-like adjacency layout
(cf. reference src/triples.rs:105-118), and answer the eight
``triples_with_pattern`` access paths (cf. reference src/hdt.rs:266-314).

Architecture is Spark-first: DataFrame/SQL + Catalyst, pandas/Arrow UDFs
only for the NLP stages (mention detection, entity-link scoring), never
per-row Python.
"""

__version__ = "0.1.0"
