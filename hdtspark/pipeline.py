"""End-to-end KG construction: transcripts -> materialized KG.

The in-memory (cached-DataFrame) orchestration; durable materialization with
checkpoints/resume lives in checkpoint.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import bitmap_triples, encode, extract
from .dict_builder import build_dict
from .query import KG


def build_kg(transcripts: DataFrame, use_pandas_udf: bool = True,
             cache: bool = True, with_adjacency: bool = True) -> KG:
    """Run extract -> dict -> encode -> projections (+ adjacency)."""
    triples_str = extract.extract_triples(transcripts, use_pandas_udf=use_pandas_udf)
    if cache:
        # The raw triples feed four distinct-term scans + the encode joins;
        # caching avoids re-running the pandas-UDF extraction each time.
        triples_str = triples_str.cache()

    d = build_dict(triples_str)
    spo = encode.encode_triples(triples_str, d)
    if cache:
        spo = spo.cache()
    ops = encode.ops_projection(spo)
    pso = encode.pso_projection(spo)
    adj = bitmap_triples.adjacency(spo) if with_adjacency else None

    return KG(dict=d, spo=spo, ops=ops, pso=pso, adj=adj, triples_str=triples_str)
