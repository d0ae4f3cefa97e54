"""Physical-plan regression tests: lock the plan properties the 100 TB
design depends on (pushdown, broadcast, no Python on the build path,
no superfluous exchanges)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from hdtspark import encode, ranking


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_dense_ids_plan_is_jvm_only(spark):
    terms = spark.createDataFrame(
        [(f"term-{i:05d}",) for i in range(3000)], "term string")
    out = ranking.dense_ids(terms, "term", num_partitions=8)
    plan = _plan(out)
    # no Python/Arrow stage anywhere in the ranking path
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker
    # exactly one data exchange: the hash partition on the bucket for the
    # window (the broadcast of the offsets map is not a data shuffle)
    simple = _plan(out, "simple")
    data_exchanges = [l for l in simple.splitlines()
                      if "Exchange hashpartitioning" in l]
    assert len(data_exchanges) == 1, simple


def test_encode_broadcasts_small_dict(kg):
    df = encode.encode_triples(kg.triples_str, kg.dict)
    assert "BroadcastHashJoin" in _plan(df)
    # dedup+sort ride ONE range exchange, and the small dict never forces a
    # sort-merge join of the fact side
    import re
    simple = _plan(df, "simple")
    range_ex = {m for l in simple.splitlines()
                if "Exchange rangepartitioning" in l
                and "ReusedExchange" not in l
                for m in re.findall(r"rangepartitioning\(([^)]*)\)", l)}
    # one unique range-partitioning key set (AQE may print the node in both
    # the initial and final plan sections)
    assert len(range_ex) == 1, simple
    assert "SortMergeJoin" not in simple, simple


def test_materialized_ops_scan_pushes_filters(spark, kg, tmp_path):
    path = str(tmp_path / "ops")
    kg.ops.write.parquet(path)
    ops = spark.read.parquet(path)
    q = ops.filter((F.col("o") == 42) & (F.col("p") == 3)).select("s")
    plan = _plan(q)
    assert "EqualTo(o,42)" in plan and "EqualTo(p,3)" in plan, plan
    # column pruning: the scan reads only the three id columns
    assert "ReadSchema: struct<o:bigint,p:bigint,s:bigint>" in plan, plan
