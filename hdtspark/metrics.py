"""VOID-style statistics + lineage rows (reference fill_header,
src/nt.rs:47-113; north-rule lineage/metrics requirement)."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F


def void_stats(spo: DataFrame) -> dict[str, int]:
    """numTriples / distinct subjects / distinct objects / numProperties —
    one aggregation pass (map-side partial aggregation)."""
    row = spo.agg(
        F.count("*").alias("num_triples"),
        F.countDistinct("s").alias("distinct_subjects"),
        F.countDistinct("o").alias("distinct_objects"),
        F.countDistinct("p").alias("num_predicates"),
    ).first()
    return {k: int(row[k]) for k in
            ("num_triples", "distinct_subjects", "distinct_objects", "num_predicates")}


def void_stats_df(spo: DataFrame) -> DataFrame:
    stats = void_stats(spo)
    return spo.sparkSession.createDataFrame(
        sorted(stats.items()), "key string, value long"
    )


def partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts for the lineage table (north rule)."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows_out"))
        .select(F.lit(stage).alias("stage"), "partition_id", "rows_out")
    )


class StageTimer:
    """Wall-clock per stage, recorded into the lineage manifest."""

    def __init__(self):
        self.t0 = time.monotonic()

    def elapsed_ms(self) -> int:
        return int((time.monotonic() - self.t0) * 1000)
