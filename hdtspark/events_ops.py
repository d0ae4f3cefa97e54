"""Event-stream analytics (windows / ranks) over the events table.

Batch expressions of the aggregations the streaming module runs with
watermarks; sums use integer cents (``round(value*100)`` as bigint) so
results are exact and independent of floating-point addition order —
required for bit-stable cross-engine oracle checks and, at scale, for
deterministic reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_CENTS = F.round(F.col("value") * 100).cast("long")


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact value sum."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(_CENTS).alias("sum_cents"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_cents")
    )


def top_users(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by total value per event_type (rank deterministic:
    exact integer sums, ties broken by user_id)."""
    sums = (
        events.groupBy("event_type", "user_id")
        .agg(F.sum(_CENTS).alias("sum_cents"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("sum_cents").desc(), F.col("user_id").asc())
    return (
        sums.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
