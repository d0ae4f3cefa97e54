"""Event-stream analytics (windows / ranks) over the events table.

Batch expressions of the aggregations the streaming module runs with
watermarks; sums use integer cents (``round(value*100)`` as bigint) so
results are exact and independent of floating-point addition order —
required for bit-stable cross-engine oracle checks and, at scale, for
deterministic reruns.

All output columns are BIGINT-typed (window starts as epoch seconds, ranks
cast to long) so the driver's type-sensitive value hash matches the DuckDB
oracle byte-for-byte — timestamp/int32 vs BIGINT dtype skew was the only
round-1 mismatch (values were already identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cents() -> F.Column:
    """Exact integer-cents column (built lazily: constructing a Column at
    import time requires an active SparkSession and crashed cold imports)."""
    return F.round(F.col("value") * 100).cast("long")


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact value sum.

    ``window_start`` is returned as epoch seconds (BIGINT): timestamp
    columns hash differently across engines (ntz vs instant), epoch
    seconds are engine-neutral.
    """
    agged = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(_cents()).alias("sum_cents"))
    )
    # Epoch seconds for both TIMESTAMP (instant: plain cast) and
    # TIMESTAMP_NTZ (wall clock: diff from the NTZ epoch literal — a cast
    # would route through the session timezone and be non-deterministic).
    start_type = agged.schema["w"].dataType["start"].dataType.typeName()
    if start_type == "timestamp_ntz":
        epoch = F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)")
    else:
        epoch = F.col("w.start").cast("long")
    return agged.select(epoch.cast("long").alias("window_start"),
                        "event_type", "n_events", "sum_cents")


def top_users(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by total value per event_type (rank deterministic:
    exact integer sums, ties broken by user_id)."""
    sums = (
        events.groupBy("event_type", "user_id")
        .agg(F.sum(_cents()).alias("sum_cents"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("sum_cents").desc(), F.col("user_id").asc())
    return (
        sums.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
