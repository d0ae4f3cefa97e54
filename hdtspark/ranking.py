"""Distributed dense 1-based ID assignment by global sort order.

The reference assigns IDs as ``1 + rank of the term in the lexicographically
sorted section`` (reference src/dict_sect_pfc.rs:116,126 — BTreeSet order).
A naive ``row_number().over(Window.orderBy(term))`` pulls the whole section
into ONE partition — unusable at 100 TB.  This module implements the
zipWithIndex-equivalent two-phase pattern the north rule asks for:

1. ``repartitionByRange(col)`` + ``sortWithinPartitions(col)`` — a global
   range-sort (Spark samples boundaries; partitions are ordered).
2. One Arrow-batched ``mapInPandas`` pass attaches (partition_id,
   local_rank) — a running counter per partition, no shuffle.
3. Per-partition counts (a tiny agg over step 2's output) are turned into
   cumulative offsets on the driver (#partitions rows, not #terms) and
   broadcast-joined back: ``id = offset[pid] + local_rank + 1``.

The intermediate is persisted so the counts job and the final job see the
SAME range boundaries (range partitioning samples its input; recomputation
could re-sample differently).

Spark's UTF8 binary string ordering == Rust ``str`` byte order == Python
``str`` code-point order for valid UTF-8, so IDs match the oracle exactly
(verified with a Cyrillic fixture term, cf. reference src/hdt.rs:513-515).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F


def dense_ids(df: DataFrame, col: str, num_partitions: int | None = None,
              id_col: str = "id") -> DataFrame:
    """(col) -> (col, id_col) with id = 1 + rank in global binary sort order.

    ``df`` must have distinct, non-null values of ``col``.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    ranged = df.select(col).repartitionByRange(n, F.col(col)).sortWithinPartitions(col)

    out_schema = f"{col} string, _pid int, _rank long"

    def attach_rank(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_rank"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    ranked = ranged.mapInPandas(attach_rank, schema=out_schema)
    ranked.persist(StorageLevel.MEMORY_AND_DISK)

    # Tiny: one row per partition.
    counts = (
        ranked.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_cnt"]

    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    return (
        ranked.join(F.broadcast(offsets_df), "_pid")
        .select(col, (F.col("_off") + F.col("_rank") + 1).alias(id_col))
    )


def dense_ids_grouped(df: DataFrame, group_col: str, col: str,
                      num_partitions: int | None = None,
                      id_col: str = "id") -> tuple[DataFrame, dict[str, int]]:
    """Per-group dense 1-based IDs by global sort order, ONE two-phase pass.

    Input: (group_col, col) distinct rows.  Output: (group_col, col, id_col)
    where id = 1 + rank of col within its group's global sort order, plus a
    {group: count} dict (free — derived from the offsets aggregation, saving
    one count() job per group).

    Used to build all four dictionary sections in a single ranged shuffle
    instead of four (reference builds its four sections on four threads,
    src/nt.rs:240-266 — this is the Spark analog).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    ranged = df.select(group_col, col).repartitionByRange(
        n, F.col(group_col), F.col(col)).sortWithinPartitions(group_col, col)

    out_schema = f"{group_col} string, {col} string, _pid int, _rank long"

    def attach_rank(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        carry: dict[str, int] = {}
        for pdf in batches:
            pdf = pdf.copy()
            base = pdf.groupby(group_col).cumcount()
            pdf["_rank"] = base + pdf[group_col].map(lambda g: carry.get(g, 0))
            pdf["_pid"] = pid
            for g, c in pdf[group_col].value_counts().items():
                carry[g] = carry.get(g, 0) + int(c)
            yield pdf

    ranked = ranged.mapInPandas(attach_rank, schema=out_schema)
    ranked.persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        ranked.groupBy("_pid", group_col).agg(F.count("*").alias("_cnt")).collect()
    )
    offsets: dict[tuple[int, str], int] = {}
    totals: dict[str, int] = {}
    for row in sorted(counts, key=lambda r: (r[group_col], r["_pid"])):
        g = row[group_col]
        offsets[(row["_pid"], g)] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + row["_cnt"]

    offsets_df = spark.createDataFrame(
        [(pid, g, off) for (pid, g), off in offsets.items()] or [(0, "", 0)],
        f"_pid int, {group_col} string, _off long",
    )
    out = (
        ranked.join(F.broadcast(offsets_df), ["_pid", group_col])
        .select(group_col, col, (F.col("_off") + F.col("_rank") + 1).alias(id_col))
    )
    return out, totals


def cumulative_sum(df: DataFrame, order_cols: list[str], weight_col: str,
                   out_col: str = "cum", num_partitions: int | None = None) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` in global ``order_cols`` order.

    Same two-phase pattern as dense_ids (range-partition + in-partition scan
    + per-partition totals broadcast back) — never a single-partition global
    window.  Returns df's columns plus ``out_col``.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols]) \
               .sortWithinPartitions(*order_cols)

    from pyspark.sql.types import StructType

    out_schema = StructType(list(ranged.schema.fields)).add("_pid", "integer").add("_local", "long")

    def attach(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            pdf = pdf.copy()
            w = pdf[weight_col].astype("int64")
            pdf["_pid"] = pid
            pdf["_local"] = w.cumsum().shift(fill_value=0) + acc
            acc += int(w.sum())
            yield pdf

    ranked = ranged.mapInPandas(attach, schema=out_schema)
    ranked.persist(StorageLevel.MEMORY_AND_DISK)

    counts = ranked.groupBy("_pid").agg(F.sum(weight_col).alias("_tot")).collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_tot"] or 0

    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    keep = [c for c in df.columns]
    return (
        ranked.join(F.broadcast(offsets_df), "_pid")
        .select(*keep, (F.col("_off") + F.col("_local")).alias(out_col))
    )
