"""Triple ID-encoding, dedup, and the three sorted projections.

Mirrors reference src/nt.rs:131-159 (re-encode to final dict IDs, sort,
dedup) — expressed as three dictionary joins + ``dropDuplicates`` +
``repartitionByRange().sortWithinPartitions()``.

Scale notes:
- Dictionary joins are string-key equi-joins; the dict side is unique per
  term, so skew sits on the fact side (hot terms like the entity-class
  object) — handled by AQE skew-join splitting; no broadcast is forced
  because at 100 TB the dictionary itself is huge (billions of terms).
- The SPO/OPS/PSO projections are range-partitioned + sorted, which is the
  Spark analog of the reference's succinct sorted layout: Parquet min/max
  stats give file/row-group pruning for bound-prefix patterns, replacing
  rank/select (reference src/triples.rs:105-118) and the OP index
  (src/triples.rs:163-209) and wavelet (?P?) with pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dict_builder import FourSectDict


# ~60-80 MB of URI-length terms: comfortably broadcastable.  Above this the
# driver-serial HashedRelation build/ship dominates (measured: two ~5M-term
# broadcasts added ~100s of serial time at ANY parallelism, wrecking the
# N->4N scaling ratio), while a shuffle join scales with cores.
BROADCAST_DICT_MAX_TERMS = 1_000_000


def encode_triples(triples_str: DataFrame, d: FourSectDict,
                   num_partitions: int | None = None) -> DataFrame:
    """(s,p,o string) -> deduplicated (s,p,o long) sorted by (s,p,o)."""
    n = num_partitions or int(
        triples_str.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    sd = d.subj_global.withColumnRenamed("term", "s").withColumnRenamed("id", "sid")
    pd_ = d.predicates.withColumnRenamed("term", "p").withColumnRenamed("id", "pid")
    od = d.obj_global.withColumnRenamed("term", "o").withColumnRenamed("id", "oid")

    # Broadcast each dict side while it fits comfortably in executor memory
    # (term counts are known exactly from the dict build, so the decision is
    # deterministic): the fact side then never shuffles for the joins — one
    # exchange total (the range partition below).  At 100 TB the dictionary
    # is billions of terms, the conditions go false, and the joins fall back
    # to shuffle joins with AQE skew splitting.
    def maybe_b(df: DataFrame, n_terms: int) -> DataFrame:
        return F.broadcast(df) if n_terms < BROADCAST_DICT_MAX_TERMS else df

    encoded = (
        triples_str.select("s", "p", "o")
        .join(maybe_b(sd, d.n_shared + d.n_subjects), "s")
        .join(maybe_b(pd_, d.n_predicates), "p")
        .join(maybe_b(od, d.n_shared + d.n_objects), "o")
        .select(F.col("sid").alias("s"), F.col("pid").alias("p"),
                F.col("oid").alias("o"))
    )
    # Range-partition FIRST: duplicates of (s,p,o) co-locate in the same
    # range partition, so the dropDuplicates aggregate is satisfied by the
    # existing distribution and Catalyst inserts no second exchange —
    # one shuffle total for dedup + global sort order.
    return (
        encoded.repartitionByRange(n, "s", "p", "o")
        .dropDuplicates(["s", "p", "o"])
        .sortWithinPartitions("s", "p", "o")
    )


def ops_projection(spo: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(o,p,s)-sorted projection — the OP-index analog (??O / ?PO paths).

    Range-partitioning on (o, p) — not o alone — keeps hot objects
    (e.g. the entity class) from pinning a whole partition (SURVEY §7.3).
    """
    n = num_partitions or int(spo.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        spo.select("o", "p", "s")
        .repartitionByRange(n, "o", "p", "s")
        .sortWithinPartitions("o", "p", "s")
    )


def pso_projection(spo: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(p,s,o)-sorted projection — wavelet-tree analog for ?P? queries."""
    n = num_partitions or int(spo.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        spo.select("p", "s", "o")
        .repartitionByRange(n, "p", "s", "o")
        .sortWithinPartitions("p", "s", "o")
    )


def validate_spo(spo: DataFrame, d: FourSectDict) -> dict:
    """Invariants of reference src/triples.rs:228,235-249 as one agg pass."""
    row = spo.agg(
        F.count("*").alias("n"),
        F.min("s").alias("min_s"), F.max("s").alias("max_s"),
        F.countDistinct("s").alias("d_s"),
        F.min("p").alias("min_p"), F.max("p").alias("max_p"),
        F.min("o").alias("min_o"), F.max("o").alias("max_o"),
    ).first()
    return {
        "no_zero_ids": row["min_s"] >= 1 and row["min_p"] >= 1 and row["min_o"] >= 1,
        # every subject ID 1..max appears ("subjects must be correlative")
        "subjects_correlative": row["min_s"] == 1
        and row["d_s"] == row["max_s"]
        and row["max_s"] == d.n_shared + d.n_subjects,
        "ids_in_range": row["max_p"] <= d.n_predicates
        and row["max_o"] <= d.n_shared + d.n_objects,
        "num_triples": row["n"],
    }
