"""Bitmap-Triples-like adjacency layout (reference src/triples.rs:213-274).

The reference stores SPO-sorted triples as a two-level tree: per subject,
the list of predicates (y layer, bitmap_y marking the last predicate of each
subject) and per (s,p) the list of objects (z layer, bitmap_z marking the
last object of each pair).  The Spark-native materialization is per-subject
adjacency arrays with cumulative offsets — offsets replace rank/select:

    adj(s, preds: array<long>, obj_offsets: array<long>, objs: array<long>)

``objs`` is the z-layer slice for subject s in (p, o) order; ``preds`` the
distinct predicates in order; ``obj_offsets[i]`` the index in ``objs`` where
``preds[i]``'s objects start (select1 on bitmap_z ≡ offset lookup).

Everything is JVM-side: one groupBy + sort_array + higher-order functions
(no Python in the loop).  Skewed subjects produce large arrays but stay a
single row — acceptable because per-subject degree is bounded in practice;
a degree cap + spill variant is the documented scale escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


SKEW_DEGREE_THRESHOLD = 100_000
DEFAULT_SALT_BUCKETS = 16


def adjacency(spo: DataFrame, salt_buckets: int | str | None = "auto",
              skew_threshold: int = SKEW_DEGREE_THRESHOLD) -> DataFrame:
    """spo(s,p,o sorted) -> adj(s, preds, obj_offsets, objs).

    ``salt_buckets``: two-phase salted aggregation for skewed subjects
    (north-rule skew handling).  Phase 1 groups by (s, hash(p,o) % k) so a
    hot subject's rows spread over k reducers and pre-combine into k partial
    arrays; phase 2 merges the k arrays per subject and re-sorts.  With
    salt_buckets=None a hot subject funnels its entire edge list through one
    reducer task — so the DEFAULT is "auto": estimate the max subject degree
    with one map-side-combined agg (cheap next to the adjacency build
    itself) and salt whenever it exceeds ``skew_threshold``.
    """
    if salt_buckets == "auto":
        # Sampled degree estimate: a full groupBy(s).count() pass over spo
        # just to pick a strategy is wasted shuffle at build time.  A 0.1%
        # sample sees a subject of true degree d about d/1000 times, so
        # est = sampled_max * 1000 resolves order-of-magnitude — all the
        # threshold needs.  (Sampling is a narrow scan, no shuffle.)
        frac = 0.001
        row = (
            spo.sample(False, frac, seed=7)
            .groupBy("s").agg(F.count("*").alias("d"))
            .agg(F.max("d").alias("m")).first()
        )
        max_deg = int((row["m"] or 0) / frac)
        salt_buckets = DEFAULT_SALT_BUCKETS if max_deg > skew_threshold else None
    if salt_buckets:
        partial = (
            spo.withColumn("_salt", F.pmod(F.hash("p", "o"), F.lit(salt_buckets)))
            .groupBy("s", "_salt")
            .agg(F.collect_list(F.struct("p", "o")).alias("po_part"))
        )
        grouped = (
            partial.groupBy("s")
            .agg(F.sort_array(F.flatten(F.collect_list("po_part"))).alias("po"))
        )
    else:
        grouped = spo.groupBy("s").agg(
            F.sort_array(F.collect_list(F.struct("p", "o"))).alias("po")
        )
    return grouped.select(
        "s",
        F.expr("array_distinct(transform(po, x -> x.p))").alias("preds"),
        F.expr(
            "filter(sequence(0, size(po)-1), "
            "i -> i = 0 OR po[i].p != po[i-1].p)"
        ).cast("array<long>").alias("obj_offsets"),
        F.expr("transform(po, x -> x.o)").alias("objs"),
    )


def adjacency_stats(adj: DataFrame) -> DataFrame:
    """Per-subject (s, n_preds, n_objs) — the SQL-checkable view of adj."""
    return adj.select(
        "s",
        F.size("preds").cast("long").alias("n_preds"),
        F.size("objs").cast("long").alias("n_objs"),
    )


def bitmap_y(adj: DataFrame) -> DataFrame:
    """y-layer view: (pos_y, p, last_of_subject) in SPO order.

    ``last_of_subject`` is the reference's bitmap_y bit
    (src/triples.rs:213-274); pos_y the global y position — derived from a
    distributed exclusive prefix sum of per-subject predicate counts
    (offsets ≡ rank/select equivalence), never a single-partition window.
    """
    from .ranking import cumulative_sum

    per_s = adj.select("s", F.size("preds").cast("long").alias("np"), "preds")
    with_off = cumulative_sum(per_s, ["s"], "np", out_col="y_start")
    return with_off.select(
        "s", "y_start", "np", F.posexplode("preds").alias("i", "p")
    ).select(
        (F.col("y_start") + F.col("i")).alias("pos_y"),
        "s", "p",
        (F.col("i") == F.col("np") - 1).alias("last_of_subject"),
    )
