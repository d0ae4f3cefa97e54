"""Incremental (Structured Streaming) ingestion mode.

The reference format is a static snapshot (README.md:20-26 — no mutation),
so the KG build itself is batch.  What streaming adds here is the INGESTION
edge a production pipeline needs: transcripts land continuously; extraction
is stateless, so it runs as a streaming query with exactly-once file-source
checkpointing into a staging triples table; the dictionary/encode stages
(global sorts) then run as periodic batch compactions over the staging
table via checkpoint.materialize_kg.

Extraction is re-expressed shuffle-free for append-mode streaming: the
entity-link argmax depends only on (surface, occurrences>=2), so the
resolved winner table is precomputed from the vocabulary and broadcast —
no streaming aggregation state.  Batch and streaming extraction are tested
equal (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import rules, vocab
from .extract import _term_exprs, detect_mentions, provenance_triples
from .synth import TRANSCRIPTS_SCHEMA


def resolved_links_df(spark: SparkSession) -> DataFrame:
    """Static (surface, occ_ge2, ent) winner table — the entity-link argmax
    precomputed per (surface, context-bonus bucket)."""
    rows = []
    for surface in vocab.SURFACES:
        for occ_ge2 in (False, True):
            ent = rules.ent_iri(vocab.best_link(surface, 2 if occ_ge2 else 1))
            rows.append((surface, occ_ge2, ent))
    return spark.createDataFrame(rows, "surface string, occ_ge2 boolean, ent string")


def extract_triples_stateless(transcripts: DataFrame) -> DataFrame:
    """Streaming-safe extraction: identical output to extract.extract_triples
    but with NO aggregation (broadcast-joined precomputed winners)."""
    spark = transcripts.sparkSession
    _, turn = _term_exprs(transcripts)
    links = resolved_links_df(spark)

    detected = (
        transcripts
        .select("conv_id", "turn_idx", turn.alias("turn"),
                F.explode(detect_mentions(F.col("text"))).alias("m"))
        .select("conv_id", "turn_idx", "turn",
                F.col("m.surface").alias("surface"),
                (F.col("m.occ") >= 2).alias("occ_ge2"))
    )
    winners = detected.join(F.broadcast(links), ["surface", "occ_ge2"])
    mentions = winners.select(
        F.col("turn").alias("s"), F.lit(rules.P_MENTIONS).alias("p"),
        F.col("ent").alias("o"), "conv_id", "turn_idx")
    ent_types = winners.select(
        F.col("ent").alias("s"), F.lit(rules.P_TYPE).alias("p"),
        F.lit(rules.C_ENTITY).alias("o"), "conv_id", "turn_idx")
    return provenance_triples(transcripts).unionAll(mentions).unionAll(ent_types)


def stream_extract(spark: SparkSession, input_dir: str, staging_dir: str,
                   checkpoint_dir: str) -> None:
    """Incrementally extract triples from transcript parquet files.

    Exactly-once per input file (file-source checkpoint); append-only
    staging table; rerun-safe — each call processes only NEW files
    (trigger availableNow, so it drains and stops).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    )
    q = (
        extract_triples_stateless(stream)
        .writeStream.format("parquet")
        .option("path", staging_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_conv_progress(spark: SparkSession, input_dir: str,
                            checkpoint_dir: str, out_dir: str) -> "object":
    """Custom STATEFUL streaming operator (applyInPandasWithState): running
    per-conversation progress — cumulative turn and character counts — kept
    in grouped state across micro-batches AND across restarts (state lives
    in the checkpoint; the parquet sink is recoverable, unlike memory).
    The conversation id is the state key, so state is partitioned exactly
    like the shuffle and scales horizontally; each batch appends one row per
    updated conversation (monotone counters: the max per conv is current).

    Returns the started StreamingQuery (availableNow trigger — drains
    pending files then stops; a later call with the same checkpoint resumes
    the same state).
    """
    import pandas as pd  # noqa: F401  (module-level import required for workers)
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        turns, chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            turns += len(pdf)
            chars += int(pdf["text"].str.len().sum())
        state.update((turns, chars))
        yield pd.DataFrame({"conv_id": [key[0]], "turns_seen": [turns],
                            "chars_seen": [chars]})

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    progressed = (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType="conv_id string, turns_seen long, chars_seen long",
            stateStructType="turns long, chars long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        progressed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True).start()
    )


def streaming_turn_stats(spark: SparkSession, input_dir: str,
                         query_name: str = "turn_stats") -> "object":
    """Watermarked event-time windowed aggregation over the transcript
    stream: per-hour per-role turn counts (late rows beyond 2h dropped).
    Returns the started StreamingQuery (memory sink, complete mode)."""
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )
    return (
        agg.writeStream.format("memory").queryName(query_name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
