"""Deterministic synthetic transcript corpus (FIXTURES.md §1 contract).

Seeded per-(conv_id) RNG; entity mentions drawn from a closed vocabulary
with Zipfian skew (to exercise salting / skew-aware partitioning); fixed
templates; timestamps derived from indices, never from the clock.  The same
per-conversation generator backs:

- the small in-memory golden corpus for pytest (``generate_rows``), and
- the distributed generator for benchmarks (``transcripts_df`` — one
  ``mapInPandas`` over ``spark.range(n_conv)``, no driver materialization).
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

from .vocab import SURFACES

# Filler words (never matched as mentions) + one Unicode word to pin
# byte-wise sort order (cf. reference test src/hdt.rs:513-515).
FILLERS = ["the", "a", "data", "row", "line", "fast", "slow", "big", "small",
           "order", "part", "group", "join", "sort", "agg", "column", "key",
           "value", "dup", "хобби"]

# Zipfian weights over the mention vocabulary: surface k gets weight 1/(k+1).
# SURFACES[0] ('batch'... sorted) — use fixed order for determinism.
_WORDS = SURFACES + FILLERS
_WEIGHTS = [1.0 / (i + 1) for i in range(len(_WORDS))]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "calculator", "browser", "sql"]

_EPOCH = datetime(2026, 1, 1, 0, 0, 0)


def _conv_rng(seed: int, conv_id: str) -> random.Random:
    h = hashlib.md5(f"{seed}:{conv_id}".encode()).hexdigest()
    return random.Random(int(h[:16], 16))


def conv_id_for(i: int) -> str:
    return f"conv-{i:06d}"


def generate_conversation(
    seed: int, conv_idx: int, min_turns: int = 3, max_turns: int = 20
) -> list[dict]:
    """Rows (dicts matching the transcripts schema) for one conversation."""
    conv_id = conv_id_for(conv_idx)
    rng = _conv_rng(seed, conv_id)
    n_turns = min_turns + rng.randrange(max_turns - min_turns + 1)
    rows = []
    for t in range(n_turns):
        if t == 0:
            role = "user"
        elif rng.random() < 0.15:
            role = "tool"
        else:
            role = "assistant" if t % 2 == 1 else "user"
        tool = rng.choice(TOOLS) if role == "tool" else None
        n_words = 5 + rng.randrange(20)
        words = rng.choices(_WORDS, weights=_WEIGHTS, k=n_words)
        text = " ".join(words)
        ts = _EPOCH + timedelta(hours=conv_idx, seconds=t * 7)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": ts,
            }
        )
    return rows


def generate_rows(seed: int, n_conv: int, **kw) -> list[dict]:
    """Full corpus as a list of row dicts (small scales / tests)."""
    out: list[dict] = []
    for i in range(n_conv):
        out.extend(generate_conversation(seed, i, **kw))
    return out


TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_df(spark, seed: int, n_conv: int, min_turns: int = 3,
                   max_turns: int = 20, partitions: int | None = None):
    """Distributed deterministic corpus: spark.range -> mapInPandas.

    Generation is keyed by (seed, conv_idx) only, so the result is identical
    for any partitioning/parallelism — the property the scaling benchmark
    relies on.
    """
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            frames = []
            for i in pdf["id"]:
                frames.append(pd.DataFrame(
                    generate_conversation(seed, int(i), min_turns, max_turns)))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return (
        spark.range(0, n_conv, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )
