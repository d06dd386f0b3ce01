"""Deterministic synthetic transcripts table.

The engine's primary input is an Iceberg/Parquet table of multi-turn
conversation transcripts::

    conv_id: string, turn_idx: int, role: string,
    text: string, tool: string, ts: timestamp

No such table ships with the sandbox, so we synthesize it — *deterministically*
(fixed seed, no wall clock) and *distributed* (each conversation is generated
from a per-conversation RNG stream, so the output rows are a pure function of
(conv_id, seed) and are identical regardless of partitioning, parallelism or
generation order). This mirrors the reference's deterministic disk fixture
generator (/root/reference/insar/tests/data/sbas_test/write_unw.py) and its
synthetic-truth harness (/root/reference/insar/sbas/synthetic.py:11-146).

Shape (per FIXTURES.md §1): conversation lengths log-normal (most 5–50 turns),
a configurable handful of "mega" conversations (10^4+ turns) to exercise
salted-repartition skew handling; inter-turn gaps mixed seconds→hours so every
retention tier (1m/1h/1d) sees both dense and empty windows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "bash", "read_file", "write_file", "browser"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark rolls windows joins "
    "filters deltas phases turns tools series tiers gaps align solve".split()
)
_EPOCH_2025 = np.datetime64("2025-01-01T00:00:00", "us")


def _gen_conv(conv_i: int, seed: int, mega_every: int, mega_turns: int) -> pd.DataFrame:
    """Generate one conversation. Pure function of (conv_i, seed)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_i]))
    if mega_every > 0 and conv_i % mega_every == 0 and conv_i > 0:
        n_turns = mega_turns
    else:
        n_turns = int(np.clip(rng.lognormal(mean=2.7, sigma=0.8), 2, 400))

    turn_idx = np.arange(n_turns, dtype=np.int32)
    # inter-turn gaps: mixture of seconds (dense < 1m windows), minutes
    # (dense 1h / sparse 1m) and multi-hour gaps (empty 1h windows, gap-fill)
    kind = rng.random(n_turns)
    gaps = np.where(
        kind < 0.6,
        rng.integers(1, 45, n_turns),  # seconds
        np.where(
            kind < 0.9,
            60 * rng.integers(1, 50, n_turns),  # minutes
            3600 * rng.integers(1, 30, n_turns),  # hours
        ),
    ).astype(np.int64)
    start = np.int64(conv_i) * 7_919  # stagger conversation starts (seconds)
    ts = _EPOCH_2025 + ((start + np.cumsum(gaps)) * 1_000_000).astype(
        "timedelta64[us]"
    )

    roles = _ROLES[
        np.where(turn_idx % 2 == 0, 0, np.where(rng.random(n_turns) < 0.15, 2, 1))
    ]
    tool = np.where(
        (roles != "user") & (rng.random(n_turns) < 0.4),
        _TOOLS[rng.integers(0, len(_TOOLS), n_turns)],
        None,
    )
    n_words = rng.integers(1, 40, n_turns)
    word_idx = rng.integers(0, len(_WORDS), (n_turns, 40))
    text = [
        f"c{conv_i} t{i} " + " ".join(_WORDS[word_idx[i, : n_words[i]]])
        for i in range(n_turns)
    ]
    return pd.DataFrame(
        {
            "conv_id": f"conv{conv_i:08d}",
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    mega_every: int = 500,
    mega_turns: int = 20_000,
    shuffle: bool = False,
) -> DataFrame:
    """Distributed deterministic transcripts DataFrame.

    ``spark.range`` fans conversation ids across partitions; each task runs
    the per-conversation generator — the 100 TB-scale path: generation cost
    is spread over all executors and no driver-side materialization happens.
    ``shuffle=True`` scrambles row order (out-of-order arrival; ordering must
    be restored by (ts, turn_idx) downstream — FIXTURES.md §1).
    """
    params = {"seed": seed, "mega_every": mega_every, "mega_turns": mega_turns}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r6: batch ~64 conversations per yielded frame — one Arrow batch
        # per conversation made serialization the dominant generation cost
        # (rows and row order are identical: concat in conv order equals
        # the sequential per-conv yields)
        for pdf in batches:
            chunk: list[pd.DataFrame] = []
            for conv_i in pdf["id"].to_numpy():
                chunk.append(_gen_conv(int(conv_i), **params))
                if len(chunk) >= 64:
                    yield pd.concat(chunk, ignore_index=True)
                    chunk = []
            if chunk:
                yield pd.concat(chunk, ignore_index=True)

    df = spark.range(0, n_convs, numPartitions=min(n_convs, 64)).mapInPandas(
        gen, schema=TRANSCRIPT_SCHEMA
    )
    if shuffle:
        df = df.repartition(16, F.crc32(F.concat("conv_id", F.col("turn_idx"))))
    return df


def synth_transcripts_pandas(
    n_convs: int = 1000,
    seed: int = 42,
    mega_every: int = 500,
    mega_turns: int = 20_000,
) -> pd.DataFrame:
    """Same rows as :func:`synth_transcripts`, built locally for oracles."""
    return pd.concat(
        [_gen_conv(i, seed, mega_every, mega_turns) for i in range(n_convs)],
        ignore_index=True,
    )
