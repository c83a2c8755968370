"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9: the tool for operators Structured Streaming lacks).

Operator: **per-conversation running digest** — for each conv_id, maintain
(turn_updates, max_lsn) across micro-batches and emit one updated digest
row per conversation per batch. This is the streaming analog of the
per-section outcome accounting the reference finalizes per run
(refiner/app/services/ecr/refine.py:330-398) — but over an unbounded
stream, with explicit managed state instead of a full recompute.

State is bounded two ways:
- one small tuple per conversation (``turn_updates`` accumulates each
  batch's distinct-turn update count — deliberately NOT a global distinct,
  which would need per-key set state that grows with conversation length);
- idle conversations are EVICTED: each update arms a processing-time
  timeout (``state.setTimeoutDuration``); when it fires, the handler sees
  ``state.hasTimedOut``, emits a final ``evicted=true`` digest, and
  ``state.remove()``s the entry — the practical answer to unbounded-key
  streams at lake scale.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "turn_updates long, max_lsn long"
OUT_SCHEMA = (
    "conv_id string, turn_updates long, max_lsn long, batch_events long, "
    "evicted boolean"
)

DEFAULT_IDLE_TIMEOUT_MS = 600_000


def _make_update(idle_timeout_ms: int):
    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            turn_updates, max_lsn = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "turn_updates": [turn_updates],
                    "max_lsn": [max_lsn],
                    "batch_events": [0],
                    "evicted": [True],
                }
            )
            return
        turn_updates, max_lsn = state.get if state.exists else (0, -1)
        batch_events = 0
        for pdf in pdfs:
            batch_events += len(pdf)
            turn_updates += pdf["turn_idx"].nunique()
            max_lsn = max(max_lsn, int(pdf["change_lsn"].max()))
        state.update((turn_updates, max_lsn))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "turn_updates": [turn_updates],
                "max_lsn": [max_lsn],
                "batch_events": [batch_events],
                "evicted": [False],
            }
        )

    return _update


def conversation_digest(
    changes: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """changes (streaming DF) → per-conversation running digests, with
    idle-state eviction after ``idle_timeout_ms`` of processing-time
    silence."""
    return (
        changes.groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
