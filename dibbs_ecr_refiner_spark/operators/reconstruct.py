"""Conversation-level narrative reconstruction — the flagship grouped-map
pandas UDF (SURVEY §2.4 A5).

The reference rebuilds a section's human-readable <text> narrative from the
entries that survived refinement, via a registry of per-section
reconstructors (refiner/app/services/ecr/narrative/reconstruction.py:
1341-1400, renderers :767-1276). The transcript analog: per conversation,
build one deterministic summary turn from the surviving turns, with a
registry of per-role renderers contributing lines.

Spark shape: groupBy(conv_id).applyInPandas — N rows in, M rows out
(the surviving turns plus one synthesized turn_idx=-1 summary row). This is
the one place grouped Python belongs: the computation is genuinely
per-group sequential text assembly. Group size is one conversation
(bounded), so skew is bounded by the longest conversation, not by event
count."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SUMMARY_TURN_IDX = -1

OUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _render_user(rows: pd.DataFrame) -> str:
    return f"user_turns={len(rows)}"


def _render_assistant(rows: pd.DataFrame) -> str:
    kept = int((rows["text"].fillna("").str.startswith("[reconstructed")).sum())
    return f"assistant_turns={len(rows)} reconstructed={kept}"


def _render_tool(rows: pd.DataFrame) -> str:
    tools = sorted(rows["tool"].dropna().unique())
    return f"tool_turns={len(rows)} tools={','.join(tools)}"


# registry keyed by role (≙ SECTION_RECONSTRUCTORS keyed by LOINC,
# reconstruction.py:1341-1347); unlisted roles get a generic line
RECONSTRUCTORS = {
    "user": _render_user,
    "assistant": _render_assistant,
    "tool": _render_tool,
}


def _generic(role: str, rows: pd.DataFrame) -> str:
    return f"{role}_turns={len(rows)}"


def reconstruct_conversation(pdf: pd.DataFrame) -> pd.DataFrame:
    """One conversation in → surviving turns + a summary turn out."""
    pdf = pdf.sort_values("turn_idx")
    lines = []
    for role in sorted(pdf["role"].dropna().unique()):
        rows = pdf[pdf["role"] == role]
        fn = RECONSTRUCTORS.get(role)
        lines.append(fn(rows) if fn else _generic(role, rows))
    summary = pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "turn_idx": [SUMMARY_TURN_IDX],
            "role": ["summary"],
            "text": ["; ".join(lines)],
            "tool": [None],
            "ts": [pdf["ts"].max()],
        }
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return pd.concat([summary[cols], pdf[cols]], ignore_index=True)


def reconstruct(transcripts: DataFrame) -> DataFrame:
    """groupBy(conv_id).applyInPandas over the clean transcript view."""
    return (
        transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .groupBy("conv_id")
        .applyInPandas(lambda pdf: reconstruct_conversation(pdf), OUT_SCHEMA)
    )
