"""Conversation-level narrative reconstruction — the flagship grouped-map
pandas UDF (SURVEY §2.4 A5).

The reference rebuilds a section's human-readable <text> narrative from the
entries that survived refinement via a registry of per-section
reconstructors that EXTRACT FIELDS from surviving entries and render tables
(refiner/app/services/ecr/narrative/reconstruction.py: registry :1341-1347,
field extraction :520, renderers :767,1019,1086,1174,1192,1276), then append
a provenance footnote (narrative/footnote.py:40-160). The transcript analog:
per conversation, a registry of per-role renderers each extracting fields
from that role's surviving turns (timeline snippets, reconstruction counts,
per-tool call tables, last-notice extraction) and rendering one line of the
synthesized summary turn; a footnote line renders the refinement provenance
when outcome columns are present.

Spark shape: groupBy(conv_id).applyInPandas — N rows in, M rows out
(the surviving turns plus one synthesized turn_idx=-1 summary row). This is
the one place grouped Python belongs: the computation is genuinely
per-group sequential text assembly. Group size is one conversation
(bounded), so skew is bounded by the longest conversation, not by event
count.

Determinism contract (pinned by the DuckDB oracles in queries/temporal.py):
every extracted field is a pure function of the surviving rows — snippets
are fixed-width prefixes, orderings are by turn_idx / tool name, counts are
exact. The same renderings are reproducible in ANSI SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SUMMARY_TURN_IDX = -1
SNIPPET = 24

OUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _snip(v) -> str:
    return ("" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))[:SNIPPET]


def _render_user(rows: pd.DataFrame) -> str:
    """Timeline table: one cell per surviving user turn, document order
    (≙ the per-entry field-extraction tables, reconstruction.py:520-767)."""
    rows = rows.sort_values("turn_idx")
    body = " / ".join(
        f"{int(r.turn_idx)}:{_snip(r.text)}" for r in rows.itertuples()
    )
    return f"USER[n={len(rows)}] {body}"


def _render_assistant(rows: pd.DataFrame) -> str:
    """Reconstruction accounting + latest utterance extraction."""
    texts = rows["text"].fillna("")
    rec = int(texts.str.startswith("[reconstructed").sum())
    last = _snip(rows.loc[rows["turn_idx"].idxmax(), "text"])
    return f"ASSISTANT[n={len(rows)} reconstructed={rec}] last={last}"


def _render_tool(rows: pd.DataFrame) -> str:
    """Tool-call table: per tool, call count + first/last turn — the
    tool-call-args analog of the reference's medication/results tables."""
    g = rows.assign(tool=rows["tool"].fillna("none")).groupby("tool")["turn_idx"]
    cells = [
        f"{tool}:n={len(idxs)},first={int(idxs.min())},last={int(idxs.max())}"
        for tool, idxs in sorted(g)
    ]
    return f"TOOL[n={len(rows)}] " + " / ".join(cells)


def _render_system(rows: pd.DataFrame) -> str:
    """Notice extraction: count + the most recent notice text."""
    last = _snip(rows.loc[rows["turn_idx"].idxmax(), "text"])
    return f"SYSTEM[n={len(rows)}] last={last}"


def _generic(role: str, rows: pd.DataFrame) -> str:
    return f"{role}_turns={len(rows)}"


# registry keyed by role (≙ SECTION_RECONSTRUCTORS keyed by LOINC,
# reconstruction.py:1341-1347); unlisted roles get the generic renderer —
# five renderers total, each extracting different fields
RECONSTRUCTORS = {
    "user": _render_user,
    "assistant": _render_assistant,
    "tool": _render_tool,
    "system": _render_system,
}


def _footnote(pdf: pd.DataFrame) -> str | None:
    """Provenance footnote (≙ narrative/footnote.py:40-160 + the per-entry
    provenance comments of section/utils.py:225-324): outcome accounting
    over the surviving turns, rendered only when the input carries
    refinement provenance columns."""
    if "_outcome" not in pdf.columns:
        return None
    counts = pdf["_outcome"].dropna().value_counts()
    cells = ",".join(f"{k}={int(counts[k])}" for k in sorted(counts.index))
    return f"footnote: outcomes {cells}" if cells else "footnote: outcomes none"


def reconstruct_conversation(pdf: pd.DataFrame) -> pd.DataFrame:
    """One conversation in → surviving turns + a summary turn out."""
    pdf = pdf.sort_values("turn_idx")
    lines = []
    for role in sorted(pdf["role"].dropna().unique()):
        rows = pdf[pdf["role"] == role]
        fn = RECONSTRUCTORS.get(role)
        lines.append(fn(rows) if fn else _generic(role, rows))
    fn_line = _footnote(pdf)
    if fn_line is not None:
        lines.append(fn_line)
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


def reconstruct(transcripts: DataFrame, with_provenance: bool = False) -> DataFrame:
    """Grouped-map reconstruction over the clean transcript view.
    with_provenance=True also feeds ``_outcome`` to the footnote renderer
    (input must carry it, e.g. LakeTable.read()).

    Plumbing (guide §4 — amortize the Python boundary): a naive
    ``groupBy(conv_id).applyInPandas`` ships every conversation as its own
    Arrow batch — tens of rows per JVM→Python round-trip, so the transfer
    and per-call overhead dwarf the renderer work (measured 8.1 s → 0.94 s
    at sf0.1, identical rows). Instead the input is hash-repartitioned by
    conv_id, sorted within partitions, and streamed through ``mapInPandas``
    in full-size Arrow batches; group boundaries are re-derived inside the
    batch loop, with the trailing (possibly batch-spanning) conversation
    carried into the next chunk. Per-conversation semantics are untouched:
    every group still goes through ``reconstruct_conversation`` and the
    renderer registry."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if with_provenance:
        cols.append("_outcome")
    n = transcripts.sparkSession.sparkContext.defaultParallelism
    part = (
        transcripts.select(*cols)
        .repartition(n, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
    )

    def run(batches):
        def process(pdf: pd.DataFrame):
            out = [reconstruct_conversation(g) for _, g in pdf.groupby("conv_id", sort=False)]
            if out:
                yield pd.concat(out, ignore_index=True)

        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # hold back the trailing conversation — it may continue in the
            # next Arrow chunk of this partition
            last = pdf["conv_id"].iloc[-1]
            mask = pdf["conv_id"] == last
            carry = pdf[mask]
            yield from process(pdf[~mask])
        if carry is not None and len(carry):
            yield from process(carry)

    return part.mapInPandas(run, OUT_SCHEMA)
