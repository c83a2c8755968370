"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 exposed as (spark, sf_dir) -> DataFrame plus a DuckDB oracle.

Modules:
- relational: scans/filters/joins/aggs/sets/scalars on the TPC-H-ish tables
- cdcq:       CDC window/dedup/watermark operators on the events stream
- text:       training-data text ops on documents (dedup families, quality)
- vectors:    embedding similarity / ANN on embeddings
- multimodal: opaque-binary decode plumbing (stubbed decode, real Spark)
"""

from __future__ import annotations

from . import cdcq, multimodal, relational, sampling, temporal, text, vectors

_MODULES = (temporal, relational, cdcq, text, vectors, multimodal, sampling)

# The driver's correctness sweep checks at most ~50 queries per round, in
# registry order; the registry holds 77. Rotation policy: least-recently
# driver-checked first, so every query gets a driver CORRECTNESS row at
# least every other round. Round-6 front of the line = the 27 queries
# CORRECTNESS_r05's 50-row window cut (last driver-checked r04: the
# lww/window/scalar/streaming-span family plus the TPC-H breadth rows) —
# which this round also makes the freshest evidence for the optimized
# top1_per_group / lww_agg / rollup_lineage rewrites. Update this list
# each round from the latest CORRECTNESS_r{N}.json.
_CHECK_FIRST = [
    # not sampled by r05's window (last driver-checked r04)
    "manifest_diff",
    "rollup_lineage",
    "ndv_exact",
    "ndv_approx",
    "top1_per_group",
    "union_dedup",
    "explode_distinct",
    "deterministic_id",
    "ts_format",
    "map_lookup",
    "json_extract",
    "pivot_status",
    "q5_supplier_volume",
    "q18_large_orders",
    "lww_rank",
    "lww_agg",
    "dedup_deliveries",
    "high_watermark",
    "ordered_turns",
    "frame_context",
    "rule_precedence",
    "sessionize",
    "percentiles",
    "config_events",
    "session_window_agg",
    "cdc_source_span",
    "repetition_score",
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    missing = [q for q in _CHECK_FIRST if q not in out]
    assert not missing, f"_CHECK_FIRST names unknown queries: {missing}"
    front = {q: out[q] for q in _CHECK_FIRST}
    return {**front, **{q: f for q, f in out.items() if q not in front}}


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
