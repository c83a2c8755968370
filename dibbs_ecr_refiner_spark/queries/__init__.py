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

from . import cdcq, multimodal, relational, temporal, text, vectors

# temporal first: round-1 driver stopped before reaching the last module
# (range_join_bucketed / reconstruct_summary had no CORRECTNESS row), so the
# previously-skipped queries now run at the front of the contract sweep.
_MODULES = (temporal, relational, cdcq, text, vectors, multimodal)


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
