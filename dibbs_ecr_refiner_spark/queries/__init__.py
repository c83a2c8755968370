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
# registry order; the registry holds 71. Rotation policy: least-recently
# driver-checked first, so every query gets a driver CORRECTNESS row at
# least every other round. Round-3 front of the line = the 7 queries that
# have NEVER had a driver row (added after the r02 sweep), then the 14 that
# were last checked in r01 (r02's 50-row window cut them), then everything
# r02 already re-verified. Update this list each round from the latest
# CORRECTNESS_r{N}.json.
_CHECK_FIRST = [
    # never driver-checked (green in local tools/check_contract.py runs)
    "split_assign",
    "split_stratified",
    "pack_sequences",
    "domain_mix_sample",
    "cdc_source_span",
    "ann_topk",
    "ann_ivf_topk",
    "dedup_simhash_pairs",
    "mm_resize_meta",
    "mm_frame_sample",
    "mm_audio_chunks",
    "pii_scrub",
    # last checked r01 (r02 window cut them)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_simhash",
    "dedup_clusters",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "embed_cosine_topk",
    "embed_near_dup",
    "ann_lsh_bucket",
    "mm_decode_stub",
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
