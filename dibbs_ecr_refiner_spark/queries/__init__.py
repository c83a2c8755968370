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
# registry order; the registry holds 76. Rotation policy: least-recently
# driver-checked first, so every query gets a driver CORRECTNESS row at
# least every other round. Round-5 front of the line = the 26 queries
# r04's 50-row window cut (the LLM-pipeline families — dedup, ANN,
# multimodal, sampling, text — all green in r03 + local re-runs, but
# unchecked for one round), then the new r5 queries so they get a driver
# row on their first round. Update this list each round from the latest
# CORRECTNESS_r{N}.json.
_CHECK_FIRST = [
    # not sampled by r04's window (last driver-checked r03)
    "group_count",
    "pii_scrub",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "dedup_minhash_verified",
    "dedup_clusters",
    "embed_cosine_topk",
    "embed_near_dup",
    "ann_lsh_bucket",
    "ann_topk",
    "ann_ivf_topk",
    "mm_decode_stub",
    "mm_resize_meta",
    "mm_frame_sample",
    "mm_audio_chunks",
    "split_assign",
    "pack_sequences",
    "domain_mix_sample",
    "split_stratified",
    # new in r5 — first driver check
    "validate_rows",
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
