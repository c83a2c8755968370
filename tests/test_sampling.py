"""Dataset-assembly operators (queries/sampling.py): invariants the
bit-exact DuckDB contract cannot express — packing feasibility, split
stability/proportions, and mixture determinism."""

from dibbs_ecr_refiner_spark.queries.sampling import (
    _PACK_BUDGET,
    domain_mix_sample,
    pack_sequences,
    split_assign,
)

SF = "/root/testdata/sf0.001"


def test_pack_sequences_respects_budget_and_covers_all_docs(spark):
    rows = pack_sequences(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.count(), "packing must assign every doc exactly once"
    totals: dict[tuple, list[int]] = {}
    for r in rows:
        totals.setdefault((r["shard"], r["seq_idx"]), []).append(int(r["n_tok"]))
    for (shard, seq), toks in totals.items():
        # a sequence over budget is only legal as a single overlong doc
        assert sum(toks) <= _PACK_BUDGET or len(toks) == 1, (shard, seq, toks)
    # greedy tightness: consecutive sequences can't be merged
    by_shard: dict[int, list[int]] = {}
    for (shard, seq), toks in sorted(totals.items()):
        by_shard.setdefault(shard, []).append(sum(toks))
    for shard, sums in by_shard.items():
        for a, b in zip(sums, sums[1:]):
            assert a + b > _PACK_BUDGET or a > _PACK_BUDGET, (shard, a, b)


def test_split_assign_is_deterministic_and_roughly_80_10_10(spark):
    a = {(r["doc_id"], r["split"]) for r in split_assign(spark, SF).collect()}
    b = {(r["doc_id"], r["split"]) for r in split_assign(spark, SF).collect()}
    assert a == b, "split membership must be identical across runs"
    n = len(a)
    frac_train = sum(1 for _, s in a if s == "train") / n
    assert 0.65 <= frac_train <= 0.92, frac_train  # wide: tiny sf
    assert {s for _, s in a} <= {"train", "val", "test"}


def test_domain_mix_copies_match_weights(spark):
    docs = {r["doc_id"]: r for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    out = domain_mix_sample(spark, SF).collect()
    copies: dict[int, int] = {}
    for r in out:
        copies[r["doc_id"]] = copies.get(r["doc_id"], 0) + 1
        assert r["copy_idx"] == copies[r["doc_id"]], "copy_idx must be dense 1..n"
    for doc_id, d in docs.items():
        n = copies.get(doc_id, 0)
        if d["source"] in ("src0", "src1", "src2", "src3"):
            assert n in (2, 3)
        elif d["lang"] == "zh":
            assert n in (1, 2)
        else:
            assert n in (0, 1)


def test_split_and_mix_stay_jvm_side(spark):
    """split_assign and domain_mix_sample are pure codegen'd expressions:
    no Python eval, no shuffle beyond the final presentation sort. Packing
    alone is allowed its grouped-map (that's the design)."""
    import contextlib
    import io

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for fn in (split_assign, domain_mix_sample):
        p = plan(fn(spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in p, (fn.__name__, marker)
    p = plan(pack_sequences(spark, SF))
    assert "FlatMapGroupsInPandas" in p  # the sharded greedy fold


def test_split_stratified_exact_per_source_proportions(spark):
    from dibbs_ecr_refiner_spark.queries.sampling import split_stratified

    rows = split_stratified(spark, SF).collect()
    per_src: dict[str, dict[str, int]] = {}
    for r in rows:
        per_src.setdefault(r["source"], {}).setdefault(r["split"], 0)
        per_src[r["source"]][r["split"]] += 1
    for src, counts in per_src.items():
        n = sum(counts.values())
        # exact boundaries: train = floor-ish at rn*10 <= n*8
        train = sum(1 for rn in range(1, n + 1) if rn * 10 <= n * 8)
        val = sum(1 for rn in range(1, n + 1) if train * 10 < rn * 10 <= n * 9) or (
            sum(1 for rn in range(1, n + 1) if rn * 10 <= n * 9) - train
        )
        assert counts.get("train", 0) == train, (src, counts)
        assert counts.get("val", 0) == val, (src, counts)
        assert counts.get("test", 0) == n - train - val, (src, counts)
