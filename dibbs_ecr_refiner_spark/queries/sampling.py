"""Dataset-assembly operators on ``documents``: deterministic train/val/
test splitting, greedy sequence packing, and weighted domain mixing — the
ops that turn a cleaned corpus into a training mixture.

Engine additions beyond the reference (per the build brief), same contract
as queries/text.py: every operator is a pure function of the data with a
bit-exact DuckDB oracle. Randomness is NEVER used — sampling decisions
come from md5 of stable ids, so the split/mixture is reproducible across
runs, engines, and cluster sizes (a re-run of the pipeline on 1000
executors produces byte-identical membership). The only hash both engines
implement identically is md5; hex digits are folded to integers with
``instr`` (also identical), keeping the oracle bit-exact.

Scale notes: split and mix are per-row codegen'd expressions (no shuffle,
no UDF). Packing shuffles once on the shard key and runs the inherently
sequential greedy fold per shard via applyInPandas — shard count is the
parallelism knob, state per task is O(1), so the plan holds at 100 TB with
shard = hash(doc) % K for K ≈ cluster cores.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def _hex_u16(expr: str) -> str:
    """SQL (valid in BOTH Spark and DuckDB) for the first 16 bits of
    md5(expr) as an integer in [0, 65536) — the portable deterministic
    uniform variate both sides of the oracle share."""
    digit = "(instr('0123456789abcdef', substr(md5({e}), {k}, 1)) - 1)"
    parts = [digit.format(e=expr, k=k) for k in (1, 2, 3, 4)]
    return f"((({parts[0]} * 16 + {parts[1]}) * 16 + {parts[2]}) * 16 + {parts[3]})"


# thresholds for an 80/10/10 split over the 16-bit variate
_U = _hex_u16("concat(cast(doc_id as string), ':split:42')")
_SPLIT_CASE = f"""
    CASE WHEN {_U} < 52429 THEN 'train'
         WHEN {_U} < 58982 THEN 'val'
         ELSE 'test' END
"""


@q(
    "split_assign",
    f"""
    SELECT doc_id, {_SPLIT_CASE} AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def split_assign(spark, sf):
    """Deterministic 80/10/10 train/val/test assignment: split(doc) =
    f(md5(doc_id, seed)) — stable under re-runs, insertions elsewhere in
    the corpus, and any partitioning, unlike rand()-based sampling which
    reshuffles membership every run. Pure per-row expression: no shuffle,
    no UDF, fully codegen'd; at 100 TB this rides along any scan for free.
    Salt the seed string to draw independent splits."""
    return (
        _docs(spark, sf)
        .select("doc_id", F.expr(_SPLIT_CASE).alias("split"))
        .orderBy("doc_id")
    )


# ------------------------------------------- greedy sequence packing

_PACK_BUDGET = 512
_N_SHARDS = 8
_NTOK_SQL_DUCK = "len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))"


@q(
    "pack_sequences",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             doc_id % {_N_SHARDS} AS shard,
             {_NTOK_SQL_DUCK} AS n_tok,
             row_number() OVER (PARTITION BY doc_id % {_N_SHARDS} ORDER BY doc_id) AS rn
      FROM documents
    ),
    p AS (
      SELECT shard, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS seq_idx, n_tok AS acc
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id, d.n_tok,
             CASE WHEN p.acc + d.n_tok <= {_PACK_BUDGET} THEN p.seq_idx ELSE p.seq_idx + 1 END,
             CASE WHEN p.acc + d.n_tok <= {_PACK_BUDGET} THEN p.acc + d.n_tok ELSE d.n_tok END
      FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(seq_idx AS BIGINT) AS seq_idx, CAST(n_tok AS BIGINT) AS n_tok
    FROM p ORDER BY doc_id
    """,
)
def pack_sequences(spark, sf):
    """Greedy sequential packing of documents into fixed-token-budget
    training sequences (the standard pretraining batch-assembly step):
    within a shard, docs are taken in doc_id order and appended to the
    current sequence until the budget would overflow, which starts the
    next sequence. The fold is inherently sequential, so it's sharded:
    ONE shuffle on the shard key, then applyInPandas runs the O(rows)
    single-pass fold per shard with O(1) state — shard count is the
    parallelism knob at scale. A doc longer than the budget gets a
    sequence of its own (acc > budget forces the next doc to break).
    Oracled by a recursive CTE walking rn within each shard."""
    docs = (
        _docs(spark, sf)
        .select(
            "doc_id",
            (F.col("doc_id") % _N_SHARDS).alias("shard"),
            F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")).alias(
                "n_tok"
            ),
        )
        .repartition(_N_SHARDS, "shard")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_idx, acc = [], 0
        cur = 0
        for i, n in enumerate(pdf["n_tok"]):
            n = int(n)
            if i == 0:
                acc = n
            elif acc + n <= _PACK_BUDGET:
                acc += n
            else:
                cur += 1
                acc = n
            seq_idx.append(cur)
        pdf["seq_idx"] = pd.Series(seq_idx, dtype="int64")
        return pdf[["doc_id", "shard", "seq_idx", "n_tok"]]

    out_schema = "doc_id long, shard long, seq_idx long, n_tok long"
    return docs.groupBy("shard").applyInPandas(fold, out_schema).orderBy("doc_id")


# ------------------------------------------- weighted domain mixing

# target mixture: boost a few head sources, keep zh, thin the rest
_WEIGHT_CASE = """
    CASE WHEN source IN ('src0','src1','src2','src3') THEN 2.5
         WHEN lang = 'zh' THEN 1.5
         ELSE 0.75 END
"""
_UMIX = _hex_u16("concat(cast(doc_id as string), ':mix:42')")
_COPIES = (
    f"(CAST(floor({_WEIGHT_CASE}) AS BIGINT) + "
    f"(CASE WHEN {_UMIX} < ({_WEIGHT_CASE} - floor({_WEIGHT_CASE})) * 65536 THEN 1 ELSE 0 END))"
)


@q(
    "domain_mix_sample",
    f"""
    WITH c AS (
      SELECT doc_id, source, {_COPIES} AS n_copies
      FROM documents
    )
    SELECT c.doc_id, c.source, CAST(u.copy_idx AS BIGINT) AS copy_idx
    FROM c, unnest(generate_series(1, c.n_copies)) AS u(copy_idx)
    WHERE c.n_copies > 0
    ORDER BY doc_id, copy_idx
    """,
)
def domain_mix_sample(spark, sf):
    """Weighted domain mixing (up/down-sampling to a target mixture, the
    data-curation step behind every pretraining recipe): each doc gets
    floor(w) copies plus one more with probability frac(w), decided by
    the SAME md5 variate on both engines — so a weight of 2.5 yields
    exactly 2 or 3 copies per doc, deterministically. Per-row expression
    + explode: no shuffle, no UDF; downsampling (w<1) is the same formula
    with floor(w)=0. Copies carry copy_idx so downstream shuffles can
    spread repeats across the epoch."""
    c = _docs(spark, sf).select(
        "doc_id", "source", F.expr(_COPIES).alias("n_copies")
    )
    return (
        c.where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("long"), "n_copies")).alias("copy_idx"),
        )
        .orderBy("doc_id", "copy_idx")
    )


# ------------------------------------------- exact stratified split

_UST = _hex_u16("concat(cast(doc_id as string), ':strat:42')")


@q(
    "split_stratified",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY {_UST}, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN rn * 10 <= n * 8 THEN 'train'
                WHEN rn * 10 <= n * 9 THEN 'val'
                ELSE 'test' END AS split
    FROM r
    ORDER BY doc_id
    """,
)
def split_stratified(spark, sf):
    """EXACT stratified 80/10/10 split: within each source, docs are
    ranked by the deterministic md5 variate (a reproducible shuffle) and
    the split boundaries are drawn at exact per-stratum fractions — so a
    30-doc source contributes exactly 24/3/3, where hash-threshold
    splitting (``split_assign``) only hits the proportions in
    expectation and can starve a small domain of eval data entirely.
    Ties on the 16-bit variate break by doc_id, keeping the rank — and
    therefore the membership — fully deterministic. One shuffle on the
    stratum key; the window is a plain rank, no UDF."""
    w = Window.partitionBy("source").orderBy(F.expr(_UST), "doc_id")
    r = _docs(spark, sf).select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    return r.select(
        "doc_id",
        "source",
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")
