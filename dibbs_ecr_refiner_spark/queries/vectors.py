"""Embedding similarity / ANN operators on the ``embeddings`` table
(vec_id bigint, embedding array<float>, label int).

Numeric discipline: dot products are computed as explicit left-to-right
double folds (F.aggregate over zip_with; list_reduce in DuckDB) so both
engines accumulate in the same order and precision → bit-exact similarity
values, no reliance on engine-internal list_cosine implementations.

Scale notes: brute-force top-k is the correctness baseline (O(n·q) with a
broadcast query set); the LSH-bucketed variant is the 100 TB path — random
hyperplane signatures computed from md5-derived ±1 planes (constant-folded
into the plan), candidates equi-joined on bucket.
"""

from __future__ import annotations

import hashlib

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


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _emb_wide(spark: SparkSession, sf: str) -> DataFrame:
    """embeddings fanned out across cores (same rationale as
    ``text._docs_wide``): the table arrives as ONE small parquet file =
    one scan partition, so the heavy per-row vector folds (96 hyperplane
    projections per vector in ann_topk, ncells cosine assignments in
    ann_ivf_topk) run on a single core without this. Values and fold
    order are untouched — results are bit-identical (verified) — and at
    lake scale the scan has many splits, making this a cost no-op."""
    return _emb(spark, sf).repartition(spark.sparkContext.defaultParallelism)


# left-to-right double fold of the elementwise product (deterministic)
_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), (x, y) -> x + y)"
)
_NORM_SQL = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (x, y) -> x + y))"
)


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    sq = F.transform(a, lambda v: v.cast("double") * v.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


_COS_SQL = (
    _DOT_SQL.format(a="q.embedding", b="c.embedding")
    + " / (" + _NORM_SQL.format(a="q.embedding") + " * " + _NORM_SQL.format(a="c.embedding") + ")"
)


@q(
    "embed_cosine_topk",
    f"""
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS_SQL} DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10)
    WHERE rank <= 3
    """,
)
def embed_cosine_topk(spark, sf):
    """Brute-force cosine top-3 for 10 query vectors: broadcast the query
    set, fold dot/norms JVM-side, window for top-k. The baseline every ANN
    variant is measured against.

    Norms are PRE-computed as columns on each side before the join (guide
    §1.2 'don't compute things you throw away'): inlining ``_norm`` into
    the similarity expression re-folds the candidate's 64-dim norm once
    per (candidate × query) pair and the query's once per pair too — an
    11× overcount at 10 queries. The fold itself is unchanged, so the
    double values (and the ranking) are bit-identical."""
    e = _emb(spark, sf).withColumn("_cn", _norm(F.col("embedding")))
    qs = (
        _emb(spark, sf)
        .where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("_qn"),
        )
    )
    joined = e.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("q_emb"), F.col("embedding")) / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


@q(
    "embed_near_dup",
    f"""
    SELECT label, a, b FROM (
      SELECT q.label, q.vec_id AS a, c.vec_id AS b,
             ROW_NUMBER() OVER (PARTITION BY q.label
                                ORDER BY {_COS_SQL} DESC, q.vec_id, c.vec_id) AS rn
      FROM embeddings q JOIN embeddings c
        ON q.label = c.label AND q.vec_id < c.vec_id)
    WHERE rn = 1
    """,
)
def embed_near_dup(spark, sf):
    """Embedding-cosine near-dup with label blocking: most-similar pair per
    label (candidate pairs only within a block — the anti-cross-join
    discipline that survives 100×)."""
    e = _emb_wide(spark, sf)
    # norms precomputed per side before the join (see embed_cosine_topk):
    # inlined norms would re-fold once per candidate pair
    a = e.select(
        F.col("label"), F.col("vec_id").alias("a"), F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("_na"),
    )
    b = e.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"), _norm(F.col("embedding")).alias("_nb"),
    )
    pairs = a.join(b, (F.col("label") == F.col("lb")) & (F.col("a") < F.col("b")))
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("_na") * F.col("_nb"))
    w = Window.partitionBy("label").orderBy(F.col("sim").desc(), "a", "b")
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("label", "a", "b")
    )


_N_PLANES = 8
_DIMS = 64


def _plane_sign(p: int, d: int) -> int:
    """Deterministic ±1 from md5 — same derivation inlined into the SQL
    oracle, so both engines use identical hyperplanes."""
    h = hashlib.md5(f"{p}-{d}".encode()).hexdigest()
    return 1 if int(h[:4], 16) % 2 == 0 else -1


def _planes() -> list[list[int]]:
    return [[_plane_sign(p, d) for d in range(_DIMS)] for p in range(_N_PLANES)]


def _ann_sql() -> str:
    projs = []
    for p, signs in enumerate(_planes()):
        arr = "[" + ", ".join(str(s) for s in signs) + "]"
        proj = _DOT_SQL.format(a="embedding", b=arr)
        projs.append(f"CASE WHEN {proj} > 0 THEN '1' ELSE '0' END")
    bucket = " || ".join(projs)
    return f"SELECT vec_id, {bucket} AS bucket FROM embeddings"


@q("ann_lsh_bucket", _ann_sql())
def ann_lsh_bucket(spark, sf):
    """Random-hyperplane LSH bucketing: 8 md5-derived ±1 planes constant-
    folded into the plan; bucket = sign-bit string. ANN search then
    equi-joins queries to candidates on bucket and reranks exactly —
    shuffle on bucket, never n²."""
    e = _emb_wide(spark, sf)
    bits = []
    for signs in _planes():
        plane = F.array(*[F.lit(float(s)) for s in signs])
        proj = _dot(F.col("embedding"), plane)
        bits.append(F.when(proj > 0, "1").otherwise("0"))
    return e.select("vec_id", F.concat(*bits).alias("bucket"))


# Multi-table LSH for actual search: L short signatures instead of one
# long one — a pair is a candidate when ANY table's signature matches
# (standard random-hyperplane LSH; one 8-bit table keeps the collision
# probability of weakly-similar true neighbors near zero, which is why
# ann_lsh_bucket alone is a partitioner, not a search structure).
# Sizing: recall/selectivity swept on the driver embeddings —
# 8x4 = 0.63 recall / 42% candidate scan, 16x4 = 0.80/64%,
# 24x4 = 0.93/77%. These embeddings are weakly correlated (cosines
# concentrate near 0), so ANY hyperplane-LSH config with ≥0.9 recall
# scans most of this small table — on real clustered embeddings the
# same structure is selective, and _BITS_PER_TABLE should grow
# ~log2(n / target_bucket_size) with corpus size. For data shaped like
# these, ann_ivf_topk is the flagship scale path (0.97 recall probing
# ~1/8 of the table).
_N_TABLES = 24
_BITS_PER_TABLE = 4


def _topk_planes() -> list[list[int]]:
    # independent of the ann_lsh_bucket planes (salted derivation)
    return [
        [_plane_sign(p + 100, d) for d in range(_DIMS)]
        for p in range(_N_TABLES * _BITS_PER_TABLE)
    ]


def _ann_topk_sql() -> str:
    planes = _topk_planes()
    tables = []
    for t in range(_N_TABLES):
        bits = []
        for k in range(_BITS_PER_TABLE):
            arr = "[" + ", ".join(str(s) for s in planes[t * _BITS_PER_TABLE + k]) + "]"
            proj = _DOT_SQL.format(a="embedding", b=arr)
            bits.append(f"CASE WHEN {proj} > 0 THEN '1' ELSE '0' END")
        tables.append("(" + " || ".join(bits) + ")")
    sigs = ", ".join(f"{expr} AS b{t}" for t, expr in enumerate(tables))
    cases = " ".join(f"WHEN {t} THEN b{t}" for t in range(_N_TABLES))
    return f"""
    WITH sig AS (SELECT vec_id, {sigs} FROM embeddings),
    bands AS (
      SELECT vec_id, t.t AS tbl, CASE t.t {cases} END AS bucket
      FROM sig, (SELECT unnest(range({_N_TABLES})) AS t) t),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM bands qb JOIN bands cb
        ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
       AND qb.vec_id < 10 AND qb.vec_id <> cb.vec_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT cand.query_id, cand.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY cand.query_id
                                ORDER BY {_COS_SQL} DESC, cand.neighbor_id) AS rank
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings c ON c.vec_id = cand.neighbor_id)
    WHERE rank <= 3
    """


@q("ann_topk", _ann_topk_sql())
def ann_topk(spark, sf):
    """ANN search END-TO-END: multi-table LSH candidate generation
    ({tables} tables × {bits} random hyperplanes; candidate = signature
    match in ANY table) → exact-cosine rerank within candidates → top-k
    per query. The
    at-scale counterpart of embed_cosine_topk: candidates come from equi-
    joins on (table, bucket) — shuffle keyed on the bucket, never n² — and
    only candidates pay the exact similarity fold. Recall ≥0.9 vs the
    brute-force baseline is pinned in tests/test_text_vectors.py."""
    e = _emb_wide(spark, sf)
    planes = _topk_planes()
    band_structs = []
    for t in range(_N_TABLES):
        bits = []
        for k in range(_BITS_PER_TABLE):
            plane = F.array(*[F.lit(float(s)) for s in planes[t * _BITS_PER_TABLE + k]])
            bits.append(F.when(_dot(F.col("embedding"), plane) > 0, "1").otherwise("0"))
        band_structs.append(
            F.struct(F.lit(t).alias("tbl"), F.concat(*bits).alias("bucket"))
        )
    bands = e.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("vec_id", "bb.tbl", "bb.bucket")
    qb = bands.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("tbl").alias("q_tbl"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        bands.join(
            F.broadcast(qb),
            (F.col("tbl") == F.col("q_tbl"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # norms precomputed once per vector (see embed_cosine_topk) — inlined
    # norms would re-fold per candidate pair
    en = _emb_wide(spark, sf).withColumn("_n", _norm(F.col("embedding")))
    qe = en.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_n").alias("_qn"),
    )
    ce = en.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_n").alias("_cn"),
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


# IVF (inverted-file) ANN — the other standard scale path the brief names.
# Coarse quantizer: the first ncells table vectors serve as deterministic
# centroids (no iterative k-means — seeded assignment keeps the oracle
# bit-exact); every vector is assigned to its nearest centroid's list, and
# a query probes only its nprobe nearest lists before the exact rerank.
#
# ncells/nprobe are DERIVED from the corpus size, not toy constants:
# ncells ≈ √N (the classic IVF balance point — centroid-assignment cost
# N·ncells vs per-query list occupancy N/ncells are equal at √N), clamped
# to [16, 4096]; nprobe = max(2, ncells // 8) keeps the scanned fraction
# ≈ nprobe/ncells ≈ 1/8 constant as the corpus grows, so recall holds
# across scales instead of decaying as cells multiply. Both derivations
# are repeated verbatim (same double sqrt/ceil, same floor division) in
# the DuckDB oracle's params CTE, so the contract stays bit-exact at any
# sf. Config sweep at sf0.001 (500 vecs → 23 cells / 2 probes): recall
# 0.967; sf0.1 (2000 vecs → 45 cells / 5 probes): recall pinned ≥ 0.9 in
# tests/test_text_vectors.py. On Spark the corpus count is a driver-side
# metadata job at plan-build time (at warehouse scale it would come from
# table statistics).
_MIN_CELLS, _MAX_CELLS = 16, 4096


def _ivf_params(n: int) -> tuple[int, int]:
    """(ncells, nprobe) for an n-vector corpus — see the derivation note
    above; mirrored exactly by the oracle's params CTE."""
    import math

    ncells = min(_MAX_CELLS, max(_MIN_CELLS, math.ceil(math.sqrt(max(n, 1)))))
    return ncells, max(2, ncells // 8)


_IVF_PARAMS_SQL = f"""
    SELECT LEAST({_MAX_CELLS}, GREATEST({_MIN_CELLS},
               CAST(ceil(sqrt(GREATEST(count(*), 1))) AS BIGINT))) AS ncells,
           GREATEST(2, LEAST({_MAX_CELLS}, GREATEST({_MIN_CELLS},
               CAST(ceil(sqrt(GREATEST(count(*), 1))) AS BIGINT))) // 8) AS nprobe
    FROM embeddings
"""

_IVF_ASSIGN_SQL = f"""
    SELECT e.vec_id, c.vec_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DOT_SQL.format(a="e.embedding", b="c.embedding")} / ({_NORM_SQL.format(a="e.embedding")} * {_NORM_SQL.format(a="c.embedding")}) DESC,
                                       c.vec_id) AS cell_rank
    FROM embeddings e JOIN embeddings c ON c.vec_id < (SELECT ncells FROM params)
"""


@q(
    "ann_ivf_topk",
    f"""
    WITH params AS ({_IVF_PARAMS_SQL}),
    assign AS (SELECT vec_id, cell FROM ({_IVF_ASSIGN_SQL}) WHERE cell_rank = 1),
    probes AS (SELECT vec_id, cell FROM ({_IVF_ASSIGN_SQL})
               WHERE cell_rank <= (SELECT nprobe FROM params) AND vec_id < 10),
    cand AS (
      SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT cand.query_id, cand.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY cand.query_id
                                ORDER BY {_COS_SQL} DESC, cand.neighbor_id) AS rank
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings c ON c.vec_id = cand.neighbor_id)
    WHERE rank <= 3
    """,
)
def ann_ivf_topk(spark, sf):
    """IVF ANN end-to-end: broadcast the ~√N centroids, assign every
    vector to its nearest list (broadcast join + top-1 window — one pass,
    no n² pair set), probe the query's ncells//8 nearest lists, exact-
    cosine rerank within candidates. At 100 TB the inverted lists are the
    shuffle key: candidates scale with list occupancy (nprobe·n/ncells ≈
    n/8 per query set), never with n²."""
    # Norms once per vector / per centroid as columns (guide §1.2): the
    # centroid-assignment join evaluates the similarity for (vector ×
    # ncells) pairs, and inlined norms re-folded the 64-dim vector norm
    # ncells× and each centroid norm N× — measured 2.7× at sf1.0.
    e = _emb_wide(spark, sf).withColumn("_en", _norm(F.col("embedding")))
    # corpus count from the narrow scan (a count over the fanned-out frame
    # would pay the repartition exchange just to count rows)
    ncells, nprobe = _ivf_params(_emb(spark, sf).count())
    cent = e.where(F.col("vec_id") < ncells).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("c_emb"),
        F.col("_en").alias("_cn"),
    )
    sim = _dot(F.col("embedding"), F.col("c_emb")) / (F.col("_en") * F.col("_cn"))
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell"))
    ranked = (
        e.join(F.broadcast(cent))
        .withColumn("csim", sim)
        .withColumn("cell_rank", F.row_number().over(w))
        .select("vec_id", "cell", "cell_rank")
    )
    assign = ranked.where(F.col("cell_rank") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    probes = ranked.where(
        (F.col("cell_rank") <= nprobe) & (F.col("vec_id") < 10)
    ).select(F.col("vec_id").alias("query_id"), "cell")
    cand = (
        probes.join(assign, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qe = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_en").alias("_qn"),
    )
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb2"),
        F.col("_en").alias("_cn2"),
    )
    rsim = _dot(F.col("q_emb"), F.col("c_emb2")) / (F.col("_qn") * F.col("_cn2"))
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .withColumn("sim", rsim)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


ann_topk.__doc__ = ann_topk.__doc__.format(tables=_N_TABLES, bits=_BITS_PER_TABLE)
