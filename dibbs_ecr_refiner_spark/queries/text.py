"""Training-data text operators on the ``documents`` table: dedup families
(exact, n-gram Jaccard, MinHash+LSH, SimHash), language-ID, quality scoring,
token counting, document fingerprinting.

These are engine additions beyond the reference (per the build brief): the
operations a large-scale training-data pipeline needs. Hashing is md5/sha256
only, which both Spark and DuckDB implement identically — so every operator
here has a bit-exact SQL oracle.

Scale notes: every pairwise operator is candidate-blocked (join on a shared
shingle / band bucket / label), never a cross join; at 100 TB the same plans
hold with the block key as the shuffle key.
"""

from __future__ import annotations

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


def _docs_wide(spark: SparkSession, sf: str) -> DataFrame:
    """documents fanned out across cores: the table arrives as a single
    small parquet file (1 scan partition), so CPU-heavy per-row work
    (hashing, shingling) must be explicitly repartitioned or it runs on
    one core. At lake scale the scan has many splits and this is a no-op
    cost-wise."""
    return _docs(spark, sf).repartition(spark.sparkContext.defaultParallelism)


def _tok(col):
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def _with_tok(spark: SparkSession, sf: str) -> DataFrame:
    """docs + materialized token array (evaluated once, referenced many
    times — avoids Catalyst re-evaluating the regex split per use)."""
    return _docs_wide(spark, sf).withColumn("tok", _tok(F.col("text")))


# token word-3-grams as strings "a b c"
_NGRAM_SQL = """
  SELECT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS g
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tok
        FROM documents),
       (SELECT unnest(range(1, 10000)) AS i)
  WHERE i + 2 <= len(tok)
"""


def _ngrams(toks, n=3):
    """Word n-grams from a *materialized* token-array column."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2])),
    ).otherwise(F.array().cast("array<string>"))


# ------------------------------------------- repetition quality signal


@q(
    "repetition_score",
    """
    WITH grams AS (
      SELECT doc_id, tok[i] || ' ' || tok[i+1] AS g
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tok
            FROM documents),
           (SELECT unnest(range(1, 10000)) AS i)
      WHERE i + 1 <= len(tok)
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           COUNT(DISTINCT g) AS n_distinct,
           ((COUNT(*) - COUNT(DISTINCT g)) * 1000000) // COUNT(*) AS rep_ppm
    FROM grams GROUP BY doc_id
    """,
)
def repetition_score(spark, sf):
    """Duplicate-bigram fraction per document (the Gopher-rules repetition
    filter): heavily repetitive boilerplate scores high and gets dropped
    from training sets. Reported in exact integer parts-per-million so the
    oracle is bit-stable. Per-row explode + one hash agg — scales like
    token_count."""
    toks = F.col("tok")
    idx = F.sequence(F.lit(0), F.size(toks) - 2)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", toks[i], toks[i + 1])),
    ).otherwise(F.array().cast("array<string>"))
    g = _with_tok(spark, sf).select("doc_id", F.explode(bigrams).alias("g"))
    return (
        g.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("g").alias("n_distinct"),
        )
        .withColumn(
            "rep_ppm",
            F.expr("((n_bigrams - n_distinct) * 1000000L) div n_bigrams"),
        )
    )


# ------------------------------------------------- PII scrubbing


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
_LONGNUM_RE = "[0-9]{7,}"


@q(
    "pii_scrub",
    f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g') AS scrubbed,
           len(regexp_split_to_array(text, '{_EMAIL_RE}')) - 1 AS n_emails,
           len(regexp_split_to_array(text, '{_LONGNUM_RE}')) - 1 AS n_longnums
    FROM documents
    """,
)
def pii_scrub(spark, sf):
    """Training-data PII scrub: mask email addresses and long digit runs
    (phone/ID shaped), reporting per-doc hit counts. Pure per-row
    regexp_replace — JVM-side, whole-stage-codegen, scales like any
    projection. Identical RE2-compatible patterns run in the DuckDB
    oracle, so the masked text is hash-checked byte-for-byte."""
    t = F.col("text")
    scrub = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _LONGNUM_RE, "<NUM>"
    )
    return _docs_wide(spark, sf).select(
        "doc_id",
        scrub.alias("scrubbed"),
        (F.size(F.split(t, _EMAIL_RE)) - 1).cast("long").alias("n_emails"),
        (F.size(F.split(t, _LONGNUM_RE)) - 1).cast("long").alias("n_longnums"),
    )


# ------------------------------------------------------------ exact dedup


@q(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf):
    """Exact dedup: hash-groupBy on content, min id as canonical
    representative. At scale this is one shuffle on the hash.

    Reads ``_docs`` (not ``_docs_wide``): the per-row work is one md5 and
    the partial aggregation ships only (hash, min_id, count) — so the
    fan-out repartition shuffled the full document text to save almost no
    per-row CPU (guide §2.3: shuffle keys and metadata, not payloads;
    measured 3.4× in OPTIMIZATION_r06.md). At lake scale the scan has many
    splits and the partial reduce parallelizes on its own."""
    return (
        _docs(spark, sf)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------- n-gram Jaccard near-dup


# Document-frequency cap for the gram blocking join: a gram shared by more
# than this many documents is boilerplate (stopword-grade), carries no
# near-dup signal, and — critically at scale — would make its join block
# quadratic (one ubiquitous gram across N docs = N² candidate pairs). The
# cap is part of the OPERATOR SEMANTICS (Jaccard over informative grams),
# mirrored exactly in the oracle SQL, so capped Spark == capped DuckDB.
_NGRAM_DF_CAP = 32


@q(
    "dedup_ngram_jaccard",
    f"""
    WITH grams0 AS (SELECT DISTINCT doc_id, g FROM ({_NGRAM_SQL})),
    grams AS (
      SELECT doc_id, g FROM grams0
      WHERE g IN (SELECT g FROM grams0 GROUP BY g
                  HAVING COUNT(*) <= {_NGRAM_DF_CAP})),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT common.a, common.b,
           CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) AS jaccard
    FROM common
    JOIN sizes sa ON common.a = sa.doc_id
    JOIN sizes sb ON common.b = sb.doc_id
    WHERE CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) >= 0.35
    """,
)
def dedup_ngram_jaccard(spark, sf):
    """Near-dup by word-3-gram Jaccard ≥ 0.35 over informative grams
    (document frequency ≤ {cap}). Candidate pairs come from a self-join on
    shared n-grams (blocking), never a cross join, and the df cap bounds
    every gram's block to ≤ {cap}² pairs — without it one boilerplate
    phrase across N docs makes its block N² (a job-killer at 100 TB). The
    ratio is exact integer arithmetic → bit-stable."""
    grams0 = (
        _with_tok(spark, sf)
        .select("doc_id", F.explode(_ngrams(F.col("tok"))).alias("g"))
        .distinct()
    )
    w_df = Window.partitionBy("g")
    grams = (
        grams0.withColumn("df", F.count(F.lit(1)).over(w_df))
        .where(F.col("df") <= _NGRAM_DF_CAP)
        .select("doc_id", "g")
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.alias("a")
    b = grams.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sa")
    sb = sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sb")
    jac = F.col("c").cast("double") / (F.col("sa") + F.col("sb") - F.col("c"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.35)
        .select("a", "b", "jaccard")
    )


dedup_ngram_jaccard.__doc__ = dedup_ngram_jaccard.__doc__.format(cap=_NGRAM_DF_CAP)


# --------------------------------------------------------- MinHash + LSH


_N_HASHES = 12
_BAND_SIZE = 3


def _minhash_band_sql() -> str:
    sigs = ", ".join(
        f"MIN(md5('{s}#' || g)) AS sig{s}" for s in range(_N_HASHES)
    )
    bands = []
    for band in range(_N_HASHES // _BAND_SIZE):
        parts = " || ".join(f"sig{band * _BAND_SIZE + k}" for k in range(_BAND_SIZE))
        bands.append(f"({band}, md5({parts}))")
    return f"""
    WITH sigs AS (
      SELECT doc_id, {sigs} FROM ({_NGRAM_SQL}) GROUP BY doc_id),
    bands AS (
      SELECT doc_id, b.band, b.bucket
      FROM sigs, LATERAL (SELECT * FROM (VALUES {', '.join(bands)}) v(band, bucket)) b)
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


@q("dedup_minhash_lsh", _minhash_band_sql())
def dedup_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup candidates: shingle → 12 md5-seeded minhash
    mins computed in ONE aggregation pass (12 min() exprs, map-side partial
    combine — no seed explosion, no second shuffle) → bands of 3 → band-
    bucket equi-join. Candidates shuffle on (band, bucket): cost is
    proportional to collisions, not n²."""
    grams = _with_tok(spark, sf).select("doc_id", F.explode(_ngrams(F.col("tok"))).alias("g"))
    sig_exprs = [
        F.min(F.md5(F.concat(F.lit(f"{s}#"), F.col("g")))).alias(f"sig{s}")
        for s in range(_N_HASHES)
    ]
    sigs = grams.groupBy("doc_id").agg(*sig_exprs)
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.md5(
                F.concat(*[F.col(f"sig{band * _BAND_SIZE + k}") for k in range(_BAND_SIZE)])
            ).alias("bucket"),
        )
        for band in range(_N_HASHES // _BAND_SIZE)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )


# --------------------------------------------------------------- SimHash


_SIMHASH_SQL = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
      FROM documents),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM toks),
    votes AS (
      SELECT doc_id, j.j,
             SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, (SELECT unnest(range(32)) AS j) j
      GROUP BY doc_id, j.j)
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
"""


@q(
    "dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
      FROM documents),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM toks),
    votes AS (
      SELECT doc_id, j.j,
             SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, (SELECT unnest(range(32)) AS j) j
      GROUP BY doc_id, j.j)
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf):
    """32-bit SimHash fingerprint per document (bit votes over md5-hashed
    token occurrences). Near-dup at scale = group by simhash prefix bands
    and compare hamming distance within buckets; the fingerprint itself is
    the oracle-checked core."""
    toks = _with_tok(spark, sf).select("doc_id", F.explode("tok").alias("t"))
    hashed = toks.select(
        "doc_id", F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h")
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j")
    # dynamic shift amounts need the SQL expression form (the Python
    # F.shiftright wrapper only takes an int literal)
    bit = F.expr("shiftright(h, j) % 2")
    votes = (
        hashed.select("doc_id", "h", js)
        .groupBy("doc_id", "j")
        .agg(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(0)
        ).alias("simhash")
    )


_HAMMING_MAX = 4
_N_SIMHASH_BANDS = 4  # 8 bits each over the 32-bit fingerprint


@q(
    "dedup_simhash_pairs",
    f"""
    WITH fp AS ({_SIMHASH_SQL}),
    bands AS (
      SELECT doc_id, simhash, j.k AS band_idx,
             (simhash >> (8 * j.k)) & 255 AS band_val
      FROM fp, (SELECT unnest(range({_N_SIMHASH_BANDS})) AS k) j)
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    """,
)
def dedup_simhash_pairs(spark, sf):
    """SimHash near-dup SEARCH completing the family: banded hamming — the
    32-bit fingerprint splits into 4×8-bit bands; pairs sharing any band
    value become candidates (pigeonhole: any pair with hamming ≤ 3 shares a
    clean band; wider radii trade recall), then exact hamming ≤ {max} via
    bit_count(xor) verifies within buckets only. Shuffle on (band, value) —
    never an all-pairs comparison."""
    fp = dedup_simhash(spark, sf)
    k = F.explode(F.sequence(F.lit(0), F.lit(_N_SIMHASH_BANDS - 1))).alias("band_idx")
    bands = fp.select(
        "doc_id", "simhash", k
    ).withColumn(
        "band_val", F.expr("(simhash >> (8 * band_idx)) & 255")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= _HAMMING_MAX
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )


# ------------------------------------------------------------ language ID


_LANG_MARKERS = {
    "en": ["the", "and", "of", "a", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}


def _lang_sql() -> str:
    cases = []
    for lang, words in _LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        cases.append(
            f"len(list_filter(tok, x -> list_contains([{lst}], x))) AS hits_{lang}"
        )
    hits = ", ".join(cases)
    return f"""
    SELECT doc_id,
           CASE
             WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
             WHEN hits_es >= hits_fr AND hits_es >= hits_de AND hits_es > 0 THEN 'es'
             WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
             WHEN hits_de > 0 THEN 'de'
             ELSE 'und' END AS pred_lang
    FROM (
      SELECT doc_id, {hits}
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tok
            FROM documents))
    """


@q("lang_id", _lang_sql())
def lang_id(spark, sf):
    """Language ID by stopword-marker voting (n-gram heuristic family);
    deterministic priority order en > es > fr > de on ties."""
    d = _with_tok(spark, sf)
    for lang, words in _LANG_MARKERS.items():
        d = d.withColumn(
            f"hits_{lang}", F.size(F.filter(F.col("tok"), lambda t: t.isin(*words)))
        )
    h = {k: F.col(f"hits_{k}") for k in _LANG_MARKERS}
    pred = (
        F.when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]) & (h["en"] > 0), "en")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]) & (h["es"] > 0), "es")
        .when((h["fr"] >= h["de"]) & (h["fr"] > 0), "fr")
        .when(h["de"] > 0, "de")
        .otherwise("und")
    )
    return d.select("doc_id", pred.alias("pred_lang"))


# ---------------------------------------------------------- quality score


@q(
    "quality_score",
    """
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
           CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> list_contains(['the','and','of','a','to'], x))) AS DOUBLE)
             / len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS stopword_ratio
    FROM documents WHERE length(text) > 0
    """,
)
def quality_score(spark, sf):
    """Quality signals: alpha ratio, punctuation ratio, stopword ratio —
    exact integer-count divisions, bit-stable."""
    d = _with_tok(spark, sf).where(F.length("text") > 0)
    toks = F.col("tok")
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "and", "of", "a", "to")))
    return d.select(
        "doc_id",
        (
            F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double") / F.length("text")
        ).alias("alpha_ratio"),
        (
            F.length(F.regexp_replace("text", "[^.,;:!?]", "")).cast("double") / F.length("text")
        ).alias("punct_ratio"),
        (stop.cast("double") / F.size(toks)).alias("stopword_ratio"),
    )


@q(
    "token_count",
    """
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens
    FROM documents
    """,
)
def token_count(spark, sf):
    """Token counting: whitespace tokens + a BPE-ish regex segmentation."""
    d = _docs_wide(spark, sf)
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )
    return d.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens"))


@q(
    "doc_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
                 t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
             (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark, sf):
    """Rolling polynomial fingerprint (Horner fold over md5-hashed tokens,
    mod 1e9+7) — order-sensitive content identity for shingled chunks."""
    hashes = F.transform(F.col("tok"), lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    fp = F.aggregate(
        hashes, F.lit(0).cast("long"), lambda acc, h: (acc * 31 + h) % 1000000007
    )
    return _with_tok(spark, sf).select("doc_id", fp.alias("fingerprint"))


def _minhash_verified_sql() -> str:
    cand = _minhash_band_sql()
    return f"""
    WITH cand AS ({cand}),
    grams2 AS (SELECT DISTINCT doc_id, g FROM ({_NGRAM_SQL})),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams2 GROUP BY doc_id),
    common AS (
      SELECT c.a, c.b, COUNT(*) AS cnt
      FROM cand c
      JOIN grams2 ga ON ga.doc_id = c.a
      JOIN grams2 gb ON gb.doc_id = c.b AND gb.g = ga.g
      GROUP BY c.a, c.b)
    SELECT common.a, common.b,
           CAST(common.cnt AS DOUBLE) / (sa.sz + sb.sz - common.cnt) AS jaccard
    FROM common
    JOIN sizes sa ON common.a = sa.doc_id
    JOIN sizes sb ON common.b = sb.doc_id
    WHERE CAST(common.cnt AS DOUBLE) / (sa.sz + sb.sz - common.cnt) >= 0.5
    """


@q("dedup_minhash_verified", _minhash_verified_sql())
def dedup_minhash_verified(spark, sf):
    """Two-stage near-dup: MinHash-LSH candidate generation, then EXACT
    Jaccard verification of only the candidates (the standard at-scale
    pipeline — sketch recall, exact precision; verification cost is
    O(candidates), not O(n²))."""
    cand = dedup_minhash_lsh(spark, sf)
    grams = (
        _with_tok(spark, sf)
        .select("doc_id", F.explode(_ngrams(F.col("tok"))).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ga = grams.select(F.col("doc_id").alias("a"), F.col("g"))
    gb = grams.select(F.col("doc_id").alias("b2"), F.col("g").alias("g2"))
    common = (
        cand.join(ga, "a")
        .join(gb, (F.col("b") == F.col("b2")) & (F.col("g") == F.col("g2")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sa = sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sa")
    sb = sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sb")
    jac = F.col("cnt").cast("double") / (F.col("sa") + F.col("sb") - F.col("cnt"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.5)
        .select("a", "b", "jaccard")
    )


def _cluster_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_band_sql()}),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION SELECT b, a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    cc AS (
      SELECT id, id AS root FROM nodes
      UNION
      SELECT e.dst AS id, cc.root
      FROM cc JOIN edges e ON cc.id = e.src
      WHERE cc.root < e.dst OR cc.root < cc.id)
    SELECT id AS doc_id, MIN(root) AS cluster_id FROM cc GROUP BY id
    """


@q("dedup_clusters", _cluster_sql())
def dedup_clusters(spark, sf):
    """Dedup cluster formation: connected components over the near-dup
    candidate graph (every doc labeled with the min doc_id reachable from
    it — the canonical representative a training pipeline keeps).

    Spark shape: iterative label propagation — each round every node takes
    the min label among itself and its neighbors (one shuffle join + min
    agg per round), converging in O(graph diameter) rounds. This is the
    standard large-scale CC algorithm (hash-join based, no GraphX needed);
    candidate graphs from LSH have tiny diameters.

    Scale discipline: the candidate-pair DAG (shingle → minhash → band
    join) is computed EXACTLY ONCE — ``edges`` is persisted before the
    loop — and each round's labels are ``localCheckpoint``ed so lineage
    stays O(1) instead of growing a plan tree per round (and the
    convergence count reads the materialized round result, not a
    recompute)."""
    pairs = dedup_minhash_lsh(spark, sf)
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(10):  # diameter bound; LSH components are tiny
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # one materialization per round: stepped carries old+new label so
        # the convergence probe is a filter over the checkpointed rows
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("label").alias("_old"),
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        changed = stepped.where(F.col("label") != F.col("_old")).count()
        labels = stepped.select("id", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
