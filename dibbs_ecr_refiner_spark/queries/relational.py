"""Relational operator inventory (SURVEY.md §2.2-§2.8) on the TPC-H-ish
driver tables, each with a DuckDB oracle.

Numeric discipline for bit-exact oracle comparison: every aggregation over
a double column first casts to an exact DECIMAL, so sums are
order-independent; results are cast back to DOUBLE (exact-decimal → double
is deterministic in both engines). Timestamps are emitted as formatted
strings, arrays as joined strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/{name}.parquet")


QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


_DEC = "decimal(18,4)"

# ---------------------------------------------------------------- flagship
# TPC-H Q1 shape: the classic scan → partial/final hash-agg pipeline.
# Whole plan stays in whole-stage codegen; only l_* columns in ReadSchema.


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
        (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf):
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    # shuffled-hash over sort-merge for the fact join (guide §3.1): the
    # orders build side is narrow (3 columns post-prune) and its per-
    # partition slice scales down with shuffle partitioning, so the hash
    # build fits task memory at any cluster size, and both inputs skip the
    # sort; AQE's skew-join splitting still applies to SHJ.
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") < "1998-03-15").hint("shuffle_hash")
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    rev = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------- projections / filters (§2.2)


@q(
    "prune_entries",
    """
    SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    """,
)
def prune_entries(spark, sf):
    """P3 entry pruning: LEFT SEMI JOIN on the matched key set
    (≙ identity-keyed anti-filter, reference entry_matching.py:426-463)."""
    li = _t(spark, sf, "lineitem")
    keep = _t(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    return (
        li.join(F.broadcast(keep), li.l_partkey == keep.p_partkey, "left_semi")
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )


@q(
    "prune_containers",
    """
    SELECT o_orderkey, o_orderpriority FROM orders o
    WHERE o.o_orderpriority = '1-URGENT'
       OR EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
    """,
)
def prune_containers(spark, sf):
    """P4 container pruning with guard: keep a container (order) iff a
    guard exempts it OR it has a matched descendant (≙ organizer pruning
    honoring the specimen-collection guard, entry_matching.py:466-551)."""
    o = _t(spark, sf, "orders")
    matched = (
        _t(spark, sf, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey")
        .distinct()
    )
    flagged = o.join(
        matched.withColumnRenamed("l_orderkey", "o_orderkey").withColumn("_hit", F.lit(True)),
        "o_orderkey",
        "left",
    )
    return flagged.where(
        (F.col("o_orderpriority") == "1-URGENT") | F.col("_hit").isNotNull()
    ).select("o_orderkey", "o_orderpriority")


@q(
    "code_membership",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def code_membership(spark, sf):
    """P5 code-membership predicate against a configured keep set
    (≙ terminology.py:116-154); small set → isin, pushed to the scan."""
    return (
        _t(spark, sf, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
    )


@q(
    "rr_filter",
    """
    SELECT event_id, event_type, value FROM events
    WHERE event_type IN ('purchase', 'error') AND value > 50
    """,
)
def rr_filter(spark, sf):
    """P9 RR condition filter: membership in the plan's retained set AND a
    qualifying tag predicate (≙ refine.py:656-709: RR11 value/@code ∈ plan
    set AND RRVS1 reportable tag present)."""
    return (
        _t(spark, sf, "events")
        .where(F.col("event_type").isin("purchase", "error") & (F.col("value") > 50))
        .select("event_id", "event_type", "value")
    )


# ------------------------------------------------------------- joins (§2.3)


@q(
    "join_broadcast_semi",
    """
    SELECT l_orderkey, l_partkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
    """,
)
def join_broadcast_semi(spark, sf):
    """J1: broadcast hash LEFT SEMI join against the code dimension
    (≙ per-system dict lookup, terminology.py:116-145)."""
    li = _t(spark, sf, "lineitem")
    dim = _t(spark, sf, "part").where(F.col("p_size") < 10).select("p_partkey")
    return li.join(F.broadcast(dim), li.l_partkey == dim.p_partkey, "left_semi").select(
        "l_orderkey", "l_partkey"
    )


@q(
    "join_fallback_coalesce",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           COALESCE(p.p_name, s.s_name, 'unknown') AS display
    FROM lineitem l
    LEFT JOIN (SELECT p_partkey, p_name FROM part WHERE p_size < 25) p
      ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def join_fallback_coalesce(spark, sf):
    """J2 translation-fallback join: try the primary key, fall back to the
    secondary only where the primary missed (≙ entry_matching.py:346-379),
    expressed as two left joins + coalesce."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").where(F.col("p_size") < 25).select("p_partkey", "p_name")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce("p_name", "s_name", F.lit("unknown")).alias("display"),
        )
    )


@q(
    "enrich_left_join",
    """
    SELECT c.c_custkey,
           COALESCE(n.n_name, 'UNKNOWN') AS nation_display,
           COALESCE(r.r_name, 'NONE') AS region_display
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def enrich_left_join(spark, sf):
    """J4 display enrichment: chained left-outer joins + coalesce
    (≙ displayName fill from config codings then narrative index,
    section/utils.py:42-133)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_display"),
            F.coalesce("r_name", F.lit("NONE")).alias("region_display"),
        )
    )


@q(
    "prune_nested_items",
    """
    WITH m AS (
      SELECT l_orderkey,
             MAX(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS has_match
      FROM lineitem GROUP BY l_orderkey)
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN m ON l.l_orderkey = m.l_orderkey
    WHERE m.has_match = 0 OR l.l_quantity > 45 OR l.l_returnflag = 'R'
    """,
)
def prune_nested_items(spark, sf):
    """P4 container-level pruning as an ARRAY operator: pack each order's
    lines into array<struct>, prune sub-items lacking a match unless the
    guard exempts them (l_returnflag='R' ≙ shared-context guard,
    entry_matching.py:535), and never prune inside a container with no
    match at all (≙ the never-delete-a-matched-entry invariant :543-551 —
    containers without matches pass through whole). Engine analog:
    operators/refine.py _pruned_items."""
    li = _t(spark, sf, "lineitem")
    packed = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_linenumber", "l_quantity", "l_returnflag")
        ).alias("items")
    )
    has_match = F.exists("items", lambda x: x["l_quantity"] > 45)
    pruned = F.when(
        has_match,
        F.filter("items", lambda x: (x["l_quantity"] > 45) | (x["l_returnflag"] == "R")),
    ).otherwise(F.col("items"))
    return (
        packed.select("l_orderkey", F.explode(pruned).alias("it"))
        .select("l_orderkey", F.col("it.l_linenumber").alias("l_linenumber"))
    )


@q(
    "enrich_narrative_fallback",
    """
    WITH idx AS (
      SELECT user_id, event_type, substring(props, 1, 40) AS narr
      FROM (SELECT user_id, event_type, props,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events)
      WHERE rn = 1)
    SELECT e.event_id, e.event_type,
           COALESCE(CASE e.event_type WHEN 'click' THEN 'Click Event'
                                      WHEN 'view' THEN 'View Event' END,
                    idx.narr) AS display
    FROM events e
    LEFT JOIN idx ON e.user_id = idx.user_id AND e.event_type = idx.event_type
    """,
)
def enrich_narrative_fallback(spark, sf):
    """J4's SECOND source: a derived per-conversation narrative index fills
    displays the config map lacks (≙ narrative-ID index resolved via
    originalText/reference, section/utils.py:151-217; engine analog
    operators/enrich.py). The config map covers only some codes; the rest
    resolve to the earliest same-group narrative snippet."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    idx = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", F.substring("props", 1, 40).alias("narr"))
    )
    cfg = F.create_map(
        F.lit("click"), F.lit("Click Event"), F.lit("view"), F.lit("View Event")
    )
    return (
        e.alias("L")
        .join(idx.alias("R"), ["user_id", "event_type"], "left")
        .select(
            F.col("L.event_id").alias("event_id"),
            F.col("L.event_type").alias("event_type"),
            F.coalesce(
                F.element_at(cfg, F.col("L.event_type")), F.col("R.narr")
            ).alias("display"),
        )
    )


@q(
    "remainder_anti_join",
    """
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def remainder_anti_join(spark, sf):
    """J6 remainder: reportable-but-not-refined keys via LEFT ANTI join
    (≙ write_remainder_rrs, pipeline.py:397-484)."""
    o = _t(spark, sf, "orders")
    reportable = o.select("o_custkey").distinct()
    refined = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    return reportable.join(refined, "o_custkey", "left_anti")


@q(
    "dedup_outermost",
    """
    SELECT l_orderkey, l_partkey, l_linenumber FROM (
      SELECT l_orderkey, l_partkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
                                ORDER BY l_linenumber) AS rn
      FROM lineitem) WHERE rn = 1
    """,
)
def dedup_outermost(spark, sf):
    """J7 nested/ancestor dedup: keep the outermost element per containment
    key via row_number (≙ generic_matching.py:532-626)."""
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy("l_linenumber")
    return (
        _t(spark, sf, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )


# ------------------------------------------------------ aggregations (§2.4)


@q(
    "group_collect_set",
    """
    SELECT n.n_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def group_collect_set(spark, sf):
    """A1 group-by rollup with set collection (≙ per-jurisdiction condition
    grouping, reportability.py:26-162); sorted + joined for stable compare."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"))
    )


@q(
    "size_reduction",
    """
    SELECT CAST(SUM(length(text)) AS BIGINT) AS unrefined_bytes,
           CAST(SUM(CASE WHEN lang = 'en' THEN length(text) ELSE 0 END) AS BIGINT) AS refined_bytes,
           CAST(FLOOR((SUM(length(text)) - SUM(CASE WHEN lang = 'en' THEN length(text) ELSE 0 END))
                 * 100.0 / SUM(length(text))) AS BIGINT) AS reduction_pct
    FROM documents
    """,
)
def size_reduction(spark, sf):
    """A3 size/reduction metric (≙ refine.py:62-81, pipeline.py:45-67)."""
    d = _t(spark, sf, "documents")
    u = F.sum(F.length("text"))
    r = F.sum(F.when(F.col("lang") == "en", F.length("text")).otherwise(F.lit(0)))
    return d.agg(
        u.cast("long").alias("unrefined_bytes"),
        r.cast("long").alias("refined_bytes"),
        F.floor((u - r) * 100.0 / u).alias("reduction_pct"),
    )


@q(
    "group_count",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def group_count(spark, sf):
    """A4 outcome accounting shape: groupBy + count."""
    return _t(spark, sf, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@q(
    "manifest_diff",
    """
    WITH a AS (
      SELECT source, md5(string_agg(sha256(text), '' ORDER BY doc_id)) AS h
      FROM documents GROUP BY source),
    b AS (
      SELECT source, md5(string_agg(sha256(text), '' ORDER BY doc_id)) AS h
      FROM documents WHERE doc_id % 17 <> 0 GROUP BY source)
    SELECT a.source,
           CASE WHEN b.h IS NULL THEN 'removed'
                WHEN a.h = b.h THEN 'same' ELSE 'changed' END AS status
    FROM a LEFT JOIN b ON a.source = b.source
    """,
)
def manifest_diff(spark, sf):
    """A6/S10 snapshot-diff CDC: per-shard content hash manifests diffed to
    added/changed/removed (≙ detect_changes.py:52-77,227-265)."""
    d = _t(spark, sf, "documents")

    def manifest(df):
        h = F.struct(F.col("doc_id"), F.sha2(F.col("text"), 256).alias("h"))
        return df.groupBy("source").agg(
            F.md5(
                F.array_join(
                    F.transform(F.array_sort(F.collect_list(h)), lambda x: x.h), ""
                )
            ).alias("h")
        )

    a = manifest(d)
    b = manifest(d.where(F.col("doc_id") % 17 != 0)).withColumnRenamed("h", "h_b")
    return a.join(b, "source", "left").select(
        "source",
        F.when(F.col("h_b").isNull(), "removed")
        .when(F.col("h") == F.col("h_b"), "same")
        .otherwise("changed")
        .alias("status"),
    )


@q(
    "rollup_lineage",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineage(spark, sf):
    """Grouping-sets rollup for lineage metrics (engine addition per
    SURVEY §2.4: not in the reference, needed for per-(partition, op)
    lineage rollups).

    Shape (guide §2.3 — aggregate before you shuffle): a naive
    ``rollup().agg()`` puts the Expand (×3 row duplication, one copy per
    grouping set) UNDER the aggregation, tripling the rows every map task
    aggregates. Pre-aggregating per (flag, status) first reduces the table
    to one row per leaf group, and the rollup then expands only those few
    rows. Exact-equal: COUNT(*) per rollup group == SUM of leaf counts,
    and the DECIMAL leaf sums re-sum associatively with no precision loss
    (the double cast happens once, at the end, like the oracle)."""
    leaf = (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("l_quantity").cast(_DEC)).alias("_sq"),
        )
    )
    return (
        leaf.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_sq").cast("double").alias("sum_qty"),
        )
    )


@q(
    "ndv_exact",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS ndv FROM lineitem
    GROUP BY l_returnflag
    """,
)
def ndv_exact(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("ndv"))
    )


@q("ndv_approx", None)  # approx sketch differs across engines → rows-only check
def ndv_approx(spark, sf):
    """approx_count_distinct (HLL++) — cardinality metrics at 10^10 scale
    where exact distinct is a full shuffle."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("ndv_approx"))
    )


# ------------------------------------------------- sorts / top-k (§2.6)


@q(
    "top1_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def top1_per_group(spark, sf):
    """Top-1-per-group (≙ 'first match wins' selections,
    traversal.py:52-54, generic_matching.py:437-445).

    Spelled as a ``max_by`` aggregation over the lexicographic ordering
    struct (price DESC via max, orderkey ASC via negation) rather than the
    oracle's ROW_NUMBER window: identical winners, but the aggregation
    gets a map-side partial reduce — only one candidate per group per
    input partition crosses the exchange, where the window shuffled and
    sorted every row (guide §2.3 'aggregate before you shuffle'; the
    window spelling of top-1 remains covered by ``lww_rank``). Measured
    1.8× at sf1.0 in OPTIMIZATION_r06.md."""
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by(
                F.struct(F.col("o_orderkey"), F.col("o_totalprice")),
                F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg")),
            ).alias("_w")
        )
        .select(
            "o_custkey",
            F.col("_w.o_orderkey").alias("o_orderkey"),
            F.col("_w.o_totalprice").alias("o_totalprice"),
        )
    )


# ------------------------------------------------------ set ops (§2.7)


@q(
    "union_dedup",
    """
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
    """,
)
def union_dedup(spark, sf):
    """Union-then-dedup (≙ matched children ∪ matched parents before dedup,
    generic_matching.py:359)."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@q(
    "explode_distinct",
    """
    SELECT lang, COUNT(DISTINCT tok) AS n_tokens FROM (
      SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
      FROM documents) WHERE tok <> '' GROUP BY lang
    """,
)
def explode_distinct(spark, sf):
    """Flatten-set (≙ all_codes flatten across systems, terminology.py:77-88)."""
    d = _t(spark, sf, "documents")
    toks = F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("tok")
    return (
        d.select("lang", toks)
        .where(F.col("tok") != "")
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("n_tokens"))
    )


# ------------------------------------------------ scalar functions (§2.8)


@q(
    "deterministic_id",
    """
    SELECT o_orderkey,
           sha256(concat_ws('|', 'jur1', 'refine', CAST(o_orderkey AS VARCHAR))) AS det_id
    FROM orders
    """,
)
def deterministic_id(spark, sf):
    """Deterministic output identity (≙ uuid5(namespace, jur|scope|id),
    augment.py:80-224) — the property that makes MERGE replay-safe."""
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.sha2(F.concat_ws("|", F.lit("jur1"), F.lit("refine"), F.col("o_orderkey")), 256).alias(
            "det_id"
        ),
    )


@q(
    "ts_format",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d%H%M%S') || '+0000' AS hl7_ts
    FROM orders
    """,
)
def ts_format(spark, sf):
    """HL7 timestamp rendering (≙ %Y%m%d%H%M%S%z, augment.py:311-312)."""
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.concat(F.date_format("o_orderdate", "yyyyMMddHHmmss"), F.lit("+0000")).alias("hl7_ts"),
    )


@q(
    "map_lookup",
    """
    SELECT l_orderkey, l_linenumber,
           CASE l_returnflag WHEN 'N' THEN 'None' WHEN 'A' THEN 'Accepted'
                WHEN 'R' THEN 'Returned' ELSE NULL END AS flag_display
    FROM lineitem
    """,
)
def map_lookup(spark, sf):
    """Literal-map lookup (≙ interpretation-code display map,
    specification/constants.py:60-77)."""
    m = F.create_map(
        F.lit("N"), F.lit("None"), F.lit("A"), F.lit("Accepted"), F.lit("R"), F.lit("Returned")
    )
    return _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", F.element_at(m, F.col("l_returnflag")).alias("flag_display")
    )


@q(
    "json_extract",
    """
    SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
    """,
)
def json_extract(spark, sf):
    """JSON decode of event payloads (≙ config/manifest/lock JSON,
    lambda_function.py:481-500)."""
    return _t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    )


@q(
    "pivot_status",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark, sf):
    """Pivot (wide aggregation): groupBy + pivot compiles to the same
    conditional-aggregate plan as the CASE-WHEN oracle."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@q(
    "q5_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_supplier_volume(spark, sf):
    """TPC-H Q5 shape: the classic six-table star join with a local-supplier
    constraint (s_nationkey = c_nationkey). Catalyst broadcasts the three
    dimension tables (supplier/nation/region plus the region-filtered
    nation set) and hash-joins the two fact tables; the revenue sum uses
    the exact-decimal discipline so the oracle is bit-stable."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    supp = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    revenue = (
        F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@q(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    """,
)
def q18_large_orders(spark, sf):
    """TPC-H Q18 shape: HAVING-subquery semi join — find customers with
    very large orders. The qualifying-orderkeys set is produced by a
    pre-aggregation and semi-joined into the fact scan (not recomputed per
    row); at scale AQE turns the (small) qualifying set into a broadcast
    semi join."""
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        _t(spark, sf, "orders")
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, sf, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("total_qty"))
    )
