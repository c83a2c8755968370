"""Explicit hot-key (skew) handling for the refinement/apply path.

The north rule requires "explicit hot-conversation skew splitting". Three
layers, outermost first:

1. **Key granularity.** Every shuffle in the apply path keys on
   (conv_id, turn_idx), never conv_id alone — a hot conversation's events
   spread across as many reducers as it has turns.
2. **Partial aggregation.** LWW is a max_by hash-agg: each map task reduces
   its local slice of a hot key before the exchange, so the reducer for a
   hot (conv_id, turn_idx) receives at most one row per upstream partition.
3. **Salting (this module).** For genuinely pathological keys (one turn
   re-written millions of times in one batch), salt the shuffle key: a
   deterministic two-stage reduce — max_by within (key, salt), then max_by
   over the salt groups. Legal because LWW is associative/commutative given
   the total order (ts, change_lsn).

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in session.py)
covers the join side; this module covers the aggregation side, which AQE
does not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_lww(
    df: DataFrame,
    key: Sequence[str] = ("conv_id", "turn_idx"),
    order: Sequence[str] = ("ts", "change_lsn"),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage LWW reduce with a salted first stage.

    Stage 1 groups on (key..., salt) — a hot key fans out over
    ``salt_buckets`` reducers; stage 2 reduces the ≤salt_buckets survivors
    per key. Output == operators.cdc.lww_resolve (property-tested)."""
    payload = [c for c in df.columns if c not in key and c not in order]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in (*order,)]), F.lit(salt_buckets)).alias("_salt")

    def reduce_step(d: DataFrame, keys: list[str]) -> DataFrame:
        winner = F.max_by(
            F.struct(*[F.col(c) for c in (*order, *payload)]),
            F.struct(*[F.col(c) for c in order]),
        ).alias("_w")
        out = d.groupBy(*keys).agg(winner)
        return out.select(
            *keys, *[F.col(f"_w.{c}").alias(c) for c in (*order, *payload)]
        )

    stage1 = reduce_step(df.withColumn("_salt", salt), [*key, "_salt"]).drop("_salt")
    return reduce_step(stage1, list(key)).select(*df.columns)


def hot_key_report(df: DataFrame, key: str = "conv_id", top: int = 20) -> DataFrame:
    """Diagnostic pre-pass: heaviest keys and their share of the batch —
    used to decide salting. ONE action: the batch total rides along as a
    broadcast single-row aggregate (no separate driver-side df.count()
    job), and the top-k is a TakeOrdered, not a full sort."""
    counts = df.groupBy(key).count()
    total = counts.agg(F.sum("count").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("count") / F.col("_total"))
        .drop("_total")
        .orderBy(F.col("count").desc())
        .limit(top)
    )
