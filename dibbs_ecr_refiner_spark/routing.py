"""Multi-configuration (jurisdiction) routing — the full J5 analog.

The reference refines each document once per active (jurisdiction,
condition) configuration and writes outputs under per-(jur, condition)
keys (refiner/app/lambda/lambda_function.py:696-804, :939-983), skipping
jurisdictions with no active config (anti-join → skip records) and
emitting remainder outputs for reportable-but-not-refined conditions
(:986-1060).

Engine analog: one change log, N active plans (one per jurisdiction), each
applied to its own lake table under ``<root>/<jurisdiction>/`` with its own
snapshot chain — the same batch ids, so resume/exactly-once semantics are
per-jurisdiction, like the reference's per-record partial-batch failures.
The loop is driver-side over a handful of configs; all data-plane work is
the ordinary distributed merge.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .engine import ReplayEngine, ReplayStats
from .lake.table import LakeTable
from .plans.config import RefinePlan


@dataclass
class RoutedReplayStats:
    per_jurisdiction: dict[str, ReplayStats] = field(default_factory=dict)
    skipped_jurisdictions: list[str] = field(default_factory=list)


class Router:
    """Route one change log into per-jurisdiction refined tables."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        plans: dict[str, RefinePlan | None],
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.root = root
        self.plans = plans
        self.num_buckets = num_buckets

    def table(self, jurisdiction: str) -> LakeTable:
        return LakeTable(
            self.spark, os.path.join(self.root, jurisdiction), num_buckets=self.num_buckets
        )

    def replay(self, changes: DataFrame, batch_col: str = "ingest_file") -> RoutedReplayStats:
        out = RoutedReplayStats()
        for jur, plan in sorted(self.plans.items()):
            if plan is None:
                # ≙ jurisdiction without an active configuration → skip
                # record in the completion manifest (lambda_function.py:
                # 852-872), not an error
                out.skipped_jurisdictions.append(jur)
                continue
            eng = ReplayEngine(self.spark, self.table(jur), plan)
            out.per_jurisdiction[jur] = eng.replay(changes, batch_col=batch_col)
        return out

    def remainders(self) -> dict[str, DataFrame]:
        """Per-jurisdiction remainder views (reportable but not refined)."""
        return {
            jur: self.table(jur).read_remainder()
            for jur, plan in sorted(self.plans.items())
            if plan is not None
        }
