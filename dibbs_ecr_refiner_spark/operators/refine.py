"""The refinement pass, compiled from a RefinePlan into Catalyst expressions.

This is the engine's re-expression of the reference's refinement executor
(refiner/app/services/ecr/refine.py:406-557): per-section (here: per-role)
4-way branch remove / narrative-only / retain / refine (:487-545), ordered
first-match-wins entry matching (entry_matching.py:289-384), keep-set
membership with per-system scoping and any-system fallback
(terminology.py:116-154), translation-fallback (entry_matching.py:346-379),
display enrichment (section/utils.py:42-133), and narrative dispositions
remove/retain/reconstruct/keep_on_match (narrative/writers.py:69-150).

Where the reference walks an lxml tree per document, we fold the (small,
versioned) configuration into literal Spark expressions once on the driver —
the rule table is *data constant-folded into the plan* — and let
whole-stage codegen evaluate it. No Python executes per row; the pandas-UDF
interpreter in refine_udf.py is a parity/extension path, not the hot path.

Output contract (columns added to the input):
- ``_keep``            boolean — False ⇒ turn removed (becomes a tombstone)
- ``text``             possibly rewritten (reconstruction)
- ``_outcome``         removed_wholesale | retained | retained_no_match |
                       refined_kept | reconstructed | removed_no_match |
                       no_config   (≙ SectionOutcome, ecr/model.py:356-472)
- ``_matched_code``, ``_matched_display``, ``_tier`` — provenance
  (≙ SectionProvenanceRecord, ecr/model.py:475-528)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.config import RefinePlan

OUTCOMES = (
    "removed_wholesale",
    "retained",
    "retained_no_match",
    "refined_kept",
    "reconstructed",
    "removed_no_match",
    "no_config",
)


TOKENS_COL = "_toks"


def _tokens(col: Column) -> Column:
    toks = F.split(F.lower(F.coalesce(col, F.lit(""))), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def _toks() -> Column:
    """The materialized token array (added once by apply(); referencing the
    column instead of re-deriving it keeps the regex split from being
    re-evaluated per rule — Catalyst CSE doesn't always catch it)."""
    return F.col(TOKENS_COL)


def _first_match(plan: RefinePlan, target: str, system: str | None) -> Column:
    """First keep-set code found in the rule's target column, else NULL.

    target='tool': the tool name itself is the code (≙ code/@code).
    target='text': lowercase alnum tokens, document order (≙ scanning
    code-bearing descendants in document order, entry_matching.py:317-344).
    System scoping ≙ code_system_oid constraint with all-systems fallback
    when unknown (terminology.py:116-154).
    """
    codes = sorted(plan.codes_for(system))
    if not codes:
        return F.lit(None).cast("string")
    if target == "tool":
        return F.when(F.col("tool").isin(codes), F.col("tool"))
    hits = F.filter(_toks(), lambda t: t.isin(*codes))
    return F.when(F.size(hits) > 0, F.element_at(hits, 1))


def _rule_match(plan: RefinePlan, rule) -> Column:
    primary = _first_match(plan, rule.target, rule.system)
    if rule.fallback_target:
        # Fallback evaluated only when the primary found no codes
        # (≙ translation fallback, entry_matching.py:346-379).
        return F.coalesce(primary, _first_match(plan, rule.fallback_target, rule.system))
    return primary


def _reconstructed_text(plan: RefinePlan) -> Column:
    """Deterministic narrative reconstruction at turn granularity: a summary
    line derived only from the surviving row (≙ rebuilding section <text>
    from surviving entries, narrative/reconstruction.py:1341-1400; the
    conversation-level grouped rollup lives in operators/reconstruct.py)."""
    n = F.size(_toks())
    return F.format_string(
        "[reconstructed cfg-v%d] role=%s tokens=%d head=%s",
        F.lit(plan.config_version),
        F.col("role"),
        n,
        F.coalesce(F.element_at(_toks(), 1), F.lit("")),
    )


def compile_refinement(plan: RefinePlan):
    """Return fn(DataFrame) -> DataFrame implementing the plan.

    Expects transcript-shaped input (role, text, tool present). Pure
    projection + filter expressions: no shuffle, no UDF, fully
    whole-stage-codegen'd; Catalyst pushes the cheap include=False
    role filter below anything expensive (≙ skip-rule partition-pruning
    analog, ecr/policy.py:24-82).
    """
    display_by_code: dict[str, str] = {}
    for k in sorted(plan.keep_codes, key=lambda k: (k.system, k.code)):
        if k.display is not None:
            display_by_code.setdefault(k.code, k.display)

    # Per-role matched code + tier (ordered rules, first match claims —
    # a nested CASE WHEN is exactly "break on first candidate-bearing rule").
    matched_code: Column = F.lit(None).cast("string")
    matched_tier: Column = F.lit(None).cast("int")
    for role, instr in sorted(plan.instructions.items()):
        if not instr.include or instr.action != "refine":
            continue
        role_code: Column = F.lit(None).cast("string")
        role_tier: Column = F.lit(None).cast("int")
        for rule in reversed(plan.rules_for(role)):
            m = _rule_match(plan, rule)
            role_code = F.when(m.isNotNull(), m).otherwise(role_code)
            role_tier = F.when(m.isNotNull(), F.lit(rule.tier)).otherwise(role_tier)
        matched_code = F.when(F.col("role") == role, role_code).otherwise(matched_code)
        matched_tier = F.when(F.col("role") == role, role_tier).otherwise(matched_tier)

    if display_by_code:
        pairs = [x for c, d in sorted(display_by_code.items()) for x in (F.lit(c), F.lit(d))]
        display_map = F.create_map(*pairs)
        matched_display = F.element_at(display_map, F.coalesce(F.col("_matched_code"), F.lit("\x00")))
    else:
        matched_display = F.lit(None).cast("string")

    def _branches():
        """(keep, outcome, text) via the 4-way per-role branch."""
        keep: Column = F.lit(True)
        outcome: Column = F.lit("no_config")
        text: Column = F.col("text")
        for role, instr in sorted(plan.instructions.items()):
            is_role = F.col("role") == role
            if not instr.include:
                keep = F.when(is_role, F.lit(False)).otherwise(keep)
                outcome = F.when(is_role, F.lit("removed_wholesale")).otherwise(outcome)
                continue
            if instr.action == "retain":
                outcome = F.when(is_role, F.lit("retained")).otherwise(outcome)
                continue
            # action == 'refine'
            hit = F.col("_matched_code").isNotNull()
            if instr.narrative == "retain":
                role_keep = F.lit(True)
                role_out = F.when(hit, F.lit("refined_kept")).otherwise(F.lit("retained_no_match"))
                role_text = F.col("text")
            elif instr.narrative in ("remove", "keep_on_match"):
                role_keep = hit
                role_out = F.when(hit, F.lit("refined_kept")).otherwise(F.lit("removed_no_match"))
                role_text = F.col("text")
            else:  # reconstruct
                role_keep = F.lit(True)
                role_out = F.when(hit, F.lit("refined_kept")).otherwise(F.lit("reconstructed"))
                role_text = F.when(hit, F.col("text")).otherwise(_reconstructed_text(plan))
            keep = F.when(is_role, role_keep).otherwise(keep)
            outcome = F.when(is_role, role_out).otherwise(outcome)
            text = F.when(is_role, role_text).otherwise(text)
        return keep, outcome, text

    def apply(df: DataFrame) -> DataFrame:
        out = (
            df.withColumn(TOKENS_COL, _tokens(F.col("text")))
            .withColumn("_matched_code", matched_code)
            .withColumn("_tier", matched_tier)
        )
        keep, outcome, text = _branches()
        return (
            out.withColumn("_keep", keep)
            .withColumn("_outcome", outcome)
            .withColumn("text", text)
            .withColumn("_matched_display", matched_display)
            .drop(TOKENS_COL)
        )

    return apply


def outcome_counts(refined: DataFrame) -> DataFrame:
    """Per-(role, outcome) accounting for lineage (≙ outcome interpretation
    + skipped-code accounting, refine.py:330-398, lambda_function.py:852-872)."""
    return refined.groupBy("role", "_outcome").count()
