"""Row-constraint validation operator (≙ the reference's XSD + Schematron
output backstop: refiner/tests/integration/scenarios/conftest.py:15-19 —
every refined document is schema-validated before it counts as produced).
Here: declarative rules → one violations DataFrame, a table-level runner
appending to the validation audit log, and the CLI face."""

import json

import pytest
from pyspark.sql import functions as F

from dibbs_ecr_refiner_spark.operators.validate import (
    expr_rule,
    in_range,
    in_set,
    not_null,
    transcript_rules,
    unique,
    validate_table,
    validation_log,
    violations,
)


@pytest.fixture()
def frame(spark):
    rows = [
        ("c1", 0, "user", "hi", 5.0),
        ("c1", 1, "assistant", None, 2.0),  # null text
        ("c1", 1, "assistant", "dup key", 1.0),  # duplicate (c1,1)
        ("c2", 0, "robot", "bad role", -3.0),  # bad enum + negative
        ("c2", 1, "user", "ok", 999.0),  # over range cap
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, score double"
    )


def test_each_rule_kind_fires_exactly_where_expected(frame):
    rules = [
        not_null("text"),
        in_set("role", ["user", "assistant", "system", "tool"]),
        in_range("score", 0, 100),
        unique("conv_id", "turn_idx"),
    ]
    got = violations(frame, rules, ("conv_id", "turn_idx")).collect()
    by_rule = {}
    for r in got:
        by_rule.setdefault(r["rule"], set()).add((r["key"], r["detail"]))
    assert by_rule["not_null(text)"] == {("c1|1", "value is NULL")}
    assert by_rule["in_set(role)"] == {("c2|0", "value robot")}
    assert by_rule["in_range(score)"] == {("c2|0", "value -3.0"), ("c2|1", "value 999.0")}
    assert by_rule["unique(conv_id,turn_idx)"] == {("c1|1", "count=2")}


def test_null_predicate_counts_as_violation(spark):
    """CHECK semantics inverted: an unknown (NULL) predicate is a
    violation, so a NULL score trips in_range."""
    df = spark.createDataFrame([("a", None)], "k string, score double")
    got = violations(df, [in_range("score", 0, 1)], ("k",)).collect()
    assert [(r["key"], r["detail"]) for r in got] == [("a", "value NULL")]


def test_expr_rule_escape_hatch(frame):
    got = violations(
        frame,
        [expr_rule("text_shorter_than_6", "length(text) < 6 OR text IS NULL")],
        ("conv_id", "turn_idx"),
    ).collect()
    assert {r["key"] for r in got} == {"c1|1", "c2|0"}  # 'dup key'(7), 'bad role'(8)


def test_violations_plan_is_union_of_pruned_scans(frame):
    """Plan shape: no UDFs (stays whole-stage-codegen'd), and the unique
    rule contributes exactly one aggregation."""
    plan = violations(
        frame, [not_null("text"), unique("conv_id", "turn_idx")], ("conv_id", "turn_idx")
    )._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def _table_with(spark, tmp_path, rows):
    import datetime as dt

    from dibbs_ecr_refiner_spark.lake.table import LakeTable

    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    delta = spark.createDataFrame(
        [
            (c, i, dt.datetime(2026, 1, 1), lsn, role, text, None, False)
            for (c, i, role, text, lsn) in rows
        ],
        "conv_id string, turn_idx int, ts timestamp, change_lsn long, "
        "role string, text string, tool string, _deleted boolean",
    )
    table.merge(delta, "b0")
    return table


def test_validate_table_clean_and_audit_log(spark, tmp_path):
    table = _table_with(
        spark, tmp_path, [("c1", 0, "user", "hi", 1), ("c1", 1, "assistant", "yo", 2)]
    )
    rec = validate_table(table)
    assert rec["ok"] and rec["violations"] == 0
    assert rec["version"] == 1
    assert rec["rules"] == [r.name for r in transcript_rules()]
    log = validation_log(table)
    assert len(log) == 1 and log[0]["ok"]
    # a second run appends, never overwrites — it's a lineage trail
    validate_table(table)
    assert len(validation_log(table)) == 2


def test_validate_table_flags_bad_rows(spark, tmp_path):
    table = _table_with(
        spark,
        tmp_path,
        [("c1", 0, "user", "hi", 1), ("c1", 1, "robot", None, 2)],
    )
    rec = validate_table(table)
    assert not rec["ok"]
    assert rec["by_rule"] == {"kept_text_not_null": 1, "role_in_enum": 1}
    assert validation_log(table)[-1]["violations"] == 2


def test_cli_validate(spark, tmp_path, capsys, monkeypatch):
    from dibbs_ecr_refiner_spark import cli

    table = _table_with(spark, tmp_path, [("c1", 0, "user", "hi", 1)])
    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    assert cli.main(["validate", "--table", table.root]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cmd"] == "validate" and out["ok"] and out["violations"] == 0
