"""Driver-contract sanity: entry() runs, queries()/oracle_sql() are
consistent, and a representative subset matches DuckDB at sf0.001.
(The full gate is tools/check_contract.py at sf0.01 — run separately.)"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_contract import TABLES, rowset

SAMPLE = [
    "q1_pricing_summary",
    "lww_agg",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "doc_fingerprint",
    "rule_precedence",
]


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "sum_disc_price" in df.columns


def test_every_oracle_has_a_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the non-oracled set is the documented rows-only list, nothing else
    # (since round 5 only ndv_approx — an approx sketch has no exact oracle)
    assert set(qs) - set(oracles) == {"ndv_approx"}
    assert len(qs) >= 40


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    df = qs[name](spark, sf_dir)
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    assert sorted(df.columns) == sorted(duck_cols)
    a = rowset(df.columns, [tuple(r) for r in df.collect()])
    b = rowset(duck_cols, res.fetchall())
    assert a == b


def test_dist_zip_matches_source():
    """The committed spark-submit artifact must not go stale: every package
    source file's bytes must match the zip entry (regenerate with
    `python tools/build_dist.py`)."""
    import os
    import zipfile

    import tools.build_dist as bd

    with zipfile.ZipFile(bd.OUT) as zf:
        names = set(zf.namelist())
        for path in bd.source_files():
            arc = os.path.relpath(path, bd.REPO)
            assert arc in names, f"missing from dist zip: {arc} — rebuild"
            assert zf.read(arc) == open(path, "rb").read(), f"stale in dist zip: {arc}"
        extras = names - {os.path.relpath(p, bd.REPO) for p in bd.source_files()}
        assert not extras, f"zip carries removed files: {extras}"
