"""Oracle parity: every SQL-expressible queries() entry must produce the
same (row count, column set, order-insensitive value multiset) as its
DuckDB oracle_sql() twin on the sf0.001 tables — this mirrors the driver's
correctness gate exactly, so a green run here predicts a green
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from split_ner_spark.queries import ORACLES, QUERIES, TABLES

SF_DIR = "/root/testdata/sf0.001"


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def _fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    return len(lines), hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    sn, sh = _fingerprint(sdf.columns, srows)
    on, oh = _fingerprint(ocols, orows)
    assert sn == on, f"{name}: row count {sn} vs {on}"
    assert sh == oh, f"{name}: value hash mismatch"


def test_rows_only_queries_are_deterministic(spark):
    """Entries without an oracle still must run and be stable."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        a = sorted(map(str, df.collect()))
        b = sorted(map(str, QUERIES[name](spark, SF_DIR).collect()))
        assert a == b, name
        assert len(a) > 0, name


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_registry_order_sweep_invariant():
    """Executable form of the registry-order mitigation (VERDICT r5 #1):
    a driver sweep that records only the first 50 entries must drop at
    most the derived ``ann_recall`` row — every hash-checked query sits
    in the first 50, and a future append that would silently displace a
    checked row fails here instead of in the driver's artifact."""
    names = list(QUERIES)
    assert len(names) - 50 <= 1, (
        f"registry has {len(names)} entries; a 50-row sweep would drop "
        f"{names[50:]}"
    )
    if len(names) > 50:
        assert names[-1] == "ann_recall", names[-1]
