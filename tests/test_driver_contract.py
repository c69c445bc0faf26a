"""Replicates the driver's CORRECTNESS gate locally: run every
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` on the same
parquet tables, compare row count, sorted column names, and values.
"""

import math
import os
import sys

import pytest

# r11: deselected from the default pass (the driver re-verifies all 50 rows itself (CORRECTNESS gate)); run with -m ""
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, _norm


def _rows(df):
    cols = sorted(df.columns)
    return [tuple(_norm(r[c]) for c in cols) for r in df.collect()], cols


def _duck_rows(duck, sql):
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return [tuple(_norm(r[i]) for i in order) for r in res.fetchall()], sorted(names)


def _eq(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, (int, float)):
        if isinstance(b, float) and math.isnan(b):
            return math.isnan(a)
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_eq(x, y, tol) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("name", list(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = fn(spark, SF_DIR)
    got, got_cols = _rows(df)
    if sql is None:
        assert len(got) >= 0  # rows-only check (driver's weak mode)
        return
    want, want_cols = _duck_rows(duck, sql)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for g, w in zip(sorted(got, key=repr), sorted(want, key=repr)):
        assert _eq(g, w, 1e-6), f"{name}: {g} != {w}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
