import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_to_s3_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def assert_same_rows(spark_df, duck_rows, tol=1e-9):
    """Order-insensitive, column-name-sorted comparison (mirrors the driver)."""
    cols = sorted(spark_df.columns)
    got = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]
    want = duck_rows
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for g, w in sorted(zip(sorted(got), sorted(want))):
        for a, b in zip(g, w):
            if isinstance(a, float) and isinstance(b, float):
                assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), (g, w)
            else:
                assert a == b, (g, w)


def _norm(v):
    import datetime

    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def duck_sorted(duck, sql):
    """Run oracle SQL; return rows as tuples with columns sorted by name."""
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = res.fetchall()
    return [tuple(_norm(r[i]) for i in order) for r in rows]
