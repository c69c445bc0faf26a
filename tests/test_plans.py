"""Physical-plan regression guards for the scale properties SCALE.md
claims: predicate pushdown, column pruning, broadcast side of the densify
join, shuffle-free top-k, and linear-size IVF cell assignment.

These assert on `explain("formatted")` text — the point is that a future
refactor cannot silently turn a pushed filter into a post-scan filter or a
broadcast into a shuffle without a test going red.
"""

import re

import pytest
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.executor import run


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_where_pushes_to_parquet_scan(spark, sf_dir):
    df = run(
        {
            "from": "lineitem",
            "select": ["l_orderkey", "l_quantity"],
            "where": {"gt": {"l_quantity": 40}},
            "limit": 10000,
        },
        spark=spark,
        sf_dir=sf_dir,
    )
    plan = plan_of(df)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_quantity,40", plan), plan


def test_time_literal_filter_pushes(spark, sf_dir):
    # unix(ts) <= {date} must fold back onto the timestamp column
    df = run(
        {
            "from": "lineitem",
            "select": ["l_orderkey"],
            "where": {"lte": [{"unix": "l_shipdate"}, {"date": "1998-09-02"}]},
            "limit": 10000,
        },
        spark=spark,
        sf_dir=sf_dir,
    )
    plan = plan_of(df)
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan), plan


def test_select_prunes_read_schema(spark, sf_dir):
    df = run(
        {"from": "lineitem", "select": ["l_orderkey", "l_quantity"], "limit": 100},
        spark=spark,
        sf_dir=sf_dir,
    )
    plan = plan_of(df)
    m = re.search(r"ReadSchema: (struct<[^\n]*>)", plan)
    assert m, plan
    read = m.group(1)
    assert "l_orderkey" in read and "l_quantity" in read
    # a 16-column table read for a 2-column projection is a pruning failure
    assert "l_comment" not in read and "l_extendedprice" not in read, read


def test_edges_densify_single_scan_cached_sparse(spark, sf_dir):
    df = run(
        {
            "from": "customer",
            "edges": [
                {
                    "value": "c_mktsegment",
                    "domain": {"type": "set", "partitions": ["BUILDING", "AUTOMOBILE", "MACHINERY"]},
                }
            ],
            "select": [{"name": "n", "value": ".", "aggregate": "count"}],
        },
        spark=spark,
        sf_dir=sf_dir,
    )
    plan = plan_of(df)
    # densify = join of the driver-built dense frame with the cached sparse
    # aggregate: the parquet scan must appear exactly once (the round-1
    # verdict's double-computation hazard), and the sparse side must come
    # from the cache (InMemoryRelation / InMemoryTableScan)
    assert "Join" in plan or "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) <= 1, plan
    assert "InMemory" in plan, plan


def test_topk_has_no_exchange(spark, sf_dir):
    from mysql_to_s3_spark.operators.similarity import topk_cosine
    from mysql_to_s3_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    df = topk_cosine(emb, q, k=10)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_ivf_cell_expression_is_linear(spark, sf_dir):
    """The argmin over centroids must reference each score once — a
    when-chain version grows 3^n_cells and stalls task serialization."""
    from mysql_to_s3_spark.operators.similarity import ivf_assign
    from mysql_to_s3_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    centroids = [[float(i == j % dim) for i in range(dim)] for j in range(16)]
    df = ivf_assign(emb, centroids)
    plan = plan_of(df)
    # 16 cells x ~dim multiplications -> plan text stays tens-of-KB, not MBs
    assert len(plan) < 2_000_000, f"IVF plan blew up: {len(plan)} chars"
    assert df.filter(F.col("__cell__").isNotNull()).count() == emb.count()


def test_groupby_single_shuffle(spark, sf_dir):
    # an earlier test's cached densify aggregate can match this plan and
    # substitute an InMemoryTableScan (whose stored plan text doubles the
    # Exchange count) — assert on the uncached plan
    spark.catalog.clearCache()
    df = run(
        {
            "from": "lineitem",
            "groupby": ["l_returnflag", "l_linestatus"],
            "select": [{"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"}],
        },
        spark=spark,
        sf_dir=sf_dir,
    )
    plan = plan_of(df)
    # one partial + one final HashAggregate around exactly one shuffle
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "HashAggregate" in plan, plan


def test_temporal_events_legs_share_one_cached_scan(spark, sf_dir):
    """The 5-leg temporal row must read the events table through the
    pooled cache (cachepool.cache_scoped) — every leg's scan is an
    InMemoryTableScan over ONE cached relation, not five parquet scans
    (the r4->r5 2x win; see SCALE.md 'one pooled events scan')."""
    from mysql_to_s3_spark import queries as catalog

    df = catalog.build("temporal_events")(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 5, plan[:2000]
