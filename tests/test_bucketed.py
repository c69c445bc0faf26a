"""Bucketed-table write/read (sinks/bucketed.py): the co-located join
must plan with zero Exchange and zero Sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_to_s3_spark.sinks.bucketed import read_bucketed, write_bucketed
from mysql_to_s3_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "li_b", keys="l_orderkey", n_buckets=8, path=str(base / "li_b"))
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_b",
        keys="l_orderkey",
        n_buckets=8,
        path=str(base / "ord_b"),
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_cobucketed_join_has_no_exchange(bucketed, spark, sf_dir):
    li = read_bucketed(spark, "li_b")
    ords = read_bucketed(spark, "ord_b")
    joined = li.join(ords, "l_orderkey").groupBy("o_orderstatus").agg(
        F.sum("l_quantity").alias("qty")
    )
    # model the 100 TB case: neither side broadcasts, the join must be a
    # sort-merge over the bucketed (pre-shuffled, pre-sorted) storage
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself is exchange-free (bucketed storage pre-shuffled
    # both sides); the only exchange allowed is the one the final
    # groupBy introduces AFTER the join. A bucket-local Sort remains —
    # Spark 4 never propagates bucketed-scan output ordering — but it
    # moves no data.
    join_part = plan[plan.index("Join") :] if "Join" in plan else plan
    assert "Exchange" not in join_part, join_part
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    # values match the unbucketed plan
    base = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, base.collect()))


def test_bucketed_scan_prunes_and_pushes_down(bucketed, spark):
    # autoBucketedScan turns the bucketed layout OFF for plans with no
    # interested operator (pure filter/scan); disable it so the bucket
    # pruning path is exercised
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        li = read_bucketed(spark, "li_b").filter(F.col("l_orderkey") == 32).select(
            "l_orderkey", "l_quantity"
        )
        plan = li._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    # bucket pruning: an equality filter on the bucket key scans 1 of 8
    # buckets; the predicate and projection still reach the parquet scan
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,32)" in plan, plan
