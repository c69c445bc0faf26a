"""Deterministic hash-split / hash-sample (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.sampling import (
    SPLIT_BUCKETS,
    hash_bucket,
    hash_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "doc_id")


def test_split_fractions_approximate_and_exhaustive(ids):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = dict(
        ids.select(hash_split(F.col("doc_id"), fr).alias("s")).groupBy("s").count().collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01


def test_split_is_deterministic_and_order_independent(spark, ids):
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r.doc_id: r.s for r in ids.select("doc_id", hash_split(F.col("doc_id"), fr).alias("s")).collect()}
    shuffled = ids.orderBy(F.reverse(F.col("doc_id").cast("string"))).repartition(7)
    b = {r.doc_id: r.s for r in shuffled.select("doc_id", hash_split(F.col("doc_id"), fr).alias("s")).collect()}
    assert a == b


def test_bad_fractions_rejected():
    with pytest.raises(ValueError):
        hash_split(F.col("x"), {"a": 0.5, "b": 0.2})


def test_hash_sample_is_stable_subset(ids):
    s10 = {r.doc_id for r in hash_sample(ids, 0.10).collect()}
    s20 = {r.doc_id for r in hash_sample(ids, 0.20).collect()}
    # nested: growing the rate only ADDS rows (bucket < cut is monotone)
    assert s10 <= s20
    assert abs(len(s10) / 20000 - 0.10) < 0.01
    # repeat run selects the identical rows
    assert s10 == {r.doc_id for r in hash_sample(ids, 0.10).collect()}


def test_bucket_range(ids):
    mm = ids.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= mm.lo and mm.hi < SPLIT_BUCKETS
