"""Bracketed exact percentiles (operators/quantiles.py): bit-equality
with Spark's buffer-everything exact percentile, at bounded memory."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.quantiles import (
    QuantileError,
    exact_median,
    exact_percentiles,
)


def _df(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "x double")


def _builtin(spark, values, qs):
    df = _df(spark, values)
    return [
        df.agg(F.percentile("x", F.lit(q))).first()[0] for q in qs
    ]


def test_matches_builtin_on_lineitem(spark, sf_dir):
    from mysql_to_s3_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = exact_percentiles(li, "l_extendedprice", qs)
    want = [
        li.agg(F.percentile("l_extendedprice", F.lit(q))).first()[0] for q in qs
    ]
    assert got == want  # bit-equal, not approx


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n=st.integers(1, 400),
    dup=st.booleans(),
)
@pytest.mark.slow  # r11: >19 s in the full-suite run; default pass deselects
def test_matches_builtin_property(spark, seed, n, dup):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 1000, n)
    if dup:  # heavy duplication stresses the rank/bracket arithmetic
        vals = np.round(vals, -2)
    qs = [0.0, 0.25, 0.5, 0.75, 1.0, float(rng.uniform())]
    got = exact_percentiles(_df(spark, vals), "x", qs)
    want = _builtin(spark, vals, qs)
    assert got == pytest.approx(want, abs=0.0)  # exact


def test_point_mass_never_collects(spark):
    # one duplicated value across the whole column: the bracket is
    # degenerate and the cap cannot trigger
    got = exact_percentiles(_df(spark, [7.0] * 5000), "x", [0.1, 0.5, 0.9],
                            max_bracket_rows=10)
    assert got == [7.0, 7.0, 7.0]


def test_tiny_inputs_and_edges(spark):
    assert exact_median(_df(spark, [42.0]), "x") == 42.0
    assert exact_percentiles(_df(spark, [1.0, 2.0]), "x", 0.5) == 1.5
    assert exact_percentiles(_df(spark, [1.0, 2.0]), "x", 0.0) == 1.0
    assert exact_percentiles(_df(spark, [1.0, 2.0]), "x", 1.0) == 2.0


def test_nulls_ignored_and_all_null(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    assert exact_median(df, "x") == 2.0
    empty = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_median(empty, "x") is None
    assert exact_percentiles(empty, "x", [0.5, 0.9]) == [None, None]


def test_parameter_validation(spark):
    df = _df(spark, [1.0])
    with pytest.raises(QuantileError, match=r"\[0, 1\]"):
        exact_percentiles(df, "x", 1.5)
    with pytest.raises(QuantileError, match="accuracy"):
        exact_percentiles(df, "x", 0.5, accuracy=10)


def test_bracket_cap_refuses_wide_bracket(spark):
    # distinct values + coarse sketch: the bracket is non-degenerate and
    # holds >> cap rows -> loud refusal naming the fix
    vals = list(np.linspace(0, 10, 1000))
    with pytest.raises(QuantileError, match="max_bracket_rows"):
        exact_percentiles(_df(spark, vals), "x", 0.5, accuracy=100,
                          max_bracket_rows=3)
    # half-duplicated rank mass resolves WITHOUT collecting: the sketch
    # bracket collapses inside the duplicated value (point-mass path),
    # so even a tiny cap cannot trigger and the answer is exact
    dup = [5.0] * 500 + list(np.linspace(0, 10, 500))
    got = exact_percentiles(_df(spark, dup), "x", 0.5, max_bracket_rows=3)
    assert got == _builtin(spark, dup, [0.5])[0] == 5.0


def test_scalar_in_scalar_out(spark):
    df = _df(spark, [1.0, 2.0, 3.0])
    assert isinstance(exact_percentiles(df, "x", 0.5), float)
    assert isinstance(exact_percentiles(df, "x", [0.5]), list)


def test_grouped_matches_builtin(spark, sf_dir):
    from mysql_to_s3_spark.operators.quantiles import exact_percentile_grouped
    from mysql_to_s3_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    for q in (0.0, 0.5, 0.9, 1.0):
        got = {
            r["l_returnflag"]: r["pct"]
            for r in exact_percentile_grouped(
                li, ["l_returnflag"], "l_extendedprice", q
            ).collect()
        }
        want = {
            r["l_returnflag"]: r["p"]
            for r in li.groupBy("l_returnflag")
            .agg(F.percentile("l_extendedprice", F.lit(q)).alias("p"))
            .collect()
        }
        assert got == want  # bit-equal per group


def test_grouped_null_and_point_mass_groups(spark):
    from mysql_to_s3_spark.operators.quantiles import exact_percentile_grouped

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None), ("c", 7.0),
         ("d", 2.0), ("d", 2.0), ("d", 2.0)],
        "k string, x double",
    )
    got = {r["k"]: r["pct"] for r in exact_percentile_grouped(df, ["k"], "x", 0.5).collect()}
    assert got == {"a": 2.0, "b": None, "c": 7.0, "d": 2.0}


def test_grouped_fallback_path_still_exact(spark):
    """A coarse sketch with a tiny bracket cap pushes groups onto the
    buffer-everything fallback — the answer stays exact."""
    from mysql_to_s3_spark.operators.quantiles import exact_percentile_grouped

    vals = list(np.linspace(0, 10, 500))
    df = spark.createDataFrame([("g", float(v)) for v in vals], "k string, x double")
    got = exact_percentile_grouped(
        df, ["k"], "x", 0.5, accuracy=100, max_bracket_rows=2
    ).first()["pct"]
    want = df.agg(F.percentile("x", F.lit(0.5))).first()[0]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 2**31), nk=st.integers(1, 5))
@pytest.mark.slow  # r11: >19 s in the full-suite run; default pass deselects
def test_grouped_property(spark, seed, nk):
    from mysql_to_s3_spark.operators.quantiles import exact_percentile_grouped

    rng = np.random.default_rng(seed)
    rows = [
        (f"k{int(rng.integers(nk))}", float(v))
        for v in np.round(rng.normal(0, 100, int(rng.integers(5, 200))), 1)
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    q = float(rng.uniform())
    got = {r["k"]: r["pct"] for r in exact_percentile_grouped(df, ["k"], "x", q).collect()}
    want = {
        r["k"]: r["p"]
        for r in df.groupBy("k").agg(F.percentile("x", F.lit(q)).alias("p")).collect()
    }
    assert got == want


def test_grouped_point_mass_sketch_cannot_lie(spark):
    """Regression (hypothesis seed 0): at n=170 a 5/accuracy probe spans
    <1 rank, the sketch bracket collapses onto the CEIL-rank value, and
    the pre-fix point-mass shortcut returned it unverified (130.4 where
    the exact interpolation is 130.162...). Containment is now proved
    for point-mass brackets too; the group falls back and stays exact."""
    import numpy as np

    rng = np.random.default_rng(0)
    rows = [("k0", float(v)) for v in np.round(rng.normal(0, 100, int(rng.integers(5, 200))), 1)]
    q = float(rng.uniform())
    from mysql_to_s3_spark.operators.quantiles import exact_percentile_grouped

    df = spark.createDataFrame(rows, "k string, x double")
    got = exact_percentile_grouped(df, ["k"], "x", q).first()["pct"]
    want = df.agg(F.percentile("x", F.lit(q))).first()[0]
    assert got == want


def test_grouped_null_key_group_matches_groupby(spark):
    """A NULL group KEY is a group like any other (groupBy semantics):
    pre-fix, the plain equi-join dropped null-key rows from the bracket
    path and returned pct=NULL for a group full of data."""
    from mysql_to_s3_spark.operators.quantiles import exact_percentile_grouped

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 3.0), ("a", 10.0)],
        "k string, x double",
    )
    got = {r["k"]: r["pct"] for r in exact_percentile_grouped(df, ["k"], "x", 0.5).collect()}
    want = {
        r["k"]: r["p"]
        for r in df.groupBy("k").agg(F.percentile("x", F.lit(0.5)).alias("p")).collect()
    }
    assert got == want == {None: 2.0, "a": 10.0}
