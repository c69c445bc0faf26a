"""Property-based conformance: the JX->Column compiler vs DuckDB SQL on
hypothesis-generated adversarial data (NULLs, empty strings, zeros,
negatives, unicode) — the corners fixed catalog queries can't sweep.

Each example materializes one small table in BOTH engines and evaluates a
battery of (JX expression, equivalent SQL) pairs side by side. JX-specific
semantics are encoded in the SQL: missing ⊇ {NULL, ''} for strings,
null-safe eq, missing AND/OR terms coerce to FALSE, div-by-zero -> default,
find -> NULL (never -1), concat skips missing terms.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mysql_to_s3_spark.functions.compiler import Schema, compile_expression

# (name, JX expression, DuckDB SQL over table t(a bigint, b double, s varchar, u varchar))
PAIRS = [
    ("eq_nullsafe", {"eq": ["a", "b"]}, "a IS NOT DISTINCT FROM b"),
    ("ne_both_exist", {"ne": ["a", "b"]}, "a IS NOT NULL AND b IS NOT NULL AND a <> b"),
    ("gt", {"gt": ["a", "b"]}, "a > b"),
    (
        "and_missing_false",
        {"and": [{"gt": {"a": 0}}, {"lt": {"b": 10}}]},
        "coalesce(a > 0, FALSE) AND coalesce(b < 10, FALSE)",
    ),
    (
        "or_missing_false",
        {"or": [{"gt": {"a": 0}}, {"lt": {"b": 10}}]},
        "coalesce(a > 0, FALSE) OR coalesce(b < 10, FALSE)",
    ),
    ("not_", {"not": {"gt": {"a": 0}}}, "NOT coalesce(a > 0, FALSE)"),
    ("add_ignore_null", {"add": ["a", "b"]}, "CASE WHEN a IS NULL AND b IS NULL THEN NULL ELSE coalesce(a, 0) + coalesce(b, 0) END"),
    ("mult_strict_null", {"mul": ["a", "b"], "nulls": False}, "a * b"),
    ("sub_null_prop", {"sub": ["a", "b"]}, "a - b"),
    ("div_zero_default", {"div": ["a", "b"], "default": -1}, "CASE WHEN b IS NULL OR b = 0 OR a IS NULL THEN -1 ELSE a / b END"),
    ("floor_bucket", {"floor": ["a", {"literal": 5}]}, "floor(a / 5) * 5"),
    ("rowwise_max", {"max": ["a", "b"]}, "CASE WHEN a IS NULL THEN b WHEN b IS NULL THEN a WHEN a >= b THEN a ELSE b END"),
    ("missing_string", {"missing": "s"}, "s IS NULL OR s = ''"),
    ("exists_string", {"exists": "s"}, "s IS NOT NULL AND s <> ''"),
    ("missing_number", {"missing": "b"}, "b IS NULL"),
    ("length_", {"length": "s"}, "length(s)"),
    ("left_clamped", {"left": ["s", 2]}, "CASE WHEN s IS NULL THEN NULL ELSE substr(s, 1, 2) END"),
    ("right_clamped", {"right": ["s", 2]}, "CASE WHEN s IS NULL THEN NULL WHEN length(s) < 2 THEN s ELSE substr(s, length(s) - 1, 2) END"),
    ("prefix_", {"prefix": {"s": "a"}}, "coalesce(starts_with(s, 'a'), FALSE)"),
    (
        "concat_skips_missing",
        {"concat": ["s", "u"], "separator": "-"},
        "NULLIF(concat_ws('-', CASE WHEN s = '' THEN NULL ELSE s END, CASE WHEN u = '' THEN NULL ELSE u END), '')",
    ),
    (
        "find_null_not_minus1",
        {"find": {"s": "b"}},
        "CASE WHEN strpos(s, 'b') > 0 THEN strpos(s, 'b') - 1 END",
    ),
    # coalesce: compared under JX equivalence ''≡NULL (see MISSING_CLASS) —
    # when every term is missing, the reference's backends return '' or
    # NULL interchangeably (both are the missing class for strings)
    (
        "coalesce_skips_empty",
        {"coalesce": ["s", "u"]},
        "CASE WHEN s IS NOT NULL AND s <> '' THEN s WHEN u IS NOT NULL AND u <> '' THEN u END",
    ),
    (
        "when_",
        {"when": {"gt": {"a": 0}}, "then": "a", "else": {"literal": -9}},
        "CASE WHEN coalesce(a > 0, FALSE) THEN a ELSE -9 END",
    ),
    ("number_cast", {"number": "s"}, "CASE WHEN s = '' THEN NULL ELSE try_cast(s AS DOUBLE) END"),
    ("in_list", {"in": {"a": [1, 2, 3]}}, "coalesce(a IN (1, 2, 3), FALSE)"),
    # Python-sign mod (reference compiles to Python %): sign of the divisor
    ("mod_python_sign", {"mod": ["a", {"literal": 3}]}, "((a % 3) + 3) % 3"),
    ("mod_neg_divisor", {"mod": ["a", {"literal": -3}]}, "((a % -3) + -3) % -3"),
    ("mod_zero_default", {"mod": ["a", {"literal": 0}], "default": -99}, "-99"),
    ("floor_negative", {"floor": ["b", {"literal": 2}]}, "floor(b / 2) * 2"),
    ("exp_power", {"exp": ["b", {"literal": 2}]}, "CASE WHEN b IS NULL THEN NULL ELSE b ** 2 END"),
    ("eq_map_form", {"eq": {"a": 1, "b": 2.0}}, "a IS NOT DISTINCT FROM 1 AND b IS NOT DISTINCT FROM 2.0"),
    ("eq_in_form", {"eq": {"a": [1, 2]}}, "coalesce(a IN (1, 2), FALSE)"),
    ("range_sugar", {"range": {"a": {"gte": -1, "lt": 3}}}, "a >= -1 AND a < 3"),
    (
        "between_literal",
        {"between": {"s": ["a", "c"]}},
        # substring strictly between first 'a' and next 'c' after it; missing -> NULL
        r"(regexp_extract(s, 'a(.*?)c', ['g1'])).g1",
    ),
    ("find_with_start", {"find": {"s": "a"}, "start": 1}, "CASE WHEN strpos(substr(s, 2), 'a') > 0 THEN strpos(substr(s, 2), 'a') END"),
    ("find_default", {"find": {"s": "zz"}, "default": -1}, "CASE WHEN strpos(s, 'zz') > 0 THEN strpos(s, 'zz') - 1 ELSE -1 END"),
    ("regex_full_match", {"regex": {"s": "a.*"}}, "coalesce(regexp_full_match(s, 'a.*'), FALSE)"),
    (
        "case_first_match",
        {"case": [{"when": {"gt": {"a": 2}}, "then": {"literal": "hi"}}, {"when": {"gt": {"a": 0}}, "then": {"literal": "lo"}}, {"literal": "else"}]},
        "CASE WHEN coalesce(a > 2, FALSE) THEN 'hi' WHEN coalesce(a > 0, FALSE) THEN 'lo' ELSE 'else' END",
    ),
    ("not_left", {"not_left": ["s", 1]}, "CASE WHEN s IS NULL THEN NULL ELSE substr(s, 2) END"),
    ("not_right", {"not_right": ["s", 1]}, "CASE WHEN s IS NULL THEN NULL ELSE substr(s, 1, greatest(length(s) - 1, 0)) END"),
    ("basic_index_of", {"basic.index_of": ["s", {"literal": "b"}]}, "strpos(s, 'b') - 1"),
    ("basic_eq", {"basic.eq": ["s", "u"]}, "s = u"),
    ("basic_substring", {"basic.substring": ["s", {"literal": 0}, {"literal": 2}]}, "substr(s, 1, 2)"),
    ("string_cast", {"string": "a"}, "CAST(a AS VARCHAR)"),
    ("boolean_cast_str", {"boolean": "s"}, "CASE WHEN s IS NULL OR s = '' THEN NULL ELSE lower(s) IN ('true', 't', '1') END"),
    ("rowwise_min", {"min": ["a", "b"]}, "CASE WHEN a IS NULL THEN b WHEN b IS NULL THEN a WHEN a <= b THEN a ELSE b END"),
    ("rowwise_count", {"count": ["a", "b", "s"]}, "(CASE WHEN a IS NULL THEN 0 ELSE 1 END) + (CASE WHEN b IS NULL THEN 0 ELSE 1 END) + (CASE WHEN s IS NULL OR s = '' THEN 0 ELSE 1 END)"),
    ("suffix_", {"suffix": {"s": "b"}}, "coalesce(ends_with(s, 'b'), FALSE)"),
]

# string-valued pairs compared under JX equivalence '' ≡ NULL: for any
# string-producing op the reference's backends return '' or NULL
# interchangeably on missing input (both are JX's missing class)
MISSING_CLASS = {
    "coalesce_skips_empty",
    "left_clamped",
    "right_clamped",
    "concat_skips_missing",
    "between_literal",
    "not_left",
    "not_right",
    "string_cast",
    "basic_substring",
}

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("u", T.StringType(), True),
    ]
)

small_int = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
small_float = st.one_of(st.none(), st.sampled_from([0.0, -1.5, 2.0, 5.0, 10.0]))
tricky_str = st.one_of(st.none(), st.sampled_from(["", "a", "ab", "abc", "ba", "-", "7", "éx"]))
row = st.tuples(small_int, small_float, tricky_str, tricky_str)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return float(v)
    return v


@given(st.lists(row, min_size=1, max_size=25))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_expression_pairs_match_duckdb(spark, rows):
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(rows, SCHEMA)
    schema = Schema.from_spark(df.schema)
    cols = [compile_expression(jx, schema).col.alias(name) for name, jx, _ in PAIRS]
    got = [tuple(_norm(v) for v in r) for r in df.select(*cols).collect()]

    pdf = pd.DataFrame(rows, columns=["a", "b", "s", "u"]).astype(
        {"a": "Int64", "b": "float64", "s": "object", "u": "object"}
    )
    con = duckdb.connect()
    con.register("t", pdf)
    sql = "SELECT " + ", ".join(f"({sql}) AS {name}" for name, _, sql in PAIRS) + " FROM t"
    want = [
        tuple(_norm(v) for v in r)
        for r in con.execute(sql).fetchall()
    ]

    assert len(got) == len(want)
    for g, w in zip(got, want):
        for (name, _, _), gv, wv in zip(PAIRS, g, w):
            if name in MISSING_CLASS:
                gv = None if gv == "" else gv
                wv = None if wv == "" else wv
            assert gv == wv, f"{name}: spark={gv!r} duckdb={wv!r} rows={rows}"


agg_row = st.tuples(
    st.one_of(st.none(), st.sampled_from(["x", "y", "z", ""])),  # group key
    st.one_of(st.none(), st.integers(min_value=-3, max_value=9)),  # value
)


@given(st.lists(agg_row, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_groupby_aggregates_match_duckdb(spark, rows):
    """JX groupby on adversarial data: null groups kept, null-ignoring
    aggregates, exists/count semantics."""
    import duckdb
    import pandas as pd

    from mysql_to_s3_spark.operators.executor import run

    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.LongType())])
    )
    out = run(
        {
            "from": "t",
            "groupby": ["k"],
            "select": [
                {"name": "n", "value": "v", "aggregate": "count"},
                {"name": "s", "value": "v", "aggregate": "sum"},
                {"name": "mn", "value": "v", "aggregate": "minimum"},
                {"name": "mx", "value": "v", "aggregate": "maximum"},
                {"name": "av", "value": "v", "aggregate": "average"},
                {"name": "ex", "value": "v", "aggregate": "exists"},
            ],
        },
        spark=spark,
        containers={"t": df},
    )
    got = sorted(
        (tuple(_norm(r[c]) for c in ["k", "n", "s", "mn", "mx", "av", "ex"]) for r in out.collect())
    , key=str)

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "v"]).astype({"v": "Int64"}))
    want = sorted(
        (
            tuple(_norm(v) for v in r)
            for r in con.execute(
                """SELECT k, count(v) AS n, sum(v) AS s, min(v) AS mn, max(v) AS mx,
                          avg(v) AS av, count(v) > 0 AS ex
                   FROM t GROUP BY k"""
            ).fetchall()
        )
    , key=str)
    assert got == want, (got, want)


@given(st.lists(agg_row, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_edges_dense_set_domain_matches_duckdb(spark, rows):
    """Dense set-domain edges: declared parts always present (count 0 when
    empty), out-of-domain and NULL rows in the null bucket, sums NULL for
    empty cells while counts are 0."""
    import duckdb
    import pandas as pd

    from mysql_to_s3_spark.operators.executor import run

    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.LongType())])
    )
    out = run(
        {
            "from": "t",
            "edges": [
                {
                    "name": "k",
                    "value": "k",
                    "allowNulls": True,
                    "domain": {"type": "set", "partitions": ["x", "y"]},
                }
            ],
            "select": [
                {"name": "n", "value": "v", "aggregate": "count"},
                {"name": "s", "value": "v", "aggregate": "sum"},
            ],
        },
        spark=spark,
        containers={"t": df},
    )
    got = sorted((tuple(_norm(r[c]) for c in ["k", "n", "s"]) for r in out.collect()), key=str)

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "v"]).astype({"v": "Int64"}))
    want = sorted(
        (
            tuple(_norm(v) for v in r)
            for r in con.execute(
                """WITH agg AS (
                     SELECT CASE WHEN k IN ('x','y') THEN k END AS k,
                            count(v) AS n, sum(v) AS s
                     FROM t GROUP BY 1),
                   parts(k) AS (VALUES ('x'), ('y'), (NULL))
                   SELECT parts.k, coalesce(agg.n, 0) AS n, agg.s AS s
                   FROM parts LEFT JOIN agg ON parts.k IS NOT DISTINCT FROM agg.k"""
            ).fetchall()
        ),
        key=str,
    )
    assert got == want, (got, want)
