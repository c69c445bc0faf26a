"""JX expression compiler unit tests: null semantics, string ops, arithmetic.

Semantics under test come from the reference's expression algebra
(vendor/jx_base/expressions.py; see SURVEY.md §2.6).
"""

import pytest
from pyspark.sql import functions as F

from mysql_to_s3_spark.functions.compiler import Schema, compile_expression


def one_row(spark, **cols):
    return spark.createDataFrame([tuple(cols.values())], list(cols.keys()))


def eval_expr(spark, expr, **cols):
    if cols:
        df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    else:
        df = spark.range(1)
    schema = Schema.from_spark(df.schema)
    c = compile_expression(expr, schema)
    return df.select(c.col.alias("out")).collect()[0]["out"]


# -- null-safe eq (EqOp @953) --


def test_eq_null_safe_true_on_two_nulls(spark):
    df = spark.createDataFrame([(None, None)], "a string, b string")
    c = compile_expression({"eq": ["a", "b"]}, Schema.from_spark(df.schema))
    assert df.select(c.col.alias("o")).collect()[0]["o"] is True


def test_eq_simple_form(spark):
    assert eval_expr(spark, {"eq": {"a": 3}}, a=3) is True
    assert eval_expr(spark, {"eq": {"a": 4}}, a=3) is False


def test_eq_empty_string_matches_null_in_filter_context(spark):
    """JX ""==missing: eq-"" must keep NULL rows, so the raw pushdown
    predicate (which drops them) must not be emitted in filter context."""
    from mysql_to_s3_spark.operators.executor import run

    df = spark.createDataFrame([("x", 1), ("", 2), (None, 3)], "s string, i int")
    out = run({"from": "t", "where": {"eq": {"s": ""}}, "select": ["i"]},
              spark=spark, containers={"t": df})
    assert sorted(r["i"] for r in out.collect()) == [2, 3]


def test_eq_rhs_list_is_in(spark):
    assert eval_expr(spark, {"eq": {"a": [1, 3, 5]}}, a=3) is True
    assert eval_expr(spark, {"eq": {"a": [1, 5]}}, a=3) is False


def test_ne_requires_both_exist(spark):
    df = spark.createDataFrame([(None, "x")], "a string, b string")
    c = compile_expression({"ne": ["a", "b"]}, Schema.from_spark(df.schema))
    assert df.select(c.col.alias("o")).collect()[0]["o"] is False


# -- and/or null coercion (AndOp @1123 / OrOp @1200) --


def test_and_missing_terms_are_false(spark):
    # reference AndOp compiles to Python `and` where None is falsy
    # (jx_python/expressions.py:208-213)
    df = spark.createDataFrame([(None, True)], "a boolean, b boolean")
    c = compile_expression({"and": ["a", "b"]}, Schema.from_spark(df.schema))
    assert df.select(c.col.alias("o")).collect()[0]["o"] is False


def test_and_filter_matches_bare_predicate(spark):
    # {"and":[{"gt":{"x":5}}]} must drop x IS NULL rows, same as bare gt
    df = spark.createDataFrame([(None,), (9,), (3,)], "x int")
    s = Schema.from_spark(df.schema)
    bare = compile_expression({"gt": {"x": 5}}, s)
    anded = compile_expression({"and": [{"gt": {"x": 5}}]}, s)
    import pyspark.sql.functions as _F

    keep = lambda c: df.filter(_F.coalesce(c.col.cast("boolean"), _F.lit(False))).count()
    assert keep(bare) == keep(anded) == 1


def test_or_missing_terms_are_false(spark):
    df = spark.createDataFrame([(None, False)], "a boolean, b boolean")
    c = compile_expression({"or": ["a", "b"]}, Schema.from_spark(df.schema))
    assert df.select(c.col.alias("o")).collect()[0]["o"] is False


# -- missing includes empty string (MissingOp @1877) --


def test_missing_empty_string(spark):
    assert eval_expr(spark, {"missing": "a"}, a="") is True
    assert eval_expr(spark, {"missing": "a"}, a="x") is False


def test_exists_inverse(spark):
    assert eval_expr(spark, {"exists": "a"}, a="") is False


# -- arithmetic (BinaryOp @794, DivOp @897, MultiOp @1717) --


def test_div_by_zero_default(spark):
    assert eval_expr(spark, {"div": ["a", "b"], "default": -1}, a=10, b=0) == -1
    assert eval_expr(spark, {"div": ["a", "b"]}, a=10, b=0) is None
    assert eval_expr(spark, {"div": ["a", "b"]}, a=10, b=4) == 2.5


def test_sub_null_propagates_unless_default(spark):
    df = spark.createDataFrame([(None, 3)], "a int, b int")
    s = Schema.from_spark(df.schema)
    assert df.select(compile_expression({"sub": ["a", "b"]}, s).col.alias("o")).collect()[0]["o"] is None
    assert (
        df.select(compile_expression({"sub": ["a", "b"], "default": 99}, s).col.alias("o")).collect()[0]["o"] == 99
    )


def test_nary_add_ignores_nulls(spark):
    df = spark.createDataFrame([(None, 3, 4)], "a int, b int, c int")
    s = Schema.from_spark(df.schema)
    assert df.select(compile_expression({"add": ["a", "b", "c"]}, s).col.alias("o")).collect()[0]["o"] == 7


def test_nary_add_strict_nulls(spark):
    df = spark.createDataFrame([(None, 3, 4)], "a int, b int, c int")
    s = Schema.from_spark(df.schema)
    out = df.select(compile_expression({"add": ["a", "b", "c"], "nulls": False}, s).col.alias("o")).collect()[0]["o"]
    assert out is None


def test_floor_two_arg_bucketing(spark):
    assert eval_expr(spark, {"floor": ["a", 7]}, a=23) == 21.0


def test_mod_and_exp(spark):
    assert eval_expr(spark, {"mod": ["a", 7]}, a=23) == 2
    assert eval_expr(spark, {"exp": ["a", 3]}, a=2) == 8.0


def test_rowwise_count_max_min(spark):
    df = spark.createDataFrame([(None, 3, 4)], "a int, b int, c int")
    s = Schema.from_spark(df.schema)
    assert df.select(compile_expression({"count": ["a", "b", "c"]}, s).col.alias("o")).collect()[0]["o"] == 2
    assert df.select(compile_expression({"max": ["a", "b", "c"]}, s).col.alias("o")).collect()[0]["o"] == 4
    assert df.select(compile_expression({"min": ["a", "b", "c"]}, s).col.alias("o")).collect()[0]["o"] == 3


# -- strings --


def test_concat_skips_missing(spark):
    df = spark.createDataFrame([("x", "", None, "y")], "a string, b string, c string, d string")
    s = Schema.from_spark(df.schema)
    expr = {"concat": ["a", "b", "c", "d"], "separator": "-"}
    assert df.select(compile_expression(expr, s).col.alias("o")).collect()[0]["o"] == "x-y"


def test_left_right_clamped(spark):
    assert eval_expr(spark, {"left": {"a": 3}}, a="hello") == "hel"
    assert eval_expr(spark, {"left": {"a": 99}}, a="hello") == "hello"
    assert eval_expr(spark, {"right": {"a": 3}}, a="hello") == "llo"
    assert eval_expr(spark, {"not_left": {"a": 3}}, a="hello") == "lo"
    assert eval_expr(spark, {"not_right": {"a": 3}}, a="hello") == "he"


def test_find_null_when_absent(spark):
    assert eval_expr(spark, {"find": {"a": "ll"}}, a="hello") == 2
    assert eval_expr(spark, {"find": {"a": "zz"}}, a="hello") is None
    assert eval_expr(spark, {"find": {"a": "zz"}, "default": -1}, a="hello") == -1
    assert eval_expr(spark, {"find": {"a": "l"}, "start": 3}, a="hello") == 3


def test_between(spark):
    expr = {"between": "a", "prefix": "<b>", "suffix": "</b>"}
    assert eval_expr(spark, expr, a="say <b>hi</b> now") == "hi"
    assert eval_expr(spark, expr, a="no tags") is None


def test_regex_full_match(spark):
    assert eval_expr(spark, {"regex": {"a": "h.*o"}}, a="hello") is True
    assert eval_expr(spark, {"regex": {"a": "ell"}}, a="hello") is False  # full match


def test_prefix_suffix(spark):
    assert eval_expr(spark, {"prefix": {"a": "he"}}, a="hello") is True
    assert eval_expr(spark, {"suffix": {"a": "lo"}}, a="hello") is True


def test_length_and_casts(spark):
    assert eval_expr(spark, {"length": "a"}, a="hello") == 5
    assert eval_expr(spark, {"number": "a"}, a="3.5") == 3.5
    assert eval_expr(spark, {"number": "a"}, a="") is None
    assert eval_expr(spark, {"string": "a"}, a=42) == "42"


# -- conditionals --


def test_when_case_coalesce(spark):
    expr = {"when": {"gt": {"a": 5}}, "then": {"literal": "big"}, "else": {"literal": "small"}}
    assert eval_expr(spark, expr, a=9) == "big"
    case = {
        "case": [
            {"when": {"lt": {"a": 0}}, "then": {"literal": "neg"}},
            {"when": {"eq": {"a": 0}}, "then": {"literal": "zero"}},
            {"literal": "pos"},
        ]
    }
    assert eval_expr(spark, case, a=0) == "zero"
    assert eval_expr(spark, case, a=7) == "pos"
    df = spark.createDataFrame([("", None, "x")], "a string, b string, c string")
    s = Schema.from_spark(df.schema)
    # JX coalesce skips "" too
    assert df.select(compile_expression({"coalesce": ["a", "b", "c"]}, s).col.alias("o")).collect()[0]["o"] == "x"


def test_in_and_range(spark):
    assert eval_expr(spark, {"in": {"a": [1, 2, 3]}}, a=2) is True
    assert eval_expr(spark, {"range": {"a": {"gte": 2, "lt": 5}}}, a=4) is True
    assert eval_expr(spark, {"range": {"a": {"gte": 2, "lt": 5}}}, a=5) is False


def test_date_literal_and_unix(spark):
    out = eval_expr(spark, {"date": "2015-01-01"})
    assert out == 1420070400.0
    out2 = eval_expr(spark, {"date": "1jan2015"})
    assert out2 == 1420070400.0


def test_first_last_on_array(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "a array<int>")
    s = Schema.from_spark(df.schema)
    assert df.select(compile_expression({"first": "a"}, s).col.alias("o")).collect()[0]["o"] == 1
    assert df.select(compile_expression({"last": "a"}, s).col.alias("o")).collect()[0]["o"] == 3


# -- get: dynamic member access (GetOp @347) --


def test_get_on_struct(spark):
    df = spark.createDataFrame([((1, "x"),)], "o struct<a:int,b:string>")
    s = Schema.from_spark(df.schema)
    c = compile_expression({"get": ["o", {"literal": "b"}]}, s)
    assert df.select(c.col.alias("out")).collect()[0]["out"] == "x"


def test_get_on_array_zero_based(spark):
    df = spark.createDataFrame([([10, 20, 30],)], "a array<int>")
    s = Schema.from_spark(df.schema)
    c = compile_expression({"get": ["a", 1]}, s)
    assert df.select(c.col.alias("out")).collect()[0]["out"] == 20


# -- split: separator is a literal, regex-escaped (SplitOp @2368) --


def test_split_list_form_literal_separator(spark):
    assert eval_expr(spark, {"split": ["a", "."]}, a="x.y.z") == ["x", "y", "z"]


def test_split_dict_form_literal_separator(spark):
    assert eval_expr(spark, {"split": {"a": "."}}, a="x.y.z") == ["x", "y", "z"]


# -- offset: positional column (OffsetOp @284) --


def test_offset_positional_column(spark):
    df = spark.createDataFrame([(7, "hi")], "n int, s string")
    s = Schema.from_spark(df.schema)
    assert df.select(compile_expression({"offset": 1}, s).col.alias("o")).collect()[0]["o"] == "hi"
