"""Query catalog: every implemented SURVEY.md §2 operator as a named
(JX query, DuckDB oracle SQL) pair over the driver testdata tables.

This is the single source for the driver contract (``__spark_entry__.py``)
and the benchmark (``bench.py``). Each entry is either

  - a JX query dict (run through ``mysql_to_s3_spark.run``), or
  - a callable ``(spark, sf_dir) -> DataFrame`` for shapes that need setup
    (e.g. nested-table containers built from two parquet tables).

Column aliases match between the Spark result and the oracle SQL — the
driver's comparator sorts columns by name before hashing values.

Determinism note: any query that can return a strict subset of rows
(``limit`` below the full result) sorts on a UNIQUE key first, so Spark and
DuckDB pick the same rows.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


def _jx(query: dict) -> Callable[[SparkSession, str], DataFrame]:
    from mysql_to_s3_spark.operators.executor import run

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run(query, spark=spark, sf_dir=sf_dir)

    return build


def _nested_items_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders + collect_list(struct(lineitem)) children — the §2.3
    one-to-many join shape, used as a nested-table container."""
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    items = load_table(spark, sf_dir, "lineitem")
    children = items.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))).alias("items")
    )
    return orders.join(children, orders.o_orderkey == children.l_orderkey, "left").drop("l_orderkey")


def _nested_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.executor import run

    fact = _nested_items_container(spark, sf_dir)
    q = {
        "from": "fact.items",
        "select": [{"name": "total", "value": "l_quantity", "aggregate": "sum"}],
        "where": {"gt": {"o_totalprice": 100000}},
    }
    return run(q, spark=spark, containers={"fact": fact})


# ---------------------------------------------------------------------------
# catalog: name -> (builder, oracle_sql | None)

CATALOG: dict[str, tuple[Any, str | None]] = {}


def _q(name: str, jx_or_fn, oracle: str | None) -> None:
    CATALOG[name] = (jx_or_fn if callable(jx_or_fn) else _jx(jx_or_fn), oracle)


# -- set-ops (filter / select / sort / limit; jx.py:92-99) --

# NOTE on limits: (l_orderkey, l_linenumber) is NOT unique in the synthetic
# lineitem, so a limit below the result size would be a nondeterministic row
# pick. Queries bound their result with a key-range filter and set the limit
# ABOVE the full filtered count instead.
_q(
    "setop_filter_sort_limit",
    {
        "from": "lineitem",
        "where": {"and": [{"gt": {"l_quantity": 40}}, {"lt": {"l_orderkey": 1000}}]},
        "select": ["l_orderkey", "l_linenumber", "l_quantity"],
        "sort": ["l_orderkey", "l_linenumber"],
        "limit": 10000,
    },
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_quantity > 40 AND l_orderkey < 1000
       ORDER BY l_orderkey, l_linenumber LIMIT 10000""",
)

_q(
    "setop_computed_revenue",
    {
        "from": "lineitem",
        "select": [
            {"name": "okey", "value": "l_orderkey"},
            {"name": "lnum", "value": "l_linenumber"},
            {"name": "revenue", "value": {"mul": ["l_extendedprice", {"sub": [1, "l_discount"]}]}},
        ],
        "where": {"and": [{"eq": {"l_returnflag": "R"}}, {"lt": {"l_orderkey": 1500}}]},
        "sort": ["l_orderkey", "l_linenumber"],
        "limit": 10000,
    },
    """SELECT l_orderkey AS okey, l_linenumber AS lnum,
              l_extendedprice * (1 - l_discount) AS revenue
       FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey < 1500
       ORDER BY l_orderkey, l_linenumber LIMIT 10000""",
)

_q(
    "setop_string_ops",
    {
        "from": "customer",
        "select": [
            {"name": "ck", "value": "c_custkey"},
            {"name": "prefix8", "value": {"left": ["c_name", 8]}},
            {"name": "tail3", "value": {"right": ["c_name", 3]}},
            {"name": "no_head", "value": {"not_left": ["c_name", 9]}},
            {"name": "pos5", "value": {"find": {"c_name": "5"}}},
            {"name": "tagged", "value": {"concat": [{"literal": "c:"}, "c_mktsegment"], "separator": "-"}},
            {"name": "is_cust", "value": {"prefix": {"c_name": "Customer"}}},
            {"name": "nlen", "value": {"length": "c_name"}},
        ],
        "sort": ["c_custkey"],
        "limit": 300,
    },
    """SELECT c_custkey AS ck,
              substr(c_name, 1, 8) AS prefix8,
              substr(c_name, length(c_name) - 2, 3) AS tail3,
              substr(c_name, 10) AS no_head,
              CASE WHEN strpos(c_name, '5') > 0 THEN strpos(c_name, '5') - 1 END AS pos5,
              'c:' || '-' || c_mktsegment AS tagged,
              starts_with(c_name, 'Customer') AS is_cust,
              length(c_name) AS nlen
       FROM customer ORDER BY c_custkey LIMIT 300""",
)

_q(
    "setop_conditionals",
    {
        "from": "orders",
        "select": [
            {"name": "ok", "value": "o_orderkey"},
            {
                "name": "size",
                "value": {"when": {"gt": {"o_totalprice": 100000}}, "then": {"literal": "big"}, "else": {"literal": "small"}},
            },
            {
                "name": "status_word",
                "value": {
                    "case": [
                        {"when": {"eq": {"o_orderstatus": "F"}}, "then": {"literal": "final"}},
                        {"when": {"eq": {"o_orderstatus": "O"}}, "then": {"literal": "open"}},
                        {"literal": "other"},
                    ]
                },
            },
        ],
        "sort": ["o_orderkey"],
        "limit": 500,
    },
    """SELECT o_orderkey AS ok,
              CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size,
              CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word
       FROM orders ORDER BY o_orderkey LIMIT 500""",
)

_q(
    "setop_in_range",
    {
        "from": "lineitem",
        "where": {
            "and": [
                {"in": {"l_returnflag": ["A", "N"]}},
                {"range": {"l_quantity": {"gte": 10, "lt": 20}}},
                {"lt": {"l_orderkey": 2000}},
            ]
        },
        "select": ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
        "sort": ["l_orderkey", "l_linenumber"],
        "limit": 10000,
    },
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
       WHERE l_returnflag IN ('A', 'N') AND l_quantity >= 10 AND l_quantity < 20
         AND l_orderkey < 2000
       ORDER BY l_orderkey, l_linenumber LIMIT 10000""",
)

_q(
    "setop_arithmetic",
    {
        "from": "lineitem",
        "where": {"lt": {"l_orderkey": 500}},
        "select": [
            {"name": "ok", "value": "l_orderkey"},
            {"name": "ln", "value": "l_linenumber"},
            {"name": "s", "value": {"add": ["l_quantity", "l_discount", "l_tax"]}},
            {"name": "d", "value": {"sub": ["l_extendedprice", "l_quantity"]}},
            {"name": "ratio", "value": {"div": ["l_extendedprice", "l_quantity"]}},
            {"name": "safe_div", "value": {"div": ["l_quantity", "l_discount"], "default": -1}},
            {"name": "m", "value": {"mod": ["l_linenumber", 3]}},
            {"name": "p", "value": {"exp": ["l_discount", 2]}},
            {"name": "bucket", "value": {"floor": ["l_quantity", 7]}},
        ],
        "sort": ["l_orderkey", "l_linenumber"],
        "limit": 10000,
    },
    """SELECT l_orderkey AS ok, l_linenumber AS ln,
              l_quantity + l_discount + l_tax AS s,
              l_extendedprice - l_quantity AS d,
              l_extendedprice / l_quantity AS ratio,
              CASE WHEN l_discount = 0 THEN -1 ELSE l_quantity / l_discount END AS safe_div,
              l_linenumber % 3 AS m,
              pow(l_discount, 2) AS p,
              floor(l_quantity / 7) * 7 AS bucket
       FROM lineitem WHERE l_orderkey < 500
       ORDER BY l_orderkey, l_linenumber LIMIT 10000""",
)

_q(
    "setop_dates_unix",
    {
        "from": "orders",
        "select": [
            {"name": "ok", "value": "o_orderkey"},
            {"name": "unix_ts", "value": {"unix": "o_orderdate"}},
            {"name": "after_1995", "value": {"gte": [{"unix": "o_orderdate"}, {"date": "1995-01-01"}]}},
        ],
        "sort": ["o_orderkey"],
        "limit": 500,
    },
    """SELECT o_orderkey AS ok,
              epoch(o_orderdate) AS unix_ts,
              o_orderdate >= TIMESTAMP '1995-01-01' AS after_1995
       FROM orders ORDER BY o_orderkey LIMIT 500""",
)

_q(
    "setop_between_extract",
    {
        "from": "events",
        "select": [
            {"name": "eid", "value": "event_id"},
            {"name": "k_val", "value": {"between": "props", "prefix": '{"k": ', "suffix": "}"}},
        ],
        "sort": ["event_id"],
        "limit": 500,
    },
    """SELECT event_id AS eid,
              CASE WHEN regexp_matches(props, '\\{"k": (.*?)\\}')
                   THEN regexp_extract(props, '\\{"k": (.*?)\\}', 1) END AS k_val
       FROM events ORDER BY event_id LIMIT 500""",
)

# -- scalar aggregation (§2.4) --

_q(
    "agg_scalar_stats",
    {
        "from": "lineitem",
        "select": [
            {"name": "n", "value": "l_quantity", "aggregate": "count"},
            {"name": "total", "value": "l_quantity", "aggregate": "sum"},
            {"name": "lo", "value": "l_quantity", "aggregate": "min"},
            {"name": "hi", "value": "l_quantity", "aggregate": "max"},
            {"name": "mean", "value": "l_quantity", "aggregate": "avg"},
            {"name": "sd", "value": "l_quantity", "aggregate": "std"},
            {"name": "med", "value": "l_quantity", "aggregate": "median"},
        ],
    },
    """SELECT count(l_quantity) AS n, sum(l_quantity) AS total,
              min(l_quantity) AS lo, max(l_quantity) AS hi,
              avg(l_quantity) AS mean, stddev_pop(l_quantity) AS sd,
              median(l_quantity) AS med
       FROM lineitem""",
)

_q(
    "agg_scalar_moments",
    {
        "from": "lineitem",
        "select": [
            {"name": "vr", "value": "l_discount", "aggregate": "variance"},
            {"name": "p90", "value": "l_extendedprice", "aggregate": "percentile", "percentile": 0.9},
            {"name": "card", "value": "l_returnflag", "aggregate": "cardinality"},
            {"name": "m0", "value": "l_discount", "aggregate": "s0"},
            {"name": "m1", "value": "l_discount", "aggregate": "s1"},
            {"name": "m2", "value": "l_discount", "aggregate": "s2"},
            {"name": "any_qty", "value": "l_quantity", "aggregate": "exists"},
        ],
    },
    """SELECT var_pop(l_discount) AS vr,
              quantile_cont(l_extendedprice, 0.9) AS p90,
              count(DISTINCT l_returnflag) AS card,
              CAST(count(l_discount) AS DOUBLE) AS m0,
              sum(l_discount) AS m1,
              sum(l_discount * l_discount) AS m2,
              count(l_quantity) > 0 AS any_qty
       FROM lineitem""",
)

_q(
    "agg_union_set",
    {
        "from": "lineitem",
        "select": [{"name": "flags", "value": "l_returnflag", "aggregate": "union"}],
    },
    """SELECT list_sort(list(DISTINCT l_returnflag)) AS flags FROM lineitem""",
)

# -- groupby (§2.1) --

_q(
    "groupby_tpch_q1",
    {
        "from": "lineitem",
        "groupby": ["l_returnflag", "l_linestatus"],
        "select": [
            {"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"},
            {"name": "sum_base_price", "value": "l_extendedprice", "aggregate": "sum"},
            {
                "name": "sum_disc_price",
                "value": {"mul": ["l_extendedprice", {"sub": [1, "l_discount"]}]},
                "aggregate": "sum",
            },
            {"name": "avg_disc", "value": "l_discount", "aggregate": "avg"},
            {"name": "count_order", "value": ".", "aggregate": "count"},
        ],
        "where": {"lte": [{"unix": "l_shipdate"}, {"date": "1998-09-02"}]},
    },
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
              sum(l_extendedprice) AS sum_base_price,
              sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
              avg(l_discount) AS avg_disc, count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)

_q(
    "groupby_expr_bucket",
    {
        "from": "orders",
        "groupby": [{"name": "bucket", "value": {"floor": ["o_totalprice", 50000]}}],
        "select": [{"name": "n", "value": ".", "aggregate": "count"}],
    },
    """SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket, count(*) AS n
       FROM orders GROUP BY 1""",
)

_q(
    "groupby_two_keys",
    {
        "from": "orders",
        "groupby": ["o_orderstatus", "o_orderpriority"],
        "select": [
            {"name": "n", "value": ".", "aggregate": "count"},
            {"name": "avg_price", "value": "o_totalprice", "aggregate": "avg"},
            {"name": "max_price", "value": "o_totalprice", "aggregate": "max"},
        ],
    },
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
              avg(o_totalprice) AS avg_price, max(o_totalprice) AS max_price
       FROM orders GROUP BY 1, 2""",
)

# -- edges + domains (§2.1, §2.7): DENSE output --

_q(
    "edges_set_domain_dense",
    {
        "from": "customer",
        "edges": [
            {
                "name": "seg",
                "value": "c_mktsegment",
                "allowNulls": False,
                "domain": {
                    "type": "set",
                    "partitions": ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD", "NOSUCH"],
                },
            }
        ],
        "select": [{"name": "n", "value": ".", "aggregate": "count"}],
    },
    """WITH parts(seg) AS (VALUES ('AUTOMOBILE'), ('BUILDING'), ('FURNITURE'),
                                 ('MACHINERY'), ('HOUSEHOLD'), ('NOSUCH')),
            agg AS (SELECT c_mktsegment AS seg, count(*) AS n FROM customer GROUP BY 1)
       SELECT parts.seg AS seg, CAST(coalesce(agg.n, 0) AS BIGINT) AS n
       FROM parts LEFT JOIN agg USING (seg)""",
)

_q(
    "edges_set_null_bucket",
    {
        "from": "customer",
        "edges": [
            {
                "name": "seg",
                "value": "c_mktsegment",
                "allowNulls": True,
                "domain": {"type": "set", "partitions": ["AUTOMOBILE", "BUILDING"]},
            }
        ],
        "select": [{"name": "n", "value": ".", "aggregate": "count"}],
    },
    # null bucket collects rows OUTSIDE the declared parts (allowNulls=True)
    """WITH agg AS (SELECT CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
                                THEN c_mktsegment END AS seg,
                           count(*) AS n
                    FROM customer GROUP BY 1),
            parts(seg) AS (VALUES ('AUTOMOBILE'), ('BUILDING'), (NULL))
       SELECT parts.seg AS seg, CAST(coalesce(agg.n, 0) AS BIGINT) AS n
       FROM parts LEFT JOIN agg ON parts.seg IS NOT DISTINCT FROM agg.seg""",
)

_q(
    "edges_default_domain",
    {
        "from": "lineitem",
        "edges": [{"name": "flag", "value": "l_returnflag", "allowNulls": False}],
        "select": [{"name": "total", "value": "l_quantity", "aggregate": "sum"}],
        "limit": 1000,
    },
    """SELECT l_returnflag AS flag, sum(l_quantity) AS total
       FROM lineitem GROUP BY 1""",
)

_q(
    "edges_time_month_dense",
    {
        "from": "orders",
        "edges": [
            {
                "name": "month",
                "value": "o_orderdate",
                "allowNulls": False,
                "domain": {"type": "time", "min": "1995-01-01", "max": "1996-01-01", "interval": "month"},
            }
        ],
        "select": [{"name": "n", "value": ".", "aggregate": "count"}],
    },
    """WITH months AS (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                                     TIMESTAMP '1995-12-01',
                                                     INTERVAL 1 MONTH)) AS month),
            agg AS (SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n
                    FROM orders
                    WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
                    GROUP BY 1)
       SELECT months.month AS month, CAST(coalesce(agg.n, 0) AS BIGINT) AS n
       FROM months LEFT JOIN agg USING (month)""",
)

_q(
    "edges_range_histogram",
    {
        "from": "lineitem",
        "edges": [
            {
                "name": "qty_bucket",
                "value": "l_quantity",
                "allowNulls": False,
                "domain": {"type": "range", "min": 0, "max": 50, "interval": 10},
            }
        ],
        "select": [{"name": "n", "value": ".", "aggregate": "count"}],
    },
    """WITH buckets AS (SELECT unnest([0.0, 10.0, 20.0, 30.0, 40.0]) AS qty_bucket),
            agg AS (SELECT floor(l_quantity / 10) * 10 AS qty_bucket, count(*) AS n
                    FROM lineitem WHERE l_quantity >= 0 AND l_quantity < 50 GROUP BY 1)
       SELECT buckets.qty_bucket AS qty_bucket, CAST(coalesce(agg.n, 0) AS BIGINT) AS n
       FROM buckets LEFT JOIN agg USING (qty_bucket)""",
)

_q(
    "edges_two_dims_dense",
    {
        "from": "lineitem",
        "edges": [
            {"name": "flag", "value": "l_returnflag", "allowNulls": False},
            {"name": "status", "value": "l_linestatus", "allowNulls": False},
        ],
        "select": [{"name": "total", "value": "l_quantity", "aggregate": "sum"}],
        "limit": 1000,
    },
    # dense cross product of the two discovered part sets; empty cells NULL
    """WITH f AS (SELECT DISTINCT l_returnflag AS flag FROM lineitem),
            s AS (SELECT DISTINCT l_linestatus AS status FROM lineitem),
            agg AS (SELECT l_returnflag AS flag, l_linestatus AS status,
                           sum(l_quantity) AS total
                    FROM lineitem GROUP BY 1, 2)
       SELECT f.flag AS flag, s.status AS status, agg.total AS total
       FROM f CROSS JOIN s LEFT JOIN agg USING (flag, status)""",
)

_q(
    "edges_multivalue_words",
    {
        "from": "documents",
        "edges": [{"name": "word", "value": {"split": ["text", " "]}, "allowNulls": False}],
        "select": [{"name": "n", "value": ".", "aggregate": "count"}],
        "limit": 1000,
    },
    # a row contributes to EVERY matching coordinate (multivalue explode)
    """SELECT w AS word, count(*) AS n
       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY 1""",
)

# -- window clauses (§2.5) --

_q(
    "window_rownum_partition",
    {
        "from": "lineitem",
        "where": {"lt": {"l_orderkey": 2000}},
        "window": [{"name": "seq", "edges": ["l_orderkey"], "sort": ["l_linenumber"]}],
        "select": ["l_orderkey", "l_linenumber", "seq"],
        "sort": ["l_orderkey", "l_linenumber"],
        "limit": 10000,
    },
    """SELECT l_orderkey, l_linenumber,
              row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS seq
       FROM lineitem WHERE l_orderkey < 2000
       ORDER BY l_orderkey, l_linenumber LIMIT 10000""",
)

_q(
    "window_running_sum",
    {
        "from": "lineitem",
        "where": {"lt": {"l_orderkey": 2000}},
        "window": [
            {
                "name": "running_qty",
                "value": "l_quantity",
                "aggregate": "sum",
                "edges": ["l_orderkey"],
                "sort": ["l_linenumber"],
                "range": {"min": None, "max": 1},
            }
        ],
        "select": ["l_orderkey", "l_linenumber", "running_qty"],
        "sort": ["l_orderkey", "l_linenumber"],
        "limit": 10000,
    },
    """SELECT l_orderkey, l_linenumber,
              sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
       FROM lineitem WHERE l_orderkey < 2000
       ORDER BY l_orderkey, l_linenumber LIMIT 10000""",
)

_q(
    "window_lead_lag",
    {
        "from": "events",
        "window": [
            {
                "name": "prev_value",
                "value": {"rows": ["value", -1]},
                "edges": ["user_id"],
                "sort": ["ts", "event_id"],
            }
        ],
        "select": ["event_id", "prev_value"],
        "sort": ["event_id"],
        "limit": 10000,
    },
    """SELECT event_id,
              lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
       FROM events ORDER BY event_id LIMIT 10000""",
)

# -- nested-table addressing (from: "fact.items"; §2.1 from + §2.3 joins) --

_q(
    "nested_table_from",
    _nested_from,
    """SELECT sum(l_quantity) AS total FROM lineitem
       WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000)""",
)


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (dedup / similarity / text / multimodal).
# Oracle SQL is GENERATED from the same module constants the Spark operators
# use, so both sides compute identical heuristics.


def _sql_words(col: str) -> str:
    return f"regexp_extract_all({col}, '\\w+')"


def _sql_stop_hits(col: str, vocab: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in vocab)
    return (
        f"coalesce(list_sum(list_transform({_sql_words(col)}, "
        f"w -> CASE WHEN list_contains([{lst}], lower(w)) THEN 1 ELSE 0 END)), 0)"
    )


def _text_stats_sql() -> str:
    from mysql_to_s3_spark.operators.text import LANG_PROFILES, TOKEN_RE

    stop = _sql_stop_hits("text", LANG_PROFILES["en"])
    return f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
           len({_sql_words('text')}) AS n_words,
           round(CASE WHEN len({_sql_words('text')}) > 0
                 THEN coalesce(list_sum(list_transform({_sql_words('text')}, w -> length(w))), 0)::DOUBLE
                      / len({_sql_words('text')}) ELSE 0.0 END, 6) AS avg_word_len,
           round(CASE WHEN length(text) > 0
                 THEN length(regexp_replace(text, '[\\w\\s]', '', 'g'))::DOUBLE / length(text)
                 ELSE 0.0 END, 6) AS punct_ratio,
           round(CASE WHEN len({_sql_words('text')}) > 0
                 THEN {stop}::DOUBLE / len({_sql_words('text')}) ELSE 0.0 END, 6) AS stopword_ratio
    FROM documents"""


def _langid_sql() -> str:
    from mysql_to_s3_spark.operators.text import LANG_PROFILES

    langs = list(LANG_PROFILES)
    scores = {
        lang: (
            f"len(list_intersect(list_distinct(list_transform({_sql_words('text')}, w -> lower(w))), "
            f"[{', '.join(repr(w) for w in prof)}]))"
        )
        for lang, prof in LANG_PROFILES.items()
    }
    cases = []
    for lang in langs:
        i = langs.index(lang)
        conds = [f"{scores[lang]} > 0"]
        conds += [f"{scores[lang]} > {scores[o]}" for o in langs[:i]]
        conds += [f"{scores[lang]} >= {scores[o]}" for o in langs[i + 1:]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
    SELECT doc_id, CASE {' '.join(cases)} ELSE 'und' END AS lang_guess
    FROM documents"""


_SQL_FP = "substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16)"

# exact char-5-shingle sets + all-pairs Jaccard (oracle side only — the
# Spark side uses the shared-shingle equi-join / LSH, never all-pairs)
_SQL_SHINGLES = (
    "list_distinct([substr(text, i, 5) FOR i IN range(1, greatest(length(text) - 3, 2))])"
)

_SQL_JACCARD_PAIRS = f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents)
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.9"""


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> ({a}[i]::DOUBLE) * ({b}[i]::DOUBLE)))"


def _sql_cosine(a: str, b: str) -> str:
    return f"({_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})))"


def _sql_plane_dot(vec: str, plane: list[float]) -> str:
    lst = ", ".join(repr(x) for x in plane)
    return f"list_sum(list_transform(range(1, {len(plane) + 1}), i -> ({vec}[i]::DOUBLE) * ([{lst}][i])))"


def _ann_sql() -> str:
    from mysql_to_s3_spark.operators.similarity import hyperplanes

    planes = hyperplanes()
    bucket = "(" + " || ".join(
        f"CASE WHEN {_sql_plane_dot('e.embedding', p)} > 0 THEN '1' ELSE '0' END" for p in planes
    ) + ")"
    q_bucket = "(" + " || ".join(
        f"CASE WHEN {_sql_plane_dot('q.qe', p)} > 0 THEN '1' ELSE '0' END" for p in planes
    ) + ")"
    return f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round({_sql_cosine('e.embedding', 'q.qe')}, 6) AS cos
    FROM embeddings e, q
    WHERE {bucket} = {q_bucket}
    ORDER BY cos DESC, e.vec_id LIMIT 10"""


def _text_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.operators.text import text_stats
    from mysql_to_s3_spark.sources.registry import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    st = text_stats(F.col("text"))
    return docs.select(F.col("doc_id"), *[c.alias(n) for n, c in st.items()])


def _text_langid_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.operators.text import language_id
    from mysql_to_s3_spark.sources.registry import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(F.col("doc_id"), language_id(F.col("text")).alias("lang_guess"))


def _text_fingerprint_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.operators.text import fingerprint
    from mysql_to_s3_spark.sources.registry import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(F.col("doc_id"), fingerprint(F.col("text")).alias("fp"))


def _dedup_exact_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.dedup import exact_dedup
    from mysql_to_s3_spark.sources.registry import load_table, spread

    return exact_dedup(spread(load_table(spark, sf_dir, "documents")))


def _dedup_ngram_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.dedup import ngram_jaccard_pairs
    from mysql_to_s3_spark.sources.registry import load_table

    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.9)


def _dedup_minhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.dedup import minhash_lsh_pairs
    from mysql_to_s3_spark.sources.registry import load_table

    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.9)


def _dedup_simhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.dedup import simhash_pairs
    from mysql_to_s3_spark.sources.registry import load_table

    return simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def _dedup_embedding_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.dedup import embedding_dup_pairs
    from mysql_to_s3_spark.sources.registry import load_table

    return embedding_dup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.45)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]


def _similarity_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.operators.similarity import topk_cosine
    from mysql_to_s3_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return topk_cosine(emb.filter(F.col("vec_id") != 0), _query_vec(spark, sf_dir), k=10)


def _similarity_ann_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.similarity import ann_topk
    from mysql_to_s3_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk(emb, _query_vec(spark, sf_dir), k=10)


def _multimodal_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql_to_s3_spark.operators.multimodal import binary_features, media_table
    from mysql_to_s3_spark.sources.registry import load_table, spread

    return binary_features(media_table(spread(load_table(spark, sf_dir, "documents"))))


_q("text_stats", _text_stats_spark, _text_stats_sql())
_q("text_langid", _text_langid_spark, _langid_sql())
_q(
    "text_fingerprint",
    _text_fingerprint_spark,
    f"SELECT doc_id, {_SQL_FP} AS fp FROM documents",
)
_q(
    "dedup_exact",
    _dedup_exact_spark,
    f"""SELECT {_SQL_FP} AS fp, min(doc_id) AS keeper, count(*) AS n_dupes
        FROM documents GROUP BY 1""",
)
_q("dedup_ngram_jaccard", _dedup_ngram_spark, _SQL_JACCARD_PAIRS)
# minhash verifies candidates with exact Jaccard, so it matches the exact
# oracle up to the LSH miss probability ((1-j^4)^16 ~= 4e-8 at j=0.9)
_q("dedup_minhash_lsh", _dedup_minhash_spark, _SQL_JACCARD_PAIRS)
# simhash has no DuckDB-replicable hash primitive (xxhash64) -> rows-only
_q("dedup_simhash", _dedup_simhash_spark, None)
_q(
    "dedup_embedding_cosine",
    _dedup_embedding_spark,
    f"""SELECT a.vec_id AS a, b.vec_id AS b,
               round({_sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round({_sql_cosine('a.embedding', 'b.embedding')}, 6) >= 0.45""",
)
_q(
    "similarity_topk",
    _similarity_topk_spark,
    f"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, round({_sql_cosine('e.embedding', 'q.qe')}, 6) AS cos
        FROM embeddings e, q WHERE e.vec_id != 0
        ORDER BY cos DESC, e.vec_id LIMIT 10""",
)
_q("similarity_ann_lsh", _similarity_ann_spark, _ann_sql())
_q(
    "multimodal_features",
    _multimodal_spark,
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest
       FROM documents""",
)


# ---------------------------------------------------------------------------
# snowflake extract pipeline (the reference's namesake), exercised on the
# TPC-H tables: orders fact + customer many-to-one dim + lineitem
# one-to-many children, then flattened back to scalars the oracle can check.


def _snowflake_denorm_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.sources.registry import load_table
    from mysql_to_s3_spark.sources.snowflake import (
        Relation,
        SnowflakeConfig,
        TableMeta,
        build_plan,
        doc_frame,
    )

    tables = {name: load_table(spark, sf_dir, name) for name in ("orders", "customer", "lineitem")}
    meta = [
        TableMeta("orders", tables["orders"].columns, ["o_orderkey"]),
        TableMeta("customer", tables["customer"].columns, ["c_custkey"]),
        TableMeta("lineitem", tables["lineitem"].columns, ["l_orderkey", "l_linenumber"]),
    ]
    rels = [
        Relation("orders_cust", "orders", ["o_custkey"], "customer", ["c_custkey"]),
        Relation("items_order", "lineitem", ["l_orderkey"], "orders", ["o_orderkey"]),
    ]
    cfg = SnowflakeConfig(fact_table="orders")
    plan = build_plan(meta, rels, cfg)
    docs = doc_frame(tables, plan, cfg, ids=list(range(100)))
    items = F.col("orders.lineitem")
    return docs.select(
        F.col("__id__").cast("bigint").alias("okey"),
        F.col("orders.o_custkey.c_name").alias("cname"),
        F.when(items.isNull(), F.lit(0)).otherwise(F.size(items)).cast("bigint").alias("n_items"),
        F.round(
            F.aggregate(items, F.lit(0.0), lambda acc, it: acc + it["l_quantity"]), 6
        ).alias("total_qty"),
    )


_q(
    "snowflake_denormalize",
    _snowflake_denorm_spark,
    """SELECT o.o_orderkey AS okey,
              c.c_name AS cname,
              (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items,
              (SELECT round(sum(l.l_quantity), 6) FROM lineitem l
               WHERE l.l_orderkey = o.o_orderkey) AS total_qty
       FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE o.o_orderkey < 100""",
)


def names() -> list[str]:
    return list(CATALOG)


def build(name: str) -> Callable[[SparkSession, str], DataFrame]:
    return CATALOG[name][0]


def oracle(name: str) -> str | None:
    return CATALOG[name][1]
