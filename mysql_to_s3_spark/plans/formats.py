"""Result shaping for ``format: list | table | cube``.

The reference returns JSON structures from jx.run (jx_python/jx.py:109-118):
  list  -> the documents themselves
  table -> {"meta","header","data"} (pyLibrary/convert.py:156 list2table)
  cube  -> column-oriented arrays; with edges, a dimensional cube whose
           data matrices are indexed by the edge partition coordinates and
           whose null bucket sorts LAST (convert.py:174 list2cube;
           jx_sqlite/query_table.py:119-342 format=cube for edges).

These are driver-side shapings of an already-computed (and, for edges,
already-densified) DataFrame — the heavy work stays in Spark; the result
is by definition small (cube cells, limited lists).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def _rows(df: DataFrame) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def format_list(df: DataFrame) -> list[dict]:
    return _rows(df)


def format_table(df: DataFrame) -> dict:
    """list2table: header + row arrays (convert.py:156-171)."""
    header = list(df.columns)
    data = [[r.get(k) for k in header] for r in _rows(df)]
    return {"meta": {"format": "table"}, "header": header, "data": data}


def format_cube(df: DataFrame, edges: list | None = None, select_names: list[str] | None = None) -> dict:
    """list2cube (convert.py:174-198) when there are no edges: one rownum
    edge, column-oriented data. With edges: a dense dimensional cube —
    edge domains list their discovered/declared parts in sort order with
    the null bucket last, and each select becomes an N-dimensional nested
    list indexed by the edge coordinates."""
    rows = _rows(df)
    if not edges:
        keys = select_names or list(df.columns)
        data = {k: [r.get(k) for r in rows] for k in keys}
        return {
            "meta": {"format": "cube"},
            "edges": [
                {"name": "rownum", "domain": {"type": "rownum", "min": 0, "max": len(rows), "interval": 1}}
            ],
            "data": data,
        }

    edge_names = [e.name for e in edges]
    selects = select_names or [c for c in df.columns if c not in edge_names]

    # partition values per edge: DECLARED domain order when the domain
    # carries explicit partitions (set / general-set / time / range —
    # reference cubes list named parts in declaration order, not
    # alphabetized), else sorted observed values with the null bucket
    # last (lists/aggs.py:44,54). Observed values outside the declared
    # list (the allowNulls bucket) append after, None last.
    def part_key(v):
        return (v is None, v)

    parts: list[list] = []
    for i, name in enumerate(edge_names):
        observed = {r.get(name) for r in rows}
        declared = None
        if edges is not None and i < len(edges):
            from mysql_to_s3_spark.plans.domains import compile_domain

            declared = compile_domain(edges[i].domain).part_python_values()
        if declared is not None:
            extra = sorted(observed - set(declared), key=part_key)
            vals = list(declared) + extra
        else:
            vals = sorted(observed, key=part_key)
        parts.append(vals)
    index = [{v: i for i, v in enumerate(p)} for p in parts]

    def empty_matrix(dims: list[int]) -> Any:
        if not dims:
            return None
        return [empty_matrix(dims[1:]) for _ in range(dims[0])]

    dims = [len(p) for p in parts]
    data = {s: empty_matrix(dims) for s in selects}
    for r in rows:
        coord = [index[i][r.get(name)] for i, name in enumerate(edge_names)]
        for s in selects:
            m = data[s]
            for c in coord[:-1]:
                m = m[c]
            if coord:
                m[coord[-1]] = r.get(s)
            else:
                data[s] = r.get(s)

    return {
        "meta": {"format": "cube"},
        "edges": [
            {
                "name": name,
                "allowNulls": e.allowNulls,
                "domain": {"type": "set", "partitions": [{"value": v} for v in parts[i]]},
            }
            for i, (name, e) in enumerate(zip(edge_names, edges))
        ],
        "data": data,
    }


def run_formatted(query: dict, **kwargs) -> Any:
    """jx.run analog returning the format-shaped result (list/table/cube)
    instead of the raw DataFrame."""
    from mysql_to_s3_spark.operators.executor import run
    from mysql_to_s3_spark.plans.normalize import QueryOp

    q = QueryOp.wrap(query)
    df = run(q, **kwargs)
    if q.format == "table":
        return format_table(df)
    if q.format == "cube":
        return format_cube(df, edges=q.edges or None)
    return format_list(df)
