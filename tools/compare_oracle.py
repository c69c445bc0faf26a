"""Driver-contract pre-flight: run every catalog query AND its DuckDB
oracle side-by-side, sort columns by name, compare exact values.

Usage: python tools/compare_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mysql_to_s3_spark import queries as cat
from mysql_to_s3_spark.session import get_spark
from mysql_to_s3_spark.sources.registry import TABLES


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _key(row):
    """None-safe, type-safe sort key for mixed-type rows."""
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    spark = get_spark("compare", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in cat.names():
        if only and not any(f in name for f in only):
            continue
        sql = cat.oracle(name)
        try:
            df = cat.build(name)(spark, sf_dir)
            cols = sorted(df.columns)
            got = sorted(
                (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_key
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"rows  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            rel = con.execute(sql)
            names_ = [d[0] for d in rel.description]
            order = [names_.index(c) for c in sorted(names_)]
            exp = sorted(
                (tuple(_norm(row[i]) for i in order) for row in rel.fetchall()), key=_key
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        # driver-grade TYPE audit: the driver hashes exact values, where
        # Python's == calls 35 == 35.0 equal — catch int/float (and
        # Decimal) drift per column before it becomes a driver hash FAIL
        stypes: dict[str, set] = {c: set() for c in cols}
        otypes: dict[str, set] = {c: set() for c in cols}
        for r in df.limit(50).collect():
            for c in cols:
                if r[c] is not None:
                    stypes[c].add(type(r[c]).__name__)
        for row_ in con.execute(sql).fetchmany(50):
            for c, v in zip(names_, row_):
                if v is not None and c in otypes:
                    otypes[c].add(type(v).__name__)
        tdiffs = {
            c: (sorted(stypes[c]), sorted(otypes.get(c, set())))
            for c in cols
            if stypes[c] and otypes.get(c) and stypes[c] != otypes[c]
        }
        if sorted(names_) != cols:
            print(f"FAIL  {name}: columns spark={cols} oracle={sorted(names_)}")
            failures.append(name)
        elif tdiffs:
            print(f"FAIL  {name}: value TYPE drift (spark vs oracle): {tdiffs}")
            failures.append(name)
        elif got != exp:
            diff = next(
                (i for i, (g, e) in enumerate(zip(got, exp)) if g != e),
                min(len(got), len(exp)),
            )
            print(
                f"FAIL  {name}: rows spark={len(got)} oracle={len(exp)}; "
                f"first diff @{diff}:\n  spark  {got[diff] if diff < len(got) else '<none>'}"
                f"\n  oracle {exp[diff] if diff < len(exp) else '<none>'}"
            )
            failures.append(name)
        else:
            print(f"ok    {name}: {len(got)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
