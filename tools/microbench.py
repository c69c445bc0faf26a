"""Micro-bench a few catalog rows: min-of-N collect + one count.

Usage: python tools/microbench.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, MB_RUNS (default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("MB_RUNS", "2"))
    names = sys.argv[1:]

    from mysql_to_s3_spark import queries as catalog
    from mysql_to_s3_spark.session import get_spark

    spark = get_spark("microbench")
    # same warmup as bench.py
    catalog.build("agg_scalar_stats")(spark, sf_dir).collect()
    catalog.build("groupby_tpch_q1")(spark, sf_dir).collect()

    for name in names:
        spark.sparkContext.setJobDescription(f"microbench: {name}")
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            catalog.build(name)(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t0 = time.perf_counter()
        catalog.build(name)(spark, sf_dir).count()
        cnt = time.perf_counter() - t0
        print(f"{name:32s} wall {best:7.3f}  engine {cnt:7.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
