"""Multi-batch incremental-ingest stress: chain batches through
dedup_against_index -> write_dedup_index(mode='append') at sf1 (50k docs)
and measure that the per-batch SCREEN cost stays ~constant (batch-linear
ingest), vs the full recompute (minhash_lsh_pairs over old ∪ new) whose
cost grows with the corpus.

Usage: python tools/bench_index_batches.py [sf_dir] [n_batches]
Prints one JSON line per batch plus a closing full-recompute reference.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1data"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from mysql_to_s3_spark import get_spark
    from mysql_to_s3_spark.operators.dedup import minhash_lsh_pairs
    from mysql_to_s3_spark.operators.dedup_index import (
        dedup_against_index,
        dedup_index_pairs,
        write_dedup_index,
    )
    from mysql_to_s3_spark.sources.registry import load_table

    spark = get_spark("bench_index_batches")
    docs = load_table(spark, sf_dir, "documents")

    # interleaved batches (doc_id mod n): the generator plants near-dups
    # at adjacent ids, so a contiguous range split hides every pair
    # inside one batch (measured: 0 cross pairs) — the modulo split makes
    # the screens actually find and verify cross-batch duplicates
    def batch(i):
        return docs.filter(F.col("doc_id") % n_batches == i)

    path = tempfile.mkdtemp(prefix="dedup_idx_sf1_")
    try:
        t0 = time.perf_counter()
        write_dedup_index(batch(0), path)
        print(json.dumps({"batch": 0, "phase": "build", "sec": round(time.perf_counter() - t0, 2),
                          "batch_rows": batch(0).count()}), flush=True)
        for i in range(1, n_batches):
            nb = batch(i)
            t0 = time.perf_counter()
            n_pairs = dedup_index_pairs(nb, path, threshold=0.9).count()
            t_screen = time.perf_counter() - t0
            t0 = time.perf_counter()
            kept = dedup_against_index(nb, path, threshold=0.9).localCheckpoint()
            n_kept = kept.count()
            t_filter = time.perf_counter() - t0
            t0 = time.perf_counter()
            write_dedup_index(kept, path, mode="append")
            t_append = time.perf_counter() - t0
            print(json.dumps({
                "batch": i, "phase": "screen+append",
                "screen_sec": round(t_screen, 2), "filter_sec": round(t_filter, 2),
                "append_sec": round(t_append, 2), "pairs": n_pairs,
                "batch_rows": nb.count(), "kept": n_kept,
            }), flush=True)

        # reference: what the LAST batch would have cost without the index
        last = batch(n_batches - 1)
        prior = docs.filter(F.col("doc_id") % n_batches != n_batches - 1)
        t0 = time.perf_counter()
        in_last = lambda c: F.col(c) % n_batches == n_batches - 1  # noqa: E731
        n_cross = (
            minhash_lsh_pairs(prior.unionByName(last), threshold=0.9)
            .filter(in_last("a") != in_last("b"))
            .count()
        )
        print(json.dumps({
            "phase": "full_recompute_last_batch",
            "sec": round(time.perf_counter() - t0, 2), "cross_pairs": n_cross,
        }), flush=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
