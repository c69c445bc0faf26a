"""Measure the FULL multi-epoch training-data lifecycle at sf1 (VERDICT
r7 #4): repeat_epochs (mixed per-stratum up-sampling rates) ->
epoch_shuffle keyed by doc_id#epoch_copy -> write_training_shards with a
manifest -> verify_shards, reporting docs/sec end-to-end plus the
copies-scatter count (adjacent same-doc pairs in the trainer's
(shard, pos) order — the contract the composite key exists for).

Usage: python tools/bench_epoch_lifecycle.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1data"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from mysql_to_s3_spark import get_spark
    from mysql_to_s3_spark.operators.sampling import epoch_shuffle, repeat_epochs
    from mysql_to_s3_spark.pipeline import verify_shards, write_training_shards
    from mysql_to_s3_spark.sources.registry import load_table

    spark = get_spark("bench_epoch_lifecycle")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    n_docs = docs.count()

    out = tempfile.mkdtemp(prefix="epoch_lifecycle_")
    try:
        t0 = time.perf_counter()
        # a published-recipe-shaped mixture: up-sample one stratum hard,
        # one moderately, leave the rest at a single pass
        rep = repeat_epochs(
            docs, {"en": 2.45, "de": 1.5}, strata_col="lang"
        ).withColumn("rep_id", F.concat_ws("#", "doc_id", "epoch_copy"))
        shuf = epoch_shuffle(rep, epoch=3, n_shards=64, id_col="rep_id")
        audit = write_training_shards(
            shuf.select("rep_id", "text"), out,
            budget=2048, n_buckets=n_buckets, id_col="rep_id", manifest=True,
        )
        n_pack_dropped = audit.count()
        mism = verify_shards(spark, out)
        wall = time.perf_counter() - t0

        # copies-scatter: adjacent same-doc pairs in (shard, pos) order,
        # computed engine-side (one window lag per shard partition)
        from pyspark.sql import Window

        w = Window.partitionBy("shard").orderBy("pos")
        adjacent = (
            shuf.withColumn("__prev__", F.lag("doc_id").over(w))
            .filter(F.col("__prev__") == F.col("doc_id"))
            .count()
        )
        n_rep = rep.count()
        print(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_after_repeat": n_rep,
                "pack_dropped": n_pack_dropped,
                "manifest_mismatches": len(mism),
                "adjacent_same_doc_pairs": adjacent,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_rep / wall, 1),
            }
        )
        assert mism == [], "receipt must verify clean"
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
