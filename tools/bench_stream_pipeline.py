"""Measure the STREAMING corpus pipeline's throughput at sf1: split the
sf1 documents table into parquet chunk files, drain them through
prepare_corpus_stream (quality gate -> LM perplexity gate [pretrained
unigram broadcast] -> exact dedup -> decontamination -> split) with
availableNow, and report docs/sec end-to-end.

Usage: python tools/bench_stream_pipeline.py [sf_dir] [n_chunks] [sink]

``sink`` = 'parquet' (default: plain survivor landing) or 'shards'
(r7: the COMPLETE streaming ingest — survivors packed per micro-batch
into receipted training shards via stream_write_training_shards; each
batch group's manifest is verified after the drain).
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
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sink = sys.argv[3] if len(sys.argv) > 3 else "parquet"

    from mysql_to_s3_spark import get_spark
    from mysql_to_s3_spark.operators.lm import unigram_counts
    from mysql_to_s3_spark.pipeline import CorpusConfig, prepare_corpus_stream
    from mysql_to_s3_spark.sources.registry import load_table

    spark = get_spark("bench_stream")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # pretrained LM (fit once in batch — the documented streaming contract)
    lm_rows = [
        (r.token, r.n)
        for r in unigram_counts(docs, vocab_size=50_000).collect()
    ]
    bench_rows = [
        (int(r.doc_id) + 10_000_000, r.text)
        for r in docs.orderBy("doc_id").limit(20).collect()
    ]

    src = tempfile.mkdtemp(prefix="stream_src_")
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    (
        docs.withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
        .repartition(n_chunks)
        .write.mode("overwrite")
        .parquet(src)
    )

    schema = spark.read.parquet(src).schema
    cfg = CorpusConfig(
        min_quality=0.5,
        min_lm_logprob=-14.0,
        exact=True,
        decontam_threshold=0.8,
        splits={"train": 0.9, "val": 0.1},
    )
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", max(1, n_chunks // 10)).parquet(src)
    outs = prepare_corpus_stream(
        sdf, cfg, ts_col="ts", bench_rows=bench_rows, lm_rows=lm_rows,
        lateness="1 hour",
    )
    t0 = time.perf_counter()
    if sink == "shards":
        from mysql_to_s3_spark.pipeline import (
            stream_write_training_shards,
            verify_shards,
        )

        q = stream_write_training_shards(
            outs.select("doc_id", "text", "split"),
            out_dir,
            budget=2048,
            n_buckets=16,
            extra_cols=("split",),
            manifest=True,
            checkpoint=ckpt,
            available_now=True,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        import glob
        import json as _json

        batches = sorted(glob.glob(out_dir + "/batch=*"))
        mismatches = sum(len(verify_shards(spark, b)) for b in batches)
        kept = sum(
            1
            for b in batches
            for f in glob.glob(b + "/bucket=*/part-*")
            for _ in open(f)
        )
        extra = {"n_batches": len(batches), "receipt_mismatches": mismatches}
    else:
        q = (
            outs.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        kept = spark.read.parquet(out_dir).count()
        extra = {}
    import json

    print(
        json.dumps(
            {
                "metric": "stream_pipeline_sf1",
                "sf_dir": sf_dir,
                "sink": sink,
                "n_docs": n_docs,
                "kept": kept,
                "n_chunks": n_chunks,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                **extra,
            }
        )
    )
    for d in (src, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
