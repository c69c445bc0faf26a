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
    # r9: 'dsir' mode — the DSIR importance-weight gate ON in the
    # streaming pipeline (pretrained target/source bucket models, the
    # documented streaming contract), with exact dedup OFF so every gate
    # is stateless per-row and the drained survivor set can be asserted
    # IDENTICAL to the batch pipeline's (the 0-divergence check).
    dsir_mode = len(sys.argv) > 4 and sys.argv[4] == "dsir"

    from mysql_to_s3_spark import get_spark
    from mysql_to_s3_spark.operators.lm import unigram_counts
    from mysql_to_s3_spark.pipeline import CorpusConfig, prepare_corpus_stream
    from mysql_to_s3_spark.sources.registry import load_table

    spark = get_spark("bench_stream")
    base = load_table(spark, sf_dir, "documents")
    docs = base.select("doc_id", "text")
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

    dsir_kw = {}
    cut = None
    if dsir_mode:
        from mysql_to_s3_spark.operators.dsir import (
            dsir_logratio,
            hashed_ngram_counts,
        )

        tgt = hashed_ngram_counts(base.filter(F.col("lang") == "en"))
        srcm = hashed_ngram_counts(base)
        tgt_rows = [(r.bucket, r.n) for r in tgt.collect()]
        src_rows = [(r.bucket, r.n) for r in srcm.collect()]
        # pick the threshold at the WIDEST weight gap around the median:
        # both engines' summation orders differ by last-ulp drift, so the
        # cut must sit far from any actual weight for the 0-divergence
        # assertion to be meaningful rather than lucky
        ws = sorted(
            r.dsir_logratio
            for r in dsir_logratio(docs, tgt, srcm).collect()
        )
        mid = len(ws) // 2
        lo, hi = mid - min(len(ws) // 4, 2000), mid + min(len(ws) // 4, 2000)
        gap_i = max(range(lo, hi), key=lambda i: ws[i + 1] - ws[i])
        cut = (ws[gap_i] + ws[gap_i + 1]) / 2.0
        dsir_kw = {"dsir_target_counts": tgt_rows, "dsir_source_counts": src_rows}

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
    if dsir_mode:
        cfg = CorpusConfig(
            min_quality=0.5,
            dsir_min_logratio=cut,
            exact=False,  # stateless gates only: survivor set == batch
            decontam_threshold=0.8,
            splits={"train": 0.9, "val": 0.1},
        )
    else:
        cfg = CorpusConfig(
            min_quality=0.5,
            min_lm_logprob=-14.0,
            exact=True,
            decontam_threshold=0.8,
            splits={"train": 0.9, "val": 0.1},
        )
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", max(1, n_chunks // 10)).parquet(src)
    outs = prepare_corpus_stream(
        sdf, cfg, ts_col="ts", bench_rows=bench_rows,
        lm_rows=None if dsir_mode else lm_rows,
        lateness="1 hour",
        **dsir_kw,
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
        landed = spark.read.parquet(out_dir)
        kept = landed.count()
        extra = {}
        if dsir_mode:
            # 0-divergence: with only stateless per-row gates the drained
            # survivor set must be IDENTICAL to the batch pipeline's
            # (batch scores DSIR in join mode, the stream in arrow mode —
            # the gap-midpoint threshold makes the comparison drift-proof)
            from mysql_to_s3_spark.pipeline import prepare_corpus

            batch_docs = prepare_corpus(
                docs, cfg,
                bench=spark.createDataFrame(bench_rows, "doc_id long, text string"),
                dsir_target_counts=tgt,
                dsir_source_counts=srcm,
            ).docs
            s_ids = {r.doc_id for r in landed.select("doc_id").collect()}
            b_ids = {r.doc_id for r in batch_docs.select("doc_id").collect()}
            diverged = s_ids ^ b_ids
            extra = {
                "dsir_cut": round(cut, 6),
                "batch_kept": len(b_ids),
                "divergence": len(diverged),
                "stream_only": len(s_ids - b_ids),
                "batch_only": len(b_ids - s_ids),
            }
            if diverged:
                sample = sorted(diverged)[:5]
                wj = {
                    r.doc_id: r.dsir_logratio
                    for r in dsir_logratio(
                        docs.filter(F.col("doc_id").isin(sample)), tgt, srcm
                    ).collect()
                }
                from mysql_to_s3_spark.operators.dsir import dsir_scorer

                sc = dsir_scorer(tgt_rows, src_rows)
                wa = {
                    r.doc_id: r.w
                    for r in docs.filter(F.col("doc_id").isin(sample))
                    .select("doc_id", sc(F.col("text")).alias("w"))
                    .collect()
                }
                extra["divergence_sample"] = [
                    {"doc_id": d, "in_stream": d in s_ids,
                     "w_join": wj.get(d), "w_arrow": wa.get(d)}
                    for d in sample
                ]
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
    if dsir_mode and extra.get("divergence", 0):
        raise SystemExit(f"stream/batch divergence: {extra['divergence']} docs")


if __name__ == "__main__":
    main()
