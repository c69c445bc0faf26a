"""Document chunking + sequence packing (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.packing import (
    chunk_documents,
    pack_assignments,
    pack_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),          # 10 tokens
        (2, "one two, three!"),              # 5 tokens (punct isolated)
        (3, ""),                             # empty -> no chunks, no pack
        (4, " ".join(f"t{i}" for i in range(23))),  # 23 tokens
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_windows_and_overlap(docs):
    out = chunk_documents(docs, max_tokens=8, overlap=3).orderBy("doc_id", "chunk_idx")
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 3 (empty) emits nothing
    assert 3 not in by_doc
    # doc 1: 10 tokens, stride 5 -> starts 1, 6 -> windows of 8 and 5
    assert [r.n_tokens for r in by_doc[1]] == [8, 5]
    assert by_doc[1][0].chunk_text == "a b c d e f g h"
    assert by_doc[1][1].chunk_text == "f g h i j"  # 3-token overlap
    # doc 2: tokenizer isolates punctuation
    assert by_doc[2][0].chunk_text == "one two , three !"
    # doc 4: 23 tokens, starts 1,6,11,16,21 -> last chunk short
    assert [r.chunk_idx for r in by_doc[4]] == [0, 1, 2, 3, 4]
    assert [r.n_tokens for r in by_doc[4]] == [8, 8, 8, 8, 3]


def test_chunk_rejects_degenerate_stride(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_pack_conserves_and_is_contiguous(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.pmod(F.col("id"), 97) + 1).cast("int"))).alias("text"),
    )
    budget, n_buckets = 100, 4
    a = pack_assignments(docs, budget=budget, n_buckets=n_buckets)
    rows = a.collect()
    # every non-empty doc assigned exactly once
    assert len(rows) == 500
    assert len({r.doc_id for r in rows}) == 500
    # token conservation into the per-seq rollup
    s = pack_stats(docs, budget=budget, n_buckets=n_buckets)
    stats = s.collect()
    assert sum(r.tokens_total for r in stats) == sum(r.n_tokens for r in rows)
    # per bucket: seq_nos contiguous from 0; every doc's start offset lies
    # inside its sequence's budget window
    by_bucket = {}
    for r in stats:
        by_bucket.setdefault(r.bucket, []).append(r.seq_no)
    for b, seqs in by_bucket.items():
        assert sorted(seqs) == list(range(max(seqs) + 1))
    for r in rows:
        assert r.seq_no == r.start_off // budget
    # fill_frac caps at 1.0 and is > 0
    assert all(0.0 < r.fill_frac <= 1.0 for r in stats)


def test_pack_is_partitioning_invariant(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("x"), (F.pmod(F.col("id"), 31) + 1).cast("int"))).alias("text"),
    )
    a = {(r.doc_id): (r.bucket, r.seq_no) for r in pack_assignments(docs, budget=64, n_buckets=8).collect()}
    shuffled = docs.orderBy(F.reverse(F.col("doc_id").cast("string"))).repartition(13)
    b = {(r.doc_id): (r.bucket, r.seq_no) for r in pack_assignments(shuffled, budget=64, n_buckets=8).collect()}
    assert a == b


def test_pack_oversized_doc_spans_alone(spark):
    # one 500-token doc with budget 100: it starts a sequence and the
    # next doc in the bucket starts at floor(500/100) = seq 5
    docs = spark.createDataFrame(
        [(1, " ".join(["big"] * 500)), (2, " ".join(["small"] * 10))],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in pack_assignments(docs, budget=100, n_buckets=1).collect()}
    assert rows[1].seq_no == 0  # big doc sorted first (n desc)
    assert rows[2].start_off == 500 and rows[2].seq_no == 5


def test_pack_assignments_rejects_reserved_keep_cols(spark):
    """A keep/id column named like a generated output column would
    produce ambiguous duplicates and corrupt shard output silently —
    it must fail loudly instead."""
    import pytest as _pytest

    from mysql_to_s3_spark.operators.packing import pack_assignments

    df = spark.createDataFrame(
        [(1, "a b c", 7)], "doc_id long, text string, bucket long"
    )
    with _pytest.raises(ValueError, match="bucket"):
        pack_assignments(df, keep_cols=("bucket",))
    with _pytest.raises(ValueError, match="id_col"):
        pack_assignments(
            df.withColumnRenamed("bucket", "n_tokens"), id_col="n_tokens"
        )
    with _pytest.raises(ValueError, match="repeated"):
        pack_assignments(df.drop("bucket"), keep_cols=("doc_id",))
