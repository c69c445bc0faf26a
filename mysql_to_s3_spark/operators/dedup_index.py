"""Incremental dedup: screen NEW documents against a PERSISTED index of
the corpus already ingested — without re-shingling or re-hashing a byte
of the old corpus.

At 100 TB the corpus is append-only and arrives in batches; re-running
`minhash_lsh_pairs` over old ∪ new per batch re-pays the full corpus
shingling cost every time. The index stores, once per ingested doc:

- ``fp``  — the 16-byte exact-dedup fingerprint,
- ``sig`` — the 64-long minhash signature,
- ``hb``  — the xxhash64-folded distinct shingle set (``array<long>``,
  ~8 bytes/shingle: the verify payload, a few percent of text size),

plus a ``bands`` table of (band, bucket, id) keys — the same two-table
persisted-index shape as the IVF ANN index (vectors + centroids).

A new batch then pays exactly its own cost: project its shingles and
signature, equi-join its band keys against the index's bands table,
signature pre-verify (σ-scaled margin, same as the batch operator), and
decide with HASHED Jaccard over the stored ``hb`` sets — exact up to
64-bit collisions (~1e-12 per screened pair; the trade is stated in
`decontam.contamination_pairs`'s hashed switch too). The old corpus is
touched only through the index: one bands equi-join plus point lookups
of ``sig``/``hb`` for candidates.

Consistency contract: the index's hash family (`dedup._base_hashes` +
`_minhash_columns` constants) is deterministic, so signatures written
by one batch compare exactly with signatures computed by any later
batch.

Reference parity: none (beyond-reference, SURVEY §2 item 8 — the
reference re-extracts from scratch; its `Counter` resume is row-id
based, not content-based).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mysql_to_s3_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_N,
    _base_hashes,
    _minhash_columns,
    _shingle_sets,
)
from mysql_to_s3_spark.operators.text import fingerprint


def _doc_rows(df: DataFrame, id_col: str, text_col: str, n_hashes: int) -> DataFrame:
    """(id, fp, hb, sig) — one scan; hb is materialized by a repartition
    Exchange before sig derives from it, so projection collapse cannot
    re-expand the per-shingle xxhash64 into all n_hashes permutations
    (same trap + fix as minhash_lsh_pairs)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (
        _shingle_sets(df, id_col, text_col)
        .join(
            df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp")),
            "id",
        )
        .withColumn("hb", F.array_distinct(_base_hashes(F.col("sh"))))
        .repartition(par, "id")
    )
    sig = F.array(*_minhash_columns(F.col("hb"), n_hashes))
    return base.select("id", "fp", "hb", sig.alias("sig"))


def _band_rows(docs: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    r = n_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.element_at("sig", b * r + j + 1) for j in range(r)]).alias("bucket"),
        )
        for b in range(bands)
    ]
    return docs.select("id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "id", "bb.band", "bb.bucket"
    )


def write_dedup_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = MINHASH_N,
    bands: int = MINHASH_BANDS,
    mode: str = "overwrite",
) -> None:
    """Build/extend the index. ``mode='append'`` adds a new batch's docs
    (callers append only the batch's KEPT docs, after screening)."""
    docs = _doc_rows(df, id_col, text_col, n_hashes)
    docs.write.mode(mode).parquet(path + "/docs")
    # derive bands from the WRITTEN docs parquet: the signatures are read
    # back materialized instead of recomputing the whole shingle/minhash
    # projection a second time (and the two tables cannot diverge).
    # mode='append' must only band the rows just written, so scope the
    # read-back to this batch's ids via a broadcast semi-join.
    spark = df.sparkSession
    written = spark.read.parquet(path + "/docs")
    if mode == "append":
        batch_ids = df.select(F.col(id_col).alias("id")).distinct()
        written = written.join(F.broadcast(batch_ids), "id", "left_semi")
    _band_rows(written, n_hashes, bands).write.mode(mode).parquet(path + "/bands")


def dedup_index_pairs(
    new_df: DataFrame,
    path: str,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = MINHASH_N,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(new_id, index_id, jaccard) for every new doc within ``threshold``
    of an indexed doc — plus exact-duplicate hits at jaccard 1.0 via the
    fingerprint (an identical doc always matches even if, pathologically,
    LSH missed it). Only the new batch is shingled."""
    spark = new_df.sparkSession
    idx_docs = spark.read.parquet(path + "/docs")
    idx_bands = spark.read.parquet(path + "/bands")

    from mysql_to_s3_spark.functions.cachepool import cache_scoped

    # scoped cache (LRU per family, evicted frames unpersisted) — a bare
    # .persist() would pin the batch's shingle sets until session end
    new_docs = cache_scoped(
        _doc_rows(new_df, id_col, text_col, n_hashes), "dedup_index.new_docs"
    )
    cand = (
        _band_rows(new_docs, n_hashes, bands)
        .join(
            idx_bands.select(
                F.col("id").alias("index_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select(F.col("id").alias("new_id"), "index_id")
        .distinct()
    )
    margin = 4.0 * (threshold * (1.0 - threshold) / n_hashes) ** 0.5
    est = (
        cand.join(
            new_docs.select(F.col("id").alias("new_id"), F.col("sig").alias("sig_n"),
                            F.col("hb").alias("hb_n")),
            "new_id",
        )
        .join(
            idx_docs.select(F.col("id").alias("index_id"), F.col("sig").alias("sig_i"),
                            F.col("hb").alias("hb_i")),
            "index_id",
        )
        .withColumn(
            "__est__",
            F.size(F.filter(F.zip_with("sig_n", "sig_i", lambda p, q: p == q), lambda v: v))
            / F.lit(float(n_hashes)),
        )
        .filter(F.col("__est__") >= F.lit(max(0.0, threshold - margin)))
    )
    inter = F.size(F.array_intersect("hb_n", "hb_i"))
    j = inter.cast("double") / (F.size("hb_n") + F.size("hb_i") - inter)
    near = (
        est.select("new_id", "index_id", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    exact = (
        new_docs.select(F.col("id").alias("new_id"), "fp")
        .join(idx_docs.select(F.col("id").alias("index_id"), "fp"), "fp")
        .select("new_id", "index_id", F.lit(1.0).alias("jaccard"))
    )
    return near.unionByName(exact).groupBy("new_id", "index_id").agg(
        F.max("jaccard").alias("jaccard")
    )


def dedup_against_index(
    new_df: DataFrame,
    path: str,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The incremental ingest filter: new docs minus everything already
    represented in the index (exact or near) — one anti-join against the
    (small) hit set. Survivors are what `write_dedup_index(mode='append')`
    should then add.

    MATERIALIZE the result (localCheckpoint / write) before appending it
    to the same index: the returned frame is lazy and its lineage
    re-reads the index parquet on every evaluation, so evaluating it
    AFTER the append would screen against the extended index (the batch
    would then anti-join itself away)."""
    hits = (
        dedup_index_pairs(new_df, path, threshold, id_col, text_col)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_df.join(hits, id_col, "left_anti")
