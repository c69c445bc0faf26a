"""Bucketed parquet tables: pre-shuffled storage for repeated joins.

At 100 TB the dominant cost of the snowflake assembly
(`sources/snowflake.py`) and of every id-keyed dedup join is the hash
exchange of the fact and child tables on the join key — repeated on
EVERY query. Spark's bucketing (`DataFrameWriter.bucketBy` + `sortBy`,
hive-style bucketed tables) moves that shuffle to WRITE time, once:
a table bucketed on its join key is read back with a recognized
`HashPartitioning` output, so a sort-merge join of two tables bucketed
on the same key with the same bucket count plans with ZERO Exchange
(asserted in tests/test_bucketed.py). A per-task Sort remains — Spark 4
dropped bucketed-scan output-ordering propagation (the pre-4.0
`spark.sql.legacy.bucketedTableScanOutputOrdering` flag is gone) — but
that sort is bucket-local with no network movement; `sortBy` still
pays for itself via parquet min/max row-group pruning on the key.

Usage shape mirrors the reference's one-time `information_schema`
discovery vs per-run extract split (reference `extract.py:40` runs the
same fact join every batch): bucket the fact and each child on the fact
key at ingest; every later assembly, incremental batch, or dedup pass
joins shuffle-free.

Sizing: pick `n_buckets` so each bucket is 100-200 MB at the target
scale (e.g. ~1000 buckets/TB of post-compression parquet); bucket
counts must MATCH across co-joined tables (Spark only elides the
exchange when both sides agree, or one side's count divides the other's
with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str] | str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted, by default) parquet
    table. ``path`` makes it an external table at that location
    (bucketing metadata still lives in the catalog — reading the bare
    files would lose it)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if sort:
        # one file per bucket: repartition uses the same murmur3 pmod
        # as the bucket-id expression, so task i holds exactly bucket
        # i's rows and writes one key-sorted file for it — maximizing
        # parquet row-group min/max pruning on the key.
        df = df.repartition(n_buckets, *[df[k] for k in keys])
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucketing metadata (a plain
    `spark.read.parquet(path)` of the same files would lose it)."""
    return spark.table(table)
