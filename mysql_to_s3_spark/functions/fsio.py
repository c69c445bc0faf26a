"""Small-file I/O through the Hadoop FileSystem API.

Sidecar artifacts (shard manifests, classifier label maps, BPE merge
lists) must live NEXT TO the data they describe — which at scale means
an object store (`s3a://...`) or HDFS, where Python's ``open()`` cannot
reach. These helpers resolve the filesystem from the path's scheme via
the active Hadoop configuration, so the same code serves ``/local``,
``s3a://``, and ``hdfs://`` paths. For driver-side sidecars only
(bytes that fit in memory) — bulk data goes through DataFrame writers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Create/overwrite a small text file at any Hadoop-reachable path."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file from any Hadoop-reachable path."""
    jvm = spark._jvm
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # IOUtils drains the stream fully regardless of block boundaries
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 8192, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))
