"""WARC (Web ARChive, ISO 28500) source: the container format web
crawls ship in (Common Crawl et al.) and therefore the front door of a
crawl-to-corpus pipeline. Pure-stdlib parser — the format is length-
prefixed records with MIME-style headers; per-record gzip members
(the standard `.warc.gz` layout) decompress with stdlib ``gzip``.

Spark integration: ``read_warc`` loads files via the built-in
``binaryFile`` source and parses records inside an Arrow
``mapInPandas`` stage — one task per WARC file, which is the natural
parallelism unit for this format (records are not splittable without
an external index; crawl WARCs are sized ~1 GB precisely so that
per-file tasks balance). At 100 TB that is ~100k files >> any
cluster's core count, so per-file tasks saturate executors; memory per
task is one file + its largest record (``binaryFile`` materializes the
file — keep WARCs at the conventional ~1 GB, and raise
``spark.sql.files.maxPartitionBytes`` irrelevance aside, this is the
documented shape of every public Spark/EMR WARC reader).

The HTTP payload of ``response`` records is split into status +
headers + body (raw capture — chunked/content-encoding are preserved
as captured, which is what WARC stores; decoding them is the consumer
reader's job and out of scope here).

Reference parity note: the reference (klahnakoski/MySQL-to-S3) has no
crawl ingestion; this is part of the beyond-reference LLM-data-pipeline
surface, following only the public WARC/1.0–1.1 spec.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class WarcError(ValueError):
    """Raised on malformed WARC payloads."""


WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


# ---------------------------------------------------------------------------
# writers (tests + synthetic corpora; also the honest spec documentation)


def build_http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """Minimal HTTP/1.1 response block as captured inside a WARC
    ``response`` record."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(status, "OK")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("ascii") + bytes(body)


def build_warc_record(
    payload: bytes,
    warc_type: str = "response",
    url: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One WARC/1.0 record: version line, headers, blank line, payload
    of exactly Content-Length bytes, two CRLFs."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if url is not None:
        headers.insert(1, ("WARC-Target-URI", url))
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers) + "\r\n"
    return head.encode("ascii") + bytes(payload) + b"\r\n\r\n"


def write_warc_gz(records: list[bytes]) -> bytes:
    """Concatenated per-record gzip members — the standard `.warc.gz`
    layout (each record its own member, so readers can seek to member
    boundaries from an external index)."""
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec))
    return out.getvalue()


# ---------------------------------------------------------------------------
# parser


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split a captured HTTP response into (status, content_type, body).
    Raw capture semantics: the body bytes are returned exactly as
    stored (no de-chunking, no content-decoding)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload[:5] == b"HTTP/":
        return None, None, payload
    head = payload[:sep].decode("latin-1")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[sep + 4 :]


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record (keys = WARC_SCHEMA field names
    minus warc_file). Accepts plain WARC bytes or multi-member gzip
    (`.warc.gz`); malformed structure raises WarcError loudly rather
    than silently truncating a corpus."""
    b = bytes(data)
    if b[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(b)) as gz:
            b = gz.read()  # stdlib gzip reads ALL concatenated members
    pos = 0
    while pos < len(b):
        # tolerate extra record separators
        while b[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(b):
            return
        hdr_end = b.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError(f"unterminated WARC header block at byte {pos}")
        head = b[pos:hdr_end].decode("latin-1")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise WarcError(f"missing WARC version line at byte {pos}: {lines[0]!r}")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcError(f"bad/missing Content-Length at byte {pos}") from e
        body_start = hdr_end + 4
        if body_start + length > len(b):
            raise WarcError(
                f"truncated WARC record at byte {pos}: "
                f"need {length} payload bytes, have {len(b) - body_start}"
            )
        payload = b[body_start : body_start + length]
        warc_type = fields.get("warc-type")
        status = ctype = None
        body = payload
        if warc_type == "response" and "application/http" in fields.get("content-type", ""):
            status, ctype, body = _parse_http(payload)
        yield {
            "record_id": fields.get("warc-record-id"),
            "warc_type": warc_type,
            "url": fields.get("warc-target-uri"),
            "warc_date": fields.get("warc-date"),
            "content_type": fields.get("content-type"),
            "http_status": status,
            "http_content_type": ctype,
            "body": body,
        }
        pos = body_start + length


def read_warc(spark: SparkSession, path: str, types: tuple[str, ...] | None = ("response",)) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan -> Arrow mapInPandas
    parse, one row per record. ``types`` filters record types at parse
    time (None keeps all — request/metadata/warcinfo records too).
    One task per file; see the module docstring for the 100 TB shape."""
    keep = tuple(types) if types is not None else None

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                for r in parse_warc(rec["content"]):
                    if keep is not None and r["warc_type"] not in keep:
                        continue
                    r["warc_file"] = rec["path"]
                    rows.append(r)
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_parse, WARC_SCHEMA)


def _header_charset(content_type: str | None) -> str | None:
    """Pull ``charset=`` out of an HTTP Content-Type header value."""
    if not content_type:
        return None
    for part in content_type.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset":
            return v.strip().strip("\"'") or None
    return None


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def warc_documents(
    spark: SparkSession,
    path: str,
    fallback_charset: str = "utf-8",
) -> DataFrame:
    """WARC responses as a documents-shaped frame (url, warc_date,
    http_status, text) — the input the corpus pipeline's
    `html_to_text` / `normalize_text` / `canonical_url` stages expect.

    Charset handling matches what crawls actually contain: each body
    decodes with the charset its OWN Content-Type header declares,
    falling back to ``fallback_charset``; undecodable sequences are
    replaced, and an unknown/invalid declared charset falls back too
    (crawls lie about encodings; losing a byte beats losing the
    document). One Arrow pass fused onto the record parse — no second
    scan."""

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import codecs as _codecs

        import pandas as pd

        for pdf in batches:
            texts = []
            for ct, body in zip(pdf["http_content_type"], pdf["body"]):
                cs = _header_charset(ct) or fallback_charset
                try:
                    _codecs.lookup(cs)
                except LookupError:
                    cs = fallback_charset
                texts.append(bytes(body).decode(cs, errors="replace"))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_date": pdf["warc_date"],
                    "http_status": pdf["http_status"].astype("Int32"),
                    "text": texts,
                }
            )

    df = read_warc(spark, path, types=("response",))
    return df.select("url", "warc_date", "http_status", "http_content_type", "body").mapInPandas(
        _decode, DOCUMENTS_SCHEMA
    )


def crawl_to_documents(
    spark: SparkSession,
    path: str,
    normalize_form: str = "NFC",
    fallback_charset: str = "utf-8",
    min_status: int = 200,
    max_status: int = 299,
) -> DataFrame:
    """The composed crawl-to-corpus front end: WARC responses ->
    charset-aware decode -> HTML -> visible text -> Unicode
    normalization -> a ``prepare_corpus``-ready frame with a
    DETERMINISTIC ``doc_id`` (xxhash64 of url + capture date — stable
    across runs, engines, and partitionings, so downstream splits /
    dedup keepers / shard receipts are reproducible from the raw
    crawl). Pair with ``CorpusConfig(url_col='url')`` so re-crawls
    drop first:

        docs = crawl_to_documents(spark, 'crawl/*.warc.gz')
        prep = prepare_corpus(docs, CorpusConfig(url_col='url'))

    Everything here is one lazy plan: binaryFile scan -> two Arrow
    stages + codegen'd Column algebra — zero shuffles before the
    pipeline's own stages."""
    from mysql_to_s3_spark.operators.text import html_to_text, normalize_text

    docs = warc_documents(spark, path, fallback_charset=fallback_charset)
    return (
        docs.filter(
            (F.col("http_status") >= min_status) & (F.col("http_status") <= max_status)
        )
        .select(
            F.xxhash64("url", "warc_date").alias("doc_id"),
            "url",
            "warc_date",
            normalize_text(html_to_text(F.col("text")), form=normalize_form).alias("text"),
        )
    )
