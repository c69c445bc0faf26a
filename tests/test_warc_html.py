"""Crawl-ingest front end: WARC source (sources/warc.py), HTML -> text
extraction, and Unicode normalization (operators/text.py)."""

from __future__ import annotations

import gzip
import os
import unicodedata

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.text import html_to_text, normalize_text
from mysql_to_s3_spark.sources.warc import (
    WarcError,
    build_http_response,
    build_warc_record,
    parse_warc,
    read_warc,
    warc_documents,
    write_warc_gz,
)

# ---------------------------------------------------------------------------
# WARC parser


def _resp_record(i: int, body: bytes | None = None, status: int = 200) -> bytes:
    body = body if body is not None else f"<html><body>doc {i}</body></html>".encode()
    return build_warc_record(
        build_http_response(body, status=status), url=f"http://ex.com/{i}"
    )


def test_parse_warc_plain_and_gzip():
    recs = [_resp_record(i) for i in range(3)]
    for blob in (b"".join(recs), write_warc_gz(recs)):
        got = list(parse_warc(blob))
        assert [r["url"] for r in got] == [f"http://ex.com/{i}" for i in range(3)]
        assert all(r["http_status"] == 200 and r["warc_type"] == "response" for r in got)
        assert got[2]["body"] == b"<html><body>doc 2</body></html>"


def test_parse_warc_single_member_gzip():
    # some writers gzip the whole file as ONE member — stdlib reads both
    recs = [_resp_record(i) for i in range(2)]
    got = list(parse_warc(gzip.compress(b"".join(recs))))
    assert len(got) == 2


def test_parse_warc_non_response_records_and_types():
    info = build_warc_record(
        b'{"software": "test"}', warc_type="warcinfo",
        content_type="application/warc-fields",
    )
    got = list(parse_warc(info + _resp_record(1)))
    assert [r["warc_type"] for r in got] == ["warcinfo", "response"]
    # warcinfo payload is NOT http-parsed
    assert got[0]["http_status"] is None and got[0]["body"] == b'{"software": "test"}'


def test_parse_warc_http_status_and_binary_body():
    body = bytes(range(256))  # binary payload survives exactly
    got = list(parse_warc(_resp_record(9, body=body, status=404)))
    assert got[0]["http_status"] == 404 and got[0]["body"] == body


def test_parse_warc_malformed_raises():
    with pytest.raises(WarcError, match="version"):
        list(parse_warc(b"NOTWARC/1.0\r\nX: y\r\n\r\n"))
    rec = _resp_record(1)
    with pytest.raises(WarcError, match="truncated"):
        list(parse_warc(rec[:-20]))
    with pytest.raises(WarcError, match="Content-Length"):
        list(parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"))


@settings(max_examples=20, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=6),
    gz=st.booleans(),
)
def test_parse_warc_roundtrip_property(bodies, gz):
    recs = [
        build_warc_record(build_http_response(b), url=f"http://p.com/{i}")
        for i, b in enumerate(bodies)
    ]
    blob = write_warc_gz(recs) if gz else b"".join(recs)
    got = list(parse_warc(blob))
    assert [r["body"] for r in got] == bodies
    assert [r["url"] for r in got] == [f"http://p.com/{i}" for i in range(len(bodies))]


def test_read_warc_distributed(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc.gz"), "wb") as fh:
        fh.write(write_warc_gz([_resp_record(0), _resp_record(1)]))
    with open(os.path.join(d, "b.warc"), "wb") as fh:
        fh.write(_resp_record(2))
    rows = sorted(
        (r["url"], r["http_status"], bytes(r["body"]).decode(), os.path.basename(r["warc_file"]))
        for r in read_warc(spark, d).collect()
    )
    assert [u for u, *_ in rows] == [f"http://ex.com/{i}" for i in range(3)]
    assert rows[2][3].endswith("b.warc")
    # documents view decodes bodies
    docs = {r["url"]: r["text"] for r in warc_documents(spark, d).collect()}
    assert docs["http://ex.com/1"] == "<html><body>doc 1</body></html>"


def test_read_warc_type_filter(spark, tmp_path):
    d = str(tmp_path / "warcs2")
    os.makedirs(d)
    info = build_warc_record(b"x", warc_type="warcinfo", content_type="application/warc-fields")
    with open(os.path.join(d, "a.warc"), "wb") as fh:
        fh.write(info + _resp_record(1))
    assert read_warc(spark, d).count() == 1  # default: responses only
    assert read_warc(spark, d, types=None).count() == 2


# ---------------------------------------------------------------------------
# HTML -> text


HTML_CASES = [
    ("<p>hello <b>world</b></p>", "hello world"),
    ('<script>var x = "<p>";</script>after', "after"),  # tag inside JS string
    ("<style>p { color: red; }</style>text", "text"),
    ("<SCRIPT>x</SCRIPT>ok", "ok"),  # case-insensitive
    ("a<!-- comment \n multiline -->b", "a b"),
    ("x&lt;tag&gt;y", "x<tag>y"),  # entity-decoded tag is NOT stripped
    ("A&amp;B", "A&B"),
    ("q&amp;lt;r", "q&lt;r"),  # double-escape: &amp; decodes LAST
    ("a&nbsp;b", "a b"),
    ("it&#39;s &quot;q&quot; &apos;a&apos;", "it's \"q\" 'a'"),
    ("  spaced\n\nout\ttext  ", "spaced out text"),
    ("<div>one</div><div>two</div>", "one two"),  # tags become separators
]


def test_html_to_text_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_CASES)], "id int, h string"
    )
    got = {r["id"]: r["t"] for r in df.select("id", html_to_text(F.col("h")).alias("t")).collect()}
    for i, (h, want) in enumerate(HTML_CASES):
        assert got[i] == want, (h, got[i], want)


# ---------------------------------------------------------------------------
# Unicode normalization


def test_normalize_text_nfc_and_control_strip(spark):
    s = "écoleÅ\x07\x00"
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(normalize_text(F.col("s")).alias("n")).first()["n"]
    assert got == unicodedata.normalize("NFC", "écoleÅ")
    assert "\x07" not in got and "\x00" not in got
    # whitespace controls survive (they are text, not noise)
    got2 = (
        spark.createDataFrame([("a\tb\nc",)], "s string")
        .select(normalize_text(F.col("s")).alias("n"))
        .first()["n"]
    )
    assert got2 == "a\tb\nc"


def test_normalize_text_nfkc_and_forms(spark):
    df = spark.createDataFrame([("ﬁn ①",)], "s string")  # fi-ligature, circled 1
    got = df.select(normalize_text(F.col("s"), "NFKC").alias("n")).first()["n"]
    assert got == "fin 1"
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(F.col("s"), "NFX")


def test_normalize_text_null_safe(spark):
    df = spark.createDataFrame([(1, None), (2, "ok")], "id int, s string")
    got = {r["id"]: r["n"] for r in df.select("id", normalize_text(F.col("s")).alias("n")).collect()}
    assert got[1] is None and got[2] == "ok"


def test_warc_documents_charset_from_headers(spark, tmp_path):
    """Each body decodes with its OWN declared charset; bogus charsets
    and undecodable bytes fall back / replace instead of failing."""
    d = str(tmp_path / "warcs_cs")
    os.makedirs(d)
    recs = [
        build_warc_record(
            build_http_response("caf\xe9".encode("latin-1"), content_type="text/html; charset=ISO-8859-1"),
            url="http://cs.com/latin",
        ),
        build_warc_record(
            build_http_response("naïve".encode("utf-8"), content_type='text/html; charset="utf-8"'),
            url="http://cs.com/utf8",
        ),
        build_warc_record(
            build_http_response(b"plain", content_type="text/html; charset=NOT-A-CHARSET"),
            url="http://cs.com/bogus",
        ),
        build_warc_record(
            build_http_response(b"ok \xff\xfe end", content_type="text/html"),  # no charset
            url="http://cs.com/binary",
        ),
    ]
    with open(os.path.join(d, "a.warc"), "wb") as fh:
        fh.write(b"".join(recs))
    got = {r["url"]: r["text"] for r in warc_documents(spark, d).collect()}
    assert got["http://cs.com/latin"] == "café"
    assert got["http://cs.com/utf8"] == "naïve"
    assert got["http://cs.com/bogus"] == "plain"
    assert got["http://cs.com/binary"].startswith("ok ") and "�" in got["http://cs.com/binary"]


def test_crawl_to_documents_end_to_end(spark, tmp_path):
    from mysql_to_s3_spark.sources.warc import crawl_to_documents

    d = str(tmp_path / "warcs_c2d")
    os.makedirs(d)
    recs = [
        build_warc_record(
            build_http_response(b"<html><body><p>hello world</p></body></html>"),
            url="http://c.com/ok", date="2024-01-02T00:00:00Z",
        ),
        build_warc_record(
            build_http_response(b"gone", status=404),
            url="http://c.com/missing", date="2024-01-02T00:00:00Z",
        ),
    ]
    with open(os.path.join(d, "a.warc.gz"), "wb") as fh:
        fh.write(write_warc_gz(recs))
    docs = crawl_to_documents(spark, d)
    rows = docs.collect()
    assert len(rows) == 1  # 404 filtered by status window
    assert rows[0]["text"] == "hello world"
    assert set(docs.columns) == {"doc_id", "url", "warc_date", "text"}
    # doc_id is deterministic: a second read yields the identical id
    assert crawl_to_documents(spark, d).first()["doc_id"] == rows[0]["doc_id"]
    # and feeds prepare_corpus's url stage directly
    from mysql_to_s3_spark.pipeline import CorpusConfig, prepare_corpus

    prep = prepare_corpus(docs, CorpusConfig(url_col="url", exact=False))
    assert prep.docs.count() == 1


def test_crawl_front_end_composes(spark, tmp_path):
    """WARC -> documents -> html_to_text -> normalize_text -> the shape
    prepare_corpus consumes: the crawl-to-corpus composition."""
    d = str(tmp_path / "warcs3")
    os.makedirs(d)
    html = "<html><body><h1>Title</h1><p>doǵ park</p></body></html>"
    rec = build_warc_record(
        build_http_response(html.encode("utf-8")), url="http://c.com/1"
    )
    with open(os.path.join(d, "a.warc.gz"), "wb") as fh:
        fh.write(write_warc_gz([rec]))
    docs = warc_documents(spark, d).select(
        "url", normalize_text(html_to_text(F.col("text"))).alias("text")
    )
    row = docs.first()
    assert row["text"] == unicodedata.normalize("NFC", "Title doǵ park")
