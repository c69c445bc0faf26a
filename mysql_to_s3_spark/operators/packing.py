"""Document chunking and token-budget sequence packing.

Training pipelines cut documents into fixed-token-window chunks (with
overlap, for pretraining / RAG indexing) and then pack variable-length
pieces into fixed-budget training sequences so attention matrices stay
dense. Both are deterministic, engine-portable transforms here:

- ``chunk_documents``: per-doc sliding token windows — pure Column
  algebra (regexp tokenize -> explode(sequence) of window starts ->
  slice), no shuffle, linear in corpus token count.
- ``pack_sequences``: deterministic *offset packing*. Each doc gets a
  content-stable bucket (portable md5, see sampling.hash_bucket); within
  a bucket docs are totally ordered (n_tokens DESC, id ASC — FFD-style
  big-first ordering) and a running token offset assigns each doc to
  sequence ``floor(start_offset / budget)``. Documents are never split:
  a doc that straddles a budget boundary belongs to the sequence it
  starts in (bounded overflow <= max doc length; oversized docs simply
  span their own sequences). This is the classic greedy next-fit
  packing, made shuffle-friendly and *exactly* reproducible in ANSI SQL
  (SUM() OVER a total order) — unlike first-fit bin packing, which needs
  a sequential scan with state.

100 TB story: chunking is per-row codegen (no exchange). Packing is ONE
hash exchange on the bucket key + a per-bucket local sort (Spark window)
+ a partially-aggregated per-sequence rollup; bucket count scales with
input size so each bucket's sort stays executor-local, and skew is
impossible by construction (buckets are uniform md5 slots, not data
keys).

Reference parity: no analog (beyond-reference pipeline operator,
SURVEY §6); tokenization shared with operators/text.py:39.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.sampling import SPLIT_BUCKETS, hash_bucket
from mysql_to_s3_spark.operators.text import TOKEN_RE, token_count, tokens


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Sliding token windows per document.

    Window ``i`` starts at token offset ``1 + i*stride`` with
    ``stride = max_tokens - overlap``; every start <= n_tokens emits a
    chunk (the final chunk may be short). Empty documents emit nothing.
    Output: (id, chunk_idx, n_tokens, content_hash, chunk_text) where
    content_hash = md5 of the space-rejoined token window — a compact,
    engine-portable witness of the exact chunk content.
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap {overlap} must be < max_tokens {max_tokens}")
    stride = max_tokens - overlap
    toks = tokens(F.col(text_col))
    out = (
        df.select(F.col(id_col), toks.alias("__toks__"))
        .filter(F.size("__toks__") > 0)
        .select(
            id_col,
            "__toks__",
            F.explode(F.sequence(F.lit(1), F.size("__toks__"), F.lit(stride))).alias("__s__"),
        )
        .select(
            id_col,
            ((F.col("__s__") - 1) / stride).cast("bigint").alias("chunk_idx"),
            F.slice(F.col("__toks__"), F.col("__s__"), F.lit(max_tokens)).alias("__w__"),
        )
    )
    chunk_text = F.array_join(F.col("__w__"), " ")
    return out.select(
        id_col,
        "chunk_idx",
        F.size("__w__").cast("bigint").alias("n_tokens"),
        F.md5(chunk_text).alias("content_hash"),
        chunk_text.alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 8,
) -> str:
    """DuckDB SQL producing identical (id, chunk_idx, n_tokens,
    content_hash) rows — the oracle for ``chunk_documents``."""
    stride = max_tokens - overlap
    return f"""
      WITH toks AS (
        SELECT {id_col}, regexp_extract_all({text_col}, '{TOKEN_RE}') AS t
        FROM {table} WHERE len(regexp_extract_all({text_col}, '{TOKEN_RE}')) > 0),
      starts AS (
        SELECT {id_col}, t, unnest(range(1, len(t) + 1, {stride})) AS s FROM toks)
      SELECT {id_col},
             CAST((s - 1) / {stride} AS BIGINT) AS chunk_idx,
             CAST(len(list_slice(t, s, s + {max_tokens} - 1)) AS BIGINT) AS n_tokens,
             md5(array_to_string(list_slice(t, s, s + {max_tokens} - 1), ' ')) AS content_hash
      FROM starts"""


def pack_assignments(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    budget: int = 2048,
    n_buckets: int = 32,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document sequence assignment (bucket, seq_no, start_off).

    ``id_col`` values must be UNIQUE: the per-bucket offset window
    orders by (n_tokens DESC, id ASC), and duplicate ids tie in that
    order — the default RANGE frame then hands every copy the SAME
    start_off, aliasing them onto one sequence slot. Upsampled corpora
    (``sampling.repeat_epochs``) must pack under a composite id, e.g.
    ``concat(id, '#', epoch_copy)``.

    ``n_tokens_col`` lets callers pass a precomputed length column;
    otherwise lengths come from tokenizing ``text_col``. Zero-token
    docs are dropped (they carry no training signal and would alias
    onto whatever sequence the offset cursor is at).

    ``keep_cols`` are carried through the bucket exchange so a consumer
    that needs the payload (e.g. the shard writer) avoids a second
    join-back shuffle on the id — the ONE window exchange then moves
    full rows instead of the slim (id, n_tokens, bucket) frame, which is
    still strictly cheaper than exchanging the slim frame AND re-joining
    the payload by id.
    """
    # the output schema owns these names; a keep_col (or id_col) that
    # collides would produce duplicate/ambiguous columns and silently
    # corrupt downstream shard output — fail clearly instead (the
    # __rn__ guard contract from sampling.sample_per_key)
    reserved = {"n_tokens", "bucket", "seq_no", "start_off"}
    clash = (set(keep_cols) | {id_col}) & reserved
    if clash:
        raise ValueError(
            f"keep_cols/id_col collide with pack_assignments output "
            f"columns {sorted(clash)}; rename them before packing"
        )
    if id_col in keep_cols:
        raise ValueError(f"id_col {id_col!r} must not be repeated in keep_cols")
    n = F.col(n_tokens_col) if n_tokens_col else token_count(F.col(text_col))
    base = (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            n.cast("bigint").alias("n_tokens"),
            (hash_bucket(F.col(id_col)) % n_buckets).alias("bucket"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = Window.partitionBy("bucket").orderBy(F.col("n_tokens").desc(), F.col(id_col).asc())
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off")
    return base.select(
        id_col,
        *keep_cols,
        "n_tokens",
        "bucket",
        start,
        (F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget))
        .cast("bigint")
        .alias("seq_no"),
    )


def pack_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    budget: int = 2048,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-sequence rollup: (bucket, seq_no, n_docs, tokens_total,
    fill_frac). ``fill_frac`` caps at 1.0 — a straddling final doc
    overfills its sequence by design (docs are never split)."""
    a = pack_assignments(
        df,
        id_col=id_col,
        text_col=text_col,
        n_tokens_col=n_tokens_col,
        budget=budget,
        n_buckets=n_buckets,
    )
    return a.groupBy("bucket", "seq_no").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.round(
            F.least(F.sum("n_tokens") / F.lit(float(budget)), F.lit(1.0)), 6
        ).alias("fill_frac"),
    )


def pack_stats_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 32,
) -> str:
    """DuckDB SQL producing identical per-sequence rollups — the oracle
    for ``pack_stats`` (same portable md5 bucket as sampling.py)."""
    bucket = (
        f"((('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::BIGINT"
        f" % {SPLIT_BUCKETS}) % {n_buckets})"
    )
    return f"""
      WITH lens AS (
        SELECT {id_col},
               CAST(len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
               {bucket} AS bucket
        FROM {table}
        WHERE len(regexp_extract_all({text_col}, '{TOKEN_RE}')) > 0),
      offs AS (
        SELECT bucket, n_tokens,
               CAST(floor((SUM(n_tokens) OVER (PARTITION BY bucket
                      ORDER BY n_tokens DESC, {id_col} ASC) - n_tokens)
                    / {budget}) AS BIGINT) AS seq_no
        FROM lens)
      SELECT bucket, seq_no,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
             round(least(sum(n_tokens) / {budget}.0, 1.0), 6) AS fill_frac
      FROM offs GROUP BY 1, 2"""
