"""Corpus-fit n-gram language-model scoring — the CCNet-style
perplexity filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020) as a Spark-first
operator pair: fit token statistics over a (reference) corpus, then
score every document's mean per-token log-probability. Low-probability
docs (high perplexity) are boilerplate/gibberish candidates; the score
column slots into the same quality-gate position `quality_score` uses.

Production CCNet uses a pretrained 5-gram KenLM; this module fits its
model FROM a corpus so the whole path is self-contained and exactly
reproducible by the DuckDB oracle (the driver's `text_quality` row
carries the score as a hard-verified leg). The Spark-side plumbing —
fit shuffle, broadcast scoring, Arrow batch shape — is identical for a
pretrained model: load its table into `counts` (or its python dict into
the broadcast) and skip the fit.

Scale design (100 TB):

- ``unigram_counts`` (the fit) is ONE shuffle over the token stream
  with map-side partial aggregation — the same cost profile as a word
  count. ``vocab_size`` caps the model deterministically (count desc,
  token asc) so the scoring side stays memory-bounded no matter the
  corpus; out-of-vocabulary tokens get the add-alpha floor.
- ``unigram_logprob(mode="join")`` explodes tokens and BROADCAST-joins
  the counts, then one hash re-agg per doc: one shuffle over the token
  stream, all JVM/codegen. The smoothing denominator rides a
  broadcast single-row stats frame (crossJoin) so building the plan
  triggers NO job — the module stays lazy end to end.
- ``unigram_logprob(mode="arrow")`` is the big-corpus path: the counts
  collapse to one broadcast dict (bounded by ``vocab_size``) and
  scoring is a zero-shuffle Arrow ``pandas_udf`` over the text column
  — per-token lookups never touch a shuffle, the per-executor cost is
  the dict (once) plus the batch. The per-doc mean is a numpy
  reduction per the dense-kernel discipline (SCALE.md "Quantizer
  scoring"). This mode collects the counts (one job) at plan-build.

Both modes compute the identical add-alpha model: with V = vocab rows
and T = total token occurrences in ``counts``,

    logp(w) = log2((n_w + alpha) / (T + alpha * (V + 1)))   in-vocab
    logp(w) = log2(alpha / (T + alpha * (V + 1)))           OOV

and a doc's score is the MEAN logp over its tokens (null for docs with
no tokens — callers decide whether token-free docs pass a gate).
Tokenization is the module-wide ``TOKEN_RE`` applied to lowercased
text; the Arrow path pins ``re.ASCII`` so Python's ``\\w`` agrees with
the JVM's and RE2's ASCII word classes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from mysql_to_s3_spark.operators.text import TOKEN_RE, tokens


class LmError(ValueError):
    pass


def _doc_tokens(text: Column) -> Column:
    return tokens(F.lower(text))


def unigram_counts(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
) -> DataFrame:
    """(token, n) occurrence counts over the corpus — the LM fit.

    ``vocab_size`` keeps the top-V tokens with a DETERMINISTIC tiebreak
    (count desc, token asc): at web scale the full vocabulary is
    unbounded (typos, ids, numbers) while the top-V carries virtually
    all probability mass; capped rows are later scored through the
    OOV floor, never silently dropped."""
    cnt = (
        docs.select(F.explode(_doc_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if vocab_size is not None:
        if vocab_size <= 0:
            raise LmError("vocab_size must be positive")
        # single-task global rank is fine: the FIT output is already the
        # aggregated vocabulary (|V| rows, not the token stream) and the
        # cap exists precisely to keep that small
        w = F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("token").asc()))
        cnt = cnt.withColumn("__r__", w).filter(F.col("__r__") <= vocab_size).drop("__r__")
    return cnt


def unigram_logprob(
    docs: DataFrame,
    counts: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    mode: str = "join",
    out_col: str = "lm_logprob",
) -> DataFrame:
    """(id_col, out_col): mean per-token log2-probability per document
    under the add-alpha unigram model in ``counts`` (default: fit on
    ``docs`` itself — the self-scoring configuration the driver row
    verifies). Token-free docs score null.

    ``mode="join"``: exact JVM path (explode -> broadcast join ->
    per-doc agg), fully lazy. ``mode="arrow"``: zero-shuffle broadcast-
    dict path for web-scale corpora; collects ``counts`` at build time
    (bound it with ``unigram_counts(vocab_size=...)``)."""
    if alpha <= 0:
        raise LmError("alpha must be positive (it is the OOV probability floor)")
    if counts is None:
        counts = unigram_counts(docs, text_col)
    if mode == "join":
        stats = counts.agg(
            F.sum("n").cast("double").alias("__tot__"),
            F.count(F.lit(1)).cast("double").alias("__v__"),
        )
        toks = docs.select(
            F.col(id_col), F.explode(_doc_tokens(F.col(text_col))).alias("token")
        )
        denom = F.col("__tot__") + F.lit(alpha) * (F.col("__v__") + 1)
        scored = (
            toks.join(F.broadcast(counts), "token", "left")
            .crossJoin(F.broadcast(stats))
            .groupBy(id_col)
            .agg(
                F.avg(
                    F.log2((F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha)) / denom)
                ).alias(out_col)
            )
        )
        return docs.select(id_col).join(scored, id_col, "left")
    if mode == "arrow":
        import math
        import re

        # module-level pandas import would make every lm import pay the
        # pandas startup; the UDF type-hint resolution instead needs pd
        # visible in the function's globals at decoration time
        global pd
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        rows = counts.collect()
        total = float(sum(r.n for r in rows))
        v = float(len(rows))
        denom = total + alpha * (v + 1)
        lut = {r.token: math.log2((r.n + alpha) / denom) for r in rows}
        oov = math.log2(alpha / denom)
        bc = docs.sparkSession.sparkContext.broadcast((lut, oov))
        # re.ASCII: Python's unicode \w would tokenize non-ASCII text
        # differently from the JVM/RE2 ASCII word class the join mode
        # and the DuckDB oracle use
        tok_re = re.compile(TOKEN_RE, re.ASCII)

        @pandas_udf("double")
        def _score(s: pd.Series) -> pd.Series:
            lut_, oov_ = bc.value

            def one(txt):
                if txt is None:
                    return None
                tl = tok_re.findall(txt.lower())
                if not tl:
                    return None
                return float(sum(lut_.get(t, oov_) for t in tl) / len(tl))

            return s.map(one)

        return docs.select(F.col(id_col), _score(F.col(text_col)).alias(out_col))
    raise LmError(f"unknown mode {mode!r}; expected 'join' or 'arrow'")
