"""Unigram-LM perplexity scoring (operators/lm.py) — hand-computed
model values, join-vs-arrow mode agreement, OOV floor, vocab cap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.lm import (
    LmError,
    unigram_counts,
    unigram_logprob,
)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "c!"), (3, ""), (4, None)],
        "doc_id: long, text: string",
    )


def test_hand_computed_model(spark, tiny):
    # tokens (lowered): doc1 [a,a,b], doc2 [c,!]; counts a:2 b:1 c:1 !:1
    # T=5, V=4, alpha=1 -> denom = 5 + 1*(4+1) = 10
    lp = {"a": math.log2(3 / 10), "b": math.log2(2 / 10),
          "c": math.log2(2 / 10), "!": math.log2(2 / 10)}
    want = {
        1: (2 * lp["a"] + lp["b"]) / 3,
        2: (lp["c"] + lp["!"]) / 2,
        3: None,
        4: None,
    }
    for mode in ("join", "arrow"):
        got = {
            r.doc_id: r.lm_logprob
            for r in unigram_logprob(tiny, mode=mode).collect()
        }
        assert set(got) == set(want)
        for k, v in want.items():
            if v is None:
                assert got[k] is None, (mode, k)
            else:
                assert got[k] == pytest.approx(v, abs=1e-12), (mode, k)


def test_modes_agree_on_corpus(spark, sf_dir):
    from mysql_to_s3_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300).select("doc_id", "text")
    j = {r.doc_id: r.lm_logprob for r in unigram_logprob(docs, mode="join").collect()}
    a = {r.doc_id: r.lm_logprob for r in unigram_logprob(docs, mode="arrow").collect()}
    assert set(j) == set(a) and j
    for k in j:
        if j[k] is None:
            assert a[k] is None
        else:
            assert a[k] == pytest.approx(j[k], rel=1e-9), k


def test_oov_floor_and_cross_corpus(spark):
    ref = spark.createDataFrame([(1, "a a a b")], "doc_id: long, text: string")
    cnt = unigram_counts(ref)  # a:3 b:1 -> T=4 V=2 denom = 4 + 3 = 7
    target = spark.createDataFrame([(9, "z z")], "doc_id: long, text: string")
    floor = math.log2(1 / 7)
    for mode in ("join", "arrow"):
        got = unigram_logprob(target, cnt, mode=mode).collect()[0].lm_logprob
        assert got == pytest.approx(floor, abs=1e-12), mode


def test_vocab_cap_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "x x y y z w")], "doc_id: long, text: string"
    )
    top = unigram_counts(docs, vocab_size=3).collect()
    # counts: x:2 y:2 z:1 w:1 -> cap=3 keeps x,y then 'w' beats 'z' on
    # the token-asc tiebreak
    assert {(r.token, r.n) for r in top} == {("x", 2), ("y", 2), ("w", 1)}


def test_bad_args(spark, tiny):
    with pytest.raises(LmError):
        unigram_counts(tiny, vocab_size=0)
    with pytest.raises(LmError):
        unigram_logprob(tiny, alpha=0.0)
    with pytest.raises(LmError):
        unigram_logprob(tiny, mode="nope")
