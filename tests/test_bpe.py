"""BPE tokenizer tests: the incremental merge loop vs a naive reference,
the classic Sennrich example, encode/train consistency, and the
distributed train/encode path on a Spark corpus."""

import re

import pytest
from hypothesis import given, settings, strategies as st

from mysql_to_s3_spark.operators.bpe import (
    END_OF_WORD,
    BpeError,
    BpeModel,
    bpe_encode,
    bpe_token_count,
    bpe_train,
    bpe_train_counts,
    word_counts,
)
from mysql_to_s3_spark.operators.text import TOKEN_RE


# ---------------------------------------------------------------- reference
def _naive_train(pairs, n_merges):
    """Textbook BPE (Sennrich et al. 2016, alg. 1): full re-count of every
    pair each iteration. O(n_merges x table) — correct, slow, obvious."""
    words = [[*w[:-1], w[-1] + END_OF_WORD] for w, _ in pairs if w]
    counts = [int(n) for w, n in pairs if w]
    merges = []
    for _ in range(n_merges):
        pair_n = {}
        for syms, n in zip(words, counts):
            for p in zip(syms, syms[1:]):
                pair_n[p] = pair_n.get(p, 0) + n
        live = {p: n for p, n in pair_n.items() if n > 0}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        for i, syms in enumerate(words):
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return tuple(merges)


words_tables = st.lists(
    st.tuples(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=12,
).map(lambda rows: list({w: n for w, n in rows}.items()))


@settings(max_examples=60, deadline=None)
@given(words_tables, st.integers(min_value=1, max_value=25))
def test_train_counts_matches_naive_reference(pairs, n_merges):
    assert bpe_train_counts(pairs, n_merges) == _naive_train(pairs, n_merges)


def test_classic_sennrich_example():
    # the worked example from the paper: first merges build up "est</w>"
    pairs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_counts(pairs, 4)
    assert merges[0] == ("e", "s")  # 9 occurrences, beats ("l","o")=7
    assert merges[1] == ("es", "t" + END_OF_WORD)
    assert ("l", "o") in merges


def test_train_stops_when_exhausted():
    # one two-char word: only 1 merge possible no matter what we ask for
    assert len(bpe_train_counts([("ab", 3)], 100)) == 1


def test_encode_reproduces_training_segmentation():
    """Greedy lowest-rank encoding must reproduce the segmentation the
    training loop left for every training word (the classic BPE
    invariant — merges replay in rank order)."""
    pairs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("new", 1)]
    merges = bpe_train_counts(pairs, 8)
    model = BpeModel(merges=merges, coverage=1.0)
    # replay training manually to get final symbol tables
    words = {w: [*w[:-1], w[-1] + END_OF_WORD] for w, _ in pairs}
    for a, b in merges:
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == (a, b):
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    from mysql_to_s3_spark.operators.bpe import _encode_word

    for w, want in words.items():
        assert _encode_word(w, model.ranks()) == want, w


@settings(max_examples=40, deadline=None)
@given(words_tables, st.integers(min_value=1, max_value=20))
def test_encode_concatenates_back_to_word(pairs, n_merges):
    from mysql_to_s3_spark.operators.bpe import _encode_word

    model = BpeModel(merges=bpe_train_counts(pairs, n_merges), coverage=1.0)
    ranks = model.ranks()
    for w, _ in pairs:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + END_OF_WORD


# ---------------------------------------------------------------- spark path
CORPUS = [
    (1, "the lowest low is lower than the newest new"),
    (2, "newest widest lowest"),
    (3, "low low low new new widest"),
    (4, None),
]


def _corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_word_counts_matches_python(spark):
    got = {r["word"]: r["n"] for r in word_counts(_corpus_df(spark)).collect()}
    tok = re.compile(TOKEN_RE)
    want = {}
    for _, t in CORPUS:
        for w in tok.findall((t or "").lower()):
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_bpe_train_spark_matches_counts_train(spark):
    df = _corpus_df(spark)
    model = bpe_train(df, n_merges=10)
    assert model.coverage == 1.0
    rows = word_counts(df).collect()
    # bpe_train orders by (n desc, word asc); order must not matter for
    # the merge result because counts are what drive the loop
    table = sorted(((r["word"], r["n"]) for r in rows), key=lambda p: (-p[1], p[0]))
    assert model.merges == bpe_train_counts(table, 10)


def test_bpe_train_max_words_reports_coverage(spark):
    model = bpe_train(_corpus_df(spark), n_merges=5, max_words=2)
    assert 0.0 < model.coverage < 1.0


def test_bpe_train_rejects_bad_n_merges(spark):
    with pytest.raises(BpeError):
        bpe_train(_corpus_df(spark), n_merges=0)


def test_bpe_encode_and_token_count(spark):
    df = _corpus_df(spark)
    model = bpe_train(df, n_merges=15)
    enc = bpe_encode(df, model).select("doc_id", "bpe_tokens").collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in enc}
    assert by_id[4] is None
    tok = re.compile(TOKEN_RE)
    from mysql_to_s3_spark.operators.bpe import _encode_word

    ranks = model.ranks()
    for did, text in CORPUS:
        if text is None:
            continue
        want = []
        for w in tok.findall(text.lower()):
            want.extend(_encode_word(w, ranks))
        assert by_id[did] == want, did
    counts = bpe_token_count(df, model).select("doc_id", "n_bpe_tokens").collect()
    got_n = {r["doc_id"]: r["n_bpe_tokens"] for r in counts}
    for did, toks in by_id.items():
        if toks is not None:
            assert got_n[did] == len(toks)


def test_bpe_token_count_feeds_pack_sequences(spark):
    """The documented composition: bpe_token_count -> pack_sequences via
    n_tokens_col — packing budgets then reflect the MODEL tokenizer, and
    every seq's token total respects the budget."""
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.operators.packing import pack_assignments

    df = _corpus_df(spark).filter(F.col("text").isNotNull())
    model = bpe_train(df, n_merges=10)
    sized = bpe_token_count(df, model)
    packed = pack_assignments(
        sized, id_col="doc_id", n_tokens_col="n_bpe_tokens", budget=20, n_buckets=2
    )
    rows = packed.collect()
    by_id = {r["doc_id"]: r["n_bpe_tokens"] for r in sized.collect()}
    assert len(rows) == len(by_id)  # nothing dropped (all docs non-empty)
    for r in rows:
        # packing consumed the BPE length, not the regex token count
        assert r["n_tokens"] == by_id[r["doc_id"]]
        assert r["seq_no"] == r["start_off"] // 20
    # offset cursor is gap-free per bucket
    import collections

    per_bucket = collections.defaultdict(list)
    for r in rows:
        per_bucket[r["bucket"]].append(r)
    for rs in per_bucket.values():
        rs.sort(key=lambda r: r["start_off"])
        cursor = 0
        for r in rs:
            assert r["start_off"] == cursor
            cursor += r["n_tokens"]


def test_bpe_token_count_on_documents_table(spark, sf_dir):
    """End-to-end on the real documents table: counts are positive,
    bounded below by the char length / max-token-len heuristic being
    sane, and fewer merges => never fewer tokens."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    small = bpe_train(docs, n_merges=20, max_words=5000)
    big = BpeModel(merges=small.merges[:5], coverage=small.coverage)
    n_small = bpe_token_count(docs, small, out_col="n").select("doc_id", "n")
    n_big = bpe_token_count(docs, big, out_col="m").select("doc_id", "m")
    joined = n_small.join(n_big, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n"] >= 1
        assert r["m"] >= r["n"]  # fewer merges -> more (or equal) tokens


def test_model_save_load_roundtrip(tmp_path):
    model = BpeModel(
        merges=bpe_train_counts([("low", 5), ("newest", 6)], 6), coverage=0.97
    )
    p = str(tmp_path / "bpe.json")
    model.save(p)
    back = BpeModel.load(p)
    assert back == model
    assert back.ranks() == model.ranks()


def test_bpe_train_rejects_bad_max_words(spark):
    with pytest.raises(BpeError):
        bpe_train(_corpus_df(spark), n_merges=5, max_words=0)
