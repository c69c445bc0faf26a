"""Byte-pair-encoding tokenizer: distributed corpus statistics, compact
driver-side merge training, distributed Arrow encoding.

The reference pipeline only ever counts whitespace-ish tokens
(`/root/reference` has no tokenizer at all); a training-data engine
needs the real thing — sizing documents in model tokens, budgeting
packed sequences, pricing a corpus in tokens-per-dollar all depend on
the tokenizer the model will use. This module implements classic BPE
(Sennrich et al. 2016, arXiv:1508.07909) with the standard
industrial-scale split:

- **Corpus pass is distributed and runs ONCE**: tokenize -> explode ->
  groupBy word (`word_counts`) — one shuffle over the full corpus.
- **The merge loop trains on the AGGREGATED (word, n) table**, whose
  size follows vocabulary growth (~Heaps' law), not corpus size — at
  100 TB the top `max_words` words still cover ~all token mass, and the
  dropped tail's share is returned as `coverage` (never silently
  truncated). The loop is driver-side BY DESIGN: it is inherently
  sequential (merge i+1 depends on merge i) and its input is
  corpus-size-independent; a per-merge distributed job would be ~10⁴
  shuffles for zero added fidelity.
- **Encoding is distributed**: the merge table broadcasts as a rank
  dict; `bpe_encode` applies it per word inside an Arrow `pandas_udf`
  with a per-batch word cache (Zipf makes the cache hit rate ~99%).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from mysql_to_s3_spark.operators.text import TOKEN_RE

END_OF_WORD = "</w>"


class BpeError(ValueError):
    """Raised on invalid BPE training/encoding inputs."""


def _active_session():
    from pyspark.sql import SparkSession

    try:
        return SparkSession.getActiveSession()
    except Exception:
        return None


@dataclass(frozen=True)
class BpeModel:
    """Ordered merge list + the token-mass fraction the training table
    covered (1.0 unless ``max_words`` truncated the tail)."""

    merges: tuple[tuple[str, str], ...]
    coverage: float

    def ranks(self) -> dict[tuple[str, str], int]:
        return {m: i for i, m in enumerate(self.merges)}

    def vocab(self) -> set[str]:
        """Every symbol the merge list can produce (plus implied chars
        is unbounded — this is the MERGED symbol set)."""
        return {a + b for a, b in self.merges}

    def save(self, path: str) -> None:
        """One JSON file: the ordered merge list IS the model. Goes
        through the Hadoop FileSystem API when a Spark session is
        active (s3a://... works); plain local I/O otherwise."""
        import json

        payload = json.dumps(
            {"merges": [list(m) for m in self.merges], "coverage": self.coverage}
        )
        spark = _active_session()
        if spark is not None:
            from mysql_to_s3_spark.functions.fsio import write_text

            write_text(spark, path, payload)
        else:
            with open(path, "w") as f:
                f.write(payload)

    @staticmethod
    def load(path: str) -> "BpeModel":
        import json

        spark = _active_session()
        if spark is not None:
            from mysql_to_s3_spark.functions.fsio import read_text

            raw = read_text(spark, path)
        else:
            with open(path) as f:
                raw = f.read()
        d = json.loads(raw)
        return BpeModel(
            merges=tuple((a, b) for a, b in d["merges"]),
            coverage=float(d["coverage"]),
        )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the one distributed pass BPE needs.
    Lower-cased to match the engine's other text fingerprints; one
    explode + one hash shuffle, partial-aggregated map-side."""
    w = F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0))
    return df.select(w.alias("word")).groupBy("word").agg(F.count("*").alias("n"))


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END_OF_WORD,)


def bpe_train_counts(
    pairs: list[tuple[str, int]], n_merges: int
) -> tuple[tuple[str, str], ...]:
    """Classic BPE merge loop over a (word, count) table. Deterministic:
    the next merge is the pair with the highest weighted count, ties to
    the lexicographically smallest pair. Incremental pair-count updates
    (only words containing the merged pair are re-scanned), so the loop
    is O(n_merges x affected-words), not O(n_merges x table)."""
    words: list[list[str]] = [list(_word_symbols(w)) for w, _ in pairs if w]
    counts: list[int] = [int(n) for w, n in pairs if w]
    pair_n: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def scan(idx: int, sign: int) -> None:
        syms, n = words[idx], counts[idx]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_n[p] = pair_n.get(p, 0) + sign * n
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)

    for i in range(len(words)):
        scan(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best: tuple[str, str] | None = None
        best_n = 0
        for p, n in pair_n.items():
            if n > best_n or (n == best_n and n > 0 and (best is None or p < best)):
                best, best_n = p, n
        if best is None or best_n <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            syms = words[idx]
            scan(idx, -1)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[idx] = out
            scan(idx, +1)
        # fully-consumed pairs would otherwise win again on stale zeros
        pair_n = {p: n for p, n in pair_n.items() if n > 0}
        pair_words = {p: s for p, s in pair_words.items() if p in pair_n}
    return tuple(merges)


def bpe_train(
    df: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> BpeModel:
    """Train BPE merges on a corpus: one distributed word-count pass,
    then the driver-side merge loop over the top ``max_words`` words by
    mass (count desc, word asc — deterministic). ``coverage`` reports
    the kept fraction of total token mass; raise ``max_words`` if it is
    too far below 1.0 (the cap is visible, never silent)."""
    if n_merges < 1:
        raise BpeError(f"n_merges must be >= 1, got {n_merges}")
    if max_words < 1:
        raise BpeError(f"max_words must be >= 1, got {max_words}")
    wc = word_counts(df, text_col=text_col)
    top = wc.orderBy(F.col("n").desc(), F.col("word")).limit(int(max_words)).collect()
    total = wc.agg(F.sum("n")).first()[0] or 0
    kept = sum(r["n"] for r in top)
    coverage = (kept / total) if total else 1.0
    merges = bpe_train_counts([(r["word"], r["n"]) for r in top], n_merges)
    return BpeModel(merges=merges, coverage=coverage)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_at = -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_at = r, j
        if best_rank is None:
            break
        # merge EVERY occurrence of the winning pair (training merged
        # all occurrences in one step, so encoding must too)
        pair = (syms[best_at], syms[best_at + 1])
        merged = pair[0] + pair[1]
        out: list[str] = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col`` (array<string>): the BPE token stream of
    ``text_col``. Distributed: merges ride the closure as a rank dict
    (~n_merges entries — broadcast-sized by construction); per-batch
    word cache exploits Zipf; Arrow-batched, never per-row Python."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = model.ranks()
    # re.ASCII: training tokenizes JVM-side (regexp_extract_all, ASCII
    # word class); Python's unicode \w would tokenize non-ASCII text
    # differently from the model's own corpus pass (the lm.py seam rule)
    tok = re.compile(TOKEN_RE, re.ASCII)

    @pandas_udf("array<string>")
    def enc(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in tok.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return pd.Series([one(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Model-tokenizer document sizing: ``out_col`` = BPE token count.
    The number packing/budgeting should use when the training tokenizer
    is known (regex ``token_count`` is the tokenizer-free proxy)."""
    tmp = "__bpe_tmp__"
    out = bpe_encode(df, model, text_col=text_col, out_col=tmp)
    return out.withColumn(out_col, F.size(F.col(tmp))).drop(tmp)
