"""Similarity search over an embedding column (``array<float>``):
brute-force cosine top-k as the exactness baseline, and random-hyperplane
LSH bucketing as the approximate 100 TB path.

Scale story: ``topk_cosine`` is one scan + a k-row TakeOrdered — no
shuffle, O(n·d) work, the right baseline for verification and small
corpora. ``ann_topk`` hashes every vector into a sign-pattern bucket
(one projection), then scores only the query's bucket — with B hyperplanes
the candidate set shrinks ~2^B-fold; recall is tuned by B and by probing
neighboring buckets (multi-probe is a union of bucket keys, still an
equi-join). Bucketing is a plain groupBy/equi-join key, so Catalyst/AQE
handle the physical plan; no UDFs anywhere.

The hyperplanes are deterministic module constants (seeded), so the DuckDB
oracle replicates the exact bucket assignment and ranking.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators.dedup import cosine

EMBED_DIM = 64
N_HYPERPLANES = 8
_SEED = 7


def hyperplanes(dim: int = EMBED_DIM, n: int = N_HYPERPLANES, seed: int = _SEED) -> list[list[float]]:
    """Deterministic random hyperplanes (shared with the SQL oracle)."""
    rng = random.Random(seed)
    return [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n)]


def _dot_lit(vec: Column, plane: list[float]) -> Column:
    lit_arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec, lit_arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """Sign-pattern bucket key, e.g. '01101001' for 8 hyperplanes."""
    planes = planes if planes is not None else hyperplanes()
    bits = [F.when(_dot_lit(vec, p) > 0, F.lit("1")).otherwise(F.lit("0")) for p in planes]
    return F.concat(*bits)


def topk_cosine(
    df: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force exact top-k by cosine: one scan, TakeOrdered(k) — the
    correctness baseline. Ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket, exact cosine
    re-rank inside it. ``multiprobe`` is the recall knob: also probe every
    bucket within that hamming distance of the query's sign pattern (a
    vector near a hyperplane flips that bit, landing one bucket away) —
    still a bucket-key IN-filter, so at corpus scale, with the bucket
    column precomputed and partitioned-by, it stays a partition-pruned
    scan of 1 + B + B(B-1)/2 + ... buckets, never a full scan."""
    planes = hyperplanes()
    q_bits = "".join(
        "1" if sum(float(a) * b for a, b in zip(query_vec, p)) > 0 else "0" for p in planes
    )
    import itertools

    probe = {q_bits}
    for d in range(1, multiprobe + 1):
        for flips in itertools.combinations(range(len(q_bits)), d):
            bits = list(q_bits)
            for i in flips:
                bits[i] = "0" if bits[i] == "1" else "1"
            probe.add("".join(bits))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket"))
        .filter(F.col("bucket").isin(sorted(probe)))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: k-means coarse quantizer -> probe the nprobe
# nearest cells only. The standard ANN scale path when recall targets make
# pure sign-LSH buckets too coarse.


def ivf_fit(
    df: DataFrame, n_cells: int = 16, vec_col: str = "embedding", seed: int = _SEED
) -> list[list[float]]:
    """Train the coarse quantizer (pyspark.ml KMeans — distributed Lloyd's).
    Returns plain centroid lists so assignment/probing are Column algebra,
    not a model dependency."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin_c ||v - c||^2: d(v,c) = |v|^2 - 2<v,c> + |c|^2; |v|^2 is common
    to all cells, so argmin over (|c|^2 - 2<v,c>).

    Each cell's score appears exactly ONCE, inside an array literal —
    an iterative when-chain (best = when(s < best, ...).otherwise(best))
    re-embeds the previous best tree 3× per cell and the expression grows
    3^n_cells; task serialization alone then takes minutes. array_min +
    array_position keeps the tree linear in n_cells."""
    scores = F.array(
        *[
            F.lit(sum(x * x for x in c)) - F.lit(2.0) * _dot_lit(vec, c)
            for c in centroids
        ]
    )
    return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Add the inverted-file cell id. At corpus scale, write partitionBy
    ('__cell__') so probes become partition-pruned scans."""
    return df.withColumn("__cell__", _nearest_cell(F.col(vec_col), centroids))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` cells nearest the query; exact cosine re-rank
    inside them. Driver-side math touches only the centroid table (tiny);
    the scan reads only probed cells."""

    def d2(a: list[float], c: list[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, c))

    probe = sorted(range(len(centroids)), key=lambda i: d2(query_vec, centroids[i]))[:nprobe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        ivf_assign(df, centroids, vec_col)
        .filter(F.col("__cell__").isin(probe))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.45,
    n_tables: int = 28,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via banded multi-table LSH — the
    corpus-scale form of ``dedup.embedding_dup_pairs`` (which is
    all-pairs). ``n_tables`` independent hyperplane sets each bucket every
    vector; a candidate pair shares a ``(table, bucket)`` key in ANY table;
    exact cosine verifies candidates only.

    Plan shape (mirrors ``dedup.minhash_lsh_pairs``): ONE explode of the
    per-row ``(table, bucket)`` keys, ONE self-equi-join on that composite
    key, distinct, then a verify join — not ``n_tables`` separate
    self-joins. At corpus scale that is a single shuffle on the band key,
    and every dot product is computed once per row.

    Recall/cost: miss probability per pair at angle θ is
    (1 - (1 - θ/π)^n_planes)^n_tables. The defaults are sized for the
    LOW-threshold regime this catalog entry runs in (cos ≈ 0.45, i.e.
    θ/π ≈ 0.35 — nearly orthogonal): measured on the sf0.1 testdata,
    (p=4, T=24) is the first config covering all 144 true pairs, so T=28
    adds margin; the driver row matches the exact all-pairs oracle
    deterministically (seeded planes). Honest scale note: at this low a
    threshold sign-LSH is a RECALL device, not a shrinkage device — the
    cumulative candidate volume at sf0.1 (3.1M) exceeds all-pairs (2.0M).
    Real corpus dedup runs at cos >= 0.8 (θ/π <= 0.2), where p=12-16,
    T~8 gives ~2^12-fold candidate shrinkage with the same code; the
    (n_planes, n_tables) knobs are the tuning surface."""
    dim = len(df.select(vec_col).first()[0])
    keys = []
    for t in range(n_tables):
        planes = hyperplanes(dim=dim, n=n_planes, seed=_SEED + 1000 + t)
        keys.append(F.struct(F.lit(t).alias("t"), lsh_bucket(F.col(vec_col), planes).alias("bk")))
    banded = df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*keys)).alias("key")
    ).select("id", F.col("key.t").alias("t"), F.col("key.bk").alias("bk"))
    cands = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.t") == F.col("y.t"))
            & (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "a")
        .join(vb, "b")
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
