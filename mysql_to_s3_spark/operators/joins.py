"""As-of join: match each probe row with the latest quote row at or
before its timestamp, per key — the temporal-alignment primitive
(trades->quotes, events->latest-profile, metrics->config-at-time) that
Spark has no built-in operator for.

Spark-first design — the UNION + last-non-null WINDOW form, not a
pandas ``merge_asof`` cogroup: tag both inputs, union them, and run ONE
window ``last(value, ignoreNulls=True)`` ordered by (ts, side) within
each key — every probe row then carries the most recent preceding
quote. This is a single hash shuffle on the key (the window exchange),
whole-stage-codegen throughout, no Python workers, and it inherits
Spark's spillable window buffer, so a hot key degrades to disk instead
of OOM. A ``mapInPandas``/cogroup implementation by contrast pays
Arrow transfer for both inputs plus a per-key pandas merge and cannot
spill. Cost note: the union doubles the windowed row count — still
O(|probe| + |quote|) through one exchange, the same asymptotics as a
sort-merge interval join but with no join explosion risk.

Oracle: DuckDB's native ``ASOF JOIN`` (tested side by side in
tests/test_joins.py).

Reference parity: no analog (beyond-reference operator, SURVEY §2
item 8 family; the reference's JX has no temporal join of any kind).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


class JoinError(ValueError):
    pass


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    by: list[str],
    value_cols: list[str],
    probe_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    granularity_secs: int = 3600,
) -> DataFrame:
    """Point-in-interval join: every (probe row, interval) pair with the
    same ``by`` key and ``start <= probe_ts <= end`` (inclusive) — as a
    bucketized EQUI-join, never a range cross join.

    Mechanics: each interval explodes to the fixed-width time buckets it
    overlaps (``explode(sequence(floor(start/g), floor(end/g)))`` — the
    same trick as the JX range-span edge); each probe row maps to its
    single bucket; the join is a plain hash equi-join on
    (by..., bucket) with the exact range predicate refining inside the
    join. A probe row occupies exactly ONE bucket, so no post-join
    dedup is needed.

    Scale: blowup is bounded by interval_span / granularity — pick
    ``granularity_secs`` near the TYPICAL interval length so most
    intervals land in 1-2 buckets; a pathological mega-interval costs
    span/g join rows (visible, tunable), where the naive
    ``t1.key = t2.key AND ts BETWEEN ...`` plan degenerates to a
    per-key cross product.
    """
    if not by:
        raise JoinError("interval_join requires at least one `by` key")
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise JoinError(f"value_cols collide with probe columns: {sorted(clash)}")
    g = int(granularity_secs)
    if g <= 0:
        raise JoinError("granularity_secs must be positive")
    b_start = F.floor(F.unix_timestamp(F.col(start_col)) / g)
    b_end = F.floor(F.unix_timestamp(F.col(end_col)) / g)
    iv = intervals.select(
        *[F.col(c).alias(f"__i_{c}__") for c in by],
        F.col(start_col).alias("__start__"),
        F.col(end_col).alias("__end__"),
        *[F.col(c) for c in value_cols],
        F.explode(F.sequence(b_start, b_end)).alias("__bucket__"),
    )
    p = probe.withColumn(
        "__bucket__", F.floor(F.unix_timestamp(F.col(probe_ts)) / g)
    )
    cond = None
    for c in by:
        eq = F.col(c) == F.col(f"__i_{c}__")
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (p["__bucket__"] == iv["__bucket__"])
        & (F.col(probe_ts) >= F.col("__start__"))
        & (F.col(probe_ts) <= F.col("__end__"))
    )
    return p.join(iv, cond, "inner").select(*probe.columns, *value_cols)


def asof_join(
    probe: DataFrame,
    quote: DataFrame,
    by: list[str],
    value_cols: list[str],
    probe_ts: str = "ts",
    quote_ts: str = "ts",
    tolerance: str | None = None,
    allow_exact_matches: bool = True,
    quote_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join (backward): every probe row, plus ``value_cols``
    from the latest quote row with ``quote_ts <= probe_ts`` (strictly
    ``<`` when ``allow_exact_matches=False``) and the same ``by`` key;
    null when no quote precedes.

    ``tolerance`` (an INTERVAL literal like ``'2 hours'``) nulls out
    matches older than ``probe_ts - tolerance`` — the pandas
    ``merge_asof`` contract. ``quote_tiebreak`` makes the winner among
    equal-timestamp quotes deterministic (highest tiebreak wins);
    without it, ties follow window order within the key.

    ``by`` must be non-empty: a keyless as-of is a single global window
    task — at scale, bucket time first (edges time domain) or add a key.
    """
    if not by:
        raise JoinError("asof_join requires at least one `by` key (a keyless "
                        "as-of join is one global window task)")
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise JoinError(f"value_cols collide with probe columns: {sorted(clash)}")
    if "__asof_ts__" in value_cols:
        raise JoinError("__asof_ts__ is reserved")
    missing = {*by, *value_cols, quote_ts} - set(quote.columns)
    if missing:
        raise JoinError(f"quote side lacks columns: {sorted(missing)}")

    probe_cols = probe.columns
    # SQL join semantics for NULLs: a NULL key or NULL timestamp never
    # matches (DuckDB ASOF JOIN parity). Quote rows with either are
    # unmatchable — drop them BEFORE the union; a NULL-keyed probe row
    # then shares its partition with no quotes and correctly yields NULL
    # (without this, nulls-first ordering would hand every such probe the
    # NULL row's values: the struct wrapper is non-null, so
    # last(ignoreNulls) does not skip it).
    null_free = F.lit(True)
    for c in [*by, quote_ts]:
        null_free = null_free & F.col(c).isNotNull()
    quote = quote.filter(null_free)
    # side ordering at equal timestamps decides exact-match semantics:
    # quote BEFORE probe (0 < 1) -> a quote at exactly probe_ts is
    # visible; probe first (-1) -> it is not
    quote_side, probe_side = (0, 1) if allow_exact_matches else (1, 0)
    tb = (
        F.col(quote_tiebreak)
        if quote_tiebreak is not None
        else F.lit(0)
    )
    q = quote.select(
        *[F.col(c) for c in by],
        F.col(quote_ts).alias("__t__"),
        F.lit(quote_side).alias("__side__"),
        tb.alias("__tb__"),
        F.struct(
            F.col(quote_ts).alias("__asof_ts__"),
            *[F.col(c) for c in value_cols],
        ).alias("__q__"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}__") for c in probe_cols],
    )
    p = probe.select(
        *[F.col(c) for c in by],
        F.col(probe_ts).alias("__t__"),
        F.lit(probe_side).alias("__side__"),
        # tb only breaks ties BETWEEN quotes (same key, ts, side); probe
        # rows carry a typed null so unionByName lines up for any tb type
        F.lit(None).cast(q.schema["__tb__"].dataType).alias("__tb__"),
        F.lit(None).cast(q.schema["__q__"].dataType).alias("__q__"),
        *[F.col(c).alias(f"__p_{c}__") for c in probe_cols],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t__").asc(), F.col("__side__").asc(), F.col("__tb__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__q__"), True).over(w)
    is_probe = F.col("__side__") == probe_side
    out = q.unionByName(p).select(
        *[F.col(f"__p_{c}__").alias(c) for c in probe_cols],
        F.when(is_probe, matched).alias("__m__"),
        F.col("__side__"),
        F.col("__t__"),
    ).filter(F.col("__side__") == probe_side)
    m: Column = F.col("__m__")
    if tolerance is not None:
        m = F.when(
            F.col("__m__.__asof_ts__") >= F.col("__t__") - F.expr(f"INTERVAL {tolerance}"),
            F.col("__m__"),
        )
    return out.select(
        *probe_cols,
        *[m.getField(c).alias(c) for c in value_cols],
    )
