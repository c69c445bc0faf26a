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
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: every (probe row, interval) pair with the
    same ``by`` key and ``start <= probe_ts <= end`` (inclusive) — as a
    bucketized EQUI-join, never a range cross join. ``how="left"`` keeps
    probe rows contained in NO interval with null ``value_cols`` — safe
    here precisely because a probe row occupies exactly ONE bucket, so
    the outer side never fans out from the bucketing itself.

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
    if how not in ("inner", "left"):
        raise JoinError(f"how must be inner|left, got {how!r}")
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
    return p.join(iv, cond, how).select(*probe.columns, *value_cols)


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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every probe row, plus ``value_cols`` from the
    as-of quote row with the same ``by`` key — the full pandas
    ``merge_asof`` direction contract:

    - ``backward`` (default): the LATEST quote with ``quote_ts <=
      probe_ts`` (strictly ``<`` when ``allow_exact_matches=False``);
    - ``forward``: the EARLIEST quote with ``quote_ts >= probe_ts``
      (strictly ``>`` without exact matches) — the same one-shuffle
      union/window plan with the time ordering reversed;
    - ``nearest``: whichever of the two is closer in time, ties to the
      backward one (the pandas convention). Two window passes over the
      same union frame — same partitioning, so Catalyst plans ONE
      exchange with two sorts.

    Null when no qualifying quote exists. ``tolerance`` (an INTERVAL
    literal like ``'2 hours'``) nulls out matches farther than that
    from ``probe_ts`` on the match's own side. ``quote_tiebreak`` makes
    the winner among equal-timestamp quotes deterministic (highest
    tiebreak wins); without it, ties follow window order within the key.

    ``by`` must be non-empty: a keyless as-of is a single global window
    task — at scale, bucket time first (edges time domain) or add a key.
    """
    out = asof_join_multi(
        probe,
        quote,
        by,
        value_cols,
        [("m", direction, tolerance)],
        probe_ts=probe_ts,
        quote_ts=quote_ts,
        allow_exact_matches=allow_exact_matches,
        quote_tiebreak=quote_tiebreak,
        leg_col="__asof_leg__",
    )
    return out.drop("__asof_leg__")


def asof_join_multi(
    probe: DataFrame,
    quote: DataFrame,
    by: list[str],
    value_cols: list[str],
    specs: list[tuple[str, str, str | None]],
    probe_ts: str = "ts",
    quote_ts: str = "ts",
    allow_exact_matches: bool = True,
    quote_tiebreak: str | None = None,
    leg_col: str = "leg",
) -> DataFrame:
    """Several as-of matches of the SAME (probe, quote) pair in ONE
    shuffle: ``specs`` is a list of ``(name, direction, tolerance)``
    triples, and the result carries one row per probe row per spec,
    tagged ``leg_col = name`` — row-for-row equal to concatenating
    ``asof_join(probe, quote, ..., direction=d, tolerance=t)`` per spec
    (each tagged with its name), but the union+window plan is built
    once.

    Why this exists (optimization-round shape, guide §2.4): the
    backward and forward window passes differ only in sort order, and
    ``tolerance``/``nearest`` are pure column arithmetic ON TOP of
    those two passes — so N directional legs over the same inputs need
    ONE Exchange and at most two window sorts, not N Exchanges and N
    sorts. The per-leg fan-out is a single ``explode`` over an
    N-element struct array (no join, no second shuffle).
    """
    names = [s[0] for s in specs]
    if len(set(names)) != len(names):
        raise JoinError(f"duplicate spec names: {names}")
    if not specs:
        raise JoinError("asof_join_multi requires at least one spec")
    for _, direction, _ in specs:
        if direction not in ("backward", "forward", "nearest"):
            raise JoinError(
                f"direction must be backward|forward|nearest, got {direction!r}"
            )
    if not by:
        raise JoinError("asof_join requires at least one `by` key (a keyless "
                        "as-of join is one global window task)")
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise JoinError(f"value_cols collide with probe columns: {sorted(clash)}")
    if "__asof_ts__" in value_cols:
        raise JoinError("__asof_ts__ is reserved")
    if leg_col in probe.columns or leg_col in value_cols:
        raise JoinError(f"leg_col {leg_col!r} collides with an output column")
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
    def _w(t_order):
        return (
            Window.partitionBy(*by)
            .orderBy(t_order, F.col("__side__").asc(), F.col("__tb__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    # backward walks time ascending (last preceding quote wins); forward
    # walks it DESCENDING, so "last" is the earliest following quote —
    # the side/tiebreak ordering is direction-independent. Only the
    # passes some spec actually needs are planned: both sorts share the
    # ONE key exchange, so N specs never cost more than two sorts.
    need_back = any(d in ("backward", "nearest") for _, d, _ in specs)
    need_fwd = any(d in ("forward", "nearest") for _, d, _ in specs)
    m_back = F.last(F.col("__q__"), True).over(_w(F.col("__t__").asc()))
    m_fwd = F.last(F.col("__q__"), True).over(_w(F.col("__t__").desc()))

    u = q.unionByName(p)
    if need_back:
        u = u.withColumn("__mb__", m_back)
    if need_fwd:
        u = u.withColumn("__mf__", m_fwd)

    def _tol(m, side, tolerance):
        if tolerance is None:
            return m
        iv = F.expr(f"INTERVAL {tolerance}")
        ok = (
            m.getField("__asof_ts__") >= F.col("__t__") - iv
            if side == "backward"
            else m.getField("__asof_ts__") <= F.col("__t__") + iv
        )
        return F.when(ok, m)

    def _matched(direction, tolerance) -> Column:
        if direction == "backward":
            return _tol(F.col("__mb__"), "backward", tolerance)
        if direction == "forward":
            return _tol(F.col("__mf__"), "forward", tolerance)
        from pyspark.sql import types as T

        def _num(c, dtype):
            # TIMESTAMP_NTZ cannot cast straight to DOUBLE; the session
            # TZ is pinned UTC so the intermediate TIMESTAMP cast is
            # value-preserving (the session_stats duration idiom).
            # Plain timestamps and numeric event times cast directly.
            if isinstance(dtype, T.TimestampNTZType):
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        qt = quote.schema[quote_ts].dataType
        pt = probe.schema[probe_ts].dataType
        mb = _tol(F.col("__mb__"), "backward", tolerance)
        mf = _tol(F.col("__mf__"), "forward", tolerance)
        d_b = _num(F.col("__t__"), pt) - _num(mb.getField("__asof_ts__"), qt)
        d_f = _num(mf.getField("__asof_ts__"), qt) - _num(F.col("__t__"), pt)
        # ties (d_f == d_b) take the backward match — pandas convention
        return (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(d_f < d_b, mf)
            .otherwise(mb)
        )

    entries = F.array(
        *[
            F.struct(
                F.lit(nm).alias("__leg__"), _matched(d, t).alias("__m__")
            )
            for nm, d, t in specs
        ]
    )
    out = (
        u.filter(F.col("__side__") == probe_side)
        .select(
            *[F.col(f"__p_{c}__").alias(c) for c in probe_cols],
            F.explode(entries).alias("__e__"),
        )
    )
    e: Column = F.col("__e__")
    return out.select(
        *probe_cols,
        e.getField("__leg__").alias(leg_col),
        *[e.getField("__m__").getField(c).alias(c) for c in value_cols],
    )


def stream_asof_join(
    sdf: DataFrame,
    by: list[str],
    probe_when,
    quote_when,
    value_cols: list[str],
    ts_col: str = "ts",
    probe_id_col: str | None = None,
    lateness: str = "1 hour",
    allow_exact_matches: bool = True,
    max_buffer_per_key: int = 10_000,
):
    """Streaming as-of join over ONE unioned event stream — the
    streaming analog of ``asof_join`` (BACKWARD direction; the forward
    direction needs a bounding tolerance to be streamable — see
    ``stream_asof_join_forward``; nearest stays batch-only) and the
    same design: the batch
    operator already works on the union of probe and quote rows ordered
    by (ts, side); here the per-key state buffers arrivals and folds
    only watermark-proven rows in that exact order, so each probe row
    emits the latest quote at-or-before it (strictly before with
    ``allow_exact_matches=False``) regardless of arrival order within
    the ``lateness`` horizon. ``probe_when`` / ``quote_when`` are Column
    predicates classifying rows (e.g. ``F.col("event_type") ==
    "purchase"``); rows matching neither are ignored.

    Output: (by..., [probe_id], ts, asof_ts, value_cols...) — one row
    per watermark-proven probe, emitted in append mode. ``probe_id_col``
    must be an integral column (the state schema carries it as long);
    a non-integral id raises ``JoinError`` rather than silently nulling. Quote values
    ride the state as a to_json string and are re-typed on the way out
    with the quote side's own schema, so ``value_cols`` keep their
    types without widening the state schema per caller.

    State per key: the latest final quote (a probe never needs older
    ones) plus the sub-watermark buffer, capped at
    ``max_buffer_per_key`` (earliest kept — the funnel-valve contract).
    A key quiet past the horizon flushes and drops its state on
    EventTimeTimeout."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mysql_to_s3_spark.operators.sessions import _fixed_seconds_lateness

    if not by:
        raise JoinError("stream_asof_join requires at least one `by` key")
    missing = {*value_cols} - set(sdf.columns)
    if missing:
        raise JoinError(f"stream lacks value columns: {sorted(missing)}")
    ttl_secs = _fixed_seconds_lateness(lateness)
    if isinstance(sdf.schema[ts_col].dataType, T.TimestampNTZType):
        sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    qv_schema = T.StructType([sdf.schema[c] for c in value_cols])
    # side ordering at equal timestamps = exact-match semantics (the
    # batch operator's __side__ trick): quote first -> visible at ==ts
    quote_side, probe_side = (0, 1) if allow_exact_matches else (1, 0)
    side = (
        F.when(F.coalesce(quote_when.cast("boolean"), F.lit(False)), F.lit(quote_side))
        .when(F.coalesce(probe_when.cast("boolean"), F.lit(False)), F.lit(probe_side))
    )
    if probe_id_col is not None:
        pid_type = sdf.schema[probe_id_col].dataType
        if not isinstance(
            pid_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise JoinError(
                f"probe_id_col {probe_id_col!r} must be an integral type "
                f"(state carries it as long); got {pid_type.simpleString()} — "
                "cast or map it to an integral id upstream"
            )
        pid = F.col(probe_id_col).cast("long")
    else:
        pid = F.lit(None).cast("long")
    keyed = (
        sdf.select(
            *[F.col(c) for c in by],
            F.col(ts_col).alias("__ts__"),
            side.alias("__side__"),
            pid.alias("__pid__"),
            F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("__qv__"),
        )
        .filter(F.col("__side__").isNotNull())
        .withWatermark("__ts__", lateness)
    )

    key_fields = [sdf.schema[c] for c in by]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("__pid__", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("asof_ts", T.TimestampType()),
            T.StructField("__qv__", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("q_us", T.LongType()),
            T.StructField("q_val", T.StringType()),
            T.StructField("buf_us", T.ArrayType(T.LongType())),
            T.StructField("buf_side", T.ArrayType(T.IntegerType())),
            T.StructField("buf_pid", T.ArrayType(T.LongType())),
            T.StructField("buf_val", T.ArrayType(T.StringType())),
        ]
    )

    def fold(key: tuple, pdfs, state: GroupState):
        import datetime as _dt

        import pandas as pd

        if state.exists:
            q_us, q_val, buf_us, buf_side, buf_pid, buf_val = state.get
            buf = list(zip(buf_us, buf_side, buf_pid, buf_val))
        else:
            q_us, q_val, buf = None, None, []
        for pdf in pdfs:
            for t, s, p, v in zip(
                pdf["__ts__"], pdf["__side__"], pdf["__pid__"], pdf["__qv__"]
            ):
                buf.append(
                    (
                        int(t.value // 1000),
                        int(s),
                        None if pd.isna(p) else int(p),
                        v,
                    )
                )
        if len(buf) > max_buffer_per_key:
            buf = sorted(buf, key=lambda e: (e[0], e[1]))[:max_buffer_per_key]
        flush_all = state.hasTimedOut
        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = sorted(
            (e for e in buf if flush_all or e[0] <= wm_us),
            key=lambda e: (e[0], e[1]),
        )
        pending = [] if flush_all else [e for e in buf if e[0] > wm_us]
        out = []
        for t, s, p, v in ready:
            if s == quote_side:
                # ties between quotes at one ts: LAST in fold order wins,
                # matching the batch window's last() over (ts, side) order
                q_us, q_val = t, v
            else:
                out.append((p, t, q_us, q_val))
        if flush_all:
            state.remove()
        else:
            state.update(
                (
                    q_us,
                    q_val,
                    [e[0] for e in pending],
                    [e[1] for e in pending],
                    [e[2] for e in pending],
                    [e[3] for e in pending],
                )
            )
            from mysql_to_s3_spark.streaming.stream_extract import arm_event_ttl

            arm_event_ttl(
                state, ttl_secs, max(e[0] for e in buf) // 1000 if buf else 0
            )
        if out:
            def us2dt(us):
                return None if us is None else _dt.datetime.utcfromtimestamp(us / 1_000_000)

            row = {c: [k] * len(out) for c, k in zip(by, key)}
            row["__pid__"] = [p for p, _, _, _ in out]
            row["ts"] = [us2dt(t) for _, t, _, _ in out]
            row["asof_ts"] = [us2dt(q) for _, _, q, _ in out]
            row["__qv__"] = [v for _, _, _, v in out]
            yield pd.DataFrame(row)

    flags = keyed.groupBy(*by).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
    parsed = flags.withColumn("__q__", F.from_json(F.col("__qv__"), qv_schema))
    outcols = [*by]
    if probe_id_col is not None:
        outcols.append(F.col("__pid__").alias(probe_id_col))
    return parsed.select(
        *outcols,
        "ts",
        "asof_ts",
        *[F.col("__q__")[c].alias(c) for c in value_cols],
    )


def stream_interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    by: list[str],
    value_cols: list[str],
    probe_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    lateness: str = "1 hour",
    max_span: str = "24 hours",
) -> DataFrame:
    """Streaming point-in-interval join — here Spark's NATIVE
    stream-stream inner join with a time-interval condition IS the right
    operator, so this wrapper only supplies the correctness conditions
    it needs and keeps the batch operator's semantics:

    - both sides carry event-time watermarks (``lateness``), and
    - the join condition bounds the probe's distance from the interval
      START (``probe_ts <= start + max_span``) — without a two-sided
      event-time bound Spark cannot compute a state watermark for the
      interval side and buffers it FOREVER; ``max_span`` must be >= the
      longest real interval (longer intervals lose matches past the
      bound, the documented trade for bounded state).

    Output: probe columns + ``value_cols`` from every interval of the
    same ``by`` key containing ``probe_ts`` (inclusive ends, the batch
    ``interval_join`` contract — verified side by side in
    tests/test_joins.py).
    """
    from pyspark.sql import types as T

    if not by:
        raise JoinError("stream_interval_join requires at least one `by` key")
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise JoinError(f"value_cols collide with probe columns: {sorted(clash)}")
    # stream-stream joins need TIMESTAMP event time; NTZ is value-
    # preserving to cast under the pinned-UTC session TZ (the
    # stream_funnel / stream_session_stats convention)
    if isinstance(probe.schema[probe_ts].dataType, T.TimestampNTZType):
        probe = probe.withColumn(probe_ts, F.col(probe_ts).cast("timestamp"))
    for col in (start_col, end_col):
        if isinstance(intervals.schema[col].dataType, T.TimestampNTZType):
            intervals = intervals.withColumn(col, F.col(col).cast("timestamp"))
    p = probe.withWatermark(probe_ts, lateness)
    iv = intervals.select(
        *[F.col(c).alias(f"__i_{c}__") for c in by],
        F.col(start_col).alias("__start__"),
        F.col(end_col).alias("__end__"),
        *[F.col(c) for c in value_cols],
    ).withWatermark("__start__", lateness)
    cond = None
    for c in by:
        eq = p[c] == F.col(f"__i_{c}__")
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (p[probe_ts] >= F.col("__start__"))
        & (p[probe_ts] <= F.col("__end__"))
        & (p[probe_ts] <= F.col("__start__") + F.expr(f"INTERVAL {max_span}"))
    )
    return p.join(iv, cond, "inner").select(*probe.columns, *value_cols)


def stream_asof_join_forward(
    sdf: DataFrame,
    by: list[str],
    probe_when,
    quote_when,
    value_cols: list[str],
    tolerance: str,
    ts_col: str = "ts",
    probe_id_col: str | None = None,
    lateness: str = "1 hour",
    allow_exact_matches: bool = True,
    max_buffer_per_key: int = 10_000,
    direction: str = "forward",
):
    """Streaming FORWARD as-of join — the streaming analog of
    ``asof_join(direction="forward")``. A forward match waits for a
    quote that has not happened yet, so a stream can only offer it with
    a BOUNDING ``tolerance`` (required): each probe is decided once the
    watermark passes ``probe_ts + tolerance`` — every quote that could
    match (``quote_ts`` in [probe_ts, probe_ts + tolerance], strict
    left edge without exact matches) is then final — and emits the
    EARLIEST such quote's values, or nulls when none exists. This is
    the same decidability design as ``stream_funnel_within`` (judge
    when the window is provably complete, never revisit).

    Output and plumbing mirror ``stream_asof_join``: (by...,
    [probe_id], ts, asof_ts, value_cols...), append mode, quote values
    as re-typed JSON, integral ``probe_id_col`` enforced. Ties among
    equal-earliest quotes break on the serialized value (max wins) for
    determinism under any arrival order. State per key: undecided
    probes + quotes newer than ``watermark - tolerance`` (an older
    quote can no longer match any undecided probe), hard-capped at
    ``max_buffer_per_key`` (earliest kept); quiet keys decide
    everything buffered and drop on EventTimeTimeout via
    ``arm_event_ttl``.

    ``direction="nearest"`` completes the tolerance-bounded streaming
    trio: the probe is still decided at ``ts + tolerance`` (by then
    BOTH candidate windows are final — the backward one ended at the
    probe itself), and emits whichever of the latest-preceding /
    earliest-following in-tolerance quotes is closer, ties to backward
    (the batch ``asof_join(direction="nearest")`` convention). The
    quote-retention bound widens to ``watermark - 2*tolerance`` (an
    undecided probe may still need a quote up to ``tolerance`` BEHIND
    it).
    """
    if direction not in ("forward", "nearest"):
        raise JoinError(
            f"direction must be forward|nearest, got {direction!r} "
            "(backward is stream_asof_join)"
        )
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mysql_to_s3_spark.operators.sessions import _fixed_seconds_lateness
    from mysql_to_s3_spark.streaming.stream_extract import (
        _fixed_seconds,
        arm_event_ttl,
    )

    if not by:
        raise JoinError("stream_asof_join_forward requires at least one `by` key")
    missing = {*value_cols} - set(sdf.columns)
    if missing:
        raise JoinError(f"stream lacks value columns: {sorted(missing)}")
    ttl_secs = _fixed_seconds_lateness(lateness)
    tol_us = _fixed_seconds(tolerance) * 1_000_000
    if isinstance(sdf.schema[ts_col].dataType, T.TimestampNTZType):
        sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    qv_schema = T.StructType([sdf.schema[c] for c in value_cols])
    QUOTE, PROBE = 0, 1
    side = (
        F.when(F.coalesce(quote_when.cast("boolean"), F.lit(False)), F.lit(QUOTE))
        .when(F.coalesce(probe_when.cast("boolean"), F.lit(False)), F.lit(PROBE))
    )
    if probe_id_col is not None:
        pid_type = sdf.schema[probe_id_col].dataType
        if not isinstance(
            pid_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise JoinError(
                f"probe_id_col {probe_id_col!r} must be an integral type "
                f"(state carries it as long); got {pid_type.simpleString()}"
            )
        pid = F.col(probe_id_col).cast("long")
    else:
        pid = F.lit(None).cast("long")
    keyed = (
        sdf.select(
            *[F.col(c) for c in by],
            F.col(ts_col).alias("__ts__"),
            side.alias("__side__"),
            pid.alias("__pid__"),
            F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("__qv__"),
        )
        .filter(F.col("__side__").isNotNull())
        .withWatermark("__ts__", lateness)
    )

    key_fields = [sdf.schema[c] for c in by]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("__pid__", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("asof_ts", T.TimestampType()),
            T.StructField("__qv__", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("buf_us", T.ArrayType(T.LongType())),
            T.StructField("buf_side", T.ArrayType(T.IntegerType())),
            T.StructField("buf_pid", T.ArrayType(T.LongType())),
            T.StructField("buf_val", T.ArrayType(T.StringType())),
        ]
    )

    def fold(key: tuple, pdfs, state: GroupState):
        import datetime as _dt

        import pandas as pd

        if state.exists:
            b_us, b_side, b_pid, b_val = state.get
            buf = list(zip(b_us, b_side, b_pid, b_val))
        else:
            buf = []
        for pdf in pdfs:
            for t, s, p, v in zip(
                pdf["__ts__"], pdf["__side__"], pdf["__pid__"], pdf["__qv__"]
            ):
                buf.append(
                    (
                        int(t.value // 1000),
                        int(s),
                        None if pd.isna(p) else int(p),
                        v,
                    )
                )
        if len(buf) > max_buffer_per_key:
            buf = sorted(buf, key=lambda e: (e[0], e[1]))[:max_buffer_per_key]
        flush_all = state.hasTimedOut
        wm_us = state.getCurrentWatermarkMs() * 1000
        buf.sort(key=lambda e: (e[0], e[1]))
        quotes = [e for e in buf if e[1] == QUOTE]
        out = []
        pending = []
        for e in buf:
            if e[1] != PROBE:
                continue
            t = e[0]
            if not flush_all and t + tol_us > wm_us:
                pending.append(e)
                continue
            best = None
            for q in quotes:
                lo_ok = q[0] >= t if allow_exact_matches else q[0] > t
                if not lo_ok or q[0] > t + tol_us:
                    continue
                # quotes are ts-sorted: the first window hit is earliest;
                # scan its ts-ties for the max-serialized-value winner
                if best is None:
                    best = q
                elif q[0] == best[0] and (q[3] or "") > (best[3] or ""):
                    best = q
                elif q[0] > best[0]:
                    break
            if direction == "nearest":
                back = None
                for q in quotes:
                    hi_ok = q[0] <= t if allow_exact_matches else q[0] < t
                    if not hi_ok or q[0] < t - tol_us:
                        continue
                    # latest preceding wins; ts-ties by max serialized value
                    if back is None or q[0] > back[0]:
                        back = q
                    elif q[0] == back[0] and (q[3] or "") > (back[3] or ""):
                        back = q
                if back is not None and (
                    best is None or (t - back[0]) <= (best[0] - t)
                ):
                    best = back  # closer, or tie -> backward
            out.append((e[2], t, best[0] if best else None, best[3] if best else None))
        if flush_all:
            state.remove()
        else:
            keep_horizon = 2 * tol_us if direction == "nearest" else tol_us
            keep_quotes = [q for q in quotes if q[0] + keep_horizon > wm_us]
            nxt = keep_quotes + pending
            state.update(
                (
                    [e[0] for e in nxt],
                    [e[1] for e in nxt],
                    [e[2] for e in nxt],
                    [e[3] for e in nxt],
                )
            )
            arm_event_ttl(
                state, ttl_secs, max((e[0] for e in buf), default=0) // 1000
            )
        if out:
            def us2dt(us):
                return None if us is None else _dt.datetime.utcfromtimestamp(us / 1_000_000)

            row = {c: [k] * len(out) for c, k in zip(by, key)}
            row["__pid__"] = [p for p, _, _, _ in out]
            row["ts"] = [us2dt(t) for _, t, _, _ in out]
            row["asof_ts"] = [us2dt(q) for _, _, q, _ in out]
            row["__qv__"] = [v for _, _, _, v in out]
            yield pd.DataFrame(row)

    flags = keyed.groupBy(*by).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
    parsed = flags.withColumn("__q__", F.from_json(F.col("__qv__"), qv_schema))
    outcols = [*by]
    if probe_id_col is not None:
        outcols.append(F.col("__pid__").alias(probe_id_col))
    return parsed.select(
        *outcols,
        "ts",
        "asof_ts",
        *[F.col("__q__")[c].alias(c) for c in value_cols],
    )
