"""Property-based conformance for the streaming temporal quartet: on
hypothesis-generated event corpora, with a RANDOM arrival permutation
bounded by the lateness horizon and RANDOM micro-batch cuts, each
streaming operator's drained output must equal its batch twin on the
same data.

Arrival model: events arrive sorted by ``ts + jitter`` where jitter is
uniform in [0, 0.8 * lateness). Any inversion therefore spans less than
0.8 * lateness of event time, so when an event arrives, the watermark
(max prior arrival's ts - lateness) is still strictly below its ts —
i.e. every permutation the generator produces is inside the horizon the
operators promise to handle, and none of its events may be dropped as
late. (When the whole corpus spans less than the lateness, EVERY
permutation is in-horizon — the single-horizon funnel test exploits
that for full shuffle freedom.) A far-future pusher row (key "wm",
always the LAST file) drains the final watermark. Micro-batch cuts are
a random partition of the arrival sequence into mtime-ordered files
consumed with maxFilesPerTrigger=1.

Timestamps are globally UNIQUE integer minutes, so the batch twins are
tie-free and deterministic. The batch twins are themselves
DuckDB-oracle-checked (test_properties.py, the temporal_events driver
row), so equality here chains the streaming operators to the same
ground truth.
"""

import datetime as dt
import itertools
import os
import random

import pytest

# r11: deselected from the default pass (hypothesis streaming property
# harness, minutes per test); run the full suite with -m ""
pytestmark = pytest.mark.slow

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql_to_s3_spark.streaming.stream_extract import read_parquet_stream

T0 = dt.datetime(2024, 1, 1)
LATENESS_MIN = 60  # operators run with lateness="60 minutes"
JITTER_MAX = 0.8 * LATENESS_MIN
_ids = itertools.count()


def _ts(minute: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=float(minute))


def _write_arrival_files(
    base: str,
    rows: list[dict],
    rng: random.Random,
    pusher: dict,
    jitter_sort: bool = True,
) -> None:
    """Arrange ``rows`` in jitter-bounded arrival order (or keep the
    caller's order with ``jitter_sort=False`` when any order is legal),
    cut into random micro-batch files (mtime-ordered so the file source
    replays them deterministically), and append the watermark pusher as
    its own final file. Chunks are sliced from ONE full DataFrame so
    every file carries identical column dtypes (an all-null chunk of a
    float column stays float64, not pyarrow's null type)."""
    if jitter_sort:
        rows = sorted(
            rows, key=lambda r: r["_minute"] + rng.uniform(0, JITTER_MAX)
        )
    full = pd.DataFrame(rows + [pusher]).drop(columns=["_minute"])
    for c in full.columns:
        if pd.api.types.is_datetime64_any_dtype(full[c]):
            full[c] = full[c].astype("datetime64[us]")
    n = len(rows)
    n_cuts = min(rng.randint(0, 4), n - 1) if n > 1 else 0
    cuts = sorted(rng.sample(range(1, n), n_cuts))
    bounds = [0] + cuts + [n, n + 1]  # pusher is its own final file
    os.makedirs(base, exist_ok=True)
    t_base = None
    for i, (a, b) in enumerate(zip(bounds, bounds[1:])):
        path = f"{base}/f{i:03d}.parquet"
        full.iloc[a:b].to_parquet(path)
        if t_base is None:
            t_base = os.path.getmtime(path)
        os.utime(path, (t_base + 10 * i, t_base + 10 * i))


def _drain(out):
    name = f"prop_sink_{next(_ids)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return out.sparkSession.sql(f"SELECT * FROM {name}").collect()


def _corpus(draw, kinds, n_keys, lo, hi, min_size, max_size):
    """Unique integer minutes -> (key, kind) assignments + a seeded rng
    for everything non-hypothesis (arrival jitter, cuts, key choice)."""
    minutes = draw(
        st.sets(st.integers(lo, hi), min_size=min_size, max_size=max_size)
    )
    rng = random.Random(draw(st.integers(0, 2**31)))
    rows = [
        {"k": f"k{rng.randrange(n_keys)}", "e": rng.choice(kinds), "_minute": m}
        for m in sorted(minutes)
    ]
    return rows, rng


def _banded_corpus(draw, kinds, n_keys, band_width, band_stride,
                   min_size, max_size):
    """Multi-horizon corpus where each KEY's events sit in one time band
    narrower than the lateness. The watermark still sweeps the full
    span (incremental folds, early keys decided mid-stream), but no key
    ever goes quiet for more than ``band_width`` while still having
    in-horizon events pending — so the stateful folds' EventTimeTimeout
    (the DOCUMENTED quiet-key flush, which legitimately diverges from
    an all-data batch run when a chain/quote spans a
    longer-than-lateness per-key gap) cannot fire mid-key, and strict
    batch equality is the right assertion. Timestamps stay globally
    unique (the band map is injective)."""
    assert band_width < LATENESS_MIN <= band_stride
    minutes = draw(
        st.sets(st.integers(0, band_width * n_keys - 1),
                min_size=min_size, max_size=max_size)
    )
    rng = random.Random(draw(st.integers(0, 2**31)))
    rows = [
        {
            "k": f"k{m // band_width}",
            "e": rng.choice(kinds),
            "_minute": (m // band_width) * band_stride + (m % band_width),
        }
        for m in sorted(minutes)
    ]
    return rows, rng


# ---------------------------------------------------------------- as-of


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_asof_join_matches_batch(spark, tmp_path, data):
    """Any in-horizon arrival order + any micro-batch cuts: every
    watermark-proven probe gets exactly the batch as-of quote, across a
    corpus spanning multiple lateness horizons (incremental folds; one
    sub-lateness band per key so the quiet-key timeout — a documented
    divergence — never fires mid-key)."""
    from mysql_to_s3_spark.operators.joins import asof_join, stream_asof_join

    rows, rng = _banded_corpus(data.draw, ["p", "q"], n_keys=3,
                               band_width=48, band_stride=120,
                               min_size=4, max_size=24)
    for i, r in enumerate(rows):
        r["event_id"] = i
        r["ts"] = _ts(r["_minute"])
        r["v"] = float(i) if r["e"] == "q" else None
    pusher = {"k": "wm", "e": "q", "event_id": 9_999, "ts": _ts(10_000),
              "v": 0.0, "_minute": 10_000}
    src = str(tmp_path / f"asof_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher)

    schema = spark.read.parquet(src).schema
    out = stream_asof_join(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        by=["k"],
        probe_when=F.col("e") == "p",
        quote_when=F.col("e") == "q",
        value_cols=["v"],
        probe_id_col="event_id",
        lateness=f"{LATENESS_MIN} minutes",
    )
    got = {
        r.event_id: (r.k, r.ts, r.asof_ts, r.v)
        for r in _drain(out)
        if r.k != "wm"
    }

    all_rows = spark.read.parquet(src).filter(F.col("k") != "wm")
    want = {
        r.event_id: (r.k, r.ts, r.v)
        for r in asof_join(
            all_rows.filter(F.col("e") == "p").select("k", "event_id", "ts"),
            all_rows.filter(F.col("e") == "q").select("k", "ts", "v"),
            by=["k"],
            value_cols=["v"],
        ).collect()
    }
    assert set(got) == set(want)
    for eid, (k, ts, asof_ts, v) in got.items():
        assert (k, ts, v) == want[eid]
        # quotes always carry a value, so a match <=> both fields present
        assert (asof_ts is None) == (v is None)
        if asof_ts is not None:
            assert asof_ts <= ts


# ---------------------------------------------------------------- funnel


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_funnel_single_horizon_exact(spark, tmp_path, data):
    """Corpus span < lateness: EVERY arrival permutation is in-horizon,
    and the drained stream equals the batch funnel's converted keys
    exactly — one row per completed key, batch step timestamps, no
    duplicates (the tombstone horizon cannot expire mid-corpus)."""
    from mysql_to_s3_spark.operators.sessions import funnel, stream_funnel

    rows, rng = _corpus(data.draw, ["A", "B", "C"], n_keys=3, lo=0,
                        hi=LATENESS_MIN - 10, min_size=3, max_size=20)
    rng.shuffle(rows)  # arbitrary order is legal inside one horizon
    for r in rows:
        r["ts"] = _ts(r["_minute"])
    pusher = {"k": "wm", "e": "X", "ts": _ts(10_000), "_minute": 10_000}
    src = str(tmp_path / f"funl1_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher, jitter_sort=False)

    schema = spark.read.parquet(src).schema
    steps = [F.col("e") == s for s in ("A", "B", "C")]
    out = stream_funnel(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        by=["k"], steps=steps, lateness=f"{LATENESS_MIN} minutes",
    )
    emitted = [r for r in _drain(out) if r.k != "wm"]
    got = {r.k: (r.step_1_ts, r.step_2_ts, r.step_3_ts) for r in emitted}
    assert len(emitted) == len(got), "duplicate completion inside one horizon"

    want = {
        r.k: (r.step_1_ts, r.step_2_ts, r.step_3_ts)
        for r in funnel(
            spark.read.parquet(src).filter(F.col("k") != "wm"),
            by=["k"], steps=steps,
        ).filter(F.col("converted")).collect()
    }
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_funnel_multi_horizon_first_completion(spark, tmp_path, data):
    """Corpus spanning several horizons with jitter-bounded arrival:
    each key's FIRST emitted completion equals the batch greedy funnel
    (incremental event-time-order folding == global greedy). Uniqueness
    beyond the tombstone horizon is documentedly weaker — sessions.py
    stream_funnel docstring — so later re-completions are tolerated,
    but the first must be the greedy-earliest one."""
    from mysql_to_s3_spark.operators.sessions import funnel, stream_funnel

    rows, rng = _banded_corpus(data.draw, ["A", "B", "C"], n_keys=3,
                               band_width=48, band_stride=120,
                               min_size=4, max_size=24)
    for r in rows:
        r["ts"] = _ts(r["_minute"])
    pusher = {"k": "wm", "e": "X", "ts": _ts(10_000), "_minute": 10_000}
    src = str(tmp_path / f"funlN_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher)

    schema = spark.read.parquet(src).schema
    steps = [F.col("e") == s for s in ("A", "B", "C")]
    out = stream_funnel(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        by=["k"], steps=steps, lateness=f"{LATENESS_MIN} minutes",
    )
    emitted = [r for r in _drain(out) if r.k != "wm"]
    first = {}
    for r in sorted(emitted, key=lambda r: r.step_3_ts):
        first.setdefault(r.k, (r.step_1_ts, r.step_2_ts, r.step_3_ts))

    want = {
        r.k: (r.step_1_ts, r.step_2_ts, r.step_3_ts)
        for r in funnel(
            spark.read.parquet(src).filter(F.col("k") != "wm"),
            by=["k"], steps=steps,
        ).filter(F.col("converted")).collect()
    }
    assert first == want


# ---------------------------------------------------------------- sessions


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_sessions_match_batch(spark, tmp_path, data):
    """Drained session_window stream == batch session_stats on
    (key, session_start, n_events). Native end = last event + gap while
    batch end = last event ts, so ends are excluded; the gap is a
    non-whole-minute 1170 s so integer-minute events never land exactly
    ON the gap boundary (where the two implementations' merge rules
    could legitimately differ)."""
    from mysql_to_s3_spark.operators.sessions import (
        session_stats,
        stream_session_stats,
    )

    rows, rng = _corpus(data.draw, ["e"], n_keys=3, lo=0, hi=360,
                        min_size=3, max_size=24)
    for r in rows:
        r["ts"] = _ts(r["_minute"])
    pusher = {"k": "wm", "e": "e", "ts": _ts(10_000), "_minute": 10_000}
    src = str(tmp_path / f"sess_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher)

    schema = spark.read.parquet(src).schema
    out = stream_session_stats(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        by=["k"], gap="1170 seconds", lateness=f"{LATENESS_MIN} minutes",
    )
    got = {
        (r.k, r.session.start, r.n_events)
        for r in _drain(out)
        if r.k != "wm"
    }
    want = {
        (r.k, r.session_start, r.n_events)
        for r in session_stats(
            spark.read.parquet(src).filter(F.col("k") != "wm"),
            by=["k"], gap="1170 seconds",
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------- interval


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_interval_join_matches_batch(spark, tmp_path, data):
    """Both sides independently permuted (in-horizon) and cut: the
    drained native stream-stream join == batch interval_join pairs."""
    from mysql_to_s3_spark.operators.joins import interval_join, stream_interval_join

    probe_rows, rng = _corpus(data.draw, ["p"], n_keys=3, lo=0, hi=240,
                              min_size=2, max_size=12)
    for i, r in enumerate(probe_rows):
        r.pop("e")
        r["event_id"] = i
        r["ts"] = _ts(r["_minute"])
    iv_minutes = sorted(
        data.draw(st.sets(st.integers(0, 240), min_size=1, max_size=8))
    )
    iv_rows = [
        {
            "k": f"k{rng.randrange(3)}",
            "iv": 100 + j,
            "start": _ts(m),
            "end": _ts(m + rng.randint(0, 90)),
            "_minute": m,
        }
        for j, m in enumerate(iv_minutes)
    ]
    p_push = {"k": "wm", "event_id": 9_999, "ts": _ts(10_000), "_minute": 10_000}
    i_push = {"k": "wm", "iv": 9_999, "start": _ts(10_000),
              "end": _ts(10_001), "_minute": 10_000}
    psrc = str(tmp_path / f"ivp_{next(_ids)}")
    isrc = str(tmp_path / f"ivi_{next(_ids)}")
    _write_arrival_files(psrc, probe_rows, rng, p_push)
    _write_arrival_files(isrc, iv_rows, rng, i_push)

    out = stream_interval_join(
        read_parquet_stream(
            spark, psrc, spark.read.parquet(psrc).schema, max_files_per_trigger=1
        ),
        read_parquet_stream(
            spark, isrc, spark.read.parquet(isrc).schema, max_files_per_trigger=1
        ),
        by=["k"],
        value_cols=["iv"],
        lateness=f"{LATENESS_MIN} minutes",
        max_span="2 hours",
    )
    got = {(r.event_id, r.iv) for r in _drain(out) if r.k != "wm"}
    want = {
        (r.event_id, r.iv)
        for r in interval_join(
            spark.read.parquet(psrc).filter(F.col("k") != "wm"),
            spark.read.parquet(isrc).filter(F.col("k") != "wm"),
            by=["k"],
            value_cols=["iv"],
            granularity_secs=1800,
        ).collect()
    }
    assert got == want


# ------------------------------------------------------------- near-dedup


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_near_dedup_matches_simulated_fold(spark, tmp_path, data):
    """stream_near_dedup's flags are an exact deterministic function of
    (signatures, per-bucket arrival order): one doc per micro-batch, any
    in-horizon arrival order, flags must equal a batch-side simulation
    of the documented fold — same banded (band, bucket) grouping built
    with the module's own signature expressions, per-bucket argmax-est
    vs the cutoff, refs appended in order, cap slicing. This pins the
    streaming operator to the batch minhash machinery bit-for-bit
    (margin semantics and all), not just to hand-picked examples."""
    import numpy as np
    from pyspark.sql import functions as F

    from mysql_to_s3_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_N,
        _base_hashes,
        _minhash_columns,
        shingles,
    )
    from mysql_to_s3_spark.streaming.stream_extract import stream_near_dedup

    pool = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    templates = [
        " ".join(pool[(i * 7 + j) % len(pool)] for j in range(40))
        for i in range(3)
    ]
    n_docs = data.draw(st.integers(4, 10))
    rng = random.Random(data.draw(st.integers(0, 2**31)))
    docs = []
    for i in range(n_docs):
        w = templates[rng.randrange(len(templates))].split()
        for _ in range(rng.randrange(4)):  # 0-3 word edits -> real near-dups
            w[rng.randrange(len(w))] = rng.choice(pool)
        docs.append({"doc_id": i, "text": " ".join(w),
                     "_minute": i, "ts": _ts(i)})
    rng.shuffle(docs)  # single-horizon: any arrival order is legal
    pusher = {"doc_id": 9_999, "text": "zz qq vv pp kk", "ts": _ts(10_000),
              "_minute": 10_000}
    src = str(tmp_path / f"nd_{next(_ids)}")
    os.makedirs(src, exist_ok=True)
    arrival = docs + [pusher]
    full = pd.DataFrame(arrival).drop(columns=["_minute"])
    full["ts"] = full["ts"].astype("datetime64[us]")
    t_base = None
    for i in range(len(full)):  # ONE doc per file -> per-doc micro-batches
        p = f"{src}/f{i:03d}.parquet"
        full.iloc[i:i + 1].to_parquet(p)
        t_base = t_base or os.path.getmtime(p)
        os.utime(p, (t_base + 10 * i, t_base + 10 * i))

    threshold = 0.7
    schema = spark.read.parquet(src).schema
    out = stream_near_dedup(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        "ts", "text", "doc_id", threshold=threshold, lateness="60 minutes",
    )
    got = {
        (r.band, r.doc_id, r.matched_id, r.est) for r in _drain(out)
    }

    # batch-side replica of the banded signature frame (same expressions)
    n_hashes, bands = MINHASH_N, MINHASH_BANDS
    r_rows = n_hashes // bands
    cutoff = threshold - 4.0 * (threshold * (1 - threshold) / n_hashes) ** 0.5
    sig = F.array(*_minhash_columns(_base_hashes(shingles(F.col("text"))), n_hashes))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("__sig__", b * r_rows + j + 1) for j in range(r_rows)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    rows = (
        spark.read.parquet(src)
        .select(F.col("doc_id"), sig.alias("__sig__"))
        .withColumn("__bb__", F.explode(F.array(*band_structs)))
        .select(
            F.col("__bb__.band").alias("band"),
            F.col("__bb__.bucket").alias("bucket"),
            "doc_id",
            "__sig__",
        )
        .collect()
    )
    pos = {d["doc_id"]: i for i, d in enumerate(arrival)}
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault((r.band, r.bucket), []).append(r)
    want = set()
    for (band, _), members in by_bucket.items():
        members.sort(key=lambda r: pos[r.doc_id])
        ids, mat = [], []
        for r in members:
            sv = np.asarray(r["__sig__"], dtype=np.int64)
            if ids:
                ests = (np.asarray(mat) == sv).mean(axis=1)
                j = int(np.argmax(ests))
                if ests[j] >= cutoff:
                    want.add((band, r.doc_id, ids[j], round(float(ests[j]), 6)))
            ids.append(r.doc_id)
            mat.append(sv)
            # cap slicing (never binds at this corpus size, kept for parity)
            if len(ids) > 64:
                ids, mat = ids[-64:], mat[-64:]
    assert got == want


# ------------------------------------------------------------ exact dedup


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_exact_dedup_one_survivor_per_fingerprint(spark, tmp_path, data):
    """Any in-horizon arrival order + random cuts: exactly ONE survivor
    per distinct normalized-text fingerprint, survivors are real corpus
    rows, and every fingerprint is represented (nothing in-horizon is
    dropped entirely). Which duplicate survives is first-arrival —
    deliberately not asserted beyond membership, since within a
    micro-batch the keeper among same-fp rows is unspecified."""
    from mysql_to_s3_spark.operators.text import fingerprint
    from mysql_to_s3_spark.streaming.stream_extract import stream_exact_dedup

    texts = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    rows, rng = _corpus(data.draw, ["x"], n_keys=1, lo=0, hi=40,
                        min_size=3, max_size=18)
    for i, r in enumerate(rows):
        r.pop("e"); r.pop("k")
        r["doc_id"] = i
        # duplicates by construction: few distinct texts, many rows
        r["text"] = texts[rng.randrange(len(texts))]
        r["ts"] = _ts(r["_minute"])
    rng.shuffle(rows)  # single horizon: any order is legal
    pusher = {"doc_id": 9_999, "text": "watermark pusher unique text",
              "ts": _ts(10_000), "_minute": 10_000}
    src = str(tmp_path / f"xd_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher, jitter_sort=False)

    schema = spark.read.parquet(src).schema
    out = stream_exact_dedup(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        "ts", "text", lateness="60 minutes",
    )
    kept = [r for r in _drain(out) if r.doc_id != 9_999]
    by_id = {r["doc_id"]: r["text"] for r in rows}
    want_fps = {
        r.fp for r in spark.read.parquet(src)
        .filter(F.col("doc_id") != 9_999)
        .select(fingerprint(F.col("text")).alias("fp")).distinct().collect()
    }
    got_fps = [
        r.fp for r in spark.createDataFrame(
            [(k.doc_id, k.text) for k in kept], "doc_id: long, text: string"
        ).select(fingerprint(F.col("text")).alias("fp")).collect()
    ]
    assert len(got_fps) == len(set(got_fps)), "a fingerprint survived twice"
    assert set(got_fps) == want_fps
    for k in kept:  # survivors are genuine corpus rows
        assert by_id[k.doc_id] == k.text


# ----------------------------------------------------------- fwin funnel


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_funnel_within_matches_batch(spark, tmp_path, data):
    """Time-boxed streaming funnel across multiple horizons with
    jitter-bounded arrival: each key's first emission (min start_ts)
    equals the batch funnel_within's earliest completing start, and
    keys the batch says never convert emit nothing before a possible
    tombstone-expiry restart (so: emitted keys ⊆ batch-converted keys
    plus restart re-completions, min start equality on the batch set)."""
    from mysql_to_s3_spark.operators.sessions import (
        funnel_within,
        stream_funnel_within,
    )

    rows, rng = _banded_corpus(data.draw, ["A", "B", "C"], n_keys=3,
                               band_width=48, band_stride=120,
                               min_size=4, max_size=24)
    for r in rows:
        r["ts"] = _ts(r["_minute"])
    pusher = {"k": "wm", "e": "X", "ts": _ts(10_000), "_minute": 10_000}
    src = str(tmp_path / f"fwin_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher)

    schema = spark.read.parquet(src).schema
    steps = [F.col("e") == s for s in ("A", "B", "C")]
    out = stream_funnel_within(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        by=["k"], steps=steps, within="90 minutes",
        lateness=f"{LATENESS_MIN} minutes",
    )
    emitted = [r for r in _drain(out) if r.k != "wm"]
    first = {}
    for r in sorted(emitted, key=lambda r: r.start_ts):
        first.setdefault(r.k, r.start_ts)

    want = {
        r.k: r.start_ts
        for r in funnel_within(
            spark.read.parquet(src).filter(F.col("k") != "wm"),
            by=["k"], steps=steps, within="90 minutes",
        ).filter(F.col("converted")).collect()
    }
    assert first == want


# ------------------------------------------------------- forward as-of


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_asof_forward_matches_batch(spark, tmp_path, data):
    """Forward/nearest streaming as-of (tolerance-bounded) == batch
    asof_join(same direction, tolerance=...) under any in-horizon
    arrival order and micro-batch cuts (banded corpus: the quiet-key
    flush never fires mid-key). Globally unique timestamps mean no
    equal-ts quote ties, so the tie rules of the two implementations
    never engage."""
    from mysql_to_s3_spark.operators.joins import (
        asof_join,
        stream_asof_join_forward,
    )

    direction = data.draw(st.sampled_from(["forward", "nearest"]))
    rows, rng = _banded_corpus(data.draw, ["p", "q"], n_keys=3,
                               band_width=48, band_stride=120,
                               min_size=4, max_size=24)
    for i, r in enumerate(rows):
        r["event_id"] = i
        r["ts"] = _ts(r["_minute"])
        r["v"] = float(i) if r["e"] == "q" else None
    pusher = {"k": "wm", "e": "q", "event_id": 9_999, "ts": _ts(10_000),
              "v": 0.0, "_minute": 10_000}
    src = str(tmp_path / f"fasof_{next(_ids)}")
    _write_arrival_files(src, rows, rng, pusher)

    schema = spark.read.parquet(src).schema
    out = stream_asof_join_forward(
        read_parquet_stream(spark, src, schema, max_files_per_trigger=1),
        by=["k"],
        probe_when=F.col("e") == "p",
        quote_when=F.col("e") == "q",
        value_cols=["v"],
        tolerance="30 minutes",
        probe_id_col="event_id",
        lateness=f"{LATENESS_MIN} minutes",
        direction=direction,
    )
    got = {
        r.event_id: (r.k, r.ts, r.v)
        for r in _drain(out)
        if r.k != "wm"
    }
    all_rows = spark.read.parquet(src).filter(F.col("k") != "wm")
    want = {
        r.event_id: (r.k, r.ts, r.v)
        for r in asof_join(
            all_rows.filter(F.col("e") == "p").select("k", "event_id", "ts"),
            all_rows.filter(F.col("e") == "q").select("k", "ts", "v"),
            by=["k"],
            value_cols=["v"],
            direction=direction,
            tolerance="30 minutes",
        ).collect()
    }
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_prop_stream_shard_writer_exactly_once_batch_equivalent(
    spark, tmp_path, data
):
    """r8 (VERDICT #5): for ANY arrival permutation of a doc corpus and
    ANY micro-batch cut points, the streaming shard writer must
    (1) land every doc EXACTLY once across batch groups,
    (2) produce, per batch group, the IDENTICAL content receipt the
        batch writer produces over that group's doc subset (the
        streaming form is the batch form per micro-batch — bucket
        assignment, offset packing and receipts included), and
    (3) survive a replay of a randomly chosen epoch (foreachBatch
        at-least-once) with a byte-identical receipt."""
    import glob as _glob
    import json as _json

    from mysql_to_s3_spark.pipeline import (
        _shard_stats,
        stream_write_training_shards,
        verify_shards,
        write_training_shards,
    )

    ids = sorted(data.draw(st.sets(st.integers(0, 500), min_size=2, max_size=24)))
    rng = random.Random(data.draw(st.integers(0, 2**31)))
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choices(words, k=rng.randint(1, 30)))}
        for i in ids
    ]
    rng.shuffle(rows)  # the arrival permutation

    uid = next(_ids)
    base = str(tmp_path / f"shard_prop_src_{uid}")
    os.makedirs(base)
    n = len(rows)
    n_cuts = min(rng.randint(0, 4), n - 1)
    cuts = sorted(rng.sample(range(1, n), n_cuts)) if n_cuts else []
    bounds = [0] + cuts + [n]
    full = pd.DataFrame(rows)
    t_base = None
    for i, (a, b) in enumerate(zip(bounds, bounds[1:])):
        p = f"{base}/f{i:03d}.parquet"
        full.iloc[a:b].to_parquet(p)
        if t_base is None:
            t_base = os.path.getmtime(p)
        os.utime(p, (t_base + 10 * i, t_base + 10 * i))

    schema = spark.read.parquet(base).schema
    sdf = read_parquet_stream(spark, base, schema, max_files_per_trigger=1)
    out = str(tmp_path / f"shard_prop_out_{uid}")
    q = stream_write_training_shards(
        sdf, out, budget=16, n_buckets=2, manifest=True, available_now=True
    )
    q.awaitTermination(300)

    batches = sorted(_glob.glob(out + "/batch=*"))
    assert len(batches) == len(bounds) - 1, batches

    landed: list[int] = []
    per_batch: dict[str, list[int]] = {}
    for b in batches:
        docs_b = [
            _json.loads(_json.loads(line)["doc"])["doc_id"]
            for f in _glob.glob(b + "/bucket=*/part-*")
            for line in open(f)
        ]
        per_batch[b] = docs_b
        landed += docs_b
    assert sorted(landed) == ids  # (1) exactly once, across all groups

    for b in batches:
        assert verify_shards(spark, b) == []
        got = _shard_stats(spark, b)
        twin = str(tmp_path / f"twin_{uid}_{os.path.basename(b)}")
        sub = spark.createDataFrame(
            full[full["doc_id"].isin(per_batch[b])], "doc_id bigint, text string"
        )
        write_training_shards(sub, twin, budget=16, n_buckets=2)
        assert _shard_stats(spark, twin) == got  # (2) batch-equivalent

    victim = rng.choice(batches)  # (3) replay idempotence, random epoch
    before = _shard_stats(spark, victim)
    sub = spark.createDataFrame(
        full[full["doc_id"].isin(per_batch[victim])], "doc_id bigint, text string"
    )
    write_training_shards(sub, victim, budget=16, n_buckets=2, mode="overwrite")
    assert _shard_stats(spark, victim) == before
