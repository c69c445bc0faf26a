"""Batch-counter golden tables from the reference
(/root/reference/tests/test_counters.py:24-90): week-duration chain with
10-row sub-batches, including the restart invariance property, plus the
Spark-column analog producing identical key tuples."""

from datetime import datetime

import pytest

from mysql_to_s3_spark.streaming.counters import (
    BatchCounter,
    Counter,
    CounterError,
    DurationCounter,
    batch_key_columns,
    build_counter_chain,
)

WEEK_10_DATA = [
    (datetime(2017, 1, 1), [0, 0, 0]),
    (datetime(2017, 1, 1), [0, 0, 1]),
    (datetime(2017, 1, 1), [0, 0, 2]),
    (datetime(2017, 1, 2), [0, 0, 3]),
    (datetime(2017, 1, 2), [0, 0, 4]),
    (datetime(2017, 1, 2), [0, 0, 5]),
    (datetime(2017, 1, 2), [0, 0, 6]),
    (datetime(2017, 1, 2), [0, 0, 7]),
    (datetime(2017, 1, 2), [0, 0, 8]),
    (datetime(2017, 1, 2), [0, 0, 9]),
    (datetime(2017, 1, 3), [0, 1, 0]),
    (datetime(2017, 1, 4), [0, 1, 1]),
    (datetime(2017, 1, 5), [0, 1, 2]),
    (datetime(2017, 1, 6), [0, 1, 3]),
    (datetime(2017, 1, 7), [0, 1, 4]),
    (datetime(2017, 1, 8), [1, 0, 0]),
    (datetime(2017, 1, 9), [1, 0, 1]),
    (datetime(2017, 1, 9), [1, 0, 2]),
    (datetime(2017, 1, 10), [1, 0, 3]),
    (datetime(2017, 1, 11), [1, 0, 4]),
    (datetime(2017, 1, 11), [1, 0, 5]),
    (datetime(2017, 1, 12), [1, 0, 6]),
    (datetime(2017, 1, 12), [1, 0, 7]),
    (datetime(2017, 1, 12), [1, 0, 8]),
]


def _chain():
    return DurationCounter(
        start=datetime(2017, 1, 1), duration="week", child=BatchCounter(start=0, size=10, child=Counter(0))
    )


def test_week_10_golden():
    c = _chain()
    got = [c.next((d, None)) for d, _ in WEEK_10_DATA]
    assert got == [e for _, e in WEEK_10_DATA]


def test_restart_invariance():
    # no matter where counting restarts from a checkpointed key, the
    # remaining keys are identical (reference test_cut_week_10)
    for cut in range(1, len(WEEK_10_DATA)):
        c = _chain()
        for d, _ in WEEK_10_DATA[:cut]:
            last = c.next((d, None))
        c2 = _chain()
        c2.reset(last)
        # replay the last row to advance the child counter identically
        c2.next((WEEK_10_DATA[cut - 1][0], None))
        got = [c2.next((d, None)) for d, _ in WEEK_10_DATA[cut:]]
        assert got == [e for _, e in WEEK_10_DATA[cut:]], f"cut={cut}"


def test_strictly_increasing_enforced():
    c = _chain()
    c.next((datetime(2017, 2, 1), None))
    with pytest.raises(CounterError):
        c.next((datetime(2017, 1, 1), None))


def test_build_counter_chain_forms():
    c = build_counter_chain(0, 100)
    assert c.next((1,)) == [0, 0]
    c2 = build_counter_chain(datetime(2017, 1, 1), ["day", 1000])
    assert c2.next((datetime(2017, 1, 1), None)) == [0, 0, 0]


def test_spark_batch_key_columns_matches_golden(spark):
    rows = [(i, d) for i, (d, _) in enumerate(WEEK_10_DATA)]
    df = spark.createDataFrame(rows, "seq int, ts timestamp")
    keyed = batch_key_columns(df, "ts", datetime(2017, 1, 1), ["week", 10], tiebreak_cols=["seq"])
    got = {
        r["seq"]: [r["__batch0__"], r["__batch1__"], r["__batch2__"]]
        for r in keyed.collect()
    }
    for i, (_, expected) in enumerate(WEEK_10_DATA):
        assert got[i] == expected, f"row {i}: {got[i]} != {expected}"


DAY_3_DATA = [
    (datetime(2017, 1, 1), [0, 0, 0]),
    (datetime(2017, 1, 1), [0, 0, 1]),
    (datetime(2017, 1, 1), [0, 0, 2]),
    (datetime(2017, 1, 2), [1, 0, 0]),
    (datetime(2017, 1, 2), [1, 0, 1]),
    (datetime(2017, 1, 2), [1, 0, 2]),
    (datetime(2017, 1, 2), [1, 1, 0]),
    (datetime(2017, 1, 2), [1, 1, 1]),
    (datetime(2017, 1, 2), [1, 1, 2]),
    (datetime(2017, 1, 2), [1, 2, 0]),
    (datetime(2017, 1, 3), [2, 0, 0]),
    (datetime(2017, 1, 4), [3, 0, 0]),
    (datetime(2017, 1, 5), [4, 0, 0]),
    (datetime(2017, 1, 6), [5, 0, 0]),
    (datetime(2017, 1, 7), [6, 0, 0]),
    (datetime(2017, 1, 8), [7, 0, 0]),
    (datetime(2017, 1, 9), [8, 0, 0]),
    (datetime(2017, 1, 9), [8, 0, 1]),
    (datetime(2017, 1, 10), [9, 0, 0]),
    (datetime(2017, 1, 11), [10, 0, 0]),
    (datetime(2017, 1, 11), [10, 0, 1]),
    (datetime(2017, 1, 12), [11, 0, 0]),
    (datetime(2017, 1, 12), [11, 0, 1]),
    (datetime(2017, 1, 12), [11, 0, 2]),
]


def test_day_3_golden():
    """reference tests/test_counters.py:132-174 — day buckets, size-3
    sub-batches (batch0 counts days since start, not weeks)."""
    c = DurationCounter(
        start=datetime(2017, 1, 1), duration="day", child=BatchCounter(start=0, size=3, child=Counter(0))
    )
    got = [c.next((d, None)) for d, _ in DAY_3_DATA]
    assert got == [e for _, e in DAY_3_DATA]


def test_parts_of_day_golden():
    """reference tests/test_counters.py:176-199 — values may move
    BACKWARD within a duration bucket (00:01:01 then 00:00:00 on the
    same day): the monotonicity contract applies to the bucket floor,
    not the raw value."""
    data = [
        (datetime(2017, 1, 1), [0, 0, 0]),
        (datetime(2017, 1, 1), [0, 0, 1]),
        (datetime(2017, 1, 1), [0, 0, 2]),
        (datetime(2017, 1, 2, 0, 1, 1), [1, 0, 0]),
        (datetime(2017, 1, 2), [1, 0, 1]),
    ]
    c = DurationCounter(
        start=datetime(2017, 1, 1), duration="day", child=BatchCounter(start=0, size=3, child=Counter(0))
    )
    got = [c.next((d, None)) for d, _ in data]
    assert got == [e for _, e in data]
