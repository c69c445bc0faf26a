"""Incremental batch counters: assign each row of a strictly-increasing
(time, ...) stream a batch key tuple [duration#, sub-batch#, row#].

Two equivalent implementations:

  - Counter / BatchCounter / DurationCounter: driver-side chain with the
    reference's exact semantics (mysql_to_s3/counter.py:20,36,59),
    including restart/reset behavior — golden-tested against the
    reference's own unit tables (tests/test_counters.py:24-60).
  - batch_key_columns(): the Spark-column analog for cluster scale — the
    duration bucket is a floor expression and the sub-batch/row indexes
    are row_number arithmetic inside a window partitioned by the bucket.
    Same key tuples, computed distributed.

Duration floors mirror mo_times (vendor/mo_times/dates.py:57-70):
day-multiples floor on the unix day grid, WEEK floors with a +4 day offset
(weeks start Sunday: 1970-01-04), months floor on the calendar grid.

Late data is rejected like the reference (counter.py:69-70 "Expecting
strictly increasing"); a Structured Streaming port would use a zero-
lateness watermark.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any, Sequence

from mysql_to_s3_spark.functions.dates import parse_duration

_WEEK_OFFSET = 4 * 86400  # unix epoch was a Thursday; +4d anchors Sundays


class CounterError(ValueError):
    pass


def _to_unix(value: Any) -> float:
    if isinstance(value, dt.datetime):
        return value.replace(tzinfo=dt.timezone.utc).timestamp()
    if isinstance(value, dt.date):
        return dt.datetime(value.year, value.month, value.day, tzinfo=dt.timezone.utc).timestamp()
    if isinstance(value, str):
        # extract configs pass date strings (extract.start in config JSON)
        from mysql_to_s3_spark.functions.dates import parse_date_literal

        return float(parse_date_literal(value))
    return float(value)


def floor_duration(unix: float, duration: dict) -> float:
    """mo_times Date.floor: calendar months, Sunday-anchored weeks,
    plain grid otherwise."""
    if duration["months"]:
        d = dt.datetime.utcfromtimestamp(unix)
        month_index = (d.year * 12 + d.month - 1) // duration["months"] * duration["months"]
        year, month = divmod(month_index, 12)
        return dt.datetime(year, month + 1, 1, tzinfo=dt.timezone.utc).timestamp()
    secs = duration["seconds"]
    if secs % (7 * 86400) == 0:
        return math.floor((unix + _WEEK_OFFSET) / secs) * secs - _WEEK_OFFSET
    return math.floor(unix / secs) * secs


def duration_key(unix: float, start_unix: float, duration: dict) -> int:
    """Bucket index of ``unix`` relative to floor(start)."""
    if duration["months"]:
        d = dt.datetime.utcfromtimestamp(floor_duration(unix, duration))
        s = dt.datetime.utcfromtimestamp(floor_duration(start_unix, duration))
        return ((d.year * 12 + d.month) - (s.year * 12 + s.month)) // duration["months"]
    return int(round((floor_duration(unix, duration) - floor_duration(start_unix, duration)) / duration["seconds"]))


class Counter:
    """Plain row counter (reference counter.py:20)."""

    def __init__(self, start: int = 0):
        self.count = start

    def next(self, value=None) -> list[int]:
        out = self.count
        self.count += 1
        return [out]

    def reset(self, start: Sequence[int] | None = None) -> None:
        self.count = start[0] if start else 0


class BatchCounter:
    """Counts sub-batches of ``size`` rows (reference counter.py:36)."""

    def __init__(self, start: int, size: int, child):
        self.next_output = start
        self.size = size
        self.child = child

    def next(self, value=None) -> list[int]:
        out = self.next_output
        c = self.child.next(value[1:] if isinstance(value, (list, tuple)) else None)
        if c[0] >= self.size - 1:
            self.next_output += 1
            self.child.reset()
        return [out] + c

    def reset(self, start: Sequence[int] | None = None) -> None:
        if start:
            self.next_output = start[0]
            self.child.reset(start[1:])
        else:
            self.next_output = 0
            self.child.reset()


class DurationCounter:
    """Time-bucket counter (reference counter.py:59): floors the leading
    value to ``duration`` buckets, resetting the child on rollover.
    Rejects non-increasing input like the reference."""

    def __init__(self, start, duration: str, child):
        self.duration = parse_duration(duration)
        self.start = floor_duration(_to_unix(start), self.duration)
        self.last_value = self.start
        self.batch = 0
        self.child = child

    def next(self, value) -> list[int]:
        v = _to_unix(value[0] if isinstance(value, (list, tuple)) else value)
        if floor_duration(self.last_value, self.duration) > v:
            raise CounterError("Expecting strictly increasing values")
        self.last_value = v
        key = duration_key(v, self.start, self.duration)
        if key != self.batch:
            self.child.reset()
            self.batch = key
        c = self.child.next(value[1:] if isinstance(value, (list, tuple)) else None)
        return [self.batch] + c

    def reset(self, start: Sequence[int] | None = None) -> None:
        if start:
            self.batch = start[0]
            self.child.reset(start[1:])
        else:
            self.child.reset()


def build_counter_chain(start, batch_spec) -> Any:
    """Reference config form ``extract.batch``: int -> BatchCounter;
    ["day", 1000] -> DurationCounter(day) ∘ BatchCounter(1000) ∘ Counter
    (extract.py:112-118)."""
    if isinstance(batch_spec, int):
        return BatchCounter(0, batch_spec, Counter(0))
    duration, size = batch_spec
    return DurationCounter(start=start, duration=duration, child=BatchCounter(0, size, Counter(0)))


# ---------------------------------------------------------------------------
# Spark-column analog (the scale path)


def batch_key_columns(
    df,
    value_col: str,
    start,
    batch_spec,
    tiebreak_cols: Sequence[str] = (),
    offsets: dict[int, int] | None = None,
):
    """Add __batch0__/__batch1__/__batch2__ columns equal to the counter
    chain's key tuple, computed distributed.

    duration bucket = floor expression (no shuffle); sub-batch and row
    index = one window shuffle partitioned by the bucket. Skew bound: a
    bucket holds at most one duration of data.

    ``offsets`` maps a duration bucket -> rows already numbered in earlier
    calls (BatchCounter continuation): row numbering inside that bucket
    starts after them instead of at 0. Bounded by elapsed durations, so a
    literal map expression suffices.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if isinstance(batch_spec, int):
        duration, size = None, batch_spec
    else:
        duration, size = parse_duration(batch_spec[0]), batch_spec[1]

    v = F.col(value_col).cast("timestamp").cast("double")
    if duration is None:
        bucket = F.lit(0)
    elif duration["months"]:
        start_floor = dt.datetime.utcfromtimestamp(floor_duration(_to_unix(start), duration))
        months = F.floor(
            F.months_between(
                F.col(value_col).cast("timestamp"),
                F.lit(start_floor.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"),
            )
        )
        bucket = F.floor(months / duration["months"])
    else:
        secs = duration["seconds"]
        if secs % (7 * 86400) == 0:
            flo = F.floor((v + _WEEK_OFFSET) / secs) * secs - _WEEK_OFFSET
        else:
            flo = F.floor(v / secs) * secs
        start_floor = floor_duration(_to_unix(start), duration)
        bucket = ((flo - F.lit(start_floor)) / secs).cast("bigint")

    w = Window.partitionBy(bucket).orderBy(F.col(value_col), *[F.col(c) for c in tiebreak_cols])
    rn = F.row_number().over(w) - 1
    if offsets:
        m = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        rn = rn + F.coalesce(m[bucket.cast("bigint")], F.lit(0))
    # materialize the row number ONCE: deriving batch1 and batch2 straight
    # from the window expression plants two copies with distinct expr IDs,
    # which Catalyst cannot merge — two Window operators, two Exchanges
    # and Sorts over the same partitioning (observed in the plan)
    return (
        df.withColumn("__batch0__", bucket.cast("bigint"))
        .withColumn("__rn__", rn)
        .withColumn("__batch1__", (F.col("__rn__") / size).cast("bigint"))
        .withColumn("__batch2__", F.col("__rn__") % size)
        .drop("__rn__")
    )
