"""Evaluation grid: the `steps` relation of a PromQL range query.

A range query evaluates every expression at ``start, start+step, ..., end``
(SURVEY §2B). Here the grid is itself a DataFrame derived *inside the plan*
from the data's time bounds (1-row aggregate -> sequence -> explode), so no
driver-side collect happens and Catalyst can broadcast it — the grid is tiny
(thousands of rows) next to the fact table.

All times are epoch milliseconds (reference types/metric.go:35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def data_grid(points: DataFrame, step_ms: int, ts_col: str = "ts") -> DataFrame:
    """Grid aligned to ``step_ms`` covering the data's [min_ts, max_ts].

    start = ceil(min_ts / step) * step, end = floor(max_ts / step) * step,
    inclusive — integer arithmetic only, so a SQL oracle reproduces it
    bit-exactly. Returns a single-column DataFrame ``step_ts``.
    """
    bounds = points.agg(
        F.min(ts_col).alias("min_ts"), F.max(ts_col).alias("max_ts")
    )
    start = f"((min_ts + {step_ms} - 1) div {step_ms}) * {step_ms}"
    end = f"(max_ts div {step_ms}) * {step_ms}"
    # empty array when no step falls inside [min_ts, max_ts] (sequence()
    # rejects start > end) or the input has no rows at all
    return bounds.select(
        F.explode(
            F.expr(
                f"CASE WHEN min_ts IS NOT NULL AND {start} <= {end}"
                f" THEN sequence({start}, {end}, {step_ms})"
                f" ELSE array() END"
            )
        ).alias("step_ts")
    )


def bucket_size_ms(step_ms: int, range_ms: int) -> int:
    """Bucket width for the range-join rewrite.

    ``step_ms`` minimizes false pairs (each point meets exactly the steps
    whose window covers it), but a step much finer than the range (instant
    queries use step=1 ms) would explode the grid side by
    ``range/step`` rows per step. Floor the width at ``range/32`` so the
    grid-side blowup is bounded by 33 rows per step while the residual
    filter still discards only a ~3% overshoot per bucket.
    """
    return max(step_ms, range_ms // 32, 1)


def grid_with_buckets(grid: DataFrame, step_ms: int, range_ms: int) -> DataFrame:
    """Explode each grid step into the bucket ids its lookback window
    ``(step_ts - range_ms, step_ts]`` overlaps.

    This turns the range join "point.ts in window(step)" into a plain
    equi-join on ``bucket`` + a residual filter — a broadcastable hash join
    instead of a nested-loop theta join. Blowup factor is
    ``range_ms/bucket + 1`` rows per step, on the tiny side only.
    """
    bucket_ms = bucket_size_ms(step_ms, range_ms)
    return grid.select(
        "step_ts",
        F.explode(
            F.expr(
                f"sequence((step_ts - {range_ms}) div {bucket_ms},"
                f" step_ts div {bucket_ms})"
            )
        ).alias("bucket"),
    )
