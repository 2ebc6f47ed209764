"""PromQL selectors as DataFrame programs.

Instant vector selector ``m{...}`` (SURVEY §2B, compliance yml:46-66): at
each grid step ``t`` return, per series, the most recent sample in
``(t - lookback, t]`` (lookback delta = 5 min, reference
api/promql/engine.go:43). Range selector ``m[r]``: all samples in
``(t - r, t]`` per (series, step).

Scale notes
-----------
* The instant selector is implemented as **one shuffle by series**: sample
  rows and grid-marker rows are unioned and a single ``last_value`` window
  pass resolves the as-of lookup. No range join, no per-step re-scan of the
  fact table — the cost is O(points + series x steps) regardless of the
  lookback/step ratio.
* The range selector uses the bucketed equi-join from ``grid.py``: the grid
  side explodes into overlapped buckets and the join is a hash join on
  ``bucket`` (broadcast when the grid is small), never a nested loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from squirreldb_spark.tsdb.grid import bucket_size_ms, data_grid, grid_with_buckets

LOOKBACK_MS = 300_000  # PromQL lookback delta, api/promql/engine.go:43


def instant_select(
    points: DataFrame,
    series_keys: Sequence[str],
    step_ms: int,
    lookback_ms: int = LOOKBACK_MS,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Instant vector: columns ``(*series_keys, step_ts, value)``.

    Rows where no sample exists within the lookback window are absent
    (PromQL staleness semantics: the series vanishes from the vector).
    """
    if grid is None:
        grid = data_grid(points, step_ms)
    keys = list(series_keys)

    series = points.select(*keys).distinct()
    # grid markers: one row per (series, step) with a NULL value
    markers = series.crossJoin(F.broadcast(grid)).select(
        *keys,
        F.col("step_ts").alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("long").alias("sample_ts"),
        F.lit(0).alias("is_sample"),
    )
    samples = points.select(
        *keys,
        "ts",
        F.col("value"),
        F.col("ts").alias("sample_ts"),
        F.lit(1).alias("is_sample"),
    )
    # order samples before markers at equal ts so a sample AT the step is seen
    w = (
        Window.partitionBy(*keys)
        .orderBy("ts", F.desc("is_sample"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = (
        samples.unionByName(markers)
        .withColumn("last_value", F.last("value", ignorenulls=True).over(w))
        .withColumn("last_ts", F.last("sample_ts", ignorenulls=True).over(w))
    )
    return (
        resolved.filter(F.col("is_sample") == 0)
        .filter(F.col("last_ts") > F.col("ts") - F.lit(lookback_ms))
        .select(*keys, F.col("ts").alias("step_ts"), F.col("last_value").alias("value"))
    )


def range_select(
    points: DataFrame,
    series_keys: Sequence[str],
    step_ms: int,
    range_ms: int,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Range vector: all samples in ``(step_ts - range_ms, step_ts]``.

    Columns ``(*series_keys, step_ts, ts, value)``. One fact row appears
    under every step whose window covers it (ceil(range/step) copies).
    """
    if grid is None:
        grid = data_grid(points, step_ms)
    keys = list(series_keys)
    gb = grid_with_buckets(grid, step_ms, range_ms)
    bucket_ms = bucket_size_ms(step_ms, range_ms)
    pts = points.withColumn("bucket", F.expr(f"ts div {bucket_ms}"))
    joined = pts.join(F.broadcast(gb), on="bucket", how="inner").filter(
        (F.col("ts") > F.col("step_ts") - F.lit(range_ms))
        & (F.col("ts") <= F.col("step_ts"))
    )
    # keep any extra columns the caller attached (e.g. precomputed lags)
    return joined.select(*[c for c in points.columns if c != "bucket"], "step_ts")
