"""PromQL long-tail functions (SURVEY §2B, yml:166-243).

* ``histogram_quantile`` — classic Prometheus bucket interpolation over a
  vector carrying an ``le`` label: cumulative-count window + linear
  interpolation inside the located bucket. Pure window/group expressions.
* ``deriv`` / ``predict_linear`` — per-window least squares via
  ``covar_pop/var_pop`` aggregates (SURVEY §2B table maps them exactly so).
* ``absent`` — grid anti-join.
* date functions — PromQL conventions (day_of_week: 0=Sunday) computed
  with engine-independent integer epoch arithmetic where possible.
* ``label_replace`` / ``label_join`` — column derivation (our label model
  is promoted columns, SURVEY §1.5).
* ``holt_winters`` — the one genuinely sequential recurrence: an
  Arrow-batched ``applyInPandas`` per (series, step) window (SURVEY §7
  hard-parts #4).
* ``export_pivot`` — A35: the remote-read -> Parquet wide export
  (one row per ts, one column per series) as ``groupBy().pivot()``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from squirreldb_spark.tsdb.selectors import range_select


def histogram_quantile(
    vec: DataFrame,
    q: float,
    group_keys: Sequence[str],
    le_col: str = "le",
    out: str = "value",
) -> DataFrame:
    """Prometheus bucket-interpolation quantile.

    ``vec``: (group_keys..., step_ts, le_col DOUBLE (inf for +Inf), value =
    cumulative count). Returns (group_keys..., step_ts, out).

    Algorithm (upstream bucketQuantile, promql/quantile.go): enforce
    bucket-count monotonicity (running max — scrape races can produce
    dips), rank = q * total, locate the first bucket whose cumulative
    count >= rank and linear-interpolate between its bounds. Special
    cases, all upstream: phi NaN/<0/>1 -> NaN/-Inf/+Inf per series; no
    +Inf bucket or fewer than two buckets or an empty histogram -> NaN;
    rank in the +Inf bucket -> highest finite le; the lowest bucket
    interpolates from 0 only when its upper bound is positive, else
    returns the bound itself.
    """
    keys = list(group_keys) + ["step_ts"]
    if q != q or q < 0 or q > 1:
        const = float("nan") if q != q else (float("-inf") if q < 0 else float("inf"))
        return (
            vec.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(*keys, F.lit(const).alias(out))
        )
    wg = Window.partitionBy(*keys)
    w = wg.orderBy(F.col(le_col))
    mono = F.max("value").over(w.rowsBetween(Window.unboundedPreceding, 0))
    enriched = (
        vec.withColumn("value", mono)  # ensureMonotonic: clamp dips
        .withColumn("prev_le", F.lag(le_col).over(w))
        .withColumn("prev_count", F.lag("value").over(w))
        .withColumn("total", F.max("value").over(wg))
        .withColumn("max_finite_le",
                    F.max(F.when(~F.col(le_col).isin(float("inf")), F.col(le_col)))
                    .over(wg))
        .withColumn("has_inf",
                    F.max((F.col(le_col) == float("inf")).cast("int")).over(wg) == 1)
        .withColumn("n_buckets", F.count(F.lit(1)).over(wg))
    )
    rank = F.lit(q) * F.col("total")
    # first bucket reaching the rank
    w2 = Window.partitionBy(*keys).orderBy(F.col(le_col))
    hit = (
        enriched.filter(F.col("value") >= rank)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
    )
    lower = F.coalesce(F.col("prev_le"), F.lit(0.0))
    prev_c = F.coalesce(F.col("prev_count"), F.lit(0.0))
    bucket_n = F.col("value") - prev_c
    # an empty histogram (total 0, so rank 0 and every bucket count 0)
    # would interpolate 0/0 — ANSI raises; upstream returns NaN
    interp = F.when(
        bucket_n == 0, F.lit(float("nan"))
    ).otherwise(lower + (F.col(le_col) - lower) * (rank - prev_c) / bucket_n)
    value = (
        # not a conformant histogram: no +Inf bucket, or only +Inf
        F.when(~F.col("has_inf") | (F.col("n_buckets") < 2), F.lit(float("nan")))
        .when(F.col(le_col) == float("inf"), F.col("max_finite_le"))
        # lowest bucket with a non-positive bound: no zero anchor below it
        .when(F.col("prev_le").isNull() & (F.col(le_col) <= 0), F.col(le_col))
        .otherwise(interp)
    )
    return hit.select(*keys, value.alias(out))


def linreg(
    points: DataFrame,
    keys: Sequence[str],
    step_ms: int,
    range_ms: int,
    predict_s: float | None = None,
    grid: DataFrame | None = None,
    out: str = "value",
) -> DataFrame:
    """``deriv`` (predict_s=None -> slope per second) and
    ``predict_linear(v[r], t)`` (slope * t + intercept at eval time).

    Least squares with x = (ts - step_ts)/1000 (seconds relative to the
    evaluation time, matching upstream's interceptTime for predict_linear;
    the slope is translation-invariant so deriv is unaffected).
    """
    keys = list(keys)
    rs = range_select(points, keys, step_ms, range_ms, grid=grid)
    x = (F.col("ts") - F.col("step_ts")) / F.lit(1000.0)
    agg = rs.withColumn("x", x).groupBy(*keys, "step_ts").agg(
        F.count("value").alias("n"),
        F.covar_pop("x", "value").alias("cov"),
        F.var_pop("x").alias("var"),
        F.avg("x").alias("mx"),
        F.avg("value").alias("my"),
    ).filter((F.col("n") >= 2) & (F.col("var") > 0))
    slope = F.col("cov") / F.col("var")
    if predict_s is None:
        return agg.select(*keys, "step_ts", slope.alias(out))
    intercept = F.col("my") - slope * F.col("mx")  # value at x=0 == step_ts
    return agg.select(
        *keys, "step_ts", (slope * F.lit(predict_s) + intercept).alias(out)
    )


def absent(
    vec: DataFrame,
    grid: DataFrame,
    keys: Sequence[str],
    const_labels: dict[str, str] | None = None,
) -> DataFrame:
    """``absent(v)``: 1 at every step where the vector has no sample.

    ``const_labels`` are the labels upstream Prometheus derives from the
    selector's equality matchers (promql/functions.go
    createLabelsForAbsentFunction): absent(up{job="api"}) yields
    {job="api"} rows, not a bare label-less vector.
    """
    present = vec.select("step_ts").distinct()
    out = grid.join(present, on="step_ts", how="left_anti")
    cols = list(const_labels or {})
    for k, v in (const_labels or {}).items():
        out = out.withColumn(k, F.lit(v))
    return out.select(*cols, "step_ts", F.lit(1.0).alias("value"))


# PromQL date functions. day_of_week uses pure integer arithmetic
# (1970-01-01 was a Thursday); calendar parts go through the session-UTC
# timestamp conversion.
def date_parts(vec: DataFrame, ts_col: str = "step_ts") -> DataFrame:
    ts = F.timestamp_millis(F.col(ts_col))
    epoch_days = F.floor(F.col(ts_col) / F.lit(86_400_000))
    return (
        vec.withColumn("day_of_week", ((epoch_days + 4) % 7).cast("double"))
        .withColumn("day_of_month", F.dayofmonth(ts).cast("double"))
        .withColumn("day_of_year", F.dayofyear(ts).cast("double"))
        .withColumn("month", F.month(ts).cast("double"))
        .withColumn("year", F.year(ts).cast("double"))
        .withColumn("hour", F.hour(ts).cast("double"))
        .withColumn("minute", F.minute(ts).cast("double"))
        .withColumn(
            "days_in_month", F.dayofmonth(F.last_day(ts)).cast("double")
        )
    )


def label_replace(
    vec: DataFrame, dst: str, replacement_template: str, src: str, regex: str
) -> DataFrame:
    """``label_replace(v, dst, "$1-x", src, re)``: full-anchored match; on
    match the template (with $1..$9 groups) is written to dst, else dst is
    unchanged/copied. Template limited to a single group reference + text
    (covers the compliance corpus usage)."""
    import re as _re

    anchored = f"^(?:{regex})$"
    src_c = F.col(src).cast("string")
    matched = src_c.rlike(anchored)
    # Java's regexp_replace already reads $N as a group reference; a
    # LITERAL dollar not followed by a group number would make the Java
    # Matcher throw at execution, so escape those (upstream Go Expand
    # emits them verbatim)
    template = _re.sub(r"\$(?![0-9])", r"\\$", replacement_template)
    replaced = F.regexp_replace(src_c, anchored, template)
    existing = F.col(dst).cast("string") if dst in vec.columns else F.lit("")
    return vec.withColumn(dst, F.when(matched, replaced).otherwise(existing))


def label_join(vec: DataFrame, dst: str, sep: str, sources: Sequence[str]) -> DataFrame:
    """``label_join(v, dst, sep, src...)``: concatenation of label values."""
    return vec.withColumn(
        dst, F.concat_ws(sep, *[F.col(s).cast("string") for s in sources])
    )


def holt_winters(
    points: DataFrame,
    keys: Sequence[str],
    step_ms: int,
    range_ms: int,
    sf: float,
    tf: float,
    grid: DataFrame | None = None,
    out: str = "value",
) -> DataFrame:
    """Double exponential smoothing over each (series, step) window.

    The recurrence (s_i from s_{i-1}, b_i from b_{i-1}) cannot be expressed
    as a grouped aggregate, so this is the designated pandas path:
    ``applyInPandas`` per group, Arrow-batched, smoothing in numpy inside
    the worker. Matches upstream holt_winters: s0 = v[0], b0 = v[1]-v[0],
    needs >= 2 samples.
    """
    keys = list(keys)
    rs = range_select(points, keys, step_ms, range_ms, grid=grid)
    schema_keys = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in rs.select(*keys, "step_ts").schema.fields
    )
    schema = f"{schema_keys}, {out} double"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        # value tie-break: applyInPandas input order is shuffle-dependent,
        # so equal timestamps must still order deterministically
        pdf = pdf.sort_values(["ts", "value"])
        v = pdf["value"].to_numpy()
        head = pdf.iloc[:1][keys + ["step_ts"]]
        if len(v) < 2:
            return head.iloc[0:0].assign(**{out: 0.0})
        s, b = v[0], v[1] - v[0]
        for i in range(1, len(v)):
            x = sf * v[i]
            s_prev = s
            s = x + (1 - sf) * (s_prev + b)
            b = tf * (s - s_prev) + (1 - tf) * b
        return head.assign(**{out: [float(s)]})

    return rs.groupBy(*keys, "step_ts").applyInPandas(smooth, schema=schema)


def export_pivot(
    points: DataFrame, series_col: str, series_values: Sequence[str], ts_col: str = "ts"
) -> DataFrame:
    """A35: wide export — one row per timestamp, one column per series
    (cmd/prom-remote-storage-to-parquet/export.go:238-305). The explicit
    ``series_values`` list keeps the schema deterministic (and lets Spark
    skip the value-discovery scan)."""
    return (
        points.groupBy(ts_col)
        .pivot(series_col, list(series_values))
        .agg(F.max("value"))  # max: deterministic under duplicate timestamps
    )


def import_pivot(
    wide: DataFrame, series_col: str, series_values: Sequence[str], ts_col: str = "ts"
) -> DataFrame:
    """A35 inverse: melt the wide export back into tall points
    (cmd/prom-remote-storage-to-parquet/import.go). ``stack`` is a narrow
    projection — no shuffle; NULL cells (series absent at that ts) drop."""
    pairs = ", ".join(f"'{v}', `{v}`" for v in series_values)
    melted = wide.select(
        F.col(ts_col),
        F.expr(f"stack({len(series_values)}, {pairs}) AS ({series_col}, value)"),
    )
    return melted.filter(F.col("value").isNotNull())
