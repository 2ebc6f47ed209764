"""PromQL aggregation operators over instant vectors (SURVEY §2B).

``sum/min/max/avg/count/stddev/stdvar/group/count_values/quantile/topk/
bottomk`` with ``by(...)`` grouping. Input is an instant-vector DataFrame
``(*series_keys, step_ts, value)`` (from selectors.instant_select or any
function output); grouping keys are a subset of the series keys (``by``) —
``without`` is just the complement, computed by the caller.

PromQL uses *population* stddev/variance (stddev_pop/var_pop) and exact
linear-interpolation quantiles — percentile_approx would not hash-match the
oracle (SURVEY §7 hard-parts #2).

topk/bottomk are per-step row_number windows with a deterministic tie-break
on the series keys. At scale this is the classic "top-k per group" pattern:
a single shuffle on (step, group), no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIMPLE = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c),
    "count": lambda c: F.count(c).cast("double"),
    "stddev": lambda c: F.stddev_pop(c),
    "stdvar": lambda c: F.var_pop(c),
    "group": lambda c: F.first(F.lit(1.0)),
}


def aggregate(
    vec: DataFrame,
    by: Sequence[str],
    fn: str,
    quantile: float | None = None,
    out: str = "value",
) -> DataFrame:
    """``<fn> by(<by>) (vec)`` -> ``(*by, step_ts, <out>)``."""
    by = list(by)
    if fn == "quantile":
        assert quantile is not None
        expr = F.expr(f"percentile(value, {quantile!r})")
    else:
        expr = _SIMPLE[fn]("value")
    return vec.groupBy(*by, "step_ts").agg(expr.alias(out))


def count_values(vec: DataFrame, by: Sequence[str], label: str = "value_label",
                 out: str = "value") -> DataFrame:
    """``count_values("l", vec)``: count of series per distinct sample value."""
    by = list(by)
    return (
        vec.groupBy(*by, "step_ts", F.col("value").alias(label))
        .agg(F.count(F.lit(1)).cast("double").alias(out))
    )


def topk(
    vec: DataFrame,
    by: Sequence[str],
    series_keys: Sequence[str],
    k: int,
    bottom: bool = False,
) -> DataFrame:
    """``topk(k, vec)`` / ``bottomk`` per (step, by-group).

    Ties broken by the series keys so results are deterministic (upstream
    PromQL tie-breaks are unspecified; a fixed order is required for the
    hash-compare oracle).
    """
    by = list(by)
    order = [F.asc("value") if bottom else F.desc("value")] + [
        F.asc(c) for c in series_keys
    ]
    w = Window.partitionBy(*by, "step_ts").orderBy(*order)
    return (
        vec.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
