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

def upstream_avg(c) -> "F.Column":
    """Upstream avg semantics (funcAvgOverTime / engine.go avg): the
    incremental-Kahan mean never overflows on FINITE inputs — the mean
    of two 1.7e308 samples is 1.7e308, not +Inf. A plain sum/count
    overflows, so: take the cheap distributive avg unless it came out
    ±Inf without any ±Inf input, and in that case rescale by 2^-64
    (exact for the huge doubles that caused the overflow — power-of-two
    scaling loses no bits on normal values) and scale back. NaN inputs
    and genuine ±Inf inputs take the plain-avg branch, whose
    NaN/±Inf propagation already matches the upstream loop.

    Fully distributive — three combiner-friendly aggregates, no
    collect, no second pass — at the cost of matching upstream to ~1
    ulp rather than bit-for-bit (upstream's own result depends on its
    sequential Kahan order anyway).
    """
    c = F.col(c) if isinstance(c, str) else c
    plain = F.avg(c)
    any_inf = F.max((F.abs(c) == float("inf")).cast("int")) == 1
    rescaled = F.avg(c * F.lit(2.0 ** -64)) * F.lit(2.0 ** 64)
    return (
        F.when(F.abs(plain) != float("inf"), plain)  # finite or NaN
        .when(any_inf, plain)
        .otherwise(rescaled)
    )


_SIMPLE = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    # upstream max skips NaN unless every value is NaN (engine.go
    # aggregation: ``if group.floatValue < s.F || math.IsNaN(...)``);
    # Spark's plain max would return NaN whenever ONE series is NaN.
    # min needs no wrapper: Spark orders NaN above every number, so min
    # already picks the smallest non-NaN (all-NaN still yields NaN).
    "max": lambda c: F.coalesce(
        F.max(F.when(~F.isnan(c), F.col(c) if isinstance(c, str) else c)),
        F.max(c),
    ),
    "avg": upstream_avg,
    "count": lambda c: F.count(c).cast("double"),
    "stddev": lambda c: F.stddev_pop(c),
    "stdvar": lambda c: F.var_pop(c),
    "group": lambda c: F.first(F.lit(1.0)),
}


def prom_quantile_expr(vals: str, q: float) -> str:
    """Upstream quantile over a collected value array, exactly as
    promql/quantile.go computes it: NaN sorts FIRST
    (vectorByValueHeap.Less returns true for NaN), the rank is
    ``q * (n - 1)`` and the result is ``lo*(1-w) + hi*w`` — so a NaN
    adjacent to the rank position propagates into the result, and
    q outside [0, 1] yields ±Inf. Spark's built-in ``percentile``
    instead sorts NaN ABOVE +Inf and would put the NaNs at the wrong
    end of every window.

    Implementation: drop the NaNs, native-sort the remainder, and treat
    the k dropped NaNs as occupying the first k sorted slots. The
    sorted array is bound once via a one-element ``transform`` so the
    sort runs once per group.
    """
    if q != q:  # NaN q
        return "CAST('NaN' AS DOUBLE)"
    if q < 0:
        return "CAST('-Infinity' AS DOUBLE)"
    if q > 1:
        return "CAST('Infinity' AS DOUBLE)"
    n = f"size({vals})"
    rank = f"({q!r}D * ({n} - 1))"
    w = f"({rank} - floor({rank}))"
    li = f"CAST(floor({rank}) AS INT)"
    ui = f"CAST(least(CAST({n} - 1 AS DOUBLE), floor({rank}) + 1D) AS INT)"

    def at(idx: str) -> str:
        # index < k (the NaN prefix) -> NaN, else the sorted non-NaN
        return (
            f"IF({idx} < {n} - size(_s), CAST('NaN' AS DOUBLE),"
            f" element_at(_s, {idx} - ({n} - size(_s)) + 1))"
        )

    return (
        f"element_at(transform(array(array_sort(filter({vals},"
        f" x -> NOT isnan(x)))), _s ->"
        f" {at(li)} * (1D - {w}) + {at(ui)} * {w}), 1)"
    )


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
        g = vec.groupBy(*by, "step_ts").agg(
            F.collect_list("value").alias("_vals")
        )
        return g.select(
            *by, "step_ts",
            F.expr(prom_quantile_expr("_vals", quantile)).alias(out),
        )
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


def two_phase_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    shard_cols: Sequence[str],
    n_shards: int = 16,
    rank_col: str | None = None,
) -> DataFrame:
    """Shared two-phase "top-k per group" kernel (topk/bottomk, limitk,
    ANN per-query rerank all use it): a partial window keyed by a
    content-derived shard of ``shard_cols`` takes each shard's top-k,
    then the merge window ranks only the ``k * n_shards`` shard winners —
    identical output to one window (a row outside its shard's top-k
    cannot be in the group's top-k), but no task ever sorts a whole
    group.

    With ``shard_cols`` empty (e.g. ``topk`` over a fully-aggregated
    vector, where each group holds at most one row per step and
    ``xxhash64`` would have zero args) the partial phase is skipped —
    single-window ranking is already scale-safe there.
    """
    order_cols = list(order_cols)
    if not order_cols:
        # limitk over a fully-aggregated vector: no series keys to sort
        # by, and a window cannot have an empty ORDER BY — any constant
        # order is correct (each group holds at most one row per step)
        order_cols = [F.asc("value")]
    if shard_cols:
        sharded = df.withColumn(
            "_shard",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in shard_cols]), F.lit(n_shards)
            ),
        )
        w1 = Window.partitionBy(*partition_cols, "_shard").orderBy(*order_cols)
        df = (
            sharded.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_shard", "_r1")
        )
    out = rank_col or "_rank"
    w2 = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    ranked = df.withColumn(out, F.row_number().over(w2)).filter(
        F.col(out) <= k
    )
    return ranked if rank_col else ranked.drop(out)


def limitk(
    vec: DataFrame,
    by: Sequence[str],
    series_keys: Sequence[str],
    k: int,
) -> DataFrame:
    """``limitk(k, vec)`` (Prometheus experimental, promql/functions):
    at most k series per (step, by-group).

    Upstream's pick order is unspecified; here it is the series-key sort
    order — deterministic, required for the hash-compare oracle. Same
    two-phase shape as :func:`topk` so one mega-group never sorts in a
    single task.
    """
    by = list(by)
    return two_phase_topk(
        vec,
        [*by, "step_ts"],
        [F.asc(c) for c in series_keys],
        k,
        shard_cols=series_keys,
    )


def _hex_fraction_expr(key_col: str, digits: int = 6) -> str:
    """Uniform fraction in [0, 1) from the first ``digits`` hex chars of
    an md5 key — plain ``instr``/``substring`` arithmetic, valid verbatim
    in both Spark SQL and DuckDB so the oracle replays it exactly."""
    nibbles = [
        f"(instr('0123456789abcdef', substring({key_col}, {i + 1}, 1)) - 1)"
        for i in range(digits)
    ]
    val = " + ".join(
        f"{nib} * {16 ** (digits - 1 - i)}" for i, nib in enumerate(nibbles)
    )
    return f"(({val}) / {16 ** digits}.0)"


def limit_ratio(
    vec: DataFrame,
    by: Sequence[str],
    series_keys: Sequence[str],
    r: float,
) -> DataFrame:
    """``limit_ratio(r, vec)`` (Prometheus experimental): deterministic
    per-series sampling by label-hash threshold — upstream keeps series
    whose labels hash below ``r * maxUint64``, and a NEGATIVE r selects
    the exact complement (limit_ratio(0.7) + limit_ratio(-0.3) = all).

    Here the hash is the md5 of the joined series-key values, mapped to a
    fraction — step-independent, so a series is kept at every step or
    none. Zero shuffle: a narrow filter over the vector.
    """
    key = F.md5(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in series_keys]
        ).cast("binary")
    )
    df = vec.withColumn("_lr_key", key).withColumn(
        "_lr_frac", F.expr(_hex_fraction_expr("_lr_key"))
    )
    cond = (
        F.col("_lr_frac") < r if r >= 0 else F.col("_lr_frac") >= 1.0 + r
    )
    return df.filter(cond).drop("_lr_key", "_lr_frac")


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
    # NaN ranks LAST for both directions (upstream aggregationK evicts a
    # NaN heap head for any non-NaN sample: topk ranks NaN below every
    # number, bottomk above) — Spark's desc ordering would otherwise put
    # NaN first in topk. NaN series still fill slots when fewer than k
    # non-NaN series exist.
    order = [F.asc(F.isnan(F.col("value")))] + [
        F.asc("value") if bottom else F.desc("value")
    ] + [F.asc(c) for c in series_keys]
    return two_phase_topk(
        vec, [*by, "step_ts"], order, k, shard_cols=series_keys
    )
