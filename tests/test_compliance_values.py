"""VALUES tier of the compliance corpus (VERDICT r4 #5).

The executed corpus in test_compliance.py proves every query template
RUNS; this tier proves a stratified subset — one query per template
family — produces the exact values Prometheus semantics require.  The
expectations are computed by an INDEPENDENT pure-Python mini-evaluator
over the same fixture rows (no Spark, no planner code): instant-vector
lookback, left-open range windows, the extrapolated-rate algorithm,
Prometheus quantile interpolation, date functions, linear regression and
double-exponential smoothing are each re-implemented here directly from
the public upstream semantics (prometheus/promql/functions.go), so a
symmetric engine/oracle drift cannot hide.

Reference corpus: tests/promql-compliance-test/promql-test-queries.yml
(template families); upstream value semantics: promql/functions.go,
promql/quantile.go, promql/engine.go (subquery alignment).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest

from test_compliance import fixture_rows, make_compliance_engine

# slow tier (VERDICT r15 #2): 210 s value matrix; the edges suite stays
# in the default tier
pytestmark = pytest.mark.slow

GRID = [0, 30_000, 60_000, 90_000, 120_000]
LOOKBACK = 60_000
STEP = 30_000


@pytest.fixture(scope="module")
def ceng(spark):
    return make_compliance_engine(spark)


# ------------------------------------------------ independent evaluator


def _series() -> dict[tuple, list[tuple]]:
    out: dict[tuple, list[tuple]] = {}
    for inst, typ, name, ts, v in fixture_rows():
        out.setdefault((name, inst, typ), []).append((ts, v))
    for k in out:
        out[k].sort()
    return out


SERIES = _series()


def sel(name: str) -> dict[tuple, list[tuple]]:
    """All series of a metric -> {(instance, type): [(ts, value)]}."""
    return {(i, ty): s for (n, i, ty), s in SERIES.items() if n == name}


def inst_val(samples, t, offset=0, lookback=LOOKBACK):
    """Instant-vector value at t: newest sample in (t-lookback, t]."""
    t -= offset
    cand = [v for ts, v in samples if t - lookback < ts <= t]
    return cand[-1] if cand else None


def window(samples, t, rng, offset=0):
    """Range-vector window at t: samples with ts in (t-rng, t]."""
    t -= offset
    return [(ts, v) for ts, v in samples if t - rng < ts <= t]


def pmean(vals):
    return sum(vals) / len(vals)


def pstdvar(vals):
    m = pmean(vals)
    return sum((v - m) ** 2 for v in vals) / len(vals)  # population


def pquantile(q, vals):
    """promql/quantile.go: linear interpolation at rank q*(n-1).
    NaN sorts FIRST (vectorByValueHeap.Less returns true for NaN)."""
    if not vals:
        return float("nan")
    if q < 0:
        return float("-inf")
    if q > 1:
        return float("inf")
    s = sorted(vals, key=lambda v: (0 if math.isnan(v) else 1, v))
    n = len(s)
    rank = q * (n - 1)
    lo = int(math.floor(rank))
    hi = min(lo + 1, n - 1)
    w = rank - lo
    return s[lo] * (1 - w) + s[hi] * w


def extrapolated(w, rng_ms, t, kind):
    """promql/functions.go extrapolatedRate: rate/increase/delta."""
    if len(w) < 2:
        return None
    (ft, fv), (lt, lv) = w[0], w[-1]
    result = lv - fv
    if kind in ("rate", "increase"):  # counter reset correction
        prev = fv
        for _, v in w[1:]:
            if v < prev:
                result += prev
            prev = v
    dur_start = (ft - (t - rng_ms)) / 1000
    dur_end = (t - lt) / 1000
    sampled = (lt - ft) / 1000
    avg_between = sampled / (len(w) - 1)
    # prometheus v0.307.x order: threshold rewrite first, then the
    # zero-crossing clamp takes min(durationToStart, durationToZero)
    thresh = avg_between * 1.1
    if dur_start >= thresh:
        dur_start = avg_between / 2
    if kind in ("rate", "increase") and result > 0 and fv >= 0:
        dur_zero = sampled * (fv / result)
        if dur_zero < dur_start:
            dur_start = dur_zero
    if dur_end >= thresh:
        dur_end = avg_between / 2
    extrap = sampled + dur_start + dur_end
    factor = extrap / sampled
    if kind == "rate":
        factor /= rng_ms / 1000
    return result * factor


def linreg(w, intercept_at_ms):
    """promql/functions.go linearRegression (x in seconds)."""
    n = float(len(w))
    sx = sy = sxy = sx2 = 0.0
    for ts, v in w:
        x = (ts - intercept_at_ms) / 1000
        sx += x
        sy += v
        sxy += x * v
        sx2 += x * x
    cov = sxy - sx * sy / n
    var = sx2 - sx * sx / n
    slope = cov / var
    return slope, sy / n - slope * sx / n


def holt_winters(vals, sf, tf):
    """Double exponential smoothing, level=x0 trend=x1-x0."""
    s = vals[0]
    b = vals[1] - vals[0]
    for x in vals[1:]:
        s_new = sf * x + (1 - sf) * (s + b)
        b = tf * (s_new - s) + (1 - tf) * b
        s = s_new
    return s


def res(ceng, q, *label_attrs) -> dict:
    """Collect a query into {(label..., step_ts): value}."""
    rows = ceng.query_range(q).collect()
    out = {}
    for r in rows:
        d = r.asDict()
        key = tuple(d[a] for a in label_attrs) + (d["step_ts"],)
        assert key not in out, f"duplicate key {key} in {q!r}"
        out[key] = d["value"]
    return out


def assert_vals(got: dict, want: dict, q: str = "") -> None:
    assert set(got) == set(want), (
        f"{q}: keys differ; extra={sorted(set(got) - set(want))[:4]} "
        f"missing={sorted(set(want) - set(got))[:4]}"
    )
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, float) and math.isnan(w):
            assert isinstance(g, float) and math.isnan(g), (q, k, g)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (q, k, g, w)


MEM = sel("demo_memory_usage_bytes")
CPU = sel("demo_cpu_usage_seconds_total")
NCPU = sel("demo_num_cpus")
BATCH = sel("demo_batch_last_success_timestamp_seconds")
DISK = sel("demo_disk_usage_bytes")


# ----------------------------------------------------- selector families


def test_values_selector_and_matchers(ceng):
    q = 'demo_memory_usage_bytes{type="free", instance!="i2"}'
    want = {
        (i, ty, t): inst_val(s, t)
        for (i, ty), s in MEM.items()
        if ty == "free" and i != "i2"
        for t in GRID
    }
    assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_regex_matcher(ceng):
    q = 'demo_memory_usage_bytes{instance!~".*2"}'
    want = {
        (i, ty, t): inst_val(s, t)
        for (i, ty), s in MEM.items()
        if not i.endswith("2")
        for t in GRID
    }
    assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_offset_positive_and_negative(ceng):
    for off in (30_000, -30_000):
        lit = "30s" if off > 0 else "-30s"
        q = f"demo_memory_usage_bytes offset {lit}"
        want = {}
        for (i, ty), s in MEM.items():
            for t in GRID:
                v = inst_val(s, t, offset=off)
                if v is not None:
                    want[(i, ty, t)] = v
        assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_at_modifier_start_end(ceng):
    # grid derives from the data: start()=0, end()=120000
    for anchor_ts, q in [(0, "demo_memory_usage_bytes @ start()"),
                         (120_000, "demo_memory_usage_bytes @ end()")]:
        want = {
            (i, ty, t): inst_val(s, anchor_ts)
            for (i, ty), s in MEM.items()
            for t in GRID
        }
        assert_vals(res(ceng, q, "instance", "type"), want, q)


# -------------------------------------------------- aggregation families


def test_values_simple_agg_family(ceng):
    vecs = {
        t: [inst_val(s, t) for s in MEM.values()] for t in GRID
    }
    cases = {
        "sum": lambda v: sum(v),
        "min": lambda v: min(v),
        "max": lambda v: max(v),
        "avg": pmean,
        "count": lambda v: float(len(v)),
        "stddev": lambda v: math.sqrt(pstdvar(v)),
        "stdvar": pstdvar,
        "group": lambda v: 1.0,
    }
    for op, fn in cases.items():
        q = f"{op}(demo_memory_usage_bytes)"
        want = {(t,): None for t in ()}  # keep shape explicit
        want = {(t,): fn(vecs[t]) for t in GRID}
        got = {(t,): v for (t,), v in res(ceng, q).items()}
        assert_vals(got, want, q)


def test_values_agg_by_and_without(ceng):
    by_inst = {
        t: {
            i: [inst_val(s, t) for (i2, _), s in MEM.items() if i2 == i]
            for i in ("i1", "i2")
        }
        for t in GRID
    }
    q = "sum by(instance) (demo_memory_usage_bytes)"
    want = {(i, t): sum(v) for t in GRID for i, v in by_inst[t].items()}
    assert_vals(res(ceng, q, "instance"), want, q)
    # without(type) groups by the remaining (instance, name) -> same sums
    q = "stddev without(type) (demo_memory_usage_bytes)"
    want = {
        (i, t): math.sqrt(pstdvar(v))
        for t in GRID
        for i, v in by_inst[t].items()
    }
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_topk_bottomk(ceng):
    for op, pick in (("topk", lambda v: sorted(v, reverse=True)[:3]),
                     ("bottomk", lambda v: sorted(v)[:3])):
        q = f"{op} (3, demo_memory_usage_bytes)"
        rows = ceng.query_range(q).collect()
        got = {}
        for r in rows:
            got.setdefault(r.step_ts, []).append(r.value)
        for t in GRID:
            vec = [inst_val(s, t) for s in MEM.values()]
            assert sorted(got[t]) == sorted(pick(vec)), (q, t)


def test_values_quantile_agg(ceng):
    q = "quantile(0.5, demo_memory_usage_bytes)"
    want = {
        (t,): pquantile(0.5, [inst_val(s, t) for s in MEM.values()])
        for t in GRID
    }
    assert_vals(res(ceng, q), want, q)


def test_values_count_values(ceng):
    q = 'count_values("value", demo_num_cpus)'
    rows = ceng.query_range(q).collect()
    # label column is the Prometheus-formatted STRING ("2", not "2.0");
    # the row has two "value" fields (label + count) -> use positions
    got = {(r[1], r[0]): r[2] for r in rows}
    want = {("2", t): 1.0 for t in GRID} | {("3", t): 1.0 for t in GRID}
    assert got == want


def test_values_nested_agg(ceng):
    q = "avg(max by(type) (demo_memory_usage_bytes))"
    want = {}
    for t in GRID:
        mx = {
            ty: max(
                inst_val(s, t) for (i, ty2), s in MEM.items() if ty2 == ty
            )
            for ty in ("free", "used")
        }
        want[(t,)] = pmean(list(mx.values()))
    assert_vals(res(ceng, q), want, q)


def test_values_limitk_and_limit_ratio(ceng):
    # limitk/limit_ratio pick order is implementation-defined upstream
    # (random); what IS specified: results are a SUBSET of the input
    # vector with unchanged values, limitk returns k per group, and
    # limit_ratio(r) + limit_ratio(r-1) partition the vector.
    full = res(ceng, "demo_memory_usage_bytes", "instance", "type")
    k = res(ceng, "limitk (2, demo_memory_usage_bytes)", "instance", "type")
    assert set(k) <= set(full) and all(full[x] == k[x] for x in k)
    assert {t: len([1 for x in k if x[-1] == t]) for t in GRID} == {
        t: 2 for t in GRID
    }
    pos = res(ceng, "limit_ratio (0.5, demo_memory_usage_bytes)",
              "instance", "type")
    neg = res(ceng, "limit_ratio (-0.5, demo_memory_usage_bytes)",
              "instance", "type")
    assert set(pos) | set(neg) == set(full)
    assert not (set(pos) & set(neg))
    assert all(full[x] == v for x, v in (pos | neg).items())


# ------------------------------------------------------- binop families


def test_values_scalar_arith_ops(ceng):
    mem_vals = {
        (i, ty, t): inst_val(s, t) for (i, ty), s in MEM.items() for t in GRID
    }
    ops = {
        "+": lambda v, s: v + s,
        "-": lambda v, s: v - s,
        "*": lambda v, s: v * s,
        "/": lambda v, s: v / s,
        "%": lambda v, s: math.fmod(v, s),  # Go math.Mod semantics
        "^": lambda v, s: math.pow(v, s),
    }
    for op, fn in ops.items():
        q = f"demo_memory_usage_bytes {op} 1.2345"
        want = {k: fn(v, 1.2345) for k, v in mem_vals.items()}
        assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_comparison_filter_and_bool(ceng):
    mem_vals = {
        (i, ty, t): inst_val(s, t) for (i, ty), s in MEM.items() for t in GRID
    }
    # filter form: all values >= 100 so > keeps everything, < drops all
    got = res(ceng, "demo_memory_usage_bytes > 1.2345", "instance", "type")
    assert_vals(got, mem_vals, "filter >")
    assert res(ceng, "demo_memory_usage_bytes < 1.2345",
               "instance", "type") == {}
    # bool form: 0/1 per element
    got = res(ceng, "demo_memory_usage_bytes >= bool 1.2345",
              "instance", "type")
    assert_vals(got, {k: 1.0 for k in mem_vals}, "bool >=")
    # scalar on the left: 1.2345 < m -> 1.0
    got = res(ceng, "1.2345 < bool demo_memory_usage_bytes",
              "instance", "type")
    assert_vals(got, {k: 1.0 for k in mem_vals}, "lhs scalar bool <")


def test_values_vector_matching_self_division(ceng):
    q = ("demo_memory_usage_bytes / on(instance, type, __name__) "
         "demo_memory_usage_bytes")
    want = {
        (i, ty, t): 1.0 for (i, ty) in MEM for t in GRID
    }
    assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_group_left(ceng):
    # sum by(instance, type) of a single-series-per-key vector is the
    # vector itself -> the binop doubles every element
    q = ("sum by(instance, type) (demo_memory_usage_bytes) + "
         "on(instance, type) group_left demo_memory_usage_bytes")
    want = {
        (i, ty, t): 2 * inst_val(s, t)
        for (i, ty), s in MEM.items()
        for t in GRID
    }
    assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_nan_inf_propagation(ceng):
    ncpu = {
        (i, t): inst_val(s, t) for (i, _), s in NCPU.items() for t in GRID
    }
    got = res(ceng, "demo_num_cpus * Inf", "instance")
    assert_vals(got, {k: math.inf for k in ncpu}, "* Inf")
    got = res(ceng, "demo_num_cpus * -Inf", "instance")
    assert_vals(got, {k: -math.inf for k in ncpu}, "* -Inf")
    got = res(ceng, "demo_num_cpus * NaN", "instance")
    assert_vals(got, {k: math.nan for k in ncpu}, "* NaN")


def test_values_time_arith(ceng):
    # time() is the evaluation timestamp in SECONDS
    got = res(ceng, "time() * 1")
    assert_vals(got, {(t,): t / 1000 for t in GRID}, "time()*1")
    got = res(ceng, "time() >= bool 60")
    assert_vals(got, {(t,): float(t >= 60_000) for t in GRID}, "time>=60")
    got = res(ceng, "demo_num_cpus - time()", "instance")
    want = {
        (i, t): inst_val(s, t) - t / 1000
        for (i, _), s in NCPU.items()
        for t in GRID
    }
    assert_vals(got, want, "m - time()")


# ---------------------------------------------------- function families


def test_values_rate_increase_delta(ceng):
    for kind in ("rate", "increase", "delta"):
        q = f"{kind}(demo_cpu_usage_seconds_total[1m])"
        want = {}
        for (i, ty), s in CPU.items():
            for t in GRID:
                v = extrapolated(window(s, t, 60_000), 60_000, t, kind)
                if v is not None:
                    want[(i, ty, t)] = v
        assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_irate_idelta(ceng):
    for kind in ("irate", "idelta"):
        q = f"{kind}(demo_cpu_usage_seconds_total[1m])"
        want = {}
        for (i, ty), s in CPU.items():
            for t in GRID:
                w = window(s, t, 60_000)
                if len(w) < 2:
                    continue
                (pt, pv), (lt, lv) = w[-2], w[-1]
                if kind == "irate":
                    # counter reset: none in this fixture
                    want[(i, ty, t)] = (lv - pv) / ((lt - pt) / 1000)
                else:
                    want[(i, ty, t)] = lv - pv
        assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_over_time_family(ceng):
    cases = {
        "avg": pmean,
        "min": min,
        "max": max,
        "sum": sum,
        "count": lambda v: float(len(v)),
        "stddev": lambda v: math.sqrt(pstdvar(v)),
        "stdvar": pstdvar,
        "last": lambda v: v[-1],
        "present": lambda v: 1.0,
    }
    for op, fn in cases.items():
        q = f"{op}_over_time(demo_memory_usage_bytes[1m])"
        want = {}
        for (i, ty), s in MEM.items():
            for t in GRID:
                w = [v for _, v in window(s, t, 60_000)]
                if w:
                    want[(i, ty, t)] = fn(w)
        assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_quantile_over_time(ceng):
    q = "quantile_over_time(0.5, demo_memory_usage_bytes[1m])"
    want = {}
    for (i, ty), s in MEM.items():
        for t in GRID:
            w = [v for _, v in window(s, t, 60_000)]
            if w:
                want[(i, ty, t)] = pquantile(0.5, w)
    assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_math_funcs(ceng):
    fns = {
        "abs": abs,
        "ceil": lambda v: float(math.ceil(v)),
        "floor": lambda v: float(math.floor(v)),
        "exp": math.exp,
        "ln": lambda v: math.log(v) if v > 0 else (
            math.nan if v < 0 else -math.inf),
        "log2": lambda v: math.log2(v) if v > 0 else (
            math.nan if v < 0 else -math.inf),
        "log10": lambda v: math.log10(v) if v > 0 else (
            math.nan if v < 0 else -math.inf),
        "sqrt": lambda v: math.sqrt(v) if v >= 0 else math.nan,
        "sgn": lambda v: float((v > 0) - (v < 0)),
    }
    # exp over ~100s overflows nothing; use -m too for domain edges
    for fn_name, fn in fns.items():
        for tmpl, sign in (("{f}(demo_num_cpus)", 1.0),
                           ("{f}(-demo_num_cpus)", -1.0)):
            q = tmpl.format(f=fn_name)
            want = {
                (i, t): fn(sign * inst_val(s, t))
                for (i, _), s in NCPU.items()
                for t in GRID
            }
            assert_vals(res(ceng, q, "instance"), want, q)


def test_values_clamp_family(ceng):
    ncpu = {
        (i, t): inst_val(s, t) for (i, _), s in NCPU.items() for t in GRID
    }
    got = res(ceng, "clamp_min(demo_num_cpus, 2.5)", "instance")
    assert_vals(got, {k: max(v, 2.5) for k, v in ncpu.items()}, "clamp_min")
    got = res(ceng, "clamp_max(demo_num_cpus, 2.5)", "instance")
    assert_vals(got, {k: min(v, 2.5) for k, v in ncpu.items()}, "clamp_max")
    got = res(ceng, "clamp(demo_num_cpus, 0, 1)", "instance")
    assert_vals(got, {k: 1.0 for k in ncpu}, "clamp")


def test_values_date_funcs(ceng):
    fns = {
        "minute": lambda d: float(d.minute),
        "hour": lambda d: float(d.hour),
        "day_of_week": lambda d: float((d.weekday() + 1) % 7),  # Sun=0
        "day_of_month": lambda d: float(d.day),
        "day_of_year": lambda d: float(d.timetuple().tm_yday),
        "month": lambda d: float(d.month),
        "year": lambda d: float(d.year),
        "days_in_month": lambda d: float(
            (datetime(d.year + (d.month == 12), d.month % 12 + 1, 1,
                      tzinfo=timezone.utc)
             - datetime(d.year, d.month, 1, tzinfo=timezone.utc)).days
        ),
    }
    for fn_name, fn in fns.items():
        # no-arg form: date part of the evaluation time
        q = f"{fn_name}()"
        want = {
            (t,): fn(datetime.fromtimestamp(t / 1000, tz=timezone.utc))
            for t in GRID
        }
        assert_vals(res(ceng, q), want, q)
        # vector form over the batch-timestamp metric, offset 30s
        q = (f"{fn_name}(demo_batch_last_success_timestamp_seconds"
             " offset 30s)")
        want = {}
        for (i, _), s in BATCH.items():
            for t in GRID:
                v = inst_val(s, t, offset=30_000)
                if v is not None:
                    want[(i, t)] = fn(
                        datetime.fromtimestamp(v, tz=timezone.utc)
                    )
        assert_vals(res(ceng, q, "instance"), want, q)


def test_values_deriv_predict_linear(ceng):
    q = "deriv(demo_disk_usage_bytes[1m])"
    want = {}
    for (i, _), s in DISK.items():
        for t in GRID:
            w = window(s, t, 60_000)
            if len(w) >= 2:
                want[(i, t)] = linreg(w, w[0][0])[0]
    assert_vals(res(ceng, q, "instance"), want, q)

    q = "predict_linear(demo_disk_usage_bytes[1m], 600)"
    want = {}
    for (i, _), s in DISK.items():
        for t in GRID:
            w = window(s, t, 60_000)
            if len(w) >= 2:
                slope, intercept = linreg(w, t)
                want[(i, t)] = slope * 600 + intercept
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_holt_winters(ceng):
    q = "holt_winters(demo_disk_usage_bytes[1m], 0.5, 0.3)"
    want = {}
    for (i, _), s in DISK.items():
        for t in GRID:
            w = [v for _, v in window(s, t, 60_000)]
            if len(w) >= 2:
                want[(i, t)] = holt_winters(w, 0.5, 0.3)
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_resets_changes(ceng):
    # cpu counters are monotone: 0 resets; batch timestamps strictly
    # increase every sample: changes = n-1
    q = "resets(demo_cpu_usage_seconds_total[1m])"
    want = {}
    for (i, ty), s in CPU.items():
        for t in GRID:
            if window(s, t, 60_000):
                want[(i, ty, t)] = 0.0
    assert_vals(res(ceng, q, "instance", "type"), want, q)
    q = "changes(demo_batch_last_success_timestamp_seconds[1m])"
    want = {}
    for (i, _), s in BATCH.items():
        for t in GRID:
            w = window(s, t, 60_000)
            if w:
                want[(i, t)] = float(len(w) - 1)
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_timestamp(ceng):
    # timestamp() returns the ts of the underlying sample in SECONDS;
    # fixture samples sit exactly on the grid steps
    q = "timestamp(demo_num_cpus)"
    want = {(i, t): t / 1000 for (i, _) in NCPU for t in GRID}
    assert_vals(res(ceng, q, "instance"), want, q)
    q = "timestamp(timestamp(demo_num_cpus))"
    # inner timestamp's synthetic samples carry the eval ts -> same
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_vector_fn(ceng):
    assert_vals(res(ceng, "vector(1.23)"), {(t,): 1.23 for t in GRID})
    assert_vals(res(ceng, "vector(time())"), {(t,): t / 1000 for t in GRID})


def test_values_absent_family(ceng):
    assert res(ceng, "absent(demo_memory_usage_bytes)") == {}
    assert_vals(res(ceng, "absent(nonexistent_metric_name)"),
                {(t,): 1.0 for t in GRID})
    assert_vals(res(ceng, "absent_over_time(nonexistent_metric_name[1m])"),
                {(t,): 1.0 for t in GRID})


def test_values_histogram_quantile_ignores_no_le(ceng):
    # series without an "le" label are ignored -> empty result
    assert res(ceng, "histogram_quantile(0.9, demo_memory_usage_bytes)",
               ) == {}
    assert res(ceng, "histogram_quantile(0.9, nonexistent_metric)") == {}


def test_values_label_replace(ceng):
    q = 'label_replace(demo_num_cpus, "job", "dest-$1", "instance", "i(.*)")'
    rows = ceng.query_range(q).collect()
    for r in rows:
        assert r.job == "dest-" + r.instance[1:]
        assert r.value == inst_val(NCPU[(r.instance, "")], r.step_ts)
    # non-matching regex: vector unchanged, no dst label value
    q = 'label_replace(demo_num_cpus, "job", "dest-$1", "instance", "host:(.*)")'
    for r in ceng.query_range(q).collect():
        assert getattr(r, "job", "") in ("", None)


def test_values_label_join(ceng):
    q = 'label_join(demo_num_cpus, "new_label", "-", "instance", "type")'
    for r in ceng.query_range(q).collect():
        assert r.new_label == f"{r.instance}-"  # type is "" on num_cpus
        assert r.value == inst_val(NCPU[(r.instance, "")], r.step_ts)


def test_values_trig_family(ceng):
    ncpu = {
        (i, t): inst_val(s, t) for (i, _), s in NCPU.items() for t in GRID
    }
    got = res(ceng, "deg(rad(demo_num_cpus))", "instance")
    assert_vals(got, ncpu, "deg(rad)")
    got = res(ceng, "atan(tan(vector(0.5)))")
    assert_vals(got, {(t,): 0.5 for t in GRID}, "atan(tan)")
    got = res(ceng, "cos(pi())")
    assert_vals(got, {(t,): -1.0 for t in GRID}, "cos(pi)")
    got = res(ceng, "demo_num_cpus atan2 demo_num_cpus", "instance")
    assert_vals(got, {k: math.atan2(v, v) for k, v in ncpu.items()}, "atan2")


def test_values_scalar_literals(ceng):
    for q, v in [("42", 42.0), ("1.234", 1.234), (".123", 0.123),
                 ("1.23e-3", 0.00123), ("0x3d", 61.0),
                 ("Inf", math.inf), ("+Inf", math.inf),
                 ("-Inf", -math.inf), ("NaN", math.nan)]:
        assert_vals(res(ceng, q), {(t,): v for t in GRID}, q)
    q = "1 * 2 + 4 / 6 - 10 % 2 ^ 2"
    v = 1 * 2 + 4 / 6 - math.fmod(10, 2 ** 2)
    assert_vals(res(ceng, q), {(t,): v for t in GRID}, q)


# ----------------------------------------------------- subquery family


def test_values_subquery_avg_over_time(ceng):
    # [1m:]: default resolution = the engine step (30s); inner instant
    # selector evaluated on the absolute-aligned fine grid, outer window
    # left-open (t-60s, t]
    q = "avg_over_time(demo_num_cpus[1m:])"
    want = {}
    for (i, _), s in NCPU.items():
        for t in GRID:
            inner = [
                inst_val(s, ts2)
                for ts2 in range(0, 120_001, STEP)
                if t - 60_000 < ts2 <= t and inst_val(s, ts2) is not None
            ]
            if inner:
                want[(i, t)] = pmean(inner)
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_subquery_nested_rate(ceng):
    q = "avg_over_time(rate(demo_cpu_usage_seconds_total[30s])[1m:10s])"
    want = {}
    for (i, ty), s in CPU.items():
        for t in GRID:
            inner = []
            for ts2 in range(0, 120_001, 10_000):
                if not (t - 60_000 < ts2 <= t):
                    continue
                r = extrapolated(window(s, ts2, 30_000), 30_000, ts2, "rate")
                if r is not None:
                    inner.append(r)
            if inner:
                want[(i, ty, t)] = pmean(inner)
    assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_subquery_offset(ceng):
    q = ("max_over_time(max(demo_batch_last_success_timestamp_seconds)"
         "[1m:10s] offset 30s)")
    want = {}
    for t in GRID:
        inner = []
        for ts2 in range(0, 120_001, 10_000):
            # offset shifts the subquery window back 30s
            if not (t - 90_000 < ts2 <= t - 30_000):
                continue
            vals = [
                inst_val(s, ts2) for s in BATCH.values()
                if inst_val(s, ts2) is not None
            ]
            if vals:
                inner.append(max(vals))
        if inner:
            want[(t,)] = max(inner)
    assert_vals(res(ceng, q), want, q)


# ------------------------------------- set operations (and/unless/or)


def test_values_set_operations(ceng):
    mem_free = {
        (i, ty, t): inst_val(s, t)
        for (i, ty), s in MEM.items() if ty == "free"
        for t in GRID
    }
    mem_all = {
        (i, ty, t): inst_val(s, t)
        for (i, ty), s in MEM.items()
        for t in GRID
    }
    # and: lhs elements whose full label set (name excluded from
    # matching) exists on the rhs — cpu shares every (instance, type)
    q = ('demo_memory_usage_bytes{instance="i1"} and '
         'demo_cpu_usage_seconds_total')
    want = {k: v for k, v in mem_all.items() if k[0] == "i1"}
    assert_vals(res(ceng, q, "instance", "type"), want, q)
    # unless: num_cpus label sets (type="") match no memory series
    q = "demo_memory_usage_bytes unless demo_num_cpus"
    assert_vals(res(ceng, q, "instance", "type"), mem_all, q)
    # or: lhs plus rhs elements with label sets absent from lhs
    q = 'demo_memory_usage_bytes{type="free"} or demo_memory_usage_bytes'
    assert_vals(res(ceng, q, "instance", "type"), mem_all, q)
    assert set(mem_free) < set(mem_all)  # the or genuinely added rows


def test_values_at_absolute_timestamp(ceng):
    # @ pins the selector at an absolute unix time (seconds)
    q = "demo_memory_usage_bytes @ 60"
    want = {
        (i, ty, t): inst_val(s, 60_000)
        for (i, ty), s in MEM.items()
        for t in GRID
    }
    assert_vals(res(ceng, q, "instance", "type"), want, q)


# --------------------------------- histogram_quantile with real buckets


def _bucket_counts(i: int, t: int) -> dict[str, float]:
    """Cumulative bucket counts for instance index i at sample index t."""
    return {
        "0.1": (10 + t) * (i + 1.0),
        "0.5": (20 + 2 * t) * (i + 1.0),
        "1": (30 + 3 * t) * (i + 1.0),
        "+Inf": (40 + 4 * t) * (i + 1.0),
    }


@pytest.fixture(scope="module")
def heng(spark):
    from squirreldb_spark.promql import PromQLEngine

    rows = []
    for i, inst in enumerate(("i1", "i2")):
        for t in range(13):
            for le, c in _bucket_counts(i, t).items():
                rows.append((inst, le, "demo_latency_bucket", t * 10_000, c))
    pts = spark.createDataFrame(
        rows, "instance string, le string, name string, ts long, value double"
    )
    return PromQLEngine(
        pts, label_cols=("instance", "le", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )


def _bucket_quantile(q: float, buckets: list[tuple[float, float]]) -> float:
    """promql/quantile.go bucketQuantile: linear interpolation inside the
    containing bucket, lowest bucket interpolates from 0 when its upper
    bound is positive, q landing in +Inf returns the highest finite le.
    Counts are clamped monotonic first (ensureMonotonic); phi outside
    [0,1] -> ±Inf; <2 buckets or an empty histogram -> NaN."""
    if math.isnan(q):
        return float("nan")
    if q < 0:
        return float("-inf")
    if q > 1:
        return float("inf")
    buckets = sorted(buckets)
    if not math.isinf(buckets[-1][0]):
        return float("nan")
    run = float("-inf")
    buckets = [(le, run := max(run, c)) for le, c in buckets]
    if len(buckets) < 2:
        return float("nan")
    total = buckets[-1][1]
    if total == 0:
        return float("nan")
    rank = q * total
    b = 0
    while buckets[b][1] < rank:
        b += 1
    if math.isinf(buckets[b][0]):  # falls in +Inf
        return buckets[-2][0]
    if b == 0:
        bucket_start = 0.0 if buckets[0][0] > 0 else buckets[0][0]
        prev_count = 0.0
    else:
        bucket_start = buckets[b - 1][0]
        prev_count = buckets[b - 1][1]
    bucket_end = buckets[b][0]
    count = buckets[b][1]
    return bucket_start + (bucket_end - bucket_start) * (
        (rank - prev_count) / (count - prev_count)
    )


def test_values_histogram_quantile_buckets(heng):
    for q in (0.5, 0.9):
        promql = f"histogram_quantile({q}, demo_latency_bucket)"
        rows = heng.query_range(promql).collect()
        got = {(r.instance, r.step_ts): r.value for r in rows}
        want = {}
        for i, inst in enumerate(("i1", "i2")):
            for t in GRID:
                counts = _bucket_counts(i, t // 10_000)
                buckets = [(float(le), c) for le, c in counts.items()]
                want[(inst, t)] = _bucket_quantile(q, buckets)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-9), (promql, k)


def test_values_quantile_phi_edges(ceng):
    """promql/quantile.go: phi outside [0,1] yields ±Inf (with a warning,
    NOT an error) and phi=NaN yields NaN — per step, regardless of the
    input values."""
    assert_vals(res(ceng, "quantile(1.5, demo_memory_usage_bytes)"),
                {(t,): math.inf for t in GRID}, "phi>1")
    assert_vals(res(ceng, "quantile(-0.5, demo_memory_usage_bytes)"),
                {(t,): -math.inf for t in GRID}, "phi<0")
    assert_vals(res(ceng, "quantile(NaN, demo_memory_usage_bytes)"),
                {(t,): math.nan for t in GRID}, "phi NaN")


def test_values_quantile_over_time_phi_edges(ceng):
    for phi, want_v in ((1.5, math.inf), (-0.5, -math.inf)):
        q = f"quantile_over_time({phi}, demo_memory_usage_bytes[1m])"
        want = {}
        for (i, ty), s in MEM.items():
            for t in GRID:
                if window(s, t, 60_000):
                    want[(i, ty, t)] = want_v
        assert_vals(res(ceng, q, "instance", "type"), want, q)


def test_values_clamp_min_gt_max_empty(ceng):
    # upstream funcClamp: min > max returns an EMPTY vector, not NaN
    assert res(ceng, "clamp(demo_memory_usage_bytes, 1, 0)") == {}


def test_values_set_ops_with_on_and_ignoring(ceng):
    mem_all = {
        (i, ty, t): inst_val(s, t)
        for (i, ty), s in MEM.items()
        for t in GRID
    }
    # and on(instance): every mem instance exists on the rhs
    q = "demo_memory_usage_bytes and on(instance) demo_num_cpus"
    assert_vals(res(ceng, q, "instance", "type"), mem_all, q)
    # restricted rhs keeps only the matching on-label values
    q = ('demo_memory_usage_bytes and on(instance) '
         'demo_num_cpus{instance="i1"}')
    want = {k: v for k, v in mem_all.items() if k[0] == "i1"}
    assert_vals(res(ceng, q, "instance", "type"), want, q)
    q = ('demo_memory_usage_bytes unless on(instance) '
         'demo_num_cpus{instance="i1"}')
    want = {k: v for k, v in mem_all.items() if k[0] != "i1"}
    assert_vals(res(ceng, q, "instance", "type"), want, q)
    # ignoring(type): the remaining matching label (instance) exists on
    # both sides for every element
    q = "demo_memory_usage_bytes and ignoring(type) demo_num_cpus"
    assert_vals(res(ceng, q, "instance", "type"), mem_all, q)
    q = "demo_memory_usage_bytes unless ignoring(type) demo_num_cpus"
    assert_vals(res(ceng, q, "instance", "type"), {}, q)
    # or on(type): lhs type values are {""} so every mem element (type
    # free/used) has no on-label match in the lhs and is added
    ncpu = {
        (i, "", t): inst_val(s, t)
        for (i, _), s in NCPU.items()
        for t in GRID
    }
    q = "demo_num_cpus or on(type) demo_memory_usage_bytes"
    assert_vals(res(ceng, q, "instance", "type"), ncpu | mem_all, q)


def test_values_negative_dividend_mod(ceng):
    # Go math.Mod keeps the dividend's sign: fmod(-3, 2) = -1
    q = "-demo_num_cpus % 2"
    want = {
        (i, t): math.fmod(-inst_val(s, t), 2.0)
        for (i, _), s in NCPU.items()
        for t in GRID
    }
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_go_pow_scalar_specials(ceng):
    # Go math.Pow: Pow(-1, ±Inf) = 1 (Java's Math.pow returns NaN)
    assert_vals(res(ceng, "vector(-1) ^ Inf"), {(t,): 1.0 for t in GRID},
                "(-1)^Inf")
    # Pow(x, 0) = 1 for any x
    got = res(ceng, "demo_num_cpus ^ 0", "instance")
    want = {(i, t): 1.0 for (i, _) in NCPU for t in GRID}
    assert_vals(got, want, "m^0")


@pytest.fixture(scope="module")
def neng(spark):
    """Engine over crafted values (NaN / negatives / ties) for the
    special-case golden tests below."""
    from squirreldb_spark.promql import PromQLEngine

    rows = [
        ("a", "m", 0, float("nan")),
        ("b", "m", 0, -2.0),
        ("c", "m", 0, 3.0),
        ("d", "m", 0, -1.25),
        ("e", "m", 0, 2.5),
    ]
    pts = spark.createDataFrame(
        rows, "instance string, name string, ts long, value double"
    )
    return PromQLEngine(
        pts, label_cols=("instance", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )


def _by_instance(eng, q) -> dict:
    """{instance: value} — values are constant across the grid."""
    out = {}
    for r in eng.query_range(q).collect():
        prev = out.setdefault(r.instance, r.value)
        same = (prev == r.value) or (
            isinstance(prev, float) and isinstance(r.value, float)
            and math.isnan(prev) and math.isnan(r.value)
        )
        assert same, (q, r.instance, prev, r.value)
    return out


def _assert_by_instance(got: dict, want: dict, q: str) -> None:
    assert set(got) == set(want), (q, sorted(got), sorted(want))
    for k, w in want.items():
        g = got[k]
        if isinstance(w, float) and math.isnan(w):
            assert math.isnan(g), (q, k, g)
        else:
            assert g == pytest.approx(w, rel=1e-12, abs=1e-12), (q, k, g, w)


def test_values_pow_with_nan_operands(neng):
    # Pow(NaN, 0) = 1 and Pow(1, NaN) = 1 — both differ from a naive
    # NaN-propagation rule
    _assert_by_instance(
        _by_instance(neng, "m ^ 0"),
        {k: 1.0 for k in "abcde"}, "m^0")
    _assert_by_instance(
        _by_instance(neng, "1 ^ m"),
        {k: 1.0 for k in "abcde"}, "1^m")
    # fractional power of a negative base is NaN (Go and IEEE agree)
    _assert_by_instance(
        _by_instance(neng, "m ^ 0.5"),
        {"a": math.nan, "b": math.nan, "c": math.sqrt(3.0),
         "d": math.nan, "e": math.sqrt(2.5)}, "m^0.5")


def test_values_mod_by_zero_is_nan(neng):
    _assert_by_instance(
        _by_instance(neng, "m % 0"),
        {k: math.nan for k in "abcde"}, "m%0")


def test_values_nan_comparison_semantics(neng):
    # Go float comparisons: NaN == NaN is false, NaN != NaN is true
    _assert_by_instance(
        _by_instance(neng, "m == bool m"),
        {"a": 0.0, "b": 1.0, "c": 1.0, "d": 1.0, "e": 1.0}, "== bool")
    _assert_by_instance(
        _by_instance(neng, "m != bool m"),
        {"a": 1.0, "b": 0.0, "c": 0.0, "d": 0.0, "e": 0.0}, "!= bool")
    # filter form drops the NaN element (comparison is false)
    got = _by_instance(neng, "m == m")
    assert set(got) == {"b", "c", "d", "e"}


def test_values_clamp_nan_propagation(neng):
    # a NaN sample stays NaN through clamp; a NaN bound poisons all
    _assert_by_instance(
        _by_instance(neng, "clamp(m, 0, 10)"),
        {"a": math.nan, "b": 0.0, "c": 3.0, "d": 0.0, "e": 2.5},
        "clamp finite")
    _assert_by_instance(
        _by_instance(neng, "clamp(m, NaN, 1)"),
        {k: math.nan for k in "abcde"}, "clamp NaN bound")


def test_values_round_ties_toward_positive_inf(neng):
    # upstream funcRound: floor(v/nearest + 0.5)*nearest — ties go
    # toward +Inf: round(2.5) = 3, round(-1.25, 0.5) = -1.0
    _assert_by_instance(
        _by_instance(neng, "round(m)"),
        {"a": math.nan, "b": -2.0, "c": 3.0, "d": -1.0, "e": 3.0},
        "round(m)")
    _assert_by_instance(
        _by_instance(neng, "round(m, 0.5)"),
        {"a": math.nan, "b": -2.0, "c": 3.0, "d": -1.0, "e": 2.5},
        "round(m, 0.5)")


def test_values_nested_subquery(ceng):
    """A subquery OF a subquery: the inner avg_over_time evaluates on
    the absolute-aligned 10s grid, the outer max_over_time samples that
    result on the 30s grid inside a left-open 2m window."""
    q = "max_over_time(avg_over_time(demo_num_cpus[1m:10s])[2m:30s])"

    def inner(s, ts2):
        vals = [
            inst_val(s, ts3)
            for ts3 in range(0, 120_001, 10_000)
            if ts2 - 60_000 < ts3 <= ts2 and inst_val(s, ts3) is not None
        ]
        return pmean(vals) if vals else None

    want = {}
    for (i, _), s in NCPU.items():
        for t in GRID:
            outer = [
                inner(s, ts2)
                for ts2 in range(0, 120_001, 30_000)
                if t - 120_000 < ts2 <= t and inner(s, ts2) is not None
            ]
            if outer:
                want[(i, t)] = max(outer)
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_scalar_agg_as_binop_operand(ceng):
    # scalar(max(...)) collapses the aggregate to a per-step scalar
    q = "scalar(max(demo_num_cpus)) * demo_num_cpus"
    want = {
        (i, t): 3.0 * inst_val(s, t)
        for (i, _), s in NCPU.items()
        for t in GRID
    }
    assert_vals(res(ceng, q, "instance"), want, q)


def test_values_ceil_floor_double_semantics(spark):
    """Go math.Ceil/Floor stay on float64: NaN -> NaN, ±Inf -> ±Inf and
    |x| >= 2^63 is returned unchanged.  Spark's own ceil()/floor()
    return BIGINT (NaN -> 0, huge doubles saturate at Long.MAX) — the
    funcRound hazard; this pins the double-typed implementation."""
    from squirreldb_spark.promql import PromQLEngine

    rows = [
        ("a", "m", 0, float("nan")),
        ("b", "m", 0, float("inf")),
        ("c", "m", 0, float("-inf")),
        ("d", "m", 0, 1e300),
        ("e", "m", 0, -2.5),
        ("f", "m", 0, 2.5),
    ]
    pts = spark.createDataFrame(
        rows, "instance string, name string, ts long, value double"
    )
    eng = PromQLEngine(
        pts, label_cols=("instance", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )
    _assert_by_instance(
        _by_instance(eng, "ceil(m)"),
        {"a": math.nan, "b": math.inf, "c": -math.inf, "d": 1e300,
         "e": -2.0, "f": 3.0}, "ceil")
    _assert_by_instance(
        _by_instance(eng, "floor(m)"),
        {"a": math.nan, "b": math.inf, "c": -math.inf, "d": 1e300,
         "e": -3.0, "f": 2.0}, "floor")


def test_values_count_values_special_floats(spark):
    """count_values must label-format Inf/NaN the way Go FormatFloat
    does ("+Inf"/"-Inf"/"NaN") and must not trip ANSI cast overflow."""
    from squirreldb_spark.promql import PromQLEngine

    rows = [
        ("i1", "m", 0, float("inf")),
        ("i2", "m", 0, float("-inf")),
        ("i3", "m", 0, float("nan")),
        ("i4", "m", 0, 2.0),
        ("i5", "m", 0, 0.5),
    ]
    pts = spark.createDataFrame(
        rows, "instance string, name string, ts long, value double"
    )
    eng = PromQLEngine(
        pts, label_cols=("instance", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )
    out = eng.query_range('count_values("lbl", m)').collect()
    got = {r.lbl: r.value for r in out}
    assert got == {"+Inf": 1.0, "-Inf": 1.0, "NaN": 1.0, "2": 1.0,
                   "0.5": 1.0}
