"""Differential fuzz of PromQL expression COMPOSITION.

The compliance corpus (test_compliance.py) proves fixed templates run and
the values tier proves one query per family produces upstream values.
This suite closes the composition gap: Hypothesis generates random
expression TREES — selectors, aggregations at three grouping levels,
pointwise math functions, scalar and vector binops — renders each to
PromQL, and compares the engine's query_range output against an
independent bottom-up Python evaluation of the same tree over the
compliance fixture (key sets AND values).

Determinism: the fixture's sample values are integers and the scalar
pool is dyadic, so +, -, *, aggregation sums and means (counts are
powers of two) are EXACT in float64 on both sides; the only inexact op
is division, where both engines divide identical IEEE inputs and so
produce identical doubles. Go-semantics corners (x/0 -> ±Inf/NaN,
min/max skipping NaN) are replicated in the model. `derandomize=True`
pins the generated example set, so a pass today is a pass forever.

Upstream semantics: promql/engine.go (vector matching drops __name__,
aggregation grouping), promql/functions.go (math functions on float64).
"""

from __future__ import annotations

import math
import sys
from os.path import dirname

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, dirname(__file__))

from test_compliance import fixture_rows, make_compliance_engine

# slow tier (VERDICT r15 #2): 335 s of randomized PromQL fuzzing; the default tier keeps the
# deterministic promql/compliance-edge suites
pytestmark = pytest.mark.slow


GRID = [0, 30_000, 60_000, 90_000, 120_000]
LOOKBACK = 60_000

# ---------------------------------------------------------------- fixture


def _mem_series() -> dict[tuple[str, str], list[tuple[int, float]]]:
    out: dict[tuple[str, str], list[tuple[int, float]]] = {}
    for inst, typ, name, ts, v in fixture_rows():
        if name == "demo_memory_usage_bytes":
            out.setdefault((inst, typ), []).append((ts, v))
    for k in out:
        out[k].sort()
    return out


MEM = _mem_series()


def _inst_val(samples, t):
    cand = [v for ts, v in samples if t - LOOKBACK < ts <= t]
    return cand[-1] if cand else None


@pytest.fixture(scope="module")
def ceng(spark):
    return make_compliance_engine(spark)


# ------------------------------------------------------------ AST strategy
#
# Node forms (levels: 2 = keyed by (instance, type), 1 = (instance,),
# 0 = ()):
#   ("m",)                      — the base selector, level 2
#   ("agg", op, lvl, child)     — grouping aggregation to level `lvl`
#   ("fn", name, child)         — pointwise math function
#   ("sop", op, s, child, left) — scalar binop (scalar on the left if left)
#   ("vop", op, a, b)           — vector binop; operands are coerced to the
#                                 lower of the two levels with a sum-agg

SCALARS = [2.0, 0.5, -1.5, 4.0]
AGGS = ["sum", "min", "max", "avg", "count", "group", "stddev", "stdvar"]
FNS = ["abs", "ceil", "floor", "sqrt", "sgn"]
VOPS = ["+", "-", "*", "/"]

_BY = {2: " by(instance, type) ", 1: " by(instance) ", 0: ""}


def _exprs():
    # ("gop", op, lbl, right?) — many-to-one matching on the base metric:
    #   m op on(lbl) group_left sum by(lbl) (m)     (many side left)
    #   sum by(lbl) (m) op on(lbl) group_right m    (many side right)
    # level 2 (the many side's full label set survives), so it composes
    # under every other node form.
    leaf = st.one_of(
        st.just(("m",)),
        st.tuples(st.just("gop"), st.sampled_from(VOPS),
                  st.sampled_from(["instance", "type"]), st.booleans()),
    )

    def extend(ch):
        return st.one_of(
            st.tuples(st.just("agg"), st.sampled_from(AGGS),
                      st.sampled_from([0, 1, 2]), ch),
            st.tuples(st.just("fn"), st.sampled_from(FNS), ch),
            st.tuples(st.just("sop"), st.sampled_from(VOPS),
                      st.sampled_from(SCALARS), ch, st.booleans()),
            st.tuples(st.just("vop"), st.sampled_from(VOPS), ch, ch),
        )

    return st.recursive(leaf, extend, max_leaves=5)


def _level(e) -> int:
    k = e[0]
    if k == "m":
        return 2
    if k == "gop":
        return 2
    if k == "agg":
        return min(e[2], _level(e[3]))
    if k == "fn":
        return _level(e[2])
    if k == "sop":
        return _level(e[3])
    if k == "vop":
        return min(_level(e[2]), _level(e[3]))
    raise AssertionError(k)


def _render(e) -> str:
    k = e[0]
    if k == "m":
        return "demo_memory_usage_bytes"
    if k == "gop":
        _, op, lbl, right = e
        one = f"sum by({lbl}) (demo_memory_usage_bytes)"
        if right:
            return f"({one} {op} on({lbl}) group_right demo_memory_usage_bytes)"
        return f"(demo_memory_usage_bytes {op} on({lbl}) group_left {one})"
    if k == "agg":
        lvl = min(e[2], _level(e[3]))
        return f"{e[1]}{_BY[lvl]}({_render(e[3])})"
    if k == "fn":
        return f"{e[1]}({_render(e[2])})"
    if k == "sop":
        _, op, s, ch, left = e
        return (f"({s} {op} {_render(ch)})" if left
                else f"({_render(ch)} {op} {s})")
    if k == "vop":
        _, op, a, b = e
        lvl = min(_level(a), _level(b))
        ra, rb = _render(a), _render(b)
        if _level(a) > lvl:
            ra = f"sum{_BY[lvl]}({ra})"
        if _level(b) > lvl:
            rb = f"sum{_BY[lvl]}({rb})"
        return f"({ra} {op} {rb})"
    raise AssertionError(k)


# ------------------------------------------------------- Python evaluator


def _go_arith(op: str, a: float, b: float) -> float:
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if b == 0:
            if math.isnan(a) or a == 0:
                return math.nan
            return math.inf if a > 0 else -math.inf
        return a / b
    raise AssertionError(op)


def _go_fn(name: str, v: float) -> float:
    if name == "abs":
        return abs(v)
    if name in ("ceil", "floor"):
        if math.isnan(v) or math.isinf(v):
            return v
        return float(math.ceil(v) if name == "ceil" else math.floor(v))
    if name == "sqrt":
        return math.sqrt(v) if v >= 0 else math.nan
    if name == "sgn":
        if math.isnan(v):
            return math.nan
        return float((v > 0) - (v < 0))
    raise AssertionError(name)


def _agg_fn(op: str, vals: list[float]) -> float:
    if op == "sum":
        return sum(vals)
    if op in ("min", "max"):
        # upstream min/max skip NaN unless every value is NaN
        finite = [v for v in vals if not math.isnan(v)]
        if not finite:
            return math.nan
        return min(finite) if op == "min" else max(finite)
    if op == "avg":
        return sum(vals) / len(vals)
    if op == "count":
        return float(len(vals))
    if op == "group":
        return 1.0
    m = sum(vals) / len(vals)
    var = sum((v - m) ** 2 for v in vals) / len(vals)
    if op == "stdvar":
        return var
    if op == "stddev":
        return math.sqrt(var)
    raise AssertionError(op)


def _key_to(key: tuple, lvl: int) -> tuple:
    return key[:lvl]


def _eval(e, t) -> dict[tuple, float]:
    """Evaluate the tree at step t -> {key_tuple: value} at _level(e)."""
    k = e[0]
    if k == "m":
        return {ks: _inst_val(s, t) for ks, s in MEM.items()}
    if k == "gop":
        _, op, lbl, right = e
        base = {ks: _inst_val(s, t) for ks, s in MEM.items()}
        gi = 0 if lbl == "instance" else 1
        groups: dict[str, float] = {}
        for ks, v in base.items():
            groups[ks[gi]] = groups.get(ks[gi], 0.0) + v
        if right:
            return {ks: _go_arith(op, groups[ks[gi]], v)
                    for ks, v in base.items()}
        return {ks: _go_arith(op, v, groups[ks[gi]])
                for ks, v in base.items()}
    if k == "agg":
        child = _eval(e[3], t)
        lvl = min(e[2], _level(e[3]))
        groups: dict[tuple, list[float]] = {}
        for ks, v in child.items():
            groups.setdefault(_key_to(ks, lvl), []).append(v)
        return {ks: _agg_fn(e[1], vs) for ks, vs in groups.items()}
    if k == "fn":
        return {ks: _go_fn(e[1], v) for ks, v in _eval(e[2], t).items()}
    if k == "sop":
        _, op, s, ch, left = e
        return {
            ks: (_go_arith(op, s, v) if left else _go_arith(op, v, s))
            for ks, v in _eval(ch, t).items()
        }
    if k == "vop":
        _, op, a, b = e
        lvl = min(_level(a), _level(b))

        def coerce(node):
            vals = _eval(node, t)
            if _level(node) == lvl:
                return vals
            groups: dict[tuple, list[float]] = {}
            for ks, v in vals.items():
                groups.setdefault(_key_to(ks, lvl), []).append(v)
            return {ks: sum(vs) for ks, vs in groups.items()}

        va, vb = coerce(a), coerce(b)
        return {ks: _go_arith(op, va[ks], vb[ks]) for ks in va if ks in vb}
    raise AssertionError(k)


# ------------------------------------------------------------------ tests


# -------------------- fuzz 2: comparison filters and set operations
#
# Node forms (all at level 2 — filters make key sets vary per step,
# which is exactly what set-op composition must get right):
#   ("m",)
#   ("fn2", name, child)
#   ("sop2", op, s, child)          — vector-scalar arithmetic
#   ("cmp", op, bool_mode, child, s) — comparison against a scalar
#   ("setop", op, a, b)             — and / unless / or

CMPS = ["==", "!=", ">", "<", ">=", "<="]
SETOPS = ["and", "unless", "or"]
#: thresholds chosen inside the fixture's value range (100..122) so
#: comparisons genuinely split the vector
CMP_SCALARS = [105.0, 111.5, 118.0, 0.0]


def _exprs2():
    leaf = st.just(("m",))

    def extend(ch):
        return st.one_of(
            st.tuples(st.just("fn2"), st.sampled_from(["abs", "sgn"]), ch),
            st.tuples(st.just("sop2"), st.sampled_from(["+", "-", "*"]),
                      st.sampled_from(SCALARS), ch),
            st.tuples(st.just("cmp"), st.sampled_from(CMPS), st.booleans(),
                      ch, st.sampled_from(CMP_SCALARS)),
            st.tuples(st.just("setop"), st.sampled_from(SETOPS), ch, ch),
        )

    return st.recursive(leaf, extend, max_leaves=5)


def _go_cmp(op: str, a: float, b: float) -> bool:
    if math.isnan(a) or math.isnan(b):
        return op == "!="
    return {"==": a == b, "!=": a != b, ">": a > b, "<": a < b,
            ">=": a >= b, "<=": a <= b}[op]


def _render2(e) -> str:
    k = e[0]
    if k == "m":
        return "demo_memory_usage_bytes"
    if k == "fn2":
        return f"{e[1]}({_render2(e[2])})"
    if k == "sop2":
        return f"({_render2(e[3])} {e[1]} {e[2]})"
    if k == "cmp":
        _, op, boolm, ch, s = e
        b = " bool" if boolm else ""
        return f"({_render2(ch)} {op}{b} {s})"
    if k == "setop":
        return f"({_render2(e[2])} {e[1]} {_render2(e[3])})"
    raise AssertionError(k)


def _eval2(e, t) -> dict[tuple, float]:
    k = e[0]
    if k == "m":
        return {ks: _inst_val(s, t) for ks, s in MEM.items()}
    if k == "fn2":
        return {ks: _go_fn(e[1], v) for ks, v in _eval2(e[2], t).items()}
    if k == "sop2":
        return {ks: _go_arith(e[1], v, e[2])
                for ks, v in _eval2(e[3], t).items()}
    if k == "cmp":
        _, op, boolm, ch, s = e
        child = _eval2(ch, t)
        if boolm:
            return {ks: float(_go_cmp(op, v, s)) for ks, v in child.items()}
        return {ks: v for ks, v in child.items() if _go_cmp(op, v, s)}
    if k == "setop":
        _, op, a, b = e
        va, vb = _eval2(a, t), _eval2(b, t)
        if op == "and":
            return {ks: v for ks, v in va.items() if ks in vb}
        if op == "unless":
            return {ks: v for ks, v in va.items() if ks not in vb}
        return va | {ks: v for ks, v in vb.items() if ks not in va}
    raise AssertionError(k)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_exprs2())
def test_fuzz_filters_and_set_ops(spark, ceng, tree):
    q = _render2(tree)
    rows = ceng.query_range(q).collect()
    got: dict[tuple, float] = {}
    for r in rows:
        d = r.asDict()
        key = (d["instance"], d["type"], d["step_ts"])
        assert key not in got, (q, key)
        got[key] = d["value"]
    want: dict[tuple, float] = {}
    for t in GRID:
        for ks, v in _eval2(tree, t).items():
            want[ks + (t,)] = v
    assert set(got) == set(want), (q, sorted(set(got) ^ set(want))[:4])
    for key, w in want.items():
        g = got[key]
        if math.isnan(w):
            assert math.isnan(g), (q, key, g)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (q, key, g, w)


# ------------------- fuzz 3: range functions under window/offset combos
#
# Single-level range nodes (windows cannot nest without subqueries)
# composed with scalar arithmetic and vector binops:
#   ("ext", kind, rng, off)   — rate/increase/delta over the cpu counter
#   ("ot", op, rng, off)      — <op>_over_time over the memory gauge
#   ("sop3", op, s, node)     — node op scalar
#   ("vop3", op, a, b)        — matching on (instance, type), 1:1

EXT = ["rate", "increase", "delta"]
OT = ["avg", "min", "max", "sum", "count", "last", "stddev", "stdvar"]
RANGES = [(30_000, "30s"), (60_000, "1m"), (90_000, "1m30s")]
OFFSETS = [(0, ""), (30_000, " offset 30s")]


def _cpu_series() -> dict[tuple[str, str], list[tuple[int, float]]]:
    out: dict[tuple[str, str], list[tuple[int, float]]] = {}
    for inst, typ, name, ts, v in fixture_rows():
        if name == "demo_cpu_usage_seconds_total":
            out.setdefault((inst, typ), []).append((ts, v))
    for k in out:
        out[k].sort()
    return out


CPU = _cpu_series()


def _rng_leaves():
    return st.one_of(
        st.tuples(st.just("ext"), st.sampled_from(EXT),
                  st.sampled_from(RANGES), st.sampled_from(OFFSETS)),
        st.tuples(st.just("ot"), st.sampled_from(OT),
                  st.sampled_from(RANGES), st.sampled_from(OFFSETS)),
    )


def _exprs3():
    def extend(ch):
        return st.one_of(
            st.tuples(st.just("sop3"), st.sampled_from(VOPS),
                      st.sampled_from(SCALARS), ch),
            st.tuples(st.just("vop3"), st.sampled_from(VOPS), ch, ch),
        )

    return st.recursive(_rng_leaves(), extend, max_leaves=3)


def _render3(e) -> str:
    k = e[0]
    if k == "ext":
        _, kind, (rm, rs), (om, osfx) = e
        return f"{kind}(demo_cpu_usage_seconds_total[{rs}]{osfx})"
    if k == "ot":
        _, op, (rm, rs), (om, osfx) = e
        return f"{op}_over_time(demo_memory_usage_bytes[{rs}]{osfx})"
    if k == "sop3":
        return f"({_render3(e[3])} {e[1]} {e[2]})"
    if k == "vop3":
        return f"({_render3(e[2])} {e[1]} {_render3(e[3])})"
    raise AssertionError(k)


def _window(samples, t, rng, off):
    t -= off
    return [(ts, v) for ts, v in samples if t - rng < ts <= t]


def _extrapolated(w, rng_ms, t, kind):
    """promql/functions.go extrapolatedRate (v0.307.x clamp order) —
    the values-tier reference, inlined so this module stays
    self-contained."""
    if len(w) < 2:
        return None
    (ft, fv), (lt, lv) = w[0], w[-1]
    result = lv - fv
    if kind in ("rate", "increase"):
        prev = fv
        for _, v in w[1:]:
            if v < prev:
                result += prev
            prev = v
    dur_start = (ft - (t - rng_ms)) / 1000
    dur_end = (t - lt) / 1000
    sampled = (lt - ft) / 1000
    avg_between = sampled / (len(w) - 1)
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


def _ot_fn(op: str, vals: list[float]) -> float:
    if op == "last":
        return vals[-1]
    if op == "count":
        return float(len(vals))
    return _agg_fn(op, vals)


def _eval3(e, t) -> dict[tuple, float]:
    k = e[0]
    if k == "ext":
        _, kind, (rm, _), (om, _) = e
        out = {}
        for ks, s in CPU.items():
            v = _extrapolated(_window(s, t - om, rm, 0), rm, t - om, kind)
            if v is not None:
                out[ks] = v
        return out
    if k == "ot":
        _, op, (rm, _), (om, _) = e
        out = {}
        for ks, s in MEM.items():
            w = [v for _, v in _window(s, t, rm, om)]
            if w:
                out[ks] = _ot_fn(op, w)
        return out
    if k == "sop3":
        return {ks: _go_arith(e[1], v, e[2])
                for ks, v in _eval3(e[3], t).items()}
    if k == "vop3":
        va, vb = _eval3(e[2], t), _eval3(e[3], t)
        return {ks: _go_arith(e[1], va[ks], vb[ks]) for ks in va if ks in vb}
    raise AssertionError(k)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_exprs3())
def test_fuzz_range_functions(spark, ceng, tree):
    q = _render3(tree)
    rows = ceng.query_range(q).collect()
    got: dict[tuple, float] = {}
    for r in rows:
        d = r.asDict()
        key = (d["instance"], d["type"], d["step_ts"])
        assert key not in got, (q, key)
        got[key] = d["value"]
    want: dict[tuple, float] = {}
    for t in GRID:
        for ks, v in _eval3(tree, t).items():
            want[ks + (t,)] = v
    assert set(got) == set(want), (q, sorted(set(got) ^ set(want))[:4])
    for key, w in want.items():
        g = got[key]
        if math.isnan(w):
            assert math.isnan(g), (q, key, g)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (q, key, g, w)


# ---------------- fuzz 4: histogram_quantile over random bucket layouts
#
# Random cumulative-count vectors — including NON-MONOTONE counts (the
# ensureMonotonic clamp), a missing +Inf bucket (NaN), and phi at both
# out-of-range edges — against the values tier's bucketQuantile
# reference (promql/quantile.go).

_LES = ["0.1", "0.5", "1", "2.5", "5"]
_PHIS = [0.25, 0.5, 0.9, 1.0, -0.5, 1.5]


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_les=st.integers(min_value=1, max_value=4),
    counts=st.lists(st.integers(min_value=0, max_value=50),
                    min_size=5, max_size=5),
    with_inf=st.booleans(),
    phi=st.sampled_from(_PHIS),
)
def test_fuzz_histogram_quantile(spark, n_les, counts, with_inf, phi):
    from test_compliance_values import _bucket_quantile

    from squirreldb_spark.promql import PromQLEngine

    les = _LES[:n_les] + (["+Inf"] if with_inf else [])
    pairs = list(zip(les, counts))
    if with_inf and sum(c for _, c in pairs) == 0:
        pairs[-1] = ("+Inf", 1)  # keep rank > 0 so phi in (0,1] is defined
    rows = [("i1", le, "hb", 0, float(c)) for le, c in pairs]
    pts = spark.createDataFrame(
        rows, "instance string, le string, name string, ts long,"
        " value double"
    )
    eng = PromQLEngine(
        pts, label_cols=("instance", "le", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )
    out = eng.query_range(f"histogram_quantile({phi}, hb)").collect()
    want = _bucket_quantile(phi, [(float(le), float(c)) for le, c in pairs])
    if math.isnan(want) and not with_inf:
        # upstream drops histograms without an +Inf bucket entirely
        assert out == [] or all(math.isnan(r.value) for r in out)
        return
    got = {r.step_ts: r.value for r in out}
    assert set(got) == {0}, (pairs, phi, got)
    g = got[0]
    if math.isnan(want):
        assert math.isnan(g), (pairs, phi, g)
    else:
        assert g == pytest.approx(want, rel=1e-9, abs=1e-12), (pairs, phi, g)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_exprs())
def test_fuzz_expression_composition(spark, ceng, tree):
    q = _render(tree)
    lvl = _level(tree)
    attrs = ["instance", "type"][:lvl]
    rows = ceng.query_range(q).collect()
    got: dict[tuple, float] = {}
    for r in rows:
        d = r.asDict()
        key = tuple(d[a] for a in attrs) + (d["step_ts"],)
        assert key not in got, (q, key)
        got[key] = d["value"]
    want: dict[tuple, float] = {}
    for t in GRID:
        for ks, v in _eval(tree, t).items():
            want[ks + (t,)] = v
    assert set(got) == set(want), (
        q, sorted(set(got) ^ set(want))[:4]
    )
    for key, w in want.items():
        g = got[key]
        if math.isnan(w):
            assert math.isnan(g), (q, key, g)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (q, key, g, w)


# ----------------------- fuzz 5: selector matcher-set combinations
#
# Random matcher sets over (instance, type) — equality, negation and
# ANCHORED regex in both polarities, including the Prometheus
# empty-string semantics (`type=""` matches series lacking the label;
# `type!=""` requires a non-empty value) — against a Python `re`
# model over the union of memory (type free/used) and num_cpus
# (type "") series, so both the labeled and unlabeled cases appear.

_M_OPS = ["=", "!=", "=~", "!~"]
_INST_VALS = ["i1", "i2", "i9", ""]
_TYPE_VALS = ["free", "used", ""]
_INST_RES = ["i.*", ".*2", "i1|i9", ""]
_TYPE_RES = ["fre.*", "free|used", ".+", ""]


def _all_series() -> dict[tuple[str, str, str], list[tuple[int, float]]]:
    out: dict[tuple, list] = {}
    for inst, typ, name, ts, v in fixture_rows():
        if name in ("demo_memory_usage_bytes", "demo_num_cpus"):
            out.setdefault((name, inst, typ), []).append((ts, v))
    for k in out:
        out[k].sort()
    return out


ALL = _all_series()


def _matcher_ok(op: str, pat: str, v: str) -> bool:
    import re as _re

    if op == "=":
        return v == pat
    if op == "!=":
        return v != pat
    hit = _re.fullmatch(f"(?:{pat})", v) is not None
    return hit if op == "=~" else not hit


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    im=st.one_of(st.none(),
                 st.tuples(st.sampled_from(_M_OPS),
                           st.sampled_from(_INST_VALS + _INST_RES))),
    tm=st.one_of(st.none(),
                 st.tuples(st.sampled_from(_M_OPS),
                           st.sampled_from(_TYPE_VALS + _TYPE_RES))),
    metric=st.sampled_from(["demo_memory_usage_bytes", "demo_num_cpus"]),
)
def test_fuzz_selector_matchers(spark, ceng, im, tm, metric):
    parts = []
    if im is not None:
        parts.append(f'instance{im[0]}"{im[1]}"')
    if tm is not None:
        parts.append(f'type{tm[0]}"{tm[1]}"')
    q = metric + ("{" + ", ".join(parts) + "}" if parts else "")
    rows = ceng.query_range(q).collect()
    got = {(r.instance, r.type, r.step_ts) for r in rows}
    want = set()
    for (name, inst, typ), s in ALL.items():
        if name != metric:
            continue
        if im is not None and not _matcher_ok(im[0], im[1], inst):
            continue
        if tm is not None and not _matcher_ok(tm[0], tm[1], typ):
            continue
        for t in GRID:
            if _inst_val(s, t) is not None:
                want.add((inst, typ, t))
    assert got == want, (q, sorted(got ^ want)[:6])


# -------------------- fuzz 6: subqueries around fuzzed inner expressions
#
# `<outer>_over_time((<fuzz-1 tree>)[range:step] offset?)`: the inner
# expression evaluates on the ABSOLUTE-aligned step grid, the outer
# window is left-open, and offsets shift the whole window — the grid
# alignment logic the fixed values-tier subquery tests touch at three
# points, here exercised across range×step×offset × random inners.

_SQ_RANGES = [(60_000, "1m"), (90_000, "1m30s"), (120_000, "2m")]
_SQ_STEPS = [(10_000, "10s"), (30_000, "30s"), (30_000, "")]  # "" = default
_SQ_OFFS = [(0, ""), (30_000, " offset 30s")]
_SQ_OUTER = ["avg", "min", "max", "sum", "count", "last"]


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    inner=_exprs(),
    outer=st.sampled_from(_SQ_OUTER),
    rng=st.sampled_from(_SQ_RANGES),
    step=st.sampled_from(_SQ_STEPS),
    off=st.sampled_from(_SQ_OFFS),
)
def test_fuzz_subquery_composition(spark, ceng, inner, outer, rng, step, off):
    (rm, rs), (sm, ss), (om, osfx) = rng, step, off
    colon = f"{rs}:{ss}" if ss else f"{rs}:"
    q = f"{outer}_over_time(({_render(inner)})[{colon}]{osfx})"
    lvl = _level(inner)
    attrs = ["instance", "type"][:lvl]
    rows = ceng.query_range(q).collect()
    got: dict[tuple, float] = {}
    for r in rows:
        d = r.asDict()
        key = tuple(d[a] for a in attrs) + (d["step_ts"],)
        assert key not in got, (q, key)
        got[key] = d["value"]
    want: dict[tuple, float] = {}
    for t in GRID:
        per_key: dict[tuple, list[float]] = {}
        for ts2 in range(0, 120_001, sm):
            if t - om - rm < ts2 <= t - om:
                for ks, v in _eval(inner, ts2).items():
                    per_key.setdefault(ks, []).append(v)
        for ks, vals in per_key.items():
            want[ks + (t,)] = _ot_fn(outer, vals)
    assert set(got) == set(want), (q, sorted(set(got) ^ set(want))[:4])
    for key, w in want.items():
        g = got[key]
        if math.isnan(w):
            assert math.isnan(g), (q, key, g)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (q, key, g, w)


# ------------------- fuzz 7: @-PINNED subqueries (step-invariant windows)
#
# `<outer>_over_time((<fuzz-1 tree>)[range:step] offset? @ T)`: the whole
# inner window pins at T_eff = T - offset, so the outer result is the
# SAME per-series value at EVERY outer step.  The duplicate-sensitive
# outers (count/sum/avg) are the ones the r12 review bug hit — the old
# point-replication replay let replicas slide into neighboring steps'
# windows, inflating exactly these functions while max/min stayed right.

_SQ_ANCHORS = [(60_000, "60"), (90_000, "90"),
               (GRID[0], "start()"), (GRID[-1], "end()")]


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    inner=_exprs(),
    outer=st.sampled_from(_SQ_OUTER),
    rng=st.sampled_from(_SQ_RANGES),
    step=st.sampled_from(_SQ_STEPS),
    off=st.sampled_from(_SQ_OFFS),
    anchor=st.sampled_from(_SQ_ANCHORS),
)
def test_fuzz_subquery_at_pinned(spark, ceng, inner, outer, rng, step, off,
                                 anchor):
    (rm, rs), (sm, ss), (om, osfx), (at_ms, at_txt) = rng, step, off, anchor
    colon = f"{rs}:{ss}" if ss else f"{rs}:"
    q = f"{outer}_over_time(({_render(inner)})[{colon}]{osfx} @ {at_txt})"
    lvl = _level(inner)
    attrs = ["instance", "type"][:lvl]
    rows = ceng.query_range(q).collect()
    got: dict[tuple, float] = {}
    for r in rows:
        d = r.asDict()
        key = tuple(d[a] for a in attrs) + (d["step_ts"],)
        assert key not in got, (q, key)
        got[key] = d["value"]
    # model: ONE pinned window (T_eff - rm, T_eff], absolutely aligned
    # inner steps; the per-series fold replicates across the outer grid
    teff = at_ms - om
    per_key: dict[tuple, list[float]] = {}
    for ts2 in range(0, 120_001, sm):
        if teff - rm < ts2 <= teff:
            for ks, v in _eval(inner, ts2).items():
                per_key.setdefault(ks, []).append(v)
    want: dict[tuple, float] = {}
    for ks, vals in per_key.items():
        const = _ot_fn(outer, vals)
        for t in GRID:
            want[ks + (t,)] = const
    assert set(got) == set(want), (q, sorted(set(got) ^ set(want))[:4])
    for key, w in want.items():
        g = got[key]
        if math.isnan(w):
            assert math.isnan(g), (q, key, g)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (q, key, g, w)
