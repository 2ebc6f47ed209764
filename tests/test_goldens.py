"""Value-level compliance goldens.

The 350-case compliance corpus (test_compliance.py) asserts plans build
and execute; these tests pin exact hand-computed VALUES for the
semantics corners where a wrong answer would otherwise slip through:
vector-matching with group_left/right, `or`/`unless` label precedence,
IEEE NaN/Inf propagation, @/offset combinations, and comparison
filtering. Expected numbers are derived by hand from the fixture below
(they mirror upstream Prometheus evaluation rules, promql/engine.go).

Fixture (step=10s, lookback=20s, data grid 10s..30s):

    req{h=a,p=web}: 10s->10, 20s->20, 30s->30      (rising counter)
    req{h=b,p=web}: 10s->5,  20s->5,  30s->0       (counter reset at 30)
    lim{h=a}:       20s->100
    lim{h=b}:       20s->50
    err{h=a,p=web}: 20s->4

Instant selection at step t picks the latest sample in (t-20s, t]; lim
is therefore absent at 10s and present (via lookback) at 20s and 30s.
"""

import math

import pytest

from squirreldb_spark.promql import PromQLEngine


@pytest.fixture(scope="module")
def geng(spark):
    rows = [
        ("a", "web", "req", 10_000, 10.0),
        ("a", "web", "req", 20_000, 20.0),
        ("a", "web", "req", 30_000, 30.0),
        ("b", "web", "req", 10_000, 5.0),
        ("b", "web", "req", 20_000, 5.0),
        ("b", "web", "req", 30_000, 0.0),
        ("a", "", "lim", 20_000, 100.0),
        ("b", "", "lim", 20_000, 50.0),
        ("a", "web", "err", 20_000, 4.0),
    ]
    pts = spark.createDataFrame(
        rows, "h string, p string, name string, ts long, value double"
    )
    return PromQLEngine(
        pts, label_cols=("h", "p", "name"), name_label="name",
        step_ms=10_000, lookback_ms=20_000,
    )


def _by(out, *keys):
    return {tuple(r[k] for k in keys): r["value"] for r in out}


# ------------------------------------------------------------ group_left


def test_group_left_values(geng):
    out = geng.query_range("req / on(h) group_left lim").collect()
    got = _by(out, "h", "step_ts")
    # lim absent at 10s -> no 10s rows; carried by lookback at 20/30s
    assert got == {
        ("a", 20_000): 20.0 / 100.0,
        ("a", 30_000): 30.0 / 100.0,
        ("b", 20_000): 5.0 / 50.0,
        ("b", 30_000): 0.0 / 50.0,
    }


def test_group_left_carries_extra_labels(geng):
    out = geng.query_range("req / on(h) group_left lim").collect()
    # many-side labels survive on every row — except __name__, which
    # arithmetic drops (upstream DropMetricName)
    assert all(r.p == "web" for r in out)
    assert "name" not in out[0].asDict()


def test_group_right_values(geng):
    out = geng.query_range("lim - on(h) group_right req").collect()
    got = _by(out, "h", "step_ts")
    assert got == {
        ("a", 20_000): 80.0,
        ("a", 30_000): 70.0,
        ("b", 20_000): 45.0,
        ("b", 30_000): 50.0,
    }


# --------------------------------------------------------- or / unless


def test_or_left_precedence_and_union(geng):
    out = geng.query_range("sum by (h) (req) or sum by (h) (lim)").collect()
    got = _by(out, "h", "step_ts")
    # left series win at every step they exist; right fills nothing here
    # because the label sets match exactly (h) on both sides
    assert got[("a", 10_000)] == 10.0 and got[("a", 20_000)] == 20.0
    assert got[("b", 30_000)] == 0.0
    assert len(got) == 6  # 2 hosts x 3 steps, no duplicated right rows


def test_or_fills_right_only_steps(geng):
    # err exists only from 20s; req covers all steps -> or keeps req
    # everywhere and adds nothing; flipped order keeps err's own value
    # where it exists and req elsewhere
    a = _by(geng.query_range("sum by (h) (err) or sum by (h) (req)").collect(),
            "h", "step_ts")
    assert a[("a", 20_000)] == 4.0          # err wins where present
    assert a[("a", 10_000)] == 10.0         # req fills the gap
    assert a[("b", 20_000)] == 5.0          # no err{h=b} at all -> req
    assert len(a) == 6


def test_unless_on_drops_matching(geng):
    out = geng.query_range("req unless on(h, step_ts) err").collect()
    # err{h=a} exists at 20s and (lookback) 30s -> req{h=a} survives only
    # at 10s; req{h=b} survives everywhere
    got = {(r.h, r.step_ts) for r in out}
    assert got == {("a", 10_000), ("b", 10_000), ("b", 20_000), ("b", 30_000)}


# ------------------------------------------------------- NaN / Inf / IEEE


def test_division_by_zero_vector_scalar(geng):
    out = geng.query_range("req / 0").collect()
    got = _by(out, "h", "step_ts")
    assert got[("a", 10_000)] == math.inf
    assert math.isnan(got[("b", 30_000)])  # 0/0


def test_division_by_zero_vector_vector(geng):
    # the inner binop result carries only its matching labels (h, p)
    out = geng.query_range("req / on(h, p) (req - req)").collect()
    got = _by(out, "h", "step_ts")
    assert got[("a", 20_000)] == math.inf    # 20 / 0
    assert math.isnan(got[("b", 30_000)])    # 0 / 0


def test_nan_dropped_by_comparison_filter(geng):
    out = geng.query_range("(req / on(h, p) (req - req)) > 0").collect()
    got = _by(out, "h", "step_ts")
    # NaN > 0 is false -> the 0/0 row disappears; Inf > 0 survives
    assert ("b", 30_000) not in got
    assert got[("a", 10_000)] == math.inf


def test_nan_not_equal_is_true(geng):
    out = geng.query_range(
        "(req / on(h, p) (req - req)) != bool 0"
    ).collect()
    got = _by(out, "h", "step_ts")
    assert got[("b", 30_000)] == 1.0   # NaN != 0 -> true (IEEE)
    assert got[("a", 10_000)] == 1.0   # Inf != 0
    out2 = geng.query_range(
        "(req / on(h, p) (req - req)) == bool 0"
    ).collect()
    assert _by(out2, "h", "step_ts")[("b", 30_000)] == 0.0  # NaN == 0 -> false


def test_inf_arithmetic_propagates(geng):
    out = geng.query_range("(req / 0) - (req / 0)").collect()
    assert all(math.isnan(r.value) for r in out)  # Inf - Inf = NaN


def test_negative_pow_and_mod(geng):
    got = _by(geng.query_range("(0 - req) % 3").collect(), "h", "step_ts")
    # Spark/Go fmod keeps the dividend's sign: -10 % 3 = -1, -20 % 3 = -2
    assert got[("a", 10_000)] == -1.0
    assert got[("a", 20_000)] == -2.0
    got2 = _by(geng.query_range("req ^ 0.5").collect(), "h", "step_ts")
    assert got2[("b", 20_000)] == pytest.approx(math.sqrt(5.0))


# -------------------------------------------------------- @ and offset


def test_at_modifier_pins_evaluation(geng):
    out = geng.query_range("sum by (h) (req @ 20)").collect()
    got = _by(out, "h", "step_ts")
    # constant across the grid: the 20s sample everywhere
    for step in (10_000, 20_000, 30_000):
        assert got[("a", step)] == 20.0
        assert got[("b", step)] == 5.0


def test_offset_shifts_window(geng):
    out = geng.query_range("sum by (h) (req offset 10s)").collect()
    got = _by(out, "h", "step_ts")
    assert got[("a", 20_000)] == 10.0   # sees the 10s sample
    assert got[("a", 30_000)] == 20.0
    assert ("a", 10_000) not in got     # nothing at 0s


def test_at_with_offset_combines(geng):
    out = geng.query_range("sum by (h) (req @ 30 offset 10s)").collect()
    got = _by(out, "h", "step_ts")
    # @30 then offset 10s -> the 20s sample, pinned across the grid
    for step in (10_000, 20_000, 30_000):
        assert got[("a", step)] == 20.0


def test_negative_offset_looks_ahead(geng):
    out = geng.query_range("sum by (h) (req offset -10s)").collect()
    got = _by(out, "h", "step_ts")
    assert got[("a", 10_000)] == 20.0   # 10s step sees the 20s sample
    assert got[("a", 20_000)] == 30.0


# ------------------------------------------------------- bool / filters


def test_bool_comparison_yields_0_1(geng):
    out = geng.query_range("req >= bool 10").collect()
    got = _by(out, "h", "step_ts")
    assert got[("a", 10_000)] == 1.0
    assert got[("b", 10_000)] == 0.0
    assert got[("b", 30_000)] == 0.0


def test_comparison_keeps_left_value(geng):
    out = geng.query_range("req > 5").collect()
    got = _by(out, "h", "step_ts")
    assert got[("a", 10_000)] == 10.0
    assert ("b", 10_000) not in got     # 5 > 5 false
    assert ("b", 30_000) not in got


# ------------------------------------------------- rate/increase corners


def test_increase_with_counter_reset(geng):
    # window (10s, 30s]: samples 5@20s (after lookbehind drops 10s? no --
    # range selector takes (t-20s, t]: at 30s -> samples 5@20s is NOT in
    # (10s,30s]? 20s in (10,30] yes) -> [5@20, 0@30]; reset adds prev 5:
    # raw delta = 0 - 5 + 5 = 0? increase extrapolates beyond sampled span
    out = geng.query_range('increase(req{h="b"}[20s])').collect()
    got = {r.step_ts: r.value for r in out}
    # at 30s: samples (20s,5),(30s,0): counter delta = 0-5+5 = 0 -> 0
    assert got[30_000] == 0.0


def test_rate_simple_slope(geng):
    out = geng.query_range('rate(req{h="a"}[20s])').collect()
    got = {r.step_ts: r.value for r in out}
    # at 30s: (10,10),(20,20),(30,30) in (10,30]: only 20s,30s qualify ->
    # delta 10 over sampled 10s, extrapolated to the 20s window -> 20/20s = 1.0
    assert got[30_000] == pytest.approx(1.0)


def test_quantile_exact_interpolation(geng):
    out = geng.query_range("quantile by (step_ts) (0.5, req)").collect()
    # per step across the two series: median of {10,5}=7.5, {20,5}=12.5, {30,0}=15
    got = {r.step_ts: r.value for r in out}
    assert got[10_000] == 7.5 and got[20_000] == 12.5 and got[30_000] == 15.0
