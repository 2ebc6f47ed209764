"""Edge-fixture VALUES tier: NaN, counter resets, and irregular gaps.

The main-fixture tier (test_compliance_values.py) covers the template
families on clean data; this file drives the same independent evaluator
over the inputs where engines and Prometheus historically diverge:

- NaN samples: Spark's ordering treats NaN as the LARGEST double, while
  upstream max/min aggregation and *_over_time skip NaN unless the whole
  group is NaN (the ``|| math.IsNaN(acc)`` pattern in
  promql/functions.go aggrOverTime and engine.go aggregation), and
  topk/bottomk rank NaN below/above every number (the
  ``math.IsNaN(heap[0].F) && !math.IsNaN(s.F)`` eviction in
  engine.go aggregationK).
- Counter resets and a non-zero first sample: the zero-crossing clamp in
  extrapolatedRate applies to the RAW duration-to-start, before the
  extrapolation-threshold rewrite.
- Irregular sampling: head/tail gaps beyond 1.1x the average spacing
  trigger the half-spacing extrapolation on each side independently.
"""

from __future__ import annotations

import math

import pytest

from test_compliance_values import assert_vals, extrapolated, res, window

from squirreldb_spark.promql import PromQLEngine

GRID = [0, 30_000, 60_000, 90_000, 120_000]

#: (instance, ts, value) triples for metric edge_counter — counter with a
#: reset at 60s and a NON-ZERO first value (exercises the zero-crossing
#: clamp against the threshold rewrite)
COUNTER_ROWS = [
    ("c1", ts, v)
    for ts, v in [
        (30_000, 40.0), (40_000, 44.0), (50_000, 48.0),
        (60_000, 2.0),   # reset
        (70_000, 6.0), (80_000, 10.0), (90_000, 14.0),
        (100_000, 18.0), (110_000, 22.0), (120_000, 26.0),
    ]
] + [
    # c2 discriminates the clamp ORDER: at t=120s the window (60s,120s]
    # holds 80/90/100s -> raw head gap 20s >= threshold 11s, and
    # dur_zero = 20 * (3/6) = 10s sits strictly between the half-spacing
    # fallback (5s) and the raw gap — upstream (prometheus v0.307.x)
    # rewrites to the 5s fallback FIRST and the clamp is then a no-op
    # (min with a larger dur_zero); the pre-2.50 order would keep 10s
    ("c2", 80_000, 3.0), ("c2", 90_000, 6.0), ("c2", 100_000, 9.0),
]

#: gappy gauge: head gap AND tail gap inside a 60s window at t=120s
GAPPY_ROWS = [
    ("g1", ts, v)
    for ts, v in [
        (0, 1.0), (10_000, 2.0), (20_000, 3.0),
        (85_000, 9.5), (95_000, 10.5), (100_000, 11.0),
    ]
] + [
    # g2 anchors the data extent so the evaluation grid (data-derived,
    # grid.py) reaches 120s — where g1's window has BOTH a 25s head gap
    # and a 20s tail gap past the 1.1x-spacing threshold
    ("g2", 0, 0.0), ("g2", 120_000, 0.0),
]

#: NaN-bearing series: n1 mixes NaN with numbers, n2 is all-NaN, n3 clean
NAN_ROWS = (
    [("n1", ts, v) for ts, v in [
        (0, 5.0), (10_000, float("nan")), (20_000, 3.0),
        (30_000, float("nan")), (40_000, 7.0),
    ]]
    + [("n2", ts, float("nan")) for ts in range(0, 50_000, 10_000)]
    # n3 runs to 120s so the data-derived grid covers every step; n1/n2
    # go stale (lookback 60s) after t=100s
    + [("n3", ts, 4.0) for ts in range(0, 130_000, 10_000)]
)


def _mk_engine(spark, name: str, rows):
    pts = spark.createDataFrame(
        [(i, name, ts, v) for i, ts, v in rows],
        "instance string, name string, ts long, value double",
    )
    return PromQLEngine(
        pts, label_cols=("instance", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )


def _samples(rows, inst):
    return sorted((ts, v) for i, ts, v in rows if i == inst)


# ------------------------------------------------- extrapolation edges


def test_values_rate_zero_clamp_order(spark):
    """rate() with a head gap and a non-zero first value: upstream
    (prometheus v0.307.x extrapolatedRate) applies the
    extrapolation-threshold rewrite FIRST, then clamps with
    min(durationToStart, durationToZero) — a dur_zero above the
    half-spacing fallback never widens the window back."""
    eng = _mk_engine(spark, "edge_counter", COUNTER_ROWS)
    s = _samples(COUNTER_ROWS, "c1")
    s2 = _samples(COUNTER_ROWS, "c2")
    for kind in ("rate", "increase"):
        q = f"{kind}(edge_counter[1m])"
        want = {}
        for inst, ss in (("c1", s), ("c2", s2)):
            for t in GRID:
                v = extrapolated(window(ss, t, 60_000), 60_000, t, kind)
                if v is not None:
                    want[(inst, t)] = v
        assert_vals(res(eng, q, "instance"), want, q)
    # the reset is genuinely exercised
    w = window(s, 90_000, 60_000)
    assert any(b < a for (_, a), (_, b) in zip(w, w[1:]))
    # ...and c2's t=120s window really discriminates the clamp order
    w2 = window(s2, 120_000, 60_000)
    assert [ts for ts, _ in w2] == [80_000, 90_000, 100_000]


def test_values_gappy_extrapolation_both_ends(spark):
    """Head and tail gaps beyond 1.1x avg spacing each fall back to
    half-spacing extrapolation independently."""
    eng = _mk_engine(spark, "edge_gauge", GAPPY_ROWS)
    s = _samples(GAPPY_ROWS, "g1")
    q = "delta(edge_gauge[1m])"
    want = {}
    for t in GRID:
        v = extrapolated(window(s, t, 60_000), 60_000, t, "delta")
        if v is not None:
            want[("g1", t)] = v
    assert_vals(res(eng, q, "instance"), want, q)
    # the t=120s window really has both a head gap (85s-60s) and a tail
    # gap (120s-100s) beyond threshold
    w = window(s, 120_000, 60_000)
    assert w[0][0] == 85_000 and w[-1][0] == 100_000


def test_values_resets_changes_on_reset_fixture(spark):
    eng = _mk_engine(spark, "edge_counter", COUNTER_ROWS)
    want_r, want_c = {}, {}
    for inst in ("c1", "c2"):
        s = _samples(COUNTER_ROWS, inst)
        for t in GRID:
            w = window(s, t, 60_000)
            if not w:
                continue
            want_r[(inst, t)] = sum(
                1.0 for (_, a), (_, b) in zip(w, w[1:]) if b < a
            )
            want_c[(inst, t)] = sum(
                1.0 for (_, a), (_, b) in zip(w, w[1:]) if b != a
            )
    assert_vals(res(eng, "resets(edge_counter[1m])", "instance"), want_r)
    assert_vals(res(eng, "changes(edge_counter[1m])", "instance"), want_c)


def test_values_resets_ignore_nan_transitions(spark):
    """Upstream funcResets is a plain float < per adjacent pair: NaN on
    either side compares false, so NaN transitions never count. Spark's
    ordering (x < NaN is true) would otherwise count every NaN->number
    step as a reset."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    got = res(eng, "resets(edge_nan[1m])", "instance")
    # n1 holds NaN<->number flips but no adjacent numeric drop; n2 is
    # all NaN; n3 is constant -> every window of every series: 0 resets
    assert got and all(v == 0.0 for v in got.values()), got


# --------------------------------------------------------- NaN edges


def _nan_vec(t):
    """Instant values of the three NaN-fixture series at step t."""
    out = {}
    for inst in ("n1", "n2", "n3"):
        s = _samples(NAN_ROWS, inst)
        cand = [v for ts, v in s if t - 60_000 < ts <= t]
        if cand:
            out[inst] = cand[-1]
    return out


def _p_max(vals):
    """Upstream max: skip NaN unless every value is NaN."""
    m = vals[0]
    for v in vals:
        if v > m or math.isnan(m):
            m = v
    return m


def _p_min(vals):
    m = vals[0]
    for v in vals:
        if v < m or math.isnan(m):
            m = v
    return m


def test_values_max_min_agg_skip_nan(spark):
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    for op, fn in (("max", _p_max), ("min", _p_min)):
        q = f"{op}(edge_nan)"
        want = {}
        for t in GRID:
            vec = list(_nan_vec(t).values())
            if vec:
                want[(t,)] = fn(vec)
        assert_vals(res(eng, q), want, q)


def test_values_max_min_over_time_skip_nan(spark):
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    for op, fn in (("max", _p_max), ("min", _p_min)):
        q = f"{op}_over_time(edge_nan[1m])"
        want = {}
        for inst in ("n1", "n2", "n3"):
            s = _samples(NAN_ROWS, inst)
            for t in GRID:
                w = [v for _, v in window(s, t, 60_000)]
                if w:
                    want[(inst, t)] = fn(w)
        assert_vals(res(eng, q, "instance"), want, q)


def test_values_sum_avg_over_time_propagate_nan(spark):
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    for op in ("sum", "avg"):
        q = f"{op}_over_time(edge_nan[1m])"
        got = res(eng, q, "instance")
        # n1 windows containing a NaN -> NaN; n3 clean -> finite
        assert math.isnan(got[("n1", 30_000)])
        assert not math.isnan(got[("n3", 30_000)])


def test_values_topk_bottomk_rank_nan_last(spark):
    """topk: NaN ranks below every number (only fills when fewer than k
    non-NaN series exist); bottomk: NaN ranks above every number."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    # at t=30s: n1=NaN (last sample at 30s is NaN), n2=NaN, n3=4.0
    vec = _nan_vec(30_000)
    assert math.isnan(vec["n1"]) and math.isnan(vec["n2"])
    assert vec["n3"] == 4.0
    for op in ("topk", "bottomk"):
        rows = eng.query_range(f"{op}(1, edge_nan)").collect()
        picked = {r.step_ts: r.instance for r in rows}
        # the single pick at 30s must be the non-NaN series
        assert picked[30_000] == "n3", (op, picked)
        # k=2: the second slot fills with a NaN series
        rows2 = eng.query_range(f"{op}(2, edge_nan)").collect()
        at30 = sorted(r.instance for r in rows2 if r.step_ts == 30_000)
        assert "n3" in at30 and len(at30) == 2


def test_values_changes_nan_to_nan_is_not_a_change(spark):
    """Spark's NaN equality (NaN = NaN is true) matches upstream here:
    NaN->NaN does not count, NaN<->number does."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    got = res(eng, "changes(edge_nan[1m])", "instance")
    # n2 is all-NaN: zero changes in every window
    for t in GRID:
        if ("n2", t) in got:
            assert got[("n2", t)] == 0.0
    # n1 over the LEFT-OPEN (0,60s] window: ts=0 is excluded, leaving
    # NaN, 3, NaN, 7 -> 3 in-window transitions, all counted
    assert got[("n1", 60_000)] == 3.0


def test_values_quantile_over_time_nan_sorts_first(spark):
    """promql/quantile.go sorts NaN FIRST (vectorByValueHeap.Less is
    true for NaN) and interpolates lo*(1-w) + hi*w — so low phi touches
    the NaN prefix (-> NaN result) while high phi over the same window
    is a clean number. Spark's percentile puts NaN at the HIGH end,
    which would invert this; the engine must not use it."""
    from test_compliance_values import pquantile

    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    for phi in (0.0, 0.1, 0.5, 0.9, 1.0):
        q = f"quantile_over_time({phi}, edge_nan[1m])"
        want = {}
        for inst in ("n1", "n2", "n3"):
            s = _samples(NAN_ROWS, inst)
            for t in GRID:
                w = [v for _, v in window(s, t, 60_000)]
                if w:
                    want[(inst, t)] = pquantile(phi, w)
        got = res(eng, q, "instance")
        assert_vals(got, want, q)
    # sanity on the discriminating shape: n1 window at 60s (left-open)
    # holds [NaN, 3, NaN, 7] -> sorted NaN,NaN,3,7; phi=0 -> NaN,
    # phi=1 -> 7, phi=0.5 (rank 1.5, between the 2nd NaN and 3) -> NaN
    w = [v for _, v in window(_samples(NAN_ROWS, "n1"), 60_000, 60_000)]
    assert math.isnan(pquantile(0.0, w)) and pquantile(1.0, w) == 7.0
    assert math.isnan(pquantile(0.5, w))
    got_hi = res(eng, "quantile_over_time(1, edge_nan[1m])", "instance")
    assert got_hi[("n1", 60_000)] == 7.0
    got_mid = res(eng, "quantile_over_time(0.5, edge_nan[1m])", "instance")
    assert math.isnan(got_mid[("n1", 60_000)])


def test_values_quantile_agg_nan_and_out_of_range_phi(spark):
    from test_compliance_values import pquantile

    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    # vector at 30s is {n1: NaN, n2: NaN, n3: 4.0}
    for phi in (0.25, 0.75):
        got = res(eng, f"quantile({phi}, edge_nan)")
        want = {}
        for t in GRID:
            vec = list(_nan_vec(t).values())
            if vec:
                want[(t,)] = pquantile(phi, vec)
        assert_vals(got, want, f"quantile({phi}, ...)")
    # phi outside [0,1] -> +/-Inf for every populated step (upstream
    # returns the infinity with a warning annotation)
    lo = res(eng, "quantile(-0.5, edge_nan)")
    hi = res(eng, "quantile(1.5, edge_nan)")
    assert all(v == -math.inf for v in lo.values()) and lo
    assert all(v == math.inf for v in hi.values()) and hi


def test_values_mad_over_time_nan_first_median(spark):
    from test_compliance_values import pquantile

    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    got = res(eng, "mad_over_time(edge_nan[1m])", "instance")
    want = {}
    for inst in ("n1", "n2", "n3"):
        s = _samples(NAN_ROWS, inst)
        for t in GRID:
            w = [v for _, v in window(s, t, 60_000)]
            if w:
                med = pquantile(0.5, w)
                want[(inst, t)] = pquantile(0.5, [abs(v - med) for v in w])
    assert_vals(got, want, "mad_over_time")


def test_values_rate_increase_nan_windows(spark):
    """NaN samples in a counter window: upstream's plain float reset
    test never fires on NaN (value < NaN and NaN < value are both
    false in Go), and the first/last subtraction propagates NaN.
    Spark's NaN-is-largest ordering would instead count every
    number->NaN transition as a reset and add a NaN correction."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    for kind in ("rate", "increase"):
        got = res(eng, f"{kind}(edge_nan[1m])", "instance")
        want = {}
        for inst in ("n1", "n2", "n3"):
            s = _samples(NAN_ROWS, inst)
            for t in GRID:
                w = window(s, t, 60_000)
                v = extrapolated(w, 60_000, t, kind)
                if v is not None:
                    want[(inst, t)] = v
        assert_vals(got, want, kind)
        # the discriminating windows really are NaN (not a number from
        # a bogus reset correction)
        assert math.isnan(got[("n1", 30_000)])
        assert not math.isnan(got[("n3", 30_000)])


def test_values_irate_nan_predecessor_is_not_a_reset(spark):
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    got = res(eng, "irate(edge_nan[1m])", "instance")
    want = {}
    for inst in ("n1", "n2", "n3"):
        s = _samples(NAN_ROWS, inst)
        for t in GRID:
            w = window(s, t, 60_000)
            if len(w) < 2:
                continue
            (pt, pv), (lt, lv) = w[-2], w[-1]
            diff = lv if (lv < pv) else lv - pv  # Go float <: NaN never
            want[(inst, t)] = diff / ((lt - pt) / 1000)
    assert_vals(got, want, "irate")
    # the discriminating shape is t=60s: the window's last two samples
    # are (30s NaN, 40s 7.0) — upstream's "7 < NaN" is FALSE (no
    # reset), so the result is (7 - NaN)/10s = NaN; a Spark-ordered
    # comparison would call it a reset and emit 0.7
    s1 = _samples(NAN_ROWS, "n1")
    w = window(s1, 60_000, 60_000)
    assert math.isnan(w[-2][1]) and w[-1][1] == 7.0
    assert math.isnan(got[("n1", 60_000)])


def test_values_pow_go_special_cases(spark):
    """Go math.Pow: 1^y = 1 for ANY y (NaN, ±Inf) and (-1)^±Inf = 1;
    the JVM's Math.pow returns NaN for both families."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    # 1 ^ NaN: n2 is all-NaN, result must still be 1 everywhere
    got = res(eng, "1 ^ edge_nan", "instance")
    for (inst, t), v in got.items():
        assert v == 1.0, (inst, t, v)
    # x ^ 0 = 1 even for NaN bases (agrees on both platforms)
    got0 = res(eng, "edge_nan ^ 0", "instance")
    assert got0 and all(v == 1.0 for v in got0.values())
    # (-1) ^ +Inf = 1 (edge_nan / 0 is +Inf for n3's finite positives,
    # NaN for NaN bases -> (-1)^NaN stays NaN on both platforms)
    gotm = res(eng, "(edge_nan * 0 - 1) ^ (edge_nan / 0)", "instance")
    for t in GRID:
        if (("n3", t)) in gotm:
            assert gotm[("n3", t)] == 1.0
        if (("n2", t)) in gotm:
            assert math.isnan(gotm[("n2", t)])


def test_values_nan_div_zero_is_nan(spark):
    """Go: NaN / 0 = NaN; the naive ANSI-safe CASE (l > 0 -> +Inf)
    returns +Inf under Spark's NaN-is-largest ordering."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    got = res(eng, "edge_nan / 0", "instance")
    for t in GRID:
        if ("n2", t) in got:
            assert math.isnan(got[("n2", t)])
        if ("n3", t) in got:
            assert got[("n3", t)] == math.inf


def test_values_round_halves_toward_plus_inf(spark):
    """funcRound is floor(v/r + 0.5)*r: halves round toward +Inf
    (round(-2.5) = -2, round(2.5) = 3). Spark's HALF_UP rounds away
    from zero (-2.5 -> -3) and must not be used."""
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    # n3 is constant 4.0 -> 4*0.625 - 5 = -2.5; round() -> -2.0
    got = res(eng, "round(edge_nan * 0.625 - 5)", "instance")
    for t in GRID:
        if ("n3", t) in got:
            assert got[("n3", t)] == -2.0, got[("n3", t)]
        if ("n2", t) in got:  # NaN passes through floor
            assert math.isnan(got[("n2", t)])
    # positive half: 4*0.625 = 2.5 -> 3.0; and to-nearest 0.5: floor
    # semantics at 4*0.3125 - 1.375 = -0.125 -> round(..., 0.5) = -0.0
    got2 = res(eng, "round(edge_nan * 0.625)", "instance")
    assert all(v == 3.0 for (i, t), v in got2.items() if i == "n3")
    got3 = res(eng, "round(edge_nan * 0.3125 - 1.375, 0.5)", "instance")
    assert all(v == 0.0 for (i, t), v in got3.items() if i == "n3")


def test_values_clamp_nan_and_inverted_bounds(spark):
    eng = _mk_engine(spark, "edge_nan", NAN_ROWS)
    # NaN sample stays NaN through every clamp (Go Max/Min propagate;
    # Spark least() would return the bound)
    for q, n3_want in (("clamp(edge_nan, 1, 3)", 3.0),
                       ("clamp_max(edge_nan, 3)", 3.0),
                       ("clamp_min(edge_nan, 1)", 4.0)):
        got = res(eng, q, "instance")
        for t in GRID:
            if ("n2", t) in got:
                assert math.isnan(got[("n2", t)]), (q, t)
        # the clean series (constant 4.0) clamps numerically
        for t in GRID:
            if ("n3", t) in got:
                assert got[("n3", t)] == n3_want, (q, got[("n3", t)])
    # min > max -> EMPTY vector (not NaN): functions.md special case
    assert res(eng, "clamp(edge_nan, 3, 1)", "instance") == {}


#: huge-value series: finite doubles whose plain sum overflows
HUGE_ROWS = (
    [("h1", ts, 1.6e308) for ts in range(0, 50_000, 10_000)]
    + [("h2", ts, v) for ts, v in [
        (0, 1.6e308), (10_000, float("inf")), (20_000, 1.0)]]
    + [("h3", ts, 4.0) for ts in range(0, 130_000, 10_000)]
)


def test_values_avg_does_not_overflow_on_finite_inputs(spark):
    """funcAvgOverTime / engine.go avg use an incremental Kahan mean:
    the mean of five 1.6e308 samples is 1.6e308, never +Inf. A plain
    sum/count overflows; a genuine +Inf input must still yield +Inf."""
    eng = _mk_engine(spark, "edge_huge", HUGE_ROWS)
    got = res(eng, "avg_over_time(edge_huge[1m])", "instance")
    for t in GRID:
        if ("h1", t) in got:
            assert got[("h1", t)] == pytest.approx(1.6e308, rel=1e-9), got[("h1", t)]
        if ("h2", t) in got:
            w = [v for _, v in window(_samples(HUGE_ROWS, "h2"), t, 60_000)]
            if any(math.isinf(v) for v in w):
                assert got[("h2", t)] == math.inf  # real Inf input wins
            else:
                assert got[("h2", t)] == pytest.approx(w[0], rel=1e-9)
        if ("h3", t) in got:
            assert got[("h3", t)] == 4.0
    # cross-series avg: h3's 4.0 can't rescue the overflow — but the
    # group (h1, h3) at t=30s has finite inputs only, so finite mean
    got_agg = res(eng, 'avg(edge_huge{instance=~"h1|h3"})')
    for t in (0, 30_000):
        if (t,) in got_agg:
            assert got_agg[(t,)] == pytest.approx(8e307, rel=1e-9), got_agg[(t,)]


def _heng_from(spark, rows):
    pts = spark.createDataFrame(
        rows, "instance string, le string, name string, ts long, value double"
    )
    return PromQLEngine(
        pts, label_cols=("instance", "le", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )


def test_values_histogram_quantile_edge_buckets(spark):
    """bucketQuantile edge branches: non-monotonic counts are clamped to
    the running max (scrape-race dips), a histogram with no +Inf bucket
    or a single bucket is NaN, a non-positive lowest bound returns the
    bound itself (no zero anchor below), and phi outside [0,1] is
    ±Inf."""
    from test_compliance_values import _bucket_quantile

    def mk(inst, counts):
        return [(inst, le, "edge_hist", t, c)
                for t in (0, 30_000) for le, c in counts]

    dip = [("0.1", 10.0), ("0.5", 8.0), ("1", 20.0), ("+Inf", 20.0)]
    noinf = [("0.1", 10.0), ("1", 20.0)]
    solo = [("+Inf", 20.0)]
    neg = [("-1", 5.0), ("1", 10.0), ("+Inf", 10.0)]
    rows = mk("dip", dip) + mk("noinf", noinf) + mk("solo", solo) + mk("neg", neg)
    eng = _heng_from(spark, rows)

    got = res(eng, "histogram_quantile(0.5, edge_hist)", "instance")
    fixtures = {"dip": dip, "noinf": noinf, "solo": solo, "neg": neg}
    for inst, counts in fixtures.items():
        want = _bucket_quantile(
            0.5, [(float(le.replace("+Inf", "inf")), c) for le, c in counts]
        )
        for t in (0, 30_000):
            g = got[(inst, t)]
            if math.isnan(want):
                assert g is None or math.isnan(g), (inst, g)
            else:
                assert g == pytest.approx(want, rel=1e-9), (inst, g, want)
    # the dip really exercises the clamp: rank 10 lands in the clamped
    # (0.5, 10] bucket whose width is zero counts -> upstream continues
    # to the next bucket... verify against the checker's exact value
    assert not math.isnan(got[("dip", 0)])
    # phi outside [0, 1]
    hi = res(eng, "histogram_quantile(1.5, edge_hist)", "instance")
    lo = res(eng, "histogram_quantile(-1, edge_hist)", "instance")
    assert hi and all(v == math.inf for v in hi.values())
    assert lo and all(v == -math.inf for v in lo.values())
    # NaN branches really hit
    assert math.isnan(got[("noinf", 0)]) and math.isnan(got[("solo", 0)])
    # negative lowest bound: rank 5 -> first bucket -> returns -1.0
    assert got[("neg", 0)] == -1.0


# --------------------------- experimental 3.x tier (VERDICT r5 #5)

#: edge_tie: repeated extrema + NaN mixtures for the ts_of_* tie rules.
#: i1 has the max (9.0) at BOTH 10s and 20s and the min (1.0) at both
#: 30s and 40s; i2 mixes NaN around a single number; i3 is all-NaN.
TIE_ROWS = (
    [("i1", ts, v) for ts, v in [
        (10_000, 5.0), (20_000, 9.0), (30_000, 9.0),
        (40_000, 1.0), (50_000, 1.0), (60_000, 3.0),
    ]]
    + [("i2", ts, v) for ts, v in [
        (10_000, float("nan")), (20_000, 7.0), (30_000, float("nan")),
    ]]
    + [("i3", ts, float("nan")) for ts in (10_000, 20_000)]
    # anchor so the data-derived grid reaches 120s
    + [("zz", 0, 0.0), ("zz", 120_000, 0.0)]
)


def _ts_of_ref(w, kind):
    """Reference replay of upstream funcTsOf{Max,Min,Last}OverTime:
    forward scan with >= / <= (ties resolve to the LATEST occurrence),
    NaN skipped unless the whole window is NaN (falls back to the last
    sample's timestamp)."""
    if not w:
        return None
    if kind == "last":
        return w[-1][0] / 1000.0
    best_ts, best_v = None, None
    for ts, v in w:
        if math.isnan(v):
            continue
        if (best_v is None
                or (kind == "max" and v >= best_v)
                or (kind == "min" and v <= best_v)):
            best_ts, best_v = ts, v
    return (best_ts if best_ts is not None else w[-1][0]) / 1000.0


def test_values_ts_of_over_time_tie_and_nan_rules(spark):
    """ts_of_{max,min,last}_over_time: ties resolve to the LATEST
    occurrence, NaN samples are skipped like max_over_time, and an
    all-NaN window yields the last sample's timestamp."""
    eng = _mk_engine(spark, "edge_tie", TIE_ROWS)
    insts = ("i1", "i2", "i3", "zz")
    for kind in ("max", "min", "last"):
        q = f"ts_of_{kind}_over_time(edge_tie[1m])"
        want = {}
        for inst in insts:
            s = _samples(TIE_ROWS, inst)
            for t in GRID:
                v = _ts_of_ref(window(s, t, 60_000), kind)
                if v is not None:
                    want[(inst, t)] = v
        assert_vals(res(eng, q, "instance"), want, q)
    # the fixtures really exercise each rule at t=60s
    w1 = window(_samples(TIE_ROWS, "i1"), 60_000, 60_000)
    assert _ts_of_ref(w1, "max") == 30.0   # tie 20s/30s -> latest
    assert _ts_of_ref(w1, "min") == 50.0   # tie 40s/50s -> latest
    w3 = window(_samples(TIE_ROWS, "i3"), 60_000, 60_000)
    assert _ts_of_ref(w3, "max") == 20.0   # all-NaN -> last sample ts


def test_values_double_exponential_smoothing_factor_validation(spark):
    """double_exponential_smoothing / holt_winters: factors outside the
    OPEN interval (0, 1) are a query error (upstream
    funcDoubleExponentialSmoothing), never NaN results; both spellings
    share the validation and produce identical values on valid factors."""
    eng = _mk_engine(spark, "edge_tie", TIE_ROWS)
    ok_a = res(eng, "double_exponential_smoothing(edge_tie[1m], 0.5, 0.3)",
               "instance")
    ok_b = res(eng, "holt_winters(edge_tie[1m], 0.5, 0.3)", "instance")
    assert ok_a and set(ok_a) == set(ok_b)
    for k, v in ok_a.items():
        w = ok_b[k]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            assert w is None or math.isnan(w), (k, v, w)
        else:
            assert v == w, (k, v, w)
    for sf, tf, msg in [
        (0.0, 0.3, "smoothing"), (1.0, 0.3, "smoothing"),
        (-0.5, 0.3, "smoothing"), (0.5, 0.0, "trend"),
        (0.5, 1.0, "trend"), (0.5, 1.5, "trend"),
    ]:
        q = f"double_exponential_smoothing(edge_tie[1m], {sf}, {tf})"
        with pytest.raises(ValueError, match=f"invalid {msg} factor"):
            eng.query_range(q).collect()
