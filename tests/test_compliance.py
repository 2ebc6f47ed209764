"""PromQL compliance-style corpus (SURVEY §5, pillar 3).

Mirrors the shape of the reference's compliance suite
(tests/promql-compliance-test/promql-test-queries.yml:35-248): the same
operator templates with the same variant expansion, retargeted at a
synthetic fixture. Every expanded query must PLAN (parser + planner build a
DataFrame — Spark resolves columns eagerly, so this catches most semantic
breakage); a stratified subset also EXECUTES and sanity-checks row counts.
"""

from __future__ import annotations

import pytest

from squirreldb_spark.promql import PromQLEngine

# slow tier (VERDICT r15 #2): 582 s PromQL compliance matrix; default tier keeps test_promql +
# test_compliance_values_edges for the semantics guard
pytestmark = pytest.mark.slow


# ------------------------------------------------------------------ fixture

M = 60_000


def fixture_rows() -> list[tuple]:
    """The compliance fixture data, exposed as a function so the
    value-golden tier (test_compliance_values.py) can evaluate the same
    points independently of Spark."""
    rows = []
    for i, inst in enumerate(("i1", "i2")):
        for j, typ in enumerate(("free", "used")):
            for t in range(13):  # every 10s over 2 minutes
                ts = t * 10_000
                rows.append((inst, typ, "demo_memory_usage_bytes", ts,
                             100.0 + 10 * i + j + t))
                rows.append((inst, typ, "demo_cpu_usage_seconds_total", ts,
                             float(t * (i + 1))))
        for t in range(13):
            ts = t * 10_000
            rows.append((inst, "", "demo_num_cpus", ts, float(i + 2)))
            rows.append((inst, "", "demo_batch_last_success_timestamp_seconds",
                         ts, float(ts // 1000 - 30)))
            rows.append((inst, "", "demo_disk_usage_bytes", ts, 1000.0 + t * 5))
    return rows


def make_compliance_engine(spark) -> PromQLEngine:
    pts = spark.createDataFrame(
        fixture_rows(),
        "instance string, type string, name string, ts long, value double",
    )
    return PromQLEngine(
        pts, label_cols=("instance", "type", "name"), name_label="name",
        step_ms=30_000, lookback_ms=60_000,
    )


@pytest.fixture(scope="module")
def ceng(spark):
    return make_compliance_engine(spark)


# ------------------------------------------------------------------- corpus

VARIANTS = {
    "simpleAggrOp": ["sum", "min", "max", "avg", "count", "stddev", "stdvar", "group"],
    "topBottomOp": ["topk", "bottomk"],
    "limitOp": ["limitk"],
    "binOp": ["+", "-", "*", "/", "%", "^"],
    "compBinOp": ["==", "!=", "<", ">", "<=", ">="],
    "arithBinOp": ["+", "-", "*", "/", "%", "^"],
    "simpleTimeAggrOp": ["avg", "min", "max", "sum", "count", "stddev", "stdvar",
                         "last", "present"],
    "simpleMathFunc": ["abs", "ceil", "floor", "exp", "ln", "log2", "log10",
                       "sqrt", "sgn"],
    "extrapolatedRateFunc": ["rate", "increase", "delta"],
    "instantRateFunc": ["irate", "idelta"],
    "clampFunc": ["clamp_min", "clamp_max"],
    "dateFunc": ["minute", "hour", "day_of_week", "day_of_month", "day_of_year",
                 "month", "year", "days_in_month"],
    "quantile": ["0.5"],
    "range": ["1m"],
    "offset": ["30s"],
    "smoothingFactor": ["0.5"],
    "trendFactor": ["0.3"],
}

TEMPLATES = [
    # scalar literals
    "42", "1.234", ".123", "1.23e-3", "0x3d", "Inf", "+Inf", "-Inf", "NaN",
    # vector selectors
    "demo_memory_usage_bytes",
    '{__name__="demo_memory_usage_bytes"}',
    'demo_memory_usage_bytes{type="free"}',
    'demo_memory_usage_bytes{type!="free"}',
    'demo_memory_usage_bytes{instance=~"i.*"}',
    'demo_memory_usage_bytes{instance=~"host"}',
    'demo_memory_usage_bytes{instance!~".*2"}',
    'demo_memory_usage_bytes{type="free", instance!="i2"}',
    '{type="free", instance!="i2"}',
    "nonexistent_metric_name",
    "demo_memory_usage_bytes offset {offset}",
    "demo_memory_usage_bytes offset -{offset}",
    # aggregation operators
    "{simpleAggrOp}(demo_memory_usage_bytes)",
    "{simpleAggrOp}(nonexistent_metric_name)",
    "{simpleAggrOp} by() (demo_memory_usage_bytes)",
    "{simpleAggrOp} by(instance) (demo_memory_usage_bytes)",
    "{simpleAggrOp} by(instance, type) (demo_memory_usage_bytes)",
    "{simpleAggrOp} by(nonexistent) (demo_memory_usage_bytes)",
    "{simpleAggrOp} without() (demo_memory_usage_bytes)",
    "{simpleAggrOp} without(instance) (demo_memory_usage_bytes)",
    "{simpleAggrOp} without(instance, type) (demo_memory_usage_bytes)",
    "{simpleAggrOp} without(nonexistent) (demo_memory_usage_bytes)",
    "{topBottomOp} (3, demo_memory_usage_bytes)",
    "{topBottomOp} by(instance) (2, demo_memory_usage_bytes)",
    # experimental feature-flagged aggregations (upstream 2.x limitk)
    "{limitOp} (2, demo_memory_usage_bytes)",
    "{limitOp} by(instance) (1, demo_memory_usage_bytes)",
    # nested aggregations: the inner aggregate strips series keys, so the
    # outer ranking runs over a keyless (or partially-keyed) vector — a
    # regression class (empty shard-hash column list) caught in review
    "{topBottomOp} (1, sum(demo_memory_usage_bytes))",
    "{topBottomOp} (1, sum by(instance) (demo_memory_usage_bytes))",
    "{limitOp} (1, sum(demo_memory_usage_bytes))",
    "{simpleAggrOp}({simpleAggrOp} by(instance) (demo_memory_usage_bytes))",
    "quantile(0.5, sum by(instance) (demo_memory_usage_bytes))",
    "limit_ratio (0.5, demo_memory_usage_bytes)",
    "limit_ratio (-0.5, demo_memory_usage_bytes)",
    "quantile({quantile}, demo_memory_usage_bytes)",
    "avg(max by(type) (demo_memory_usage_bytes))",
    # binary operators
    "1 * 2 + 4 / 6 - 10 % 2 ^ 2",
    "demo_num_cpus + (1 {compBinOp} bool 2)",
    "demo_memory_usage_bytes {binOp} 1.2345",
    "demo_memory_usage_bytes {compBinOp} bool 1.2345",
    "1.2345 {compBinOp} bool demo_memory_usage_bytes",
    "0.12345 {binOp} demo_memory_usage_bytes",
    "(1 * 2 + 4 / 6 - (10%7)^2) {binOp} demo_memory_usage_bytes",
    "demo_memory_usage_bytes {binOp} (1 * 2 + 4 / 6 - 10)",
    "timestamp(demo_memory_usage_bytes * 1)",
    "timestamp(-demo_memory_usage_bytes)",
    "demo_memory_usage_bytes {binOp} on(instance, type) demo_memory_usage_bytes",
    "demo_memory_usage_bytes / on(instance, type, __name__) demo_memory_usage_bytes",
    "sum by(instance, type) (demo_memory_usage_bytes) {binOp} on(instance, type)"
    " group_left demo_memory_usage_bytes",
    # NaN/Inf propagation
    "demo_num_cpus * Inf",
    "demo_num_cpus * -Inf",
    "demo_num_cpus * NaN",
    # unary
    "demo_memory_usage_bytes + -(1)",
    "-demo_memory_usage_bytes",
    "-1 ^ 2",
    # non-const scalars
    "1 {arithBinOp} time()",
    "time() {arithBinOp} 1",
    "time() {compBinOp} bool 1",
    "1 {compBinOp} bool time()",
    "time() {arithBinOp} time()",
    "time() {binOp} demo_memory_usage_bytes",
    "demo_memory_usage_bytes {binOp} time()",
    # functions
    "{simpleTimeAggrOp}_over_time(demo_memory_usage_bytes[{range}])",
    "quantile_over_time({quantile}, demo_memory_usage_bytes[{range}])",
    "timestamp(demo_num_cpus)",
    "timestamp(timestamp(demo_num_cpus))",
    "{simpleMathFunc}(demo_memory_usage_bytes)",
    "{simpleMathFunc}(-demo_memory_usage_bytes)",
    "{extrapolatedRateFunc}(nonexistent_metric[1m])",
    "{extrapolatedRateFunc}(demo_cpu_usage_seconds_total[{range}])",
    # compound duration literals (1m30s) and escaped regex strings are
    # valid PromQL the parser must accept
    "{extrapolatedRateFunc}(demo_cpu_usage_seconds_total[1m30s])",
    'demo_memory_usage_bytes{type=~"fre\\\\w"}',
    'demo_memory_usage_bytes offset 1m30s',
    "deriv(demo_disk_usage_bytes[{range}])",
    "predict_linear(demo_disk_usage_bytes[{range}], 600)",
    "time()",
    'label_replace(demo_num_cpus, "job", "dest-$1", "instance", "i(.*)")',
    'label_replace(demo_num_cpus, "job", "dest-$1", "instance", "host:(.*)")',
    'label_replace(demo_num_cpus, "job", "value-$1", "nonexistent_src", "(.*)")',
    'label_join(demo_num_cpus, "new_label", "-", "instance", "type")',
    'label_join(demo_num_cpus, "type", "-", "instance")',
    "{dateFunc}()",
    "{dateFunc}(demo_batch_last_success_timestamp_seconds offset {offset})",
    "{instantRateFunc}(demo_cpu_usage_seconds_total[{range}])",
    "{clampFunc}(demo_memory_usage_bytes, 2)",
    "clamp(demo_memory_usage_bytes, 0, 1)",
    "clamp(demo_memory_usage_bytes, 0, 1000000000000)",
    "resets(demo_cpu_usage_seconds_total[{range}])",
    "changes(demo_batch_last_success_timestamp_seconds[{range}])",
    "vector(1.23)",
    "vector(time())",
    "histogram_quantile(0.9, nonexistent_metric)",
    "histogram_quantile(0.9, demo_memory_usage_bytes)",
    "holt_winters(demo_disk_usage_bytes[1m], {smoothingFactor}, {trendFactor})",
    'count_values("value", demo_num_cpus)',
    "absent(demo_memory_usage_bytes)",
    "absent(nonexistent_metric_name)",
    "absent_over_time(nonexistent_metric_name[1m])",
    # subqueries
    "max_over_time(max(demo_batch_last_success_timestamp_seconds)[1m:10s]"
    " offset 30s)",
    "avg_over_time(rate(demo_cpu_usage_seconds_total[30s])[1m:10s])",
    "avg_over_time(demo_num_cpus[1m:])",
    "demo_memory_usage_bytes @ start()",
    "demo_memory_usage_bytes @ end()",
    # trig + atan2
    "demo_num_cpus atan2 demo_num_cpus",
    "deg(rad(demo_num_cpus))",
    "atan(tan(vector(0.5)))",
    "cos(pi())",
    # round-12 additions: @ with a literal timestamp, offset+@ compose,
    # @ inside a subquery range, scalar(), sort_by_label (experimental),
    # group_right, the smoothing alias, the experimental ts_of_*/mad
    # range functions, and limit_ratio at its +-1.0 edges (upstream
    # semantics: keep-all / keep-all-complement)
    "demo_memory_usage_bytes @ 60",
    "demo_memory_usage_bytes offset {offset} @ end()",
    "max_over_time(demo_num_cpus[1m:10s] @ end())",
    "scalar(demo_num_cpus)",
    "demo_memory_usage_bytes + scalar(vector(2))",
    'sort_by_label(demo_memory_usage_bytes, "instance")',
    'sort_by_label_desc(demo_memory_usage_bytes, "type", "instance")',
    "demo_memory_usage_bytes + on(instance, type) group_right"
    " sum by(instance, type) (demo_memory_usage_bytes)",
    "double_exponential_smoothing(demo_disk_usage_bytes[1m],"
    " {smoothingFactor}, {trendFactor})",
    "mad_over_time(demo_memory_usage_bytes[{range}])",
    "ts_of_max_over_time(demo_memory_usage_bytes[{range}])",
    "ts_of_min_over_time(demo_memory_usage_bytes[{range}])",
    "ts_of_last_over_time(demo_memory_usage_bytes[{range}])",
    "limit_ratio (1.0, demo_memory_usage_bytes)",
    "limit_ratio (-1.0, demo_memory_usage_bytes)",
    "histogram_quantile(0.5, rate(demo_cpu_usage_seconds_total[{range}]))",
    "sgn(-demo_memory_usage_bytes) {compBinOp} bool 0",
    # round-12 continuation: upstream special-case templates — round with
    # to_nearest, quantile phi outside [0,1] (warn + ±Inf, not an error),
    # clamp with min > max (empty vector), set operations with explicit
    # on()/ignoring() matching, Go math.Pow IEEE special cases, and
    # negative-dividend fmod
    "round(demo_memory_usage_bytes)",
    "round(demo_memory_usage_bytes, 0.5)",
    "quantile(1.5, demo_memory_usage_bytes)",
    "quantile(-0.5, demo_memory_usage_bytes)",
    "quantile(NaN, demo_memory_usage_bytes)",
    "quantile_over_time(1.5, demo_memory_usage_bytes[{range}])",
    "clamp(demo_memory_usage_bytes, 1, 0)",
    "demo_memory_usage_bytes and on(instance) demo_num_cpus",
    'demo_memory_usage_bytes and on(instance) demo_num_cpus{instance="i1"}',
    "demo_memory_usage_bytes unless on(instance) demo_num_cpus",
    "demo_num_cpus or on(type) demo_memory_usage_bytes",
    "demo_memory_usage_bytes and ignoring(type) demo_num_cpus",
    "demo_memory_usage_bytes unless ignoring(type) demo_num_cpus",
    "vector(-1) ^ Inf",
    "demo_num_cpus ^ 0",
    "-demo_num_cpus % 2",
    # nested subqueries, @ on a range selector, postfix by, scalar()
    # as a binop operand, aggregate-then-histogram composition, and
    # bool comparisons with explicit matching
    "max_over_time(avg_over_time(demo_num_cpus[1m:10s])[2m:30s])",
    "sum(rate(demo_cpu_usage_seconds_total[{range}])) by (instance)",
    "rate(demo_cpu_usage_seconds_total[{range}] @ end())",
    "min_over_time(demo_memory_usage_bytes[1m:10s] @ 60 offset {offset})",
    "scalar(max(demo_num_cpus)) * demo_num_cpus",
    "quantile by (type) (0.9, demo_memory_usage_bytes)",
    "(demo_memory_usage_bytes > 100) and (demo_memory_usage_bytes < 200)",
    "count(demo_memory_usage_bytes == bool on(instance, type)"
    " demo_memory_usage_bytes)",
    "histogram_quantile(0.9, sum by (le)"
    " (rate(demo_cpu_usage_seconds_total[{range}])))",
    "avg without () (demo_memory_usage_bytes offset {offset} @ 60)",
]

SHOULD_FAIL = [
    'label_replace(demo_num_cpus, "job", "v-$1", "src", "(.*")',     # bad regex
    'label_replace(demo_num_cpus, "~invalid", "", "src", "(.*)")',   # bad dst
    'label_join(demo_num_cpus, "~invalid", "-", "instance")',        # bad dst
    "1 > 2",                                                         # scalar cmp w/o bool
]



def _expand(template: str) -> list[str]:
    out = [template]
    for key, values in VARIANTS.items():
        tok = "{" + key + "}"
        nxt = []
        for q in out:
            if tok in q:
                nxt.extend(q.replace(tok, v) for v in values)
            else:
                nxt.append(q)
        out = nxt
    return out


CORPUS = [q for t in TEMPLATES for q in _expand(t)]

#: queries that PLAN but must error at EXECUTION, matching a real
#: Prometheus: the "one" side of this group_left has two series per
#: matching key (type=free/used), so the match fans out and upstream
#: raises its duplicate/multiple-matches error; the engine's in-plan
#: duplicate-series guard surfaces the same failure on collect
RUNTIME_SHOULD_FAIL = [
    q
    for t in [
        "sum without(type) (demo_memory_usage_bytes) / on(instance)"
        " group_left demo_memory_usage_bytes",
    ]
    for q in _expand(t)
]

#: the FULL corpus executes end-to-end (collect), mirroring the
#: reference's full-corpus run against a live Prometheus
#: (tests/promql-compliance-test/README.md:1-35)
EXECUTED = CORPUS


def test_corpus_size():
    assert len(CORPUS) > 200


@pytest.mark.parametrize("q", CORPUS + RUNTIME_SHOULD_FAIL)
def test_compliance_plans(ceng, q):
    df = ceng.query_range(q)
    assert "value" in df.columns and "step_ts" in df.columns


@pytest.mark.parametrize("q", EXECUTED)
def test_compliance_executes(ceng, q):
    rows = ceng.query_range(q).collect()
    assert rows is not None  # execution itself is the assertion


@pytest.mark.parametrize("q", SHOULD_FAIL)
def test_compliance_should_fail(ceng, q):
    with pytest.raises(Exception):
        ceng.query_range(q)


@pytest.mark.parametrize("q", RUNTIME_SHOULD_FAIL)
def test_compliance_runtime_should_fail(ceng, q):
    with pytest.raises(Exception, match="same labelset"):
        ceng.query_range(q).collect()


# ----------------------------------------------------- golden spot checks


def test_golden_unary_pow_precedence(ceng):
    out = ceng.query_range("-1 ^ 2").collect()
    assert all(r.value == -1.0 for r in out)  # -(1^2), not (-1)^2


def test_golden_scalar_ladder(ceng):
    out = ceng.query_range("1 * 2 + 4 / 6 - 10 % 2 ^ 2").collect()
    assert all(r.value == pytest.approx(1 * 2 + 4 / 6 - 10 % 2**2) for r in out)


def test_golden_num_cpus(ceng):
    out = ceng.query_range("demo_num_cpus").collect()
    got = {(r.instance, r.step_ts): r.value for r in out}
    assert got[("i1", 60_000)] == 2.0 and got[("i2", 60_000)] == 3.0


def test_golden_label_replace_missing_src(ceng):
    # missing source label matches "" against (.*) -> dst gets "value-"
    out = ceng.query_range(
        'label_replace(demo_num_cpus, "job", "value-$1", "nonexistent_src", "(.*)")'
    ).collect()
    assert all(r.job == "value-" for r in out)


def test_golden_subquery_at_modifier(ceng):
    """@ on a subquery pins the whole inner window: the rising
    demo_disk_usage_bytes (1000 + 5t/10s) gives 1030 at EVERY outer
    step for @ 60, and the 30s offset composes to the window ending at
    t=30s (1015) — vs the moving-window values without @."""
    fixed = ceng.query_range(
        "max_over_time(demo_disk_usage_bytes[1m:10s] @ 60)"
    ).collect()
    assert fixed and all(r["value"] == 1030.0 for r in fixed)
    off = ceng.query_range(
        "max_over_time(demo_disk_usage_bytes[1m:10s] offset 30s @ 60)"
    ).collect()
    assert off and all(r["value"] == 1015.0 for r in off)
    moving = {
        r["step_ts"]: r["value"]
        for r in ceng.query_range(
            "max_over_time(demo_disk_usage_bytes[1m:10s])"
        ).collect()
        if r["instance"] == "i1"
    }
    assert moving[0] == 1000.0 and moving[120000] == 1060.0


def test_golden_subquery_at_duplicate_sensitive(ceng):
    """Duplicate-SENSITIVE range functions over a pinned subquery.

    Upstream wraps f(sub @ T) in a StepInvariantExpr and evaluates it
    once; the result is constant across the outer grid. The pinned
    window (0, 60s] at 10s resolution holds exactly 6 inner steps, so
    count_over_time is the constant 6 at EVERY outer step (a
    point-replication implementation leaks replicas into neighboring
    steps' sliding windows and returns 9-12 varying by step — the r12
    review finding; max_over_time alone can't catch it because max is
    duplicate-insensitive)."""
    cnt = ceng.query_range(
        "count_over_time(demo_num_cpus[1m:10s] @ 60)"
    ).collect()
    assert cnt and all(r["value"] == 6.0 for r in cnt)
    avg = ceng.query_range(
        "avg_over_time(demo_num_cpus[1m:10s] @ 60)"
    ).collect()
    assert avg and all(
        r["value"] == (2.0 if r["instance"] == "i1" else 3.0) for r in avg
    )
    tot = ceng.query_range(
        "sum_over_time(demo_num_cpus[1m:10s] @ 60)"
    ).collect()
    assert tot and all(
        r["value"] == (12.0 if r["instance"] == "i1" else 18.0) for r in tot
    )
    # rate over the pinned counter window: i1 rises 1..6 over (0,60s]
    # (delta 5 over 50s, extrapolated 60s/50s -> increase 6, rate 0.1);
    # i2 doubles it. Constant across steps.
    rt = ceng.query_range(
        "rate(demo_cpu_usage_seconds_total[1m:10s] @ 60)"
    ).collect()
    assert rt and all(
        r["value"] == pytest.approx(0.1 if r["instance"] == "i1" else 0.2)
        for r in rt
    )


def test_golden_at_modifier_signed_anchor(ceng):
    """Upstream grammar: AT signed_or_unsigned_number — "@ -60" and
    "@ +60" are legal; a pre-epoch anchor selects no data on this
    fixture (empty vector, not a parse error)."""
    assert ceng.query_range("demo_num_cpus @ -1.5").collect() == []
    assert (
        ceng.query_range("count_over_time(demo_num_cpus[1m:10s] @ -60)")
        .collect() == []
    )
    pos = ceng.query_range("demo_num_cpus @ +60").collect()
    assert pos and all(
        r["value"] == (2.0 if r["instance"] == "i1" else 3.0) for r in pos
    )
