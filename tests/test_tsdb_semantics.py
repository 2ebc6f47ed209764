"""Table-driven semantic golden tests for the TSDB operators.

Modeled on the reference's unit strategy (SURVEY §5): small hand-built
point sets with hand-computed expected outputs — lookback/staleness for the
instant selector, Prometheus extrapolation for rate/increase, NaN dedup
ordering, downsample goldens.
"""

import math

import pytest
from pyspark.sql import functions as F

from squirreldb_spark.tsdb import downsample, maintenance, range_fns, selectors
from squirreldb_spark.tsdb.grid import data_grid

KEYS = ["series"]


def mk_points(spark, rows):
    return spark.createDataFrame(rows, "series string, ts long, value double")


# ------------------------------------------------------------------- grid


def test_grid_alignment(spark):
    pts = mk_points(spark, [("a", 150, 1.0), ("a", 999, 2.0)])
    got = [r.step_ts for r in data_grid(pts, 100).collect()]
    assert got == list(range(200, 1000, 100))  # ceil(150/100)*100 .. floor(999)


# -------------------------------------------------------------- selectors


def test_instant_lookback_and_staleness(spark):
    # lookback 100: sample@150 visible at t=200, stale by t=300 (gap > lookback)
    pts = mk_points(spark, [("a", 150, 5.0), ("a", 400, 7.0)])
    vec = selectors.instant_select(pts, KEYS, step_ms=100, lookback_ms=100)
    got = {(r.series, r.step_ts): r.value for r in vec.collect()}
    assert got == {("a", 200): 5.0, ("a", 400): 7.0}


def test_instant_sample_exactly_at_step(spark):
    pts = mk_points(spark, [("a", 200, 1.0), ("a", 300, 2.0)])
    vec = selectors.instant_select(pts, KEYS, step_ms=100, lookback_ms=50)
    got = {(r.series, r.step_ts): r.value for r in vec.collect()}
    assert got == {("a", 200): 1.0, ("a", 300): 2.0}


def test_range_select_window_bounds(spark):
    # window is (t - range, t]: sample at exactly t-range is EXCLUDED
    pts = mk_points(spark, [("a", 100, 1.0), ("a", 200, 2.0), ("a", 300, 3.0)])
    rs = selectors.range_select(pts, KEYS, step_ms=100, range_ms=200)
    by_step = {}
    for r in rs.collect():
        by_step.setdefault(r.step_ts, []).append(r.ts)
    assert sorted(by_step[300]) == [200, 300]  # 100 == 300-200 excluded


# ------------------------------------------------------------- rate math


def hand_rate(samples, range_s, t_end_s, is_counter=True, is_rate=True):
    """Straight port of the published Prometheus extrapolatedRate contract
    for verification (times in seconds)."""
    ts = [s[0] for s in samples]
    vs = [s[1] for s in samples]
    rv = vs[-1] - vs[0]
    if is_counter:
        for prev, cur in zip(vs, vs[1:]):
            if cur < prev:
                rv += prev
    sampled = ts[-1] - ts[0]
    avg_sp = sampled / (len(ts) - 1)
    dur_start = ts[0] - (t_end_s - range_s)
    dur_end = t_end_s - ts[-1]
    # upstream order (prometheus v0.307.x): threshold rewrite FIRST,
    # then the zero-crossing clamp takes min(dur_start, dur_zero)
    thr = avg_sp * 1.1
    if dur_start >= thr:
        dur_start = avg_sp / 2
    if is_counter and rv > 0 and vs[0] >= 0:
        dz = sampled * (vs[0] / rv)
        if dz < dur_start:
            dur_start = dz
    if dur_end >= thr:
        dur_end = avg_sp / 2
    factor = (sampled + dur_start + dur_end) / sampled
    if is_rate:
        factor /= range_s
    return rv * factor


@pytest.mark.parametrize(
    "samples",
    [
        [(10, 0.0), (20, 10.0), (30, 20.0), (40, 30.0)],       # steady counter
        [(10, 100.0), (20, 110.0), (30, 5.0), (40, 15.0)],     # one reset
        [(35, 3.0), (40, 6.0)],                                # samples near end
    ],
)
def test_rate_extrapolation_matches_hand_math(spark, samples):
    pts = mk_points(spark, [("c", t * 1000, v) for t, v in samples])
    df = range_fns.extrapolated(
        pts, KEYS, step_ms=40_000, range_ms=40_000, is_counter=True, is_rate=True
    )
    rows = {r.step_ts: r.value for r in df.collect()}
    expected = hand_rate(samples, 40.0, 40.0)
    assert rows[40_000] == pytest.approx(expected, rel=1e-12)


def test_increase_counts_resets(spark):
    samples = [(10, 10.0), (20, 2.0), (30, 4.0)]  # reset at t=20: +10
    pts = mk_points(spark, [("c", t * 1000, v) for t, v in samples])
    df = range_fns.extrapolated(
        pts, KEYS, step_ms=30_000, range_ms=30_000, is_counter=True, is_rate=False
    )
    got = {r.step_ts: r.value for r in df.collect()}
    expected = hand_rate(samples, 30.0, 30.0, is_counter=True, is_rate=False)
    assert got[30_000] == pytest.approx(expected, rel=1e-12)
    assert expected > 4.0  # reset correction applied (raw last-first would be -6)


def test_irate_uses_last_two_samples(spark):
    pts = mk_points(
        spark, [("c", 1000, 1.0), ("c", 2000, 100.0), ("c", 4000, 130.0)]
    )
    df = range_fns.instantaneous(pts, KEYS, step_ms=4000, range_ms=4000, is_rate=True)
    got = {r.step_ts: r.value for r in df.collect()}
    assert got[4000] == pytest.approx((130.0 - 100.0) / 2.0)


def test_resets_and_changes(spark):
    pts = mk_points(
        spark,
        [("c", 1000, 5.0), ("c", 2000, 3.0), ("c", 3000, 3.0), ("c", 4000, 7.0)],
    )
    resets = range_fns.resets_changes(pts, KEYS, 4000, 4000, "resets").collect()
    changes = range_fns.resets_changes(pts, KEYS, 4000, 4000, "changes").collect()
    assert {r.step_ts: r.value for r in resets}[4000] == 1.0
    assert {r.step_ts: r.value for r in changes}[4000] == 2.0


# ------------------------------------------------------------- downsample


def test_downsample_golden(spark):
    # regular cadence fixture like MakePointsForTest (types/metric.go:114-127)
    t0 = 1_568_706_164_000
    pts = mk_points(spark, [("m", t0 + i * 10_000, float(i)) for i in range(60)])
    ds = downsample.downsample(pts, KEYS, 300_000)
    rows = sorted(ds.collect(), key=lambda r: r.bucket_ts)
    assert sum(r["count"] for r in rows) == 60
    for r in rows:
        assert r["min"] <= r["avg"] <= r["max"]
        assert r.bucket_ts % 300_000 == 0
    total_avg = sum(r["avg"] * r["count"] for r in rows) / 60
    assert total_avg == pytest.approx(sum(range(60)) / 60)


def test_route_column_counter_safety(spark):
    # counter functions must read max (cassandra/tsdb/read.go:604-609)
    for fn in ("rate", "irate", "increase", "resets"):
        assert downsample.route_column(fn) == "max"
    assert downsample.route_column("avg_over_time") == "avg"
    assert downsample.route_column("anything_else") == "avg"


def test_use_preagg_rule(spark):
    assert downsample.use_preagg(300_000)
    assert not downsample.use_preagg(299_999)
    assert not downsample.use_preagg(300_000, force_raw=True)
    assert downsample.use_preagg(1, force_preagg=True)


def test_stitch_equals_full_downsample(spark):
    # the A17 invariant (fixture scenario 3)
    t0 = 0
    pts = mk_points(spark, [("m", t0 + i * 60_000, float(i * i)) for i in range(50)])
    cutoff = 1_500_000  # aligned to 300000
    preagg = downsample.downsample(pts.filter(F.col("ts") < cutoff), KEYS, 300_000)
    stitched = downsample.stitch(preagg, pts, KEYS, cutoff, "avg_over_time", 300_000)
    full = downsample.as_points(downsample.downsample(pts, KEYS, 300_000), KEYS, "avg_over_time")
    got = sorted((r.series, r.ts, r.value) for r in stitched.collect())
    want = sorted((r.series, r.ts, r.value) for r in full.collect())
    assert got == want


# ------------------------------------------------------------ maintenance


def test_dedup_keeps_latest_write_and_prefers_non_nan(spark):
    rows = [
        ("a", 100, 1.0, 0),
        ("a", 100, 2.0, 1),          # later write wins
        ("b", 100, float("nan"), 1),
        ("b", 100, 3.0, 0),          # NaN sorts after non-NaN (metric.go:104-108)
    ]
    df = spark.createDataFrame(rows, "series string, ts long, value double, seq int")
    out = maintenance.dedup_points(df, KEYS, tiebreak="seq")
    got = {(r.series, r.ts): r.value for r in out.collect()}
    assert got[("a", 100)] == 2.0
    assert got[("b", 100)] == 3.0


def test_dedup_no_tiebreak_prefers_non_nan(spark):
    """Without a tiebreak column the non-NaN duplicate must still win:
    Spark sorts NaN above all doubles, so a bare desc() would keep NaN."""
    rows = [
        ("a", 100, float("nan")),
        ("a", 100, 5.0),
        ("b", 100, float("nan")),    # all-NaN group keeps its NaN
    ]
    df = spark.createDataFrame(rows, "series string, ts long, value double")
    out = maintenance.dedup_points(df, KEYS)
    got = {(r.series, r.ts): r.value for r in out.collect()}
    assert got[("a", 100)] == 5.0
    assert got[("b", 100)] != got[("b", 100)]  # NaN


def test_retention_and_future_clamp(spark):
    pts = mk_points(spark, [("a", 0, 1.0), ("a", 1_000_000, 2.0), ("a", 10_000_000, 3.0)])
    kept = maintenance.apply_retention(pts, now_ms=1_001_000, ttl_seconds=1)
    assert {r.ts for r in kept.collect()} == {1_000_000, 10_000_000}
    clamped = maintenance.clamp_future(pts, now_ms=1_000_000, max_future_seconds=1)
    assert {r.ts for r in clamped.collect()} == {0, 1_000_000}


def test_retention_per_row_ttl(spark):
    """Per-write TTL (X-SquirrelDB-TTL): each row expires on its own
    clock; null TTLs fall back to the default."""
    rows = [
        ("a", 0, 1.0, 10_000),          # ttl 10000s -> survives
        ("a", 0, 2.0, 1),               # ttl 1s -> expired
        ("a", 900_000, 3.0, None),      # default ttl 1000s -> survives
        ("a", 0, 4.0, None),            # default ttl 1000s -> expired
    ]
    df = spark.createDataFrame(rows, "series string, ts long, value double, ttl_s long")
    kept = maintenance.apply_retention(
        df, now_ms=1_001_000, ttl_seconds=1_000, ttl_col="ttl_s"
    )
    assert {r.value for r in kept.collect()} == {1.0, 3.0}


def test_compact_partitions_reduces_files_and_preserves_rows(spark, tmp_path):
    """A9 maintenance: small-file compaction rewrites a fragmented
    partitioned store into ~target-sized sorted files with identical
    contents."""
    import os

    from squirreldb_spark.tsdb.maintenance import compact_partitions

    path = str(tmp_path / "raw")
    rows = [
        (i % 7, ["view", "click"][i % 2], 1_700_000_000_000 + i * 1_000,
         float(i), f"2024-01-{(i % 3) + 1:02d}")
        for i in range(3_000)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, value double, date string"
    )
    # simulate micro-batch fragmentation: many tiny files per partition
    df.repartition(40).write.partitionBy("date").parquet(path)
    before = spark.read.parquet(path)
    rows_before = sorted(map(tuple, before.collect()))

    stats = compact_partitions(spark, path, target_bytes=10 * 1024 * 1024)
    assert stats["files_before"] > 100  # 40 tasks x 3 partitions
    assert stats["files_after"] <= 3 * stats["n_tasks"] + 2
    assert stats["files_after"] < stats["files_before"] / 10

    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.collect())) == rows_before
    # partition directory structure intact, no temp residue
    entries = os.listdir(path)
    assert not any("_compact_tmp" in e for e in entries)
    assert sum(e.startswith("date=") for e in entries) == 3
    # rows inside each compacted file are in (series, ts) read order
    one_part = os.path.join(path, "date=2024-01-01")
    f = [e for e in os.listdir(one_part) if e.endswith(".parquet")][0]
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(one_part, f)).to_pandas()
    key = list(zip(t.user_id, t.event_type, t.ts))
    assert key == sorted(key)


def test_compact_unpartitioned_table(spark, tmp_path):
    from squirreldb_spark.tsdb.maintenance import compact_partitions

    path = str(tmp_path / "flat")
    df = spark.range(2_000).select(
        (F.col("id") % 5).alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.col("id") * 1_000).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    df.repartition(30).write.parquet(path)
    rows_before = sorted(map(tuple, spark.read.parquet(path).collect()))
    stats = compact_partitions(spark, path, partition_col=None)
    assert stats["files_after"] < stats["files_before"]
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rows_before


def test_ts_of_over_time_tie_and_nan(spark):
    """ts_of_{max,min,last}_over_time (experimental, prometheus v3.5+):
    ties resolve to the LATEST occurrence, NaN samples are skipped, and
    the result is the sample timestamp in SECONDS."""
    from squirreldb_spark.tsdb import range_fns

    rows = [
        # max 9.0 occurs at 20s and 40s -> ts_of_max = 40; min 1.0 at
        # 10s and 30s -> ts_of_min = 30; NaN at 50s is skipped by both
        # but IS the newest sample -> ts_of_last = 50
        ("u", "m", 10_000, 1.0),
        ("u", "m", 20_000, 9.0),
        ("u", "m", 30_000, 1.0),
        ("u", "m", 40_000, 9.0),
        ("u", "m", 50_000, float("nan")),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts long, value double"
    )
    got = {}
    for fn in ("ts_of_max", "ts_of_min", "ts_of_last"):
        out = range_fns.over_time(
            df, ["user_id", "event_type"], step_ms=50_000, range_ms=50_000,
            fn=fn,
        ).collect()
        got[fn] = {r.step_ts: r.value for r in out}[50_000]
    assert got == {"ts_of_max": 40.0, "ts_of_min": 30.0, "ts_of_last": 50.0}
