"""Degraded-child sentinel + budget machinery in the bench instrument.

VERDICT r13 #1 added the sentinel/respawn protocol; VERDICT r14 #1 found
its worst-case wall unbounded (the driver bench timed out at BOTH 32 and
8 CPUs and shipped *nothing*) and prescribed: a run-wide deadline, a
run-wide respawn cap, incremental emission, and a parent-calibrated
sentinel basis instead of the hardcoded 0.099 s wall-clock.  These tests
exercise the parent-side protocol without Spark (the child process is
stubbed via bench._spawn), so the logic that decides what goes into
BENCH_rN is pinned independently of rig state.
"""

from __future__ import annotations

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def _fixed_basis_and_budget(monkeypatch):
    """Deterministic gating: pin the effective sentinel basis to the
    committed one (no probe/cpu scaling), push the deadline far out, and
    reset run-wide respawn state."""
    import time as _time

    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_BASIS", str(bench.SENTINEL_BASIS))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DEADLINE",
                       str(_time.time() + 100000.0))
    monkeypatch.setattr(bench, "_SPAWNS_LEFT", [bench.RESPAWN_BUDGET])


def _fake_child_sequence(outcomes, out_path):
    """Build a bench._spawn stub: each call consumes one outcome.

    outcome = (degraded: bool, payload: dict | None).  Mirrors the real
    child contract: a degraded non-final child writes ONLY the sentinel
    record; a healthy (or parent-forced final) child writes sentinel +
    payload.
    """
    calls = []

    def spawn(argv, env):
        degraded, payload = outcomes[len(calls)]
        final = (env or {}).get("SPARK_GRAFT_SENTINEL_FINAL") == "1"
        calls.append({"argv": argv, "final": final})
        sent = {"query": bench.SENTINEL_QUERY, "basis": bench.SENTINEL_BASIS,
                "median": 9.9 if degraded else 0.1, "degraded": degraded}
        doc = {"sentinel": sent}
        if not degraded or final:
            doc.update(payload or {})
        with open(out_path, "w") as fh:
            json.dump(doc, fh)
        return 0

    spawn.calls = calls
    return spawn


def test_degraded_child_is_respawned(monkeypatch, tmp_path):
    out = str(tmp_path / "o.json")
    stub = _fake_child_sequence([
        (True, None),                          # child 1: degraded, no payload
        (False, {"samples": {"q": [1.0]}}),    # child 2: healthy
    ], out)
    monkeypatch.setattr(bench, "_spawn", stub)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    assert payload == {"samples": {"q": [1.0]}}
    assert rig["degraded"] is False
    assert len(rig["attempts"]) == 2
    assert rig["attempts"][0]["degraded"] is True
    # the healthy second child was not the forced-final attempt
    assert [c["final"] for c in stub.calls] == [False, False]
    # the respawn drew from the run-wide budget
    assert bench._SPAWNS_LEFT[0] == bench.RESPAWN_BUDGET - 1


def test_all_degraded_forces_final_and_flags_rig(monkeypatch, tmp_path):
    out = str(tmp_path / "o.json")
    stub = _fake_child_sequence([
        (True, None),
        (True, None),
        (True, {"samples": {"q": [9.0]}}),     # forced final: payload anyway
    ], out)
    monkeypatch.setattr(bench, "_spawn", stub)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    # the record still ships (adjudicable), but loudly flagged
    assert payload == {"samples": {"q": [9.0]}}
    assert rig["rig_degraded"] is True
    assert len(rig["attempts"]) == bench.SENTINEL_MAX_SPAWNS
    # ONLY the last attempt may time a payload despite a bad sentinel
    assert [c["final"] for c in stub.calls] == [False, False, True]


def test_exhausted_respawn_budget_forces_final(monkeypatch, tmp_path):
    """VERDICT r14 #1c: respawns draw from ONE run-wide budget; when it is
    spent the very next attempt is parent-forced final instead of burning
    up to 3 spawns per child slot."""
    out = str(tmp_path / "o.json")
    monkeypatch.setattr(bench, "_SPAWNS_LEFT", [0])
    stub = _fake_child_sequence([
        (True, {"samples": {"q": [9.0]}}),     # final on FIRST attempt
    ], out)
    monkeypatch.setattr(bench, "_spawn", stub)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    assert payload == {"samples": {"q": [9.0]}}
    assert rig["rig_degraded"] is True
    assert [c["final"] for c in stub.calls] == [True]


def test_deadline_forces_final(monkeypatch, tmp_path):
    """VERDICT r14 #1a: when the wall deadline leaves no room to retry,
    the attempt runs as final (times its payload) instead of risking a
    sentinel-only record with no budget to respawn."""
    out = str(tmp_path / "o.json")
    monkeypatch.setattr(bench, "_remaining", lambda: 100.0)
    stub = _fake_child_sequence([
        (True, {"samples": {"q": [9.0]}}),
    ], out)
    monkeypatch.setattr(bench, "_spawn", stub)
    payload, rig = bench._run_sentinel_child(["x", out], out, est_sec=240.0)
    assert payload == {"samples": {"q": [9.0]}}
    assert [c["final"] for c in stub.calls] == [True]


def test_crashed_child_is_respawned_not_fatal(monkeypatch, tmp_path):
    """A child that exits non-zero (or writes nothing) must not kill the
    parent (r14's subprocess.run(check=True) would raise and the run
    shipped nothing); it is treated like a degraded attempt."""
    out = str(tmp_path / "o.json")
    calls = []

    def spawn(argv, env):
        calls.append((env or {}).get("SPARK_GRAFT_SENTINEL_FINAL") == "1")
        if len(calls) == 1:
            return 1                         # crash, no file written
        with open(out, "w") as fh:
            json.dump({"sentinel": {"degraded": False},
                       "samples": {"q": [1.0]}}, fh)
        return 0

    monkeypatch.setattr(bench, "_spawn", spawn)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    assert payload == {"samples": {"q": [1.0]}}
    assert rig["degraded"] is False
    assert rig["attempts"][0] == {"child_rc": 1, "no_payload": True}


def test_retime_movers_reads_new_child_payload(monkeypatch):
    """_retime_movers must unwrap {"sentinel":…, "samples":…} (the new
    child format) and fold retimed medians back into the block record."""
    med = {"q1": 2.0, "q2": 0.35}
    samples = {"q1": [2.0, 2.1, 1.9], "q2": [0.35, 0.36, 0.34]}
    basis = {"q1": 1.0, "q2": 0.33}  # q1 is a mover (+100%, +1.0s)

    def fake_child(argv, out_path, est_sec=240.0):
        return ({"samples": {"q1": [1.02, 0.98, 1.0]}},
                {"degraded": False, "attempts": [{"degraded": False}]})

    monkeypatch.setattr(bench, "_run_sentinel_child", fake_child)
    report = bench._retime_movers(med, samples, "r13", basis)
    assert med["q1"] == 1.0          # adjudicated median replaced in place
    assert samples["q1"] == [1.02, 0.98, 1.0]
    assert report["movers"]["q1"]["retimed_median"] == 1.0
    assert "rig_degraded" not in report["movers"]["q1"]
    assert not report["movers"]["q1"].get("standing_after_retime")
    assert report["sentinel"][0]["degraded"] is False
    assert "q2" not in report["movers"]  # below the 40%/0.3s gate


def test_retime_movers_flags_rig_degraded(monkeypatch):
    med = {"q1": 5.0}
    samples = {"q1": [5.0, 5.2, 4.8]}
    basis = {"q1": 1.0}

    def fake_child(argv, out_path, est_sec=240.0):
        return ({"samples": {"q1": [4.9, 5.0, 5.1]}},
                {"degraded": True, "rig_degraded": True,
                 "attempts": [{"degraded": True}] * 3})

    monkeypatch.setattr(bench, "_run_sentinel_child", fake_child)
    report = bench._retime_movers(med, samples, "r13", basis)
    mv = report["movers"]["q1"]
    assert mv["rig_degraded"] is True
    assert mv["standing_after_retime"] is True  # still moving vs basis


def test_retime_movers_budget_gate_ships_unadjudicated(monkeypatch):
    """VERDICT r14 #1a: a degraded-rig block can flag half the catalog as
    movers (the r14 close run flagged 45); with no wall budget left they
    ship flagged `unadjudicated_budget` instead of spawning retime
    children past the driver deadline."""
    med = {"q1": 5.0}
    samples = {"q1": [5.0, 5.2, 4.8]}
    basis = {"q1": 1.0}
    monkeypatch.setattr(bench, "_remaining", lambda: 120.0)

    def fake_child(argv, out_path, est_sec=240.0):  # pragma: no cover
        raise AssertionError("no child may spawn under the budget gate")

    monkeypatch.setattr(bench, "_run_sentinel_child", fake_child)
    report = bench._retime_movers(med, samples, "r13", basis)
    mv = report["movers"]["q1"]
    assert mv["unadjudicated_budget"] is True
    assert "standing_after_retime" not in mv
    assert report["budget_stopped"] is True
    assert med["q1"] == 5.0          # untouched — nothing was re-timed


def test_sentinel_basis_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_BASIS", "0.25")
    assert bench._effective_sentinel_basis() == 0.25


def test_sentinel_basis_scales_with_cpus_and_probe(monkeypatch):
    """The committed 0.099 s basis was measured at local[32] on the
    reference rig; at 8 CPUs (the driver's scaling run) or on a slower
    machine the effective basis must scale UP so healthy children are not
    read as degraded (r14's 8-CPU run burned max respawns this way)."""
    monkeypatch.delenv("SPARK_GRAFT_SENTINEL_BASIS", raising=False)
    monkeypatch.setattr(bench, "_BASIS_CACHE", [None])
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    monkeypatch.setattr(bench, "_rig_probe_sec",
                        lambda: 2 * bench.PROBE_BASIS)
    eff = bench._effective_sentinel_basis()
    assert eff == round(bench.SENTINEL_BASIS * (32 / 8) ** 0.7 * 2.0, 4)
    # and never BELOW the committed basis on a fast rig
    monkeypatch.setattr(bench, "_BASIS_CACHE", [None])
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    monkeypatch.setattr(bench, "_rig_probe_sec",
                        lambda: 0.5 * bench.PROBE_BASIS)
    assert bench._effective_sentinel_basis() == bench.SENTINEL_BASIS


def test_remaining_uses_env_deadline(monkeypatch):
    import time as _time

    monkeypatch.setenv("SPARK_GRAFT_BENCH_DEADLINE",
                       str(_time.time() + 500.0))
    rem = bench._remaining()
    assert 490.0 < rem <= 500.0


def test_compose_line_parses_and_fits(monkeypatch):
    timings = {f"q{i}": 0.5 for i in range(18)}
    line = bench._compose_line(
        timings, timings, timings,
        {"samples": 600000, "sec": 1.2, "samples_per_s": 500000},
        {"instant": {"qps": 3.2}, "range_1h": {"qps": 8.1}},
        {"basis_round": "r14", "basis_median_sum": 8.5, "delta_pct": 1.0},
        0.1, [])
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total_wall"
    assert doc["value"] == 9.0
    assert doc["qps"] == {"instant": 3.2, "range_1h": 8.1}
    assert len(line) < 1800


def test_compose_line_trims_oversize(monkeypatch):
    timings = {f"very_long_query_name_padding_{i:04d}": 0.123
               for i in range(40)}
    big_basis = {"filler": "x" * 1200}
    line = bench._compose_line(timings, timings, timings, {}, {},
                               big_basis, 0.1, [])
    doc = json.loads(line)
    assert "basis" not in doc           # trimmed, still parseable
    assert doc["queries"]               # queries always survive


# ---------------------------------------------------------------------------
# Post-payload sentinel bracket (r14: a child can pass the start-of-child
# sentinel and degrade MID-payload — the round-close episode saw one task
# burn 14+ min of interpreted eval on a near-idle rig).  The child re-times
# the sentinel AFTER its payload; a degraded post-read discards the payload
# so the parent respawns.


class _FakeSpark:
    def __init__(self):
        self.stopped = False

    def stop(self):
        self.stopped = True


def _post_sent(degraded):
    return {"query": bench.SENTINEL_QUERY, "basis": bench.SENTINEL_BASIS,
            "median": 9.9 if degraded else 0.1, "degraded": degraded}


def test_finish_child_ships_payload_on_healthy_post(monkeypatch, tmp_path):
    out = str(tmp_path / "o.json")
    monkeypatch.setattr(bench, "_sentinel_check",
                        lambda spark, cat: _post_sent(False))
    monkeypatch.delenv("SPARK_GRAFT_SENTINEL_FINAL", raising=False)
    spark = _FakeSpark()
    bench._finish_child(spark, None, out, _post_sent(False),
                        {"samples": {"q": [1.0]}})
    with open(out) as fh:
        doc = json.load(fh)
    assert doc["samples"] == {"q": [1.0]}
    assert doc["sentinel_post"]["degraded"] is False
    assert spark.stopped


def test_finish_child_discards_payload_on_degraded_post(monkeypatch,
                                                        tmp_path):
    out = str(tmp_path / "o.json")
    monkeypatch.setattr(bench, "_sentinel_check",
                        lambda spark, cat: _post_sent(True))
    monkeypatch.delenv("SPARK_GRAFT_SENTINEL_FINAL", raising=False)
    bench._finish_child(_FakeSpark(), None, out, _post_sent(False),
                        {"samples": {"q": [9.0]}})
    with open(out) as fh:
        doc = json.load(fh)
    assert "samples" not in doc          # payload discarded -> respawn
    assert doc["sentinel_post"]["degraded"] is True
    assert doc["sentinel"]["degraded"] is False


def test_finish_child_final_attempt_ships_despite_degraded_post(
        monkeypatch, tmp_path):
    out = str(tmp_path / "o.json")
    monkeypatch.setattr(bench, "_sentinel_check",
                        lambda spark, cat: _post_sent(True))
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_FINAL", "1")
    bench._finish_child(_FakeSpark(), None, out, _post_sent(False),
                        {"samples": {"q": [9.0]}})
    with open(out) as fh:
        doc = json.load(fh)
    assert doc["samples"] == {"q": [9.0]}  # adjudicable, loudly flagged
    assert doc["sentinel_post"]["degraded"] is True


def test_parent_respawns_on_degraded_post_sentinel(monkeypatch, tmp_path):
    """Pre-sentinel healthy, post-sentinel degraded -> parent treats the
    child as degraded, discards its payload and respawns."""
    out = str(tmp_path / "o.json")
    calls = []

    def spawn(argv, env):
        final = (env or {}).get("SPARK_GRAFT_SENTINEL_FINAL") == "1"
        calls.append(final)
        if len(calls) == 1:  # mid-payload degradation: no payload shipped
            doc = {"sentinel": _post_sent(False),
                   "sentinel_post": _post_sent(True)}
        else:
            doc = {"sentinel": _post_sent(False),
                   "sentinel_post": _post_sent(False),
                   "samples": {"q": [1.0]}}
        with open(out, "w") as fh:
            json.dump(doc, fh)
        return 0

    monkeypatch.setattr(bench, "_spawn", spawn)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    assert payload == {"samples": {"q": [1.0]}}
    assert rig["degraded"] is False
    assert len(rig["attempts"]) == 2
    assert rig["attempts"][0]["post"]["degraded"] is True
    assert rig["attempts"][0]["degraded"] is False  # pre was healthy
    assert calls == [False, False]
