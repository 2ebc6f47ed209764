"""Degraded-child sentinel in the bench instrument (VERDICT r13 #1).

All three r13 `standing_after_retime` flags were instrument artifacts:
one fresh child read emb_effective_rank at 63.7 s, a second child
minutes later — same code — read 2.5 s (basis 2.909).  The instrument
now times a cheap known-basis sentinel in every fresh child before its
payload, respawns a child whose sentinel reads degraded (bounded), and
flags `rig_degraded` on a record that even the final attempt produced
under a failed sentinel.  These tests exercise the parent-side respawn
protocol and the movers bookkeeping without Spark (the child process is
stubbed), so the logic that decides what goes into BENCH_r14 is pinned
independently of rig state.
"""

from __future__ import annotations

import json
import subprocess

import pytest

import bench


def _fake_child_sequence(outcomes):
    """Build a subprocess.run stub: each call consumes one outcome.

    outcome = (degraded: bool, payload: dict | None).  Mirrors the real
    child contract: a degraded non-final child writes ONLY the sentinel
    record; a healthy (or parent-forced final) child writes sentinel +
    payload.
    """
    calls = []

    def run(argv, check=True, env=None):
        degraded, payload = outcomes[len(calls)]
        final = (env or {}).get("SPARK_GRAFT_SENTINEL_FINAL") == "1"
        calls.append({"argv": argv, "final": final})
        out_path = argv[argv.index("--retime") + 1] if "--retime" in argv \
            else argv[-1]
        sent = {"query": bench.SENTINEL_QUERY, "basis": bench.SENTINEL_BASIS,
                "median": 9.9 if degraded else 0.1, "degraded": degraded}
        doc = {"sentinel": sent}
        if not degraded or final:
            doc.update(payload or {})
        with open(out_path, "w") as fh:
            json.dump(doc, fh)
        return subprocess.CompletedProcess(argv, 0)

    run.calls = calls
    return run


def test_degraded_child_is_respawned(monkeypatch, tmp_path):
    out = str(tmp_path / "o.json")
    stub = _fake_child_sequence([
        (True, None),                          # child 1: degraded, no payload
        (False, {"samples": {"q": [1.0]}}),    # child 2: healthy
    ])
    monkeypatch.setattr(subprocess, "run", stub)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    assert payload == {"samples": {"q": [1.0]}}
    assert rig["degraded"] is False
    assert len(rig["attempts"]) == 2
    assert rig["attempts"][0]["degraded"] is True
    # the healthy second child was not the forced-final attempt
    assert [c["final"] for c in stub.calls] == [False, False]


def test_all_degraded_forces_final_and_flags_rig(monkeypatch, tmp_path):
    out = str(tmp_path / "o.json")
    stub = _fake_child_sequence([
        (True, None),
        (True, None),
        (True, {"samples": {"q": [9.0]}}),     # forced final: payload anyway
    ])
    monkeypatch.setattr(subprocess, "run", stub)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    # the record still ships (adjudicable), but loudly flagged
    assert payload == {"samples": {"q": [9.0]}}
    assert rig["rig_degraded"] is True
    assert len(rig["attempts"]) == bench.SENTINEL_MAX_SPAWNS
    # ONLY the last attempt may time a payload despite a bad sentinel
    assert [c["final"] for c in stub.calls] == [False, False, True]


def test_retime_movers_reads_new_child_payload(monkeypatch):
    """_retime_movers must unwrap {"sentinel":…, "samples":…} (the new
    child format) and fold retimed medians back into the block record."""
    med = {"q1": 2.0, "q2": 0.35}
    samples = {"q1": [2.0, 2.1, 1.9], "q2": [0.35, 0.36, 0.34]}
    basis = {"q1": 1.0, "q2": 0.33}  # q1 is a mover (+100%, +1.0s)

    def fake_child(argv, out_path):
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

    def fake_child(argv, out_path):
        return ({"samples": {"q1": [4.9, 5.0, 5.1]}},
                {"degraded": True, "rig_degraded": True,
                 "attempts": [{"degraded": True}] * 3})

    monkeypatch.setattr(bench, "_run_sentinel_child", fake_child)
    report = bench._retime_movers(med, samples, "r13", basis)
    mv = report["movers"]["q1"]
    assert mv["rig_degraded"] is True
    assert mv["standing_after_retime"] is True  # still moving vs basis


@pytest.mark.parametrize("median,expect", [(0.1, False), (0.5, True)])
def test_sentinel_threshold(median, expect):
    assert (median > bench.SENTINEL_FACTOR * bench.SENTINEL_BASIS) is expect


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

    def run(argv, check=True, env=None):
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
        return subprocess.CompletedProcess(argv, 0)

    monkeypatch.setattr(subprocess, "run", run)
    payload, rig = bench._run_sentinel_child(["x", out], out)
    assert payload == {"samples": {"q": [1.0]}}
    assert rig["degraded"] is False
    assert len(rig["attempts"]) == 2
    assert rig["attempts"][0]["post"]["degraded"] is True
    assert rig["attempts"][0]["degraded"] is False  # pre was healthy
    assert calls == [False, False]
