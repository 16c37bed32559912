"""Unit tests for bench.py's scaling-protocol resilience: a leg
subprocess dying (host OOM / contention window) must surface its stderr
and be recorded as an unhealthy run — never kill the whole protocol."""
import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _FakeProc:
    def __init__(self, returncode, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def test_failed_leg_raises_with_stderr(monkeypatch):
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda *a, **k: _FakeProc(1, stderr="ray.exceptions.OutOfMemoryError: boom"),
    )
    monkeypatch.setattr(bench, "ensure_bench_corpus", lambda *a, **k: None)
    with pytest.raises(RuntimeError, match="8-cpu leg exited 1.*boom"):
        bench.run_scaling("/nonexistent", 10, 1, lo=8, hi=32)


def test_protocol_records_failed_run_and_continues(monkeypatch):
    calls = {"n": 0}

    def fake_run_scaling(sf_dir, n_docs, replicas, lo, hi):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("32-cpu leg exited 1: killed")
        return {
            "scaling_efficiency": 0.85,
            "pages_per_sec_lo": 1.0,
            "pages_per_sec_hi": 3.4,
            "sec_lo": 100.0,
            "sec_hi": 30.0,
            "calibration_burn_sec_lo": [0.3, 0.3],
            "calibration_burn_sec_hi": [0.3, 0.3],
            "discarded_lo": 0,
            "discarded_hi": 0,
            "healthy": True,
        }

    monkeypatch.setattr(bench, "run_scaling", fake_run_scaling)
    monkeypatch.setattr(bench, "ensure_bench_corpus", lambda *a, **k: None)
    out = bench.run_scaling_protocol(
        "/nonexistent", 10, 1, pairs=((8, 32),), n_healthy=2, max_runs_per_pair=4
    )
    runs = out["pairs"]["8->32"]["runs"]
    # run 1 failed, runs 2-3 healthy → recorded, protocol completed
    assert len(runs) == 3
    assert runs[0]["healthy"] is False and "killed" in runs[0]["error"]
    assert runs[1]["healthy"] and runs[2]["healthy"]
    assert out["pairs"]["8->32"]["n_healthy"] == 2
    assert out["pairs"]["8->32"]["median_efficiency_healthy"] == 0.85
    # the JSON stays serializable with mixed failed/healthy run records
    json.dumps(out)
