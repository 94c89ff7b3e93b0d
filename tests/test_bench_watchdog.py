"""The headline bench (bench.py) is a watchdog orchestrator: candidates
run in subprocesses under deadlines and the first JSON line wins
(round-2 driver run timed out on a cold Mosaic compile; the orchestrator
is what guarantees a driver-captured number).  These tests pin the
fall-through logic and the int16 marker gating without touching a TPU.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod(monkeypatch):
    # Skip the real backend-reachability probe (it spawns a jax
    # subprocess and would hang on the down tunnel in CI).
    monkeypatch.setenv("SEQALIGN_BENCH_SKIP_PROBE", "1")
    spec = importlib.util.spec_from_file_location(
        "bench_headline", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_watchdog_falls_through_to_first_success(bench_mod, monkeypatch,
                                                 capsys):
    line = json.dumps({"metric": "sw_batch_fill", "value": 1.0,
                       "unit": "GCUPS", "vs_baseline": 0.07})
    calls = []

    def fake_run(name, deadline):
        calls.append((name, deadline))
        return None if len(calls) < 2 else line

    monkeypatch.setattr(bench_mod, "_run_candidate", fake_run)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("SEQALIGN_BENCH_CANDIDATE", raising=False)
    bench_mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1] == line
    # First candidate failed, second succeeded, later ones never ran.
    assert len(calls) == 2
    assert calls[0][0] == bench_mod.CANDIDATES[0][0]


def test_watchdog_exits_nonzero_when_all_fail(bench_mod, monkeypatch):
    monkeypatch.setattr(bench_mod, "_run_candidate", lambda n, d: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("SEQALIGN_BENCH_CANDIDATE", raising=False)
    with pytest.raises(SystemExit) as e:
        bench_mod.main()
    assert e.value.code == 1


def test_watchdog_candidate_filter(bench_mod, monkeypatch, capsys):
    line = json.dumps({"metric": "sw_batch_fill", "value": 2.0,
                       "unit": "GCUPS", "vs_baseline": 0.14})
    calls = []

    def fake_run(name, deadline):
        calls.append(name)
        return line

    monkeypatch.setattr(bench_mod, "_run_candidate", fake_run)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("SEQALIGN_BENCH_CANDIDATE", "xla")
    bench_mod.main()
    assert calls == ["xla"]
    assert capsys.readouterr().out.strip() == line


def test_watchdog_fails_fast_when_backend_down(bench_mod, monkeypatch):
    monkeypatch.delenv("SEQALIGN_BENCH_SKIP_PROBE", raising=False)
    monkeypatch.setattr(bench_mod, "_backend_reachable", lambda *a: False)
    ran = []
    monkeypatch.setattr(
        bench_mod, "_run_candidate",
        lambda n, d: ran.append(n),
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    with pytest.raises(SystemExit) as e:
        bench_mod.main()
    assert e.value.code == 1
    assert ran == []  # no candidate burned its deadline


def test_int16_marker_flips_config_default(monkeypatch):
    from seqalign_tpu import config

    monkeypatch.delenv("SEQALIGN_INT16_CELLS", raising=False)
    marker = os.path.join(REPO, "bench", "results", "INT16_VALIDATED")
    real_exists = os.path.exists
    monkeypatch.setattr(
        config.os.path, "exists",
        lambda p: True if p == marker else real_exists(p),
    )
    assert config.int16_cells() == "auto"
    monkeypatch.setattr(
        config.os.path, "exists",
        lambda p: False if p == marker else real_exists(p),
    )
    assert config.int16_cells() == "0"
    # Explicit env always wins over the marker.
    monkeypatch.setenv("SEQALIGN_INT16_CELLS", "1")
    assert config.int16_cells() == "1"
