"""bench.py orchestrator logic (no jax import — the orchestrator level is
deliberately jax-free so a downed axon tunnel can't hang it).

These pin the driver-artifact contract: one parseable JSON line with the
infer headline and per-mode sub-results, error fields instead of
tracebacks, probe short-circuit on cpu, and budget-exhaustion skipping."""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)


def test_module_level_has_no_jax():
    assert "jax" not in sys.modules or True  # conftest imports jax; instead:
    import ast

    tree = ast.parse(open(_SPEC.origin).read())
    top_imports = {
        n.names[0].name.split(".")[0]
        for n in ast.walk(tree)
        if isinstance(n, (ast.Import,)) and isinstance(tree, ast.Module)
        and n.col_offset == 0
    }
    assert "jax" not in top_imports


def test_aggregate_headline_and_modes():
    plan = ["infer", "tiled", "eval", "train"]
    results = {
        "infer": {"metric": "m_infer", "value": 110.5, "unit": "images/sec",
                  "vs_baseline": 2.01},
        "tiled": {"metric": "m_tiled", "value": 4.2, "vs_baseline": 1.9},
        "eval": {"error": "timeout after 600s"},
        "train": {"metric": "m_train", "value": 24.6, "vs_baseline": 2.05},
    }
    out = bench._aggregate(plan, results)
    assert out["metric"] == "m_infer"
    assert out["value"] == 110.5
    assert "error" not in out
    assert set(out["modes"]) == {"tiled", "eval", "train"}
    assert out["modes"]["eval"]["error"].startswith("timeout")
    json.dumps(out)  # one-line serialisable


def test_aggregate_headline_error_propagates():
    out = bench._aggregate(["infer"], {"infer": {"error": "boom"}})
    assert out["error"] == "boom"
    assert out["value"] == 0.0


def test_aggregate_not_run():
    out = bench._aggregate(["infer"], {})
    assert out["error"] == "not run"
    assert out["metric"].endswith("infer_images_per_sec_per_chip")


def test_probe_short_circuits_on_cpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    import time

    assert bench._probe_backend(time.time() + 1) is True


def test_orchestrate_emits_backend_unavailable(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_MODE", raising=False)
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: False)
    bench.orchestrate()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["error"] == "backend_unavailable"
    assert out["value"] == 0.0


def test_orchestrate_runs_plan_and_skips_on_budget(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_MODE", raising=False)
    monkeypatch.setenv("BENCH_BUDGET", "100000")
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: True)
    calls = []

    def fake_run(mode, timeout):
        calls.append((mode, timeout))
        return {"metric": f"m_{mode}", "value": 1.0, "vs_baseline": 1.0}

    monkeypatch.setattr(bench, "_run_mode", fake_run)
    bench.orchestrate()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [m for m, _ in calls] == ["infer", "tiled", "eval", "train"]
    # per-mode timeout table honored (train gets the long slot)
    assert dict(calls)["train"] == pytest.approx(1650.0)
    assert out["metric"] == "m_infer"

    # budget exhausted -> remaining modes recorded as skipped
    monkeypatch.setenv("BENCH_BUDGET", "50")
    calls.clear()
    bench.orchestrate()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls == []
    assert out["modes"]["train"]["error"].startswith("skipped")


def test_orchestrate_retries_headline_once(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_MODE", raising=False)
    monkeypatch.setenv("BENCH_BUDGET", "100000")
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: True)
    seen = []

    def flaky(mode, timeout):
        seen.append(mode)
        if mode == "infer" and seen.count("infer") == 1:
            return {"error": "transient"}
        return {"metric": f"m_{mode}", "value": 2.0, "vs_baseline": 1.0}

    monkeypatch.setattr(bench, "_run_mode", flaky)
    bench.orchestrate()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert seen.count("infer") == 2
    assert out["value"] == 2.0 and "error" not in out
