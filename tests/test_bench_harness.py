"""bench.py subprocess harness: external timeouts + salvage assembly.

The relay-down failure mode HANGS inside a C++ PJRT call with the GIL
released, so no in-process watchdog can fire (CLAUDE.md). bench.py therefore
runs each metric in its own subprocess with an external timeout; these tests
exercise the harness plumbing on CPU via hidden no-device test metrics.
"""

import pytest

import bench


def test_run_metric_subprocess_returns_value():
    v = bench._run_metric_subprocess("_test_fast", timeout_s=120)
    assert v == 123.5


def test_run_metric_subprocess_kills_hung_child():
    v = bench._run_metric_subprocess("_test_sleep", timeout_s=3)
    assert v is None


def test_wait_for_relay_exhausted_budget(monkeypatch):
    probes = []
    monkeypatch.setattr(bench, "_relay_healthy", lambda timeout_s=150.0:
                        probes.append(1) is None and False)
    assert bench._wait_for_relay(0.0) == -1.0
    assert len(probes) == 1  # zero budget -> exactly one quick probe


def test_wait_for_relay_recovers(monkeypatch):
    import time

    state = {"n": 0}

    def flaky(timeout_s=150.0):
        state["n"] += 1
        return state["n"] >= 2  # down once, then up

    monkeypatch.setattr(bench, "_relay_healthy", flaky)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    left = bench._wait_for_relay(600.0)
    assert left > 0 and state["n"] == 2


def test_collect_skips_metrics_while_relay_down(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "_wait_for_relay", lambda budget: -1.0)
    monkeypatch.setattr(bench, "_run_metric_subprocess",
                        lambda name, t: calls.append(name) or 1.0)
    vals = bench._collect(per_metric_timeout=60.0)
    assert calls == []  # no metric subprocess ever launched
    assert all(v is None for v in vals.values())
    with pytest.raises(RuntimeError):
        bench._assemble(vals)


def test_collect_runs_metrics_when_relay_up(monkeypatch):
    monkeypatch.setattr(bench, "_wait_for_relay", lambda budget: budget)
    monkeypatch.setattr(bench, "_run_metric_subprocess",
                        lambda name, t: 42.0)
    vals = bench._collect(per_metric_timeout=60.0)
    assert vals["infer"] == 42.0
    assert not any(k.startswith("_test") for k in vals)


def test_assemble_drops_missing_extras_keeps_headline():
    vals = {"infer": 760.0, "infer_b32": None, "train": 188.5,
            "train16": None, "gaviko": None, "infer_int8": None, "mae": None}
    d = bench._assemble(vals)
    assert d["value"] == 760.0
    metrics = [e["metric"] for e in d["extra"]]
    assert len(metrics) == 1 and "train-step" in metrics[0]
    assert d["extra"][0]["vs_baseline"] == round(188.5 / bench.TARGET_TRAIN, 3)


def test_assemble_without_headline_is_fatal():
    with pytest.raises(RuntimeError):
        bench._assemble({"infer": None, "train": 188.5})


def test_assemble_full_payload_shape():
    vals = {"infer": 762.6, "infer_b32": 759.5, "train": 188.5,
            "train16": 195.7, "gaviko": 188.2, "infer_int8": 866.5,
            "mae": 0.00033}
    d = bench._assemble(vals)
    assert set(d) == {"metric", "value", "unit", "vs_baseline", "extra"}
    assert len(d["extra"]) == 6
    assert d["extra"][-1]["unit"] == "MAE / mean abs logit"
