"""bench.py backend probe: the outage path must be structured, and a
silent axon->CPU fallback must NOT be mistaken for a healthy TPU
(XLA:CPU cannot execute the bench's bf16 dots — VERDICT r3 weak #3)."""

import json
import subprocess
import types

import bench


def _completed(rc, out, err=""):
    return subprocess.CompletedProcess(args=[], returncode=rc,
                                       stdout=out, stderr=err)


def test_probe_accepts_tpu_device(monkeypatch):
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _completed(0, "[TpuDevice(id=0, ... TPU v5 lite)]"))
    ok, detail = bench.probe_backend(retries=1)
    assert ok and "TPU" in detail


def test_probe_rejects_cpu_fallback(monkeypatch):
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _completed(0, "[CpuDevice(id=0)]"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, detail = bench.probe_backend(retries=2)
    assert not ok and "fell back" in detail


def test_probe_reports_timeout(monkeypatch):
    def raise_timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="jax", timeout=150)
    monkeypatch.setattr(bench.subprocess, "run", raise_timeout)
    ok, detail = bench.probe_backend(retries=1)
    assert not ok and "timed out" in detail


def test_outage_record_is_one_json_line(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend",
                        lambda *a, **k: (False, "device init timed out"))
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] is None and "backend unavailable" in rec["error"]
    assert rec["metric"] == "csi_windows_per_sec_per_chip"
