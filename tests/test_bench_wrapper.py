"""Outage-resilient bench wrapper (VERDICT r3 next #1).

Round 3 lost its driver-verified perf evidence because `python bench.py`
hit an axon tunnel outage and died with rc=1 inside backend init. The
wrapper must instead health-poll, retry bounded child attempts, and only
give up at a global deadline. These tests exercise the control flow with
the TPU/subprocess boundary mocked; the probe itself is covered by
construction (subprocess + timeout + D2H assert).
"""

import json
import subprocess
import sys
import types

import pytest

import bench
from nova_pointcloud_tpu.utils import platform as nplatform


def test_last_json_line():
    out = "# log line\n{\"metric\": \"x\", \"value\": 1}\n"
    assert bench._last_json_line(out) == {"metric": "x", "value": 1}
    assert bench._last_json_line("# only logs\n") is None
    assert bench._last_json_line("{broken\n") is None
    # picks the LAST json line (calibration notes may print dicts earlier)
    two = "{\"a\": 1}\n# sep\n{\"b\": 2}\n"
    assert bench._last_json_line(two) == {"b": 2}
    # stray '{'-prefixed noise AFTER the metric line (library dict reprs,
    # partially flushed output) must not mask a valid earlier line — a
    # misclassified success re-runs the whole bench until the deadline
    noisy = "{\"metric\": \"m\", \"value\": 3}\n{'repr': obj}\n{trunc"
    assert bench._last_json_line(noisy) == {"metric": "m", "value": 3}


def test_wait_for_tpu_gives_up(monkeypatch):
    probes = []
    monkeypatch.setattr(nplatform, "tpu_is_healthy",
                        lambda probe_timeout_s=0: probes.append(1) or False)
    monkeypatch.setattr(nplatform.time, "sleep", lambda s: None)
    assert nplatform.wait_for_tpu(max_wait_s=0.0) is False
    assert len(probes) == 1  # one probe, no sleep loop when budget is 0


def test_wait_for_tpu_recovers(monkeypatch):
    state = {"n": 0}

    def probe(probe_timeout_s=0):
        state["n"] += 1
        return state["n"] >= 3

    monkeypatch.setattr(nplatform, "tpu_is_healthy", probe)
    monkeypatch.setattr(nplatform.time, "sleep", lambda s: None)
    assert nplatform.wait_for_tpu(max_wait_s=1e6, poll_s=0.0) is True
    assert state["n"] == 3


def test_resilient_outer_retries_then_succeeds(monkeypatch):
    """Attempt 1 stalls (remote-compiler profile), attempt 2 rc=1 (tunnel
    dropped mid-run), attempt 3 emits the JSON line -> rc 0, JSON forwarded."""
    monkeypatch.setattr(nplatform, "wait_for_tpu",
                        lambda **kw: True)
    calls = {"n": 0}
    good = "# compile=1s\n" + json.dumps({"metric": "m", "value": 2.0}) + "\n"

    def fake_run(cmd, stdout=None, env=None, timeout=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        stdout.write("" if calls["n"] == 2 else good)
        stdout.flush()
        return types.SimpleNamespace(returncode=0 if calls["n"] == 3 else 1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("NOVA_BENCH_DEADLINE_S", "100000")
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    captured = []
    monkeypatch.setattr(bench.sys.stdout, "write",
                        lambda s: captured.append(s) or len(s))
    rc = bench._resilient_outer()
    assert rc == 0 and calls["n"] == 3
    assert bench._last_json_line("".join(captured)) == {"metric": "m",
                                                        "value": 2.0}


def test_resilient_outer_deadline(monkeypatch):
    """TPU never comes back: forwards the last child output and rc!=0."""
    monkeypatch.setattr(nplatform, "wait_for_tpu", lambda **kw: False)

    def fake_run(cmd, stdout=None, env=None, timeout=None):
        stdout.write("# backend unavailable\n")
        return types.SimpleNamespace(returncode=1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    # budget (deadline-10) falls under the 30s floor -> break without
    # spinning on instant mock attempts
    monkeypatch.setenv("NOVA_BENCH_DEADLINE_S", "35")
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    monkeypatch.setattr(bench.sys.stdout, "write", lambda s: len(s))
    assert bench._resilient_outer() != 0


def test_resilient_outer_fails_fast_on_deterministic_error(monkeypatch):
    """Two consecutive FAST rc!=0 exits with a healthy TPU = a deterministic
    bug (e.g. a VMEM-OOM compile from a bad NOVA_ATTN_SB override), not an
    outage — the wrapper must give up instead of retrying to the 4h
    deadline (this blocked the round-5 sweep queue for 40 minutes)."""
    monkeypatch.setattr(nplatform, "wait_for_tpu", lambda **kw: True)
    calls = {"n": 0}

    def fake_run(cmd, stdout=None, env=None, timeout=None):
        calls["n"] += 1
        stdout.write("# vmem oom traceback\n")
        return types.SimpleNamespace(returncode=1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("NOVA_BENCH_DEADLINE_S", "100000")
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    monkeypatch.setattr(bench.sys.stdout, "write", lambda s: len(s))
    assert bench._resilient_outer() != 0
    assert calls["n"] == 2  # gave up after the second identical failure


def test_attn_sb_override_respects_vmem_limit(monkeypatch):
    """NOVA_ATTN_SB values whose footprint exceeds the physical ~16MB
    scoped-VMEM limit fall back to auto instead of a guaranteed compile
    error (observed: sb=8 at T=128 D=1024 -> 19.8M scoped alloc)."""
    from nova_pointcloud_tpu.ops.pallas.fused_block import (
        attention_block_vmem_bytes)

    assert attention_block_vmem_bytes(128, 1024, 4) <= int(15.5 * 2**20)
    assert attention_block_vmem_bytes(128, 1024, 8) > int(15.5 * 2**20)


def test_probe_src_is_subprocess_safe():
    """The probe source must not import this repo (keeps it robust to repo
    bugs) and must force a D2H (relay ignores block_until_ready)."""
    assert "nova_pointcloud_tpu" not in nplatform._TPU_PROBE_SRC
    assert "np.asarray" in nplatform._TPU_PROBE_SRC
