"""Guard the driver-facing surfaces: bench.py and __graft_entry__.

These run as subprocesses (their own platform handling) so a regression in
either can't hide behind the test env.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_bench_dry_run_emits_json():
    out = run([sys.executable, "bench.py", "--dry-run"])
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in data
    assert data["value"] > 0


def test_bench_train_dry_run_emits_json():
    out = run([sys.executable, "bench.py", "--mode", "train", "--dry-run"])
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["metric"] == "t2i_train_0.6B_samples_per_sec_per_chip"
    assert data["value"] > 0 and data["vs_baseline"] > 0
    # the two timed steps must have really trained (loss is finite, step ran)
    assert data["p50_step_ms"] > 0


def test_bench_train_t2v_dry_run_emits_json():
    out = run([sys.executable, "bench.py", "--mode", "train",
               "--train-arch", "t2v", "--dry-run"])
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["metric"] == "t2v_train_0.6B_samples_per_sec_per_chip"
    assert data["value"] > 0 and data["vs_baseline"] > 0
    assert data["p50_step_ms"] > 0


def test_graft_entry_forward():
    out = run([sys.executable, "__graft_entry__.py"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "entry forward:" in out.stdout


@pytest.mark.full
def test_graft_dryrun_multichip():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "nova-t2i mesh={'data': 4, 'tensor': 2}" in out.stdout
