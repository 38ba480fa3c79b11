"""Interactive web app (scripts/app_nova.py) end-to-end smoke."""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import pytest


@pytest.mark.parametrize("mode", ["t2pc"])
def test_app_generates(mode):
    env = dict(os.environ, NOVA_PLATFORM="cpu")
    p = subprocess.Popen(
        [sys.executable, "scripts/app_nova.py", "--mode", mode,
         "--arch", "pc_d2w64", "--num-points", "128", "--port", "7894"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        for _ in range(60):
            time.sleep(1)
            try:
                html = urllib.request.urlopen(
                    "http://127.0.0.1:7894/", timeout=2).read()
                assert b"NOVA" in html
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                continue
        else:
            raise TimeoutError(p.stdout.read().decode()[-1500:])
        req = urllib.request.Request(
            "http://127.0.0.1:7894/api/generate",
            data=json.dumps({"prompt": "a chair", "num_steps": 2,
                             "seed": 1}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=180).read())
        assert "points" in out, out.get("error")
        assert len(out["points"]) == 128
    finally:
        p.send_signal(signal.SIGTERM)
