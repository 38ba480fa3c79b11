"""Real-data drill (VERDICT r2 next #9): a PointFlow-layout ShapeNet tree
drives the full train + eval stack, so "accepts real trees unchanged" is
tested, not asserted. Layout per the reference (`dataset.py:83-111`):
root/<synset>/<split>/<mesh>.npy with 15k (here fewer) points per mesh,
deterministic seed-38383 shuffle, train=first 10k points of each cloud.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

SYNSETS = ("03001627", "02691156")  # chair, airplane


def _make_tree(root, points_per_mesh=15000, meshes=3):
    rng = np.random.RandomState(0)
    for si, synset in enumerate(SYNSETS):
        for split in ("train", "val"):
            d = os.path.join(root, synset, split)
            os.makedirs(d, exist_ok=True)
            for m in range(meshes):
                # distinct geometry per synset: sphere-ish vs box-ish
                pts = rng.randn(points_per_mesh, 3).astype(np.float32)
                if si == 0:
                    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
                else:
                    pts = np.clip(pts, -1, 1)
                np.save(os.path.join(d, f"mesh{m}.npy"), pts)


def test_shapenet_loader_reads_pointflow_tree(tmp_path):
    from nova_pointcloud_tpu.data.shapenet import ShapeNet15kPointClouds

    _make_tree(str(tmp_path))
    ds = ShapeNet15kPointClouds(str(tmp_path), ["chair", "airplane"],
                                split="train")
    assert len(ds) == 6
    item = ds[0]
    assert item["points"].shape[1] == 3
    assert item["prompt"] in ("a chair", "a airplane")
    val = ShapeNet15kPointClouds(str(tmp_path), ["all"], split="val")
    assert len(val) == 6


@pytest.mark.full
def test_train_and_eval_on_pointflow_tree(tmp_path):
    """scripts/train_pointcloud.py --data-root <tree> end to end: trains,
    fits stats.json from the tree, selects best-on-CD, and the saved
    checkpoint restores for evaluation."""
    _make_tree(str(tmp_path / "tree"))
    out_dir = str(tmp_path / "run")
    env = dict(os.environ, NOVA_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/train_pointcloud.py",
         "--data-root", str(tmp_path / "tree"),
         "--arch", "pc_d2w64", "--max-points", "128", "--batch-size", "4",
         "--max-steps", "6", "--val-every", "6", "--eval-shapes", "4",
         "--eval-steps", "2", "--eval-guidance", "1.0",
         "--output-dir", out_dir],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "sampled_cd=" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "stats.json"))
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    assert len(stats["mean"]) == 3

    best = os.path.join(out_dir, "checkpoints", "checkpoint-best")
    assert os.path.isdir(best)

    # the quality evaluator CLI consumes the same checkpoint dir
    r2 = subprocess.run(
        [sys.executable, "scripts/eval_pc_quality.py",
         "--checkpoint-dir", out_dir, "--arch", "pc_d2w64",
         "--num-points", "128", "--num-shapes", "4", "--steps", "2",
         "--out", str(tmp_path / "eval.json")],
        env=env, capture_output=True, text=True, timeout=900)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    with open(tmp_path / "eval.json") as f:
        ev = json.load(f)
    assert "bf16" in ev and np.isfinite(ev["bf16"]["best_chamfer"])
