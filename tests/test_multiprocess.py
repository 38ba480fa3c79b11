"""Multi-process (2-node story) substrate: dcn mesh axis + cross-process DP.

The reference's multi-node training is a 2-node x 8-GPU Accelerate launch
(`accelerate_configs/multi_nodes/8_gpus_node_0.yaml:6-9`); here the
equivalent is jax.distributed + a "dcn" outermost mesh axis
(parallel/mesh.create_mesh). scripts/dryrun_multinode.py runs one real DP
train step across 2 OS processes (Gloo collectives over the process
boundary) and asserts loss parity with a single-process run.
"""

import os
import subprocess
import sys

import jax
import pytest

from nova_pointcloud_tpu.parallel import batch_sharding, create_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_create_mesh_dcn_axis_order():
    # dcn must be outermost; -1 resolves to process_count (1 here)
    mesh = create_mesh({"dcn": -1, "data": 8})
    assert tuple(mesh.axis_names) == ("dcn", "data")
    assert mesh.shape["dcn"] == jax.process_count() == 1
    with pytest.raises(ValueError):
        create_mesh({"data": 8, "dcn": 1})


def test_batch_sharding_spans_dcn():
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh({"dcn": 1, "data": 8})
    assert batch_sharding(mesh, 3).spec == P(("dcn", "data"), None, None)
    # non-dcn meshes keep the plain data spec
    plain = create_mesh({"data": 8})
    assert batch_sharding(plain, 2).spec == P("data", None)


def test_multiprocess_train_step_loss_parity():
    """2 real processes, 4 virtual CPU devices each: the launcher asserts
    worker losses == single-process reference (exits nonzero otherwise)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multinode.py"),
         "--num-processes", "2"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "== single-process OK" in r.stdout
