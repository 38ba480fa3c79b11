#!/usr/bin/env python
"""Multi-process (2-node story) dryrun: one DP train step across process
boundaries, loss-parity-checked against a single-process run.

The reference trains 2 nodes x 8 GPUs via an Accelerate launcher
(`accelerate_configs/multi_nodes/8_gpus_node_0.yaml:6-9`); the TPU-native
equivalent is `jax.distributed` + a mesh whose outermost "dcn" axis spans
processes (parallel/mesh.create_mesh). This script models that on one host
with N CPU processes x 4 virtual CPU devices each (the JAX analogue of a
fake multi-node backend, SURVEY.md §4):

- launcher mode (default): computes the single-process reference loss on
  N*4 virtual devices, spawns N workers, asserts every worker's loss
  matches.
- worker mode (--worker): jax.distributed.initialize against the launcher's
  coordinator, builds the {"dcn": N, "data": 4} mesh, loads ONLY its
  process's examples (parallel/mesh.local_shard_indices — the
  `get_ddp_shards` parity), assembles the global batch with
  jax.make_array_from_process_local_data, and runs one sharded train step
  (grad psum crosses the process boundary over the dcn axis).
"""

import argparse
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 4  # virtual CPU devices per process
BATCH = 16
NUM_POINTS = 64


def _force_cpu(num_local: int):
    import re

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={num_local}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    return jax


def _examples():
    """Deterministic synthetic dataset: BATCH (points, text) examples."""
    import numpy as np

    rng = np.random.RandomState(0)
    pts = rng.randn(BATCH, NUM_POINTS, 3).astype(np.float32)
    txt = rng.randn(BATCH, 8, 32).astype(np.float32)
    return pts, txt


def _global_order(num_processes: int):
    """Global batch row order = each process's local_shard_indices block,
    concatenated in process order (rows a process owns are contiguous on
    the dcn-outermost mesh)."""
    import numpy as np

    from nova_pointcloud_tpu.parallel import local_shard_indices

    return np.concatenate([
        local_shard_indices(BATCH, process_index=p,
                            process_count=num_processes)
        for p in range(num_processes)])


def _train_step_loss(jax, mesh, batch_arrays, key):
    """One sharded train step on the tiny pc model; returns the loss."""
    import jax.numpy as jnp
    import optax

    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.parallel import make_sharded_train_step
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    model = NOVAPointCloudTransformer(arch="pc_d2w64",
                                      point_cloud_size=NUM_POINTS,
                                      patch_size=1, text_token_dim=32,
                                      dropout=0.0)
    scheduler = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    x0 = jnp.zeros((BATCH, NUM_POINTS, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((BATCH,), jnp.int32),
                                 jnp.zeros((BATCH, 8, 32)))["params"]

    def loss_fn(params, batch, key):
        k1, k2 = jax.random.split(key)
        pts, text = batch["points"], batch["text"]
        t = scheduler.sample_timesteps(k1, (pts.shape[0],))
        noise = jax.random.normal(k2, pts.shape)
        x_t = scheduler.add_noise(pts, noise, t)
        pred = model.apply({"params": params}, x_t, t, text)
        return jnp.mean((pred - noise) ** 2), {}

    with mesh:
        init_fn, step_fn = make_sharded_train_step(
            loss_fn, optax.adamw(1e-4), mesh, params)
        opt_state = init_fn(params)
        params, opt_state, metrics = step_fn(params, opt_state, batch_arrays,
                                             key)
        return float(metrics["loss"])


def run_worker(process_id: int, num_processes: int, coordinator: str) -> None:
    jax = _force_cpu(LOCAL_DEVICES)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    import numpy as np

    from nova_pointcloud_tpu.parallel import (batch_sharding, create_mesh,
                                              local_shard_indices)

    assert jax.process_count() == num_processes
    mesh = create_mesh({"dcn": num_processes, "data": LOCAL_DEVICES})
    # this process loads ONLY its own examples (dataset sharding parity)
    mine = local_shard_indices(BATCH)
    pts, txt = _examples()
    sh3 = batch_sharding(mesh, 3)  # -> P(("dcn","data"), ...) on a dcn mesh
    batch = {
        "points": jax.make_array_from_process_local_data(
            sh3, pts[mine], global_shape=(BATCH, NUM_POINTS, 3)),
        "text": jax.make_array_from_process_local_data(
            sh3, txt[mine], global_shape=(BATCH, 8, 32)),
    }
    loss = _train_step_loss(jax, mesh, batch, jax.random.PRNGKey(2))
    assert np.isfinite(loss)
    print(f"MULTINODE_WORKER {process_id} loss={loss:.8f}", flush=True)


def run_launcher(num_processes: int) -> float:
    jax = _force_cpu(LOCAL_DEVICES * num_processes)
    import numpy as np

    from nova_pointcloud_tpu.parallel import batch_sharding, create_mesh

    # single-process reference on the same number of devices, same global
    # batch order as the workers' concatenated shards
    order = _global_order(num_processes)
    pts, txt = _examples()
    mesh = create_mesh({"data": LOCAL_DEVICES * num_processes})
    sh3 = batch_sharding(mesh, 3)
    batch = {"points": jax.device_put(pts[order], sh3),
             "text": jax.device_put(txt[order], sh3)}
    ref_loss = _train_step_loss(jax, mesh, batch, jax.random.PRNGKey(2))
    print(f"MULTINODE_REF loss={ref_loss:.8f}", flush=True)

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--process-id", str(p), "--num-processes", str(num_processes),
             "--coordinator", coordinator],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for p in range(num_processes)]
    losses = {}
    for p, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=420)
        if proc.returncode != 0:
            sys.stderr.write(out)
            raise RuntimeError(f"worker {p} failed rc={proc.returncode}")
        for line in out.splitlines():
            if line.startswith("MULTINODE_WORKER"):
                losses[p] = float(line.rsplit("loss=", 1)[1])
    assert len(losses) == num_processes, losses
    for p, loss in losses.items():
        if abs(loss - ref_loss) > 1e-5:
            raise AssertionError(
                f"worker {p} loss {loss} != single-process {ref_loss}")
    print(f"dryrun_multinode({num_processes}): DP train step across "
          f"{num_processes} processes (dcn axis), loss {ref_loss:.6f} == "
          f"single-process OK", flush=True)
    return ref_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:57731")
    args = ap.parse_args()
    if args.worker:
        run_worker(args.process_id, args.num_processes, args.coordinator)
    else:
        run_launcher(args.num_processes)


if __name__ == "__main__":
    main()
