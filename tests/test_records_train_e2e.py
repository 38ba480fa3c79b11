"""End-to-end records-driven training: loader -> train pipeline -> loss down."""

import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.full


@pytest.fixture(scope="module")
def records_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("recs") / "synthetic_records"
    subprocess.run([sys.executable, "scripts/make_synthetic_records.py",
                    "--out", str(out), "--num", "64", "--height", "8",
                    "--width", "8", "--text-dim", "32", "--text-len", "8",
                    "--classes", "4"], check=True)
    return str(out)


def test_t2i_records_training_loss_decreases(records_dir):
    import jax
    import jax.numpy as jnp
    import optax

    from nova_pointcloud_tpu.data.records import FeatureDataLoader
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.parallel import create_mesh
    from nova_pointcloud_tpu.pipelines.train_nova import NOVATrainT2IPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
                            image_dim=4, image_base_size=(4, 4),
                            video_base_size=(1, 2, 2), patch_size=2,
                            text_token_dim=32, text_token_len=8,
                            noise_scheduler=sched)
    rngs = {n: jax.random.PRNGKey(i) for i, n in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    params = jax.jit(model.init)(rngs, jnp.zeros((2, 1, 8, 8, 4)),
                                 jnp.zeros((2, 8, 32)))["params"]
    history = []
    pipe = NOVATrainT2IPipeline(
        model, params, optimizer=optax.adamw(1e-3),
        mesh=create_mesh({"data": -1, "tensor": 1}),
        output_dir=None, max_steps=80, log_every=1, save_every=10**9,
        ema_decay=0.99, ema_every=10**9, lr_schedule=None, seed=0,
        tracker=lambda metrics, step: history.append(metrics["loss"]))

    loader = FeatureDataLoader(records_dir, batch_size=8, seed=0,
                               num_workers=2)

    def data():
        while True:
            yield loader.next()

    pipe.train(data(), max_steps=80)
    loader.shutdown()
    assert len(history) == 80
    early = float(np.mean(history[:15]))
    late = float(np.mean(history[-15:]))
    assert np.isfinite(early) and np.isfinite(late)
    assert late < early, f"loss did not decrease: {early} -> {late}"


def test_t2v_records_training_runs(tmp_path):
    """Video records (T-frame moments + motion_flow) feed the t2v trainer."""
    import jax
    import jax.numpy as jnp
    import optax

    out = tmp_path / "vrecs"
    subprocess.run([sys.executable, "scripts/make_synthetic_records.py",
                    "--out", str(out), "--num", "32", "--height", "8",
                    "--width", "8", "--frames", "3", "--text-dim", "32",
                    "--text-len", "8", "--classes", "4"], check=True)

    from nova_pointcloud_tpu.data.records import FeatureDataLoader
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.parallel import create_mesh
    from nova_pointcloud_tpu.pipelines.train_nova import NOVATrainT2VPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
                            image_dim=4, image_base_size=(4, 4),
                            video_base_size=(3, 2, 2), patch_size=2,
                            text_token_dim=32, text_token_len=8,
                            video_mixer_rank=8, noise_scheduler=sched)
    rngs = {n: jax.random.PRNGKey(i) for i, n in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    params = jax.jit(model.init)(rngs, jnp.zeros((2, 3, 8, 8, 4)),
                                 jnp.zeros((2, 8, 32)))["params"]
    history = []
    pipe = NOVATrainT2VPipeline(
        model, params, optimizer=optax.adamw(1e-3),
        mesh=create_mesh({"data": -1, "tensor": 1}),
        output_dir=None, max_steps=10, log_every=1, save_every=10**9,
        ema_decay=0.99, ema_every=10**9, lr_schedule=None, seed=0,
        tracker=lambda m, s: history.append(m))

    loader = FeatureDataLoader(str(out), batch_size=4, seed=0, num_workers=2)

    def data():
        while True:
            yield loader.next()

    pipe.train(data(), max_steps=10)
    loader.shutdown()
    assert len(history) == 10
    assert all(np.isfinite(m["loss_t2i"]) and np.isfinite(m["loss_i2i"])
               for m in history)
