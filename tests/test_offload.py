"""Host-memory offload: the TPU-native analogue of the reference's CPU
offload (`diffnext/pipelines/nova/pipeline_nova.py:31`
``model_cpu_offload_seq``) and of DeepSpeed ZeRO-Offload.

- optimizer-state offload: Adam m/v parked in ``pinned_host``; the jitted
  sharded train step streams them through the update. Steps must match the
  resident run exactly.
- pipeline component offload: VAE / text-encoder weights parked on host,
  streamed into HBM around their calls. Outputs must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nova_pointcloud_tpu.utils.offload import (memory_kind, to_device,
                                               to_host)


def _tiny_loss(params, batch, key):
    pred = batch["x"] @ params["w"] + params["b"]
    return jnp.mean((pred - batch["y"]) ** 2), {}


def _tiny_params(key):
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.normal(k1, (8, 4)) * 0.3,
            "b": jax.random.normal(k2, (4,)) * 0.1}


def test_to_host_roundtrip():
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "s": 3}
    host = to_host(tree)
    assert memory_kind(host["a"]) == "pinned_host"
    assert host["s"] == 3  # non-arrays pass through
    dev = to_device(host)
    assert memory_kind(dev["a"]) == "device"
    np.testing.assert_array_equal(np.asarray(dev["a"]),
                                  np.asarray(tree["a"]))


def test_sharded_step_offload_matches_resident(cpu_mesh_8):
    """make_sharded_train_step(offload_opt_state=True): opt state lives in
    pinned host memory and the trajectory matches the resident run."""
    from nova_pointcloud_tpu.parallel import (batch_sharding, create_mesh,
                                              make_sharded_train_step)

    mesh = create_mesh({"data": 4, "tensor": 2})
    params = _tiny_params(jax.random.PRNGKey(0))
    batch = {
        "x": jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (8, 8)),
            batch_sharding(mesh, 2)),
        "y": jax.device_put(
            jax.random.normal(jax.random.PRNGKey(2), (8, 4)),
            batch_sharding(mesh, 2)),
    }

    def run(offload):
        p = jax.tree.map(jnp.copy, params)
        init_fn, step_fn = make_sharded_train_step(
            _tiny_loss, optax.adamw(1e-2), mesh, p, donate=False,
            offload_opt_state=offload)
        with mesh:
            opt_state = init_fn(p)
            if offload:
                # non-scalar state lives on host; scalars (Adam count) stay
                kinds = {memory_kind(l) for l in jax.tree.leaves(opt_state)
                         if getattr(l, "ndim", 0) >= 1}
                assert kinds == {"pinned_host"}, kinds
            losses = []
            for i in range(3):
                p, opt_state, m = step_fn(p, opt_state, batch,
                                          jax.random.PRNGKey(3))
                losses.append(float(m["loss"]))
        return p, losses

    p_res, l_res = run(False)
    p_off, l_off = run(True)
    np.testing.assert_allclose(l_off, l_res, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6), p_off, p_res)


def test_trainer_plain_offload(tmp_path):
    """Trainer(offload_opt_state=True) without a mesh: host-parked Adam
    state, same losses as resident."""
    from nova_pointcloud_tpu.engine.trainer import Trainer

    params = _tiny_params(jax.random.PRNGKey(0))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 8)),
             "y": jax.random.normal(jax.random.PRNGKey(2), (8, 4))}

    def data():
        while True:
            yield batch

    def run(offload):
        tr = Trainer(_tiny_loss, params, optax.adamw(1e-2), mesh=None,
                     output_dir=None, ema_decay=None, resume=False,
                     log_every=1, offload_opt_state=offload)
        if offload:
            kinds = {memory_kind(l) for l in jax.tree.leaves(tr.opt_state)
                     if getattr(l, "ndim", 0) >= 1}
            assert kinds == {"pinned_host"}, kinds
        out = tr.train(data(), max_steps=3)
        return out["loss"]

    assert np.isclose(run(True), run(False), rtol=1e-6)


def test_trainer_offload_resume(tmp_path):
    """Resume restores into device memory; the offloaded trainer must
    re-place the state into pinned host before stepping again."""
    from nova_pointcloud_tpu.engine.trainer import Trainer

    params = _tiny_params(jax.random.PRNGKey(0))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 8)),
             "y": jax.random.normal(jax.random.PRNGKey(2), (8, 4))}

    def data():
        while True:
            yield batch

    kw = dict(mesh=None, output_dir=str(tmp_path), ema_decay=None,
              log_every=1, save_every=2, offload_opt_state=True)
    tr = Trainer(_tiny_loss, params, optax.adamw(1e-2), resume=False, **kw)
    tr.train(data(), max_steps=2)  # saves checkpoint-2

    tr2 = Trainer(_tiny_loss, params, optax.adamw(1e-2), resume=True, **kw)
    assert tr2.step == 2
    kinds = {memory_kind(l) for l in jax.tree.leaves(tr2.opt_state)
             if getattr(l, "ndim", 0) >= 1}
    assert kinds == {"pinned_host"}, kinds
    out = tr2.train(data(), max_steps=3)  # one more step must run
    assert np.isfinite(out["loss"])


def test_pipeline_host_offload_identical_outputs():
    """NOVAPipeline.enable_host_offload(): same images, VAE + text-encoder
    weights parked in pinned host memory between calls."""
    from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl import (
        AutoencoderKL)
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import (
        DummyTextEncoder)
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    model = NOVATransformer(arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
                            image_dim=4, image_base_size=(4, 4),
                            video_base_size=(1, 2, 2), patch_size=2,
                            text_token_dim=32, text_token_len=8,
                            noise_scheduler=FlowMatchEulerScheduler())
    rngs = {n: jax.random.PRNGKey(i) for i, n in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    params = jax.jit(model.init)(rngs, jnp.zeros((1, 1, 8, 8, 4)),
                                 jnp.zeros((1, 8, 32)))["params"]
    vae = AutoencoderKL(latent_channels=4, block_out_channels=(32, 64),
                        layers_per_block=1)
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 16, 16, 3)))["params"]
    enc = DummyTextEncoder(32, 8)

    def run(offload):
        pipe = NOVAPipeline(model, params, model.noise_scheduler,
                            vae=vae, vae_params=vae_params, text_encoder=enc)
        if offload:
            pipe.enable_host_offload()
            assert pipe.image_processor.host_offload
        out = pipe(["a cat"], num_inference_steps=2, num_diffusion_steps=2,
                   guidance_scale=2.0, key=jax.random.PRNGKey(7),
                   output_type="np")
        if offload:
            # weights are still parked on host after the call
            kinds = {memory_kind(l) for l in
                     jax.tree.leaves(pipe.image_processor.vae_params)}
            assert kinds == {"pinned_host"}, kinds
        return out.images

    np.testing.assert_array_equal(run(True), run(False))


@pytest.fixture
def cpu_mesh_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return None
