"""Tests for the masked-AR point-cloud model + pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nova_pointcloud_tpu.models.pointcloud_ar import NOVAPointCloudARTransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.pipelines.pointcloud_ar import NOVAPointCloudARPipeline
from nova_pointcloud_tpu.schedulers import DDPMScheduler, FlowMatchEulerScheduler

N = 128
P = 8


def make_model(scheduler=None):
    model = NOVAPointCloudARTransformer(
        arch="pc_d2w64", point_cloud_size=N, patch_size=P, text_token_dim=32,
        noise_scheduler=scheduler or FlowMatchEulerScheduler())
    pts = jnp.zeros((2, N, 3))
    text = jnp.zeros((2, 8, 32))
    rngs = {name: jax.random.PRNGKey(i) for i, name in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    params = jax.jit(model.init)(rngs, pts, text)["params"]
    return model, params


def test_train_loss_finite_and_decreases():
    model, params = make_model()
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (4, N, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    text = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        ks = jax.random.split(key, 4)
        rngs = {"mask": ks[0], "time": ks[1], "noise": ks[2], "dropout": ks[3]}

        def loss_fn(p):
            return model.apply({"params": p}, pts, text, rngs=rngs)["loss"]

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_masked_ar_generation():
    sched = FlowMatchEulerScheduler()
    model, params = make_model(sched)
    pipe = NOVAPointCloudARPipeline(model, params, sched,
                                    text_encoder=DummyTextEncoder(32, 8))
    out = pipe(["a chair", "a lamp"], num_inference_steps=4,
               num_diffusion_steps=3, guidance_scale=2.0,
               key=jax.random.PRNGKey(0))
    assert out.point_clouds.shape == (2, N, 3)
    assert out.colors.shape == (2, N, 3)
    assert np.all(np.isfinite(out.point_clouds))


def test_masked_ar_generation_ddpm():
    sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    model, params = make_model(sched)
    pipe = NOVAPointCloudARPipeline(model, params, sched,
                                    text_encoder=DummyTextEncoder(32, 8))
    out = pipe(["a chair"], num_inference_steps=4, num_diffusion_steps=3,
               guidance_scale=1.0, key=jax.random.PRNGKey(0))
    assert out.point_clouds.shape == (1, N, 3)
    assert np.all(np.isfinite(out.point_clouds))
