"""Spatiotemporal guidance (STG) perturbed third pass.

The reference appends the cond text for the 3rd pass and combines with
(cond - perturb) * stg_scale (`guidance_scaler.py:56,82-85`), but only its
UNUSED DiffusionTransformer implements the stg_skip perturbation
(`diffusion_transformer.py:101-110`) — so the shipped STG pass computes
cond twice and contributes exactly zero while costing 50% more. Per repo
policy (known reference bugs are fixed, not replicated) our DiffusionMLP
skips its middle block for the trailing ``stg_rows`` of the batch, making
the perturbed pass real (VERDICT r3 weak #4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionMLP
from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

TINY = dict(
    arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
    image_dim=4, image_base_size=(4, 4), video_base_size=(2, 2, 2),
    patch_size=2, text_token_dim=32, text_token_len=8,
)


def test_stg_rows_skips_middle_block_only_for_tail():
    mlp = DiffusionMLP(depth=4, embed_dim=32, cond_dim=16, out_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 8))
    t = jnp.full((3,), 100.0)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 16))
    params = mlp.init(jax.random.PRNGKey(2), x, t, z)["params"]
    # AdaLN-zero blocks are identity at init (zero-init gates) — skipping
    # one would be invisible; jitter params so blocks actually transform
    keys = iter(jax.random.split(jax.random.PRNGKey(3), 200))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(next(keys), p.shape, p.dtype),
        params)
    base = mlp.apply({"params": params}, x, t, z)
    stg = mlp.apply({"params": params}, x, t, z, stg_rows=1)
    # non-perturbed rows are untouched
    np.testing.assert_allclose(np.asarray(stg[:2]), np.asarray(base[:2]),
                               atol=1e-6)
    # the perturbed row actually differs (middle block bypassed)
    assert np.max(np.abs(np.asarray(stg[2] - base[2]))) > 1e-4
    # and equals a per-row forward with stg_rows covering that row alone
    solo = mlp.apply({"params": params}, x[2:], t[2:], z[2:], stg_rows=1)
    np.testing.assert_allclose(np.asarray(stg[2:]), np.asarray(solo),
                               atol=1e-6)


def test_stg_changes_sampler_output():
    """Before the fix, stg_scale>0 cost a 3rd pass and changed NOTHING
    (perturb == cond). Now the perturbed pass must steer the latents."""
    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(noise_scheduler=sched, **TINY)
    h, w = model.latent_hw
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "time": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    params = jax.jit(model.init)(
        rngs, jnp.zeros((2, 1, h, w, 4)), jnp.zeros((2, 8, 32)))["params"]
    # zero-init AdaLN gates make decoder blocks identity at init; jitter so
    # the middle-block skip is observable
    keys = iter(jax.random.split(jax.random.PRNGKey(9), 2000))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(next(keys), p.shape, p.dtype),
        params)
    pipe = NOVAPipeline(model, params, sched,
                        text_encoder=DummyTextEncoder(32, 8))
    kw = dict(num_inference_steps=3, num_diffusion_steps=4,
              guidance_scale=5.0, key=jax.random.PRNGKey(5),
              output_type="latent")
    plain = np.asarray(pipe(["a"], **kw).latents)
    stg = np.asarray(
        pipe(["a"], spatiotemporal_guidance_scale=1.0, **kw).latents)
    assert np.isfinite(stg).all()
    assert np.max(np.abs(stg - plain)) > 1e-4

    # the perturbation must apply ONLY when the 3rd pass is the STG pass:
    # with guidance off (scale<=1) there is a single cond pass — perturbing
    # it would corrupt the unguided sampler
    kw_off = dict(kw, guidance_scale=1.0)
    plain_off = np.asarray(pipe(["a"], **kw_off).latents)
    stg_off = np.asarray(
        pipe(["a"], spatiotemporal_guidance_scale=1.0, **kw_off).latents)
    np.testing.assert_allclose(stg_off, plain_off, atol=1e-6)

    # and with image guidance active the 3rd pass is the image-free pass
    # (combine's image branch wins, `guidance_scaler.py:74-81`) — STG must
    # not perturb it
    kw_img = dict(kw, image_guidance_scale=0.5)
    img = np.asarray(pipe(["a"], **kw_img).latents)
    img_stg = np.asarray(
        pipe(["a"], spatiotemporal_guidance_scale=1.0, **kw_img).latents)
    np.testing.assert_allclose(img_stg, img, atol=1e-6)
