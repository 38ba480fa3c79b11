"""Calibration robustness under prompt-distribution shift (VERDICT r3 weak #7).

The serving path folds CALIBRATED static ranges into the int8 kernels: per-
site activation amax (clipped with a 1.05 margin) and per-layer max attention
logits (static softmax offset; the kernel stays EXACT for logits up to
offset+20, its clip threshold — ops/pallas/flash_attention.py). Round 3
validated CD-neutrality on one trained checkpoint only; nothing guarded
against calibrating on prompt set A and serving a differently-distributed
set B. These tests calibrate the real masked-AR trajectory twice on
deliberately shifted prompt sets and assert B's true ranges stay inside A's
serving envelope — they fail if calibration ever becomes prompt-brittle
(e.g. a quant site moved to a pre-LN activation whose scale tracks the
prompt embedding norm).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler
import pytest

TINY = dict(
    arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
    image_dim=4, image_base_size=(4, 4), video_base_size=(2, 2, 2),
    patch_size=2, text_token_dim=32, text_token_len=8,
)
CLIP_WINDOW = 20.0  # flash_attention_static stays exact to offset+20
# Structural-drift threshold for amax sites. The serving margin is 1.05, and
# a mild exceedance only soft-clips a handful of outlier VALUES (int8 range
# clip; measured CD-neutral on the trained flagship, results/
# pc_flagship_quality_r3_static.json) — post-LN amax is an extreme-value
# stat, so its bulk sits far below the range. What must never happen is a
# site whose range TRACKS the prompt distribution (e.g. pre-LN): with the 2x
# shifted-norm set below, such a site drifts ~2x and trips this threshold.
AMAX_DRIFT = 1.35
# a_q/a_k (int8 score core, opt-in) are extreme-value stats of an attention
# PROJECTION, not post-LN bulk activations — wider-tailed under content
# shift by construction. merge_act_scales gives them QK_EXTRA_MARGIN extra
# serving headroom; the structural bound mirrors it (a norm-tracking site
# would still drift ~2x and trip this).
QK_AMAX_DRIFT = AMAX_DRIFT * 1.2
MARGIN = 1.05  # multiplicative amax headroom applied at serving


def _amax_bound(name: str) -> float:
    return QK_AMAX_DRIFT if ("a_q" in name or "a_k" in name) else AMAX_DRIFT


def _make_pipe():
    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(noise_scheduler=sched, quantize=True, **TINY)
    h, w = model.latent_hw
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "time": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    params = jax.jit(model.init)(
        rngs, jnp.zeros((2, 1, h, w, 4)), jnp.zeros((2, 8, 32)))["params"]
    # jitter: zero-init AdaLN gates would otherwise zero out whole blocks
    keys = iter(jax.random.split(jax.random.PRNGKey(9), 2000))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(next(keys), p.shape, p.dtype),
        params)
    return NOVAPipeline(model, params, sched)


def _calibrate(pipe, embeds):
    pipe.act_scales = None
    return pipe.calibrate(prompt_embeds=embeds, num_inference_steps=4,
                          num_diffusion_steps=3, key=jax.random.PRNGKey(7))


@pytest.mark.full
def test_shifted_prompts_stay_inside_serving_envelope():
    """Calibrate on A; serve B (different content AND 2x embedding norm).

    Every quant-site amax recorded on B must fit under A's margined scale,
    and every max-logit on B under A's offset + the exact-clip window. The
    quant sites sit post-LayerNorm by design, which is what makes static
    calibration distribution-robust — this is the regression guard for that
    property."""
    pipe = _make_pipe()
    rng = np.random.RandomState(0)
    a = rng.randn(2, 8, 32).astype(np.float32)
    b = 2.0 * np.random.RandomState(99).randn(2, 8, 32).astype(np.float32)

    scales_a = jax.tree.map(np.copy, _calibrate(pipe, a))
    scales_b = _calibrate(pipe, b)

    flat_a = jax.tree_util.tree_leaves_with_path(scales_a)
    flat_b = jax.tree.leaves(scales_b)
    assert len(flat_a) == len(flat_b) and len(flat_a) > 0
    worst = {"amax": 0.0, "smax": -np.inf}
    for (path, va), vb in zip(flat_a, flat_b):
        name = jax.tree_util.keystr(path)
        if "a_smax" in name:
            worst["smax"] = max(worst["smax"], float(np.max(vb - va)))
        else:
            ratio = float(np.max(vb / np.maximum(va, 1e-12)))
            # B's activation ranges must not drift structurally past A's
            # envelope (mild outlier clipping is fine, norm-tracking is not;
            # a_q/a_k get the mirrored wider bound — see QK_AMAX_DRIFT)
            assert ratio <= _amax_bound(name), (name, ratio)
            worst["amax"] = max(worst["amax"], ratio)
    # B's logits must stay exact under A's offset (clip window)
    assert worst["smax"] <= CLIP_WINDOW, worst


@pytest.mark.full
def test_calibration_is_stable_across_seeds():
    """Same distribution, different draws: ranges agree within the margin —
    the envelope is a property of the weights, not of the sampled prompts."""
    pipe = _make_pipe()
    a = np.random.RandomState(1).randn(2, 8, 32).astype(np.float32)
    b = np.random.RandomState(2).randn(2, 8, 32).astype(np.float32)
    scales_a = jax.tree.map(np.copy, _calibrate(pipe, a))
    scales_b = _calibrate(pipe, b)
    for (path, va), vb in zip(jax.tree_util.tree_leaves_with_path(scales_a),
                              jax.tree.leaves(scales_b)):
        name = jax.tree_util.keystr(path)
        if "a_smax" in name:
            assert float(np.max(np.abs(vb - va))) <= CLIP_WINDOW, name
        else:
            hi = float(np.max(vb / np.maximum(va, 1e-12)))
            # same-distribution draws should sit near the margin; use the
            # structural threshold to keep the guard draw-noise-proof
            assert hi <= _amax_bound(name), (name, hi)


@pytest.mark.full
def test_video_calibration_covers_kv_path():
    """max_latent_length>1 runs a KV-cached encode_frame step during
    calibration (VERDICT r3 next #3c): the sampler must serve T>1 with the
    merged scales, and the merged stats must only WIDEN the T=1 envelope."""
    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(noise_scheduler=sched, quantize=True,
                            video_mixer_rank=8, **TINY)
    h, w = model.latent_hw
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "time": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    params = jax.jit(model.init)(
        rngs, jnp.zeros((2, 2, h, w, 4)), jnp.zeros((2, 8, 32)))["params"]
    pipe = NOVAPipeline(model, params, sched)
    embeds = np.random.RandomState(3).randn(2, 8, 32).astype(np.float32)
    s1 = jax.tree.map(np.copy, _calibrate(pipe, embeds))
    pipe.act_scales = None
    s2 = pipe.calibrate(prompt_embeds=embeds, num_inference_steps=4,
                        num_diffusion_steps=3, key=jax.random.PRNGKey(7),
                        max_latent_length=2)
    assert jax.tree_util.tree_structure(s1) == jax.tree_util.tree_structure(s2)
    for (path, v1), v2 in zip(jax.tree_util.tree_leaves_with_path(s1),
                              jax.tree.leaves(s2)):
        assert (np.asarray(v2) >= np.asarray(v1) - 1e-6).all(), \
            jax.tree_util.keystr(path)
    # and the T=2 sampler serves with the merged scales
    out = pipe(prompt_embeds=embeds, num_inference_steps=3,
               num_diffusion_steps=2, guidance_scale=5.0,
               max_latent_length=2, key=jax.random.PRNGKey(1),
               output_type="latent")
    assert np.isfinite(np.asarray(out.latents)).all()
