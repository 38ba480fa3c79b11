"""End-to-end SAME-WEIGHTS sampler parity vs the torch reference pipeline.

VERDICT r2 next #3: block-level loader parity (test_nova_torch_loading) left
"the full composed sampler equals the reference" a conjecture. These tests
run the reference's ACTUAL pipeline code (`/root/reference/diffnext/...`,
imported on CPU torch via tests/_diffusers_shim) against this repo's jitted
samplers with identical inputs and deterministic noise, asserting the whole
composition — CFG batch order, scheduler tables + reverse-step algebra, loop
structure, postprocess — matches end to end.

RNG strategy: cross-framework RNG can't be aligned, so both sides run
deterministically — the shim's randn_tensor returns zeros (zero-variance
DDPM) and this repo's pipelines use deterministic=True; initial latents and
prompt embeddings are injected as the same numpy arrays.

The transformer here is a parity stub implementing identical math in torch
and flax: model-internal numerics are covered by the transplanted-weights
tests (test_nova_torch_loading / test_vae_torch_loading / test_phi), and
the FULL composed sampler against the reference's real
NOVATransformer3DModel (generate_video with MaskEmbed order, MAE gather,
KV caches, mixer) is covered by tests/test_full_sampler_parity.py. The
stub remains only for the pc fork, whose per-point post-LN architecture is
a documented intentional divergence (SURVEY.md §7).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
import _diffusers_shim  # noqa: E402

_diffusers_shim.install(deterministic_randn=True)
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, N, L, STEPS = 2, 64, 8, 5


def _stub_math_np(x_bn3, t_scalar, text_bld):
    """Shared stub denoiser: pred = a*x + b*sin(3x) + g(t)*mean(text)."""
    g = np.cos(np.float32(t_scalar) / 1000.0)
    c = text_bld.mean(axis=1)  # (B, 3)
    return 0.3 * x_bn3 + 0.05 * np.sin(3.0 * x_bn3) + g * c[:, None, :]


class _TorchStub(torch.nn.Module):
    """Reference-side transformer stub: channels-first (B, 3, N) interface
    of `transformer_pointcloud_nova.py` forward."""

    @property
    def device(self):
        return torch.device("cpu")

    @property
    def dtype(self):
        return torch.float32

    def forward(self, x, t, encoder_hidden_states=None, return_dict=False):
        g = torch.cos(t.float() / 1000.0) if torch.is_tensor(t) \
            else np.cos(t / 1000.0)
        c = encoder_hidden_states.mean(dim=1)  # (B, 3)
        pred = 0.3 * x + 0.05 * torch.sin(3.0 * x) + g * c[:, :, None]
        return (pred,)


class _FlaxStub(nn.Module):
    """This repo's channels-last (B, N, 3) interface."""

    @nn.compact
    def __call__(self, x, t, text, deterministic=True):
        g = jnp.cos(t.astype(jnp.float32) / 1000.0)  # (B,)
        c = jnp.mean(text, axis=1)  # (B, 3)
        return 0.3 * x + 0.05 * jnp.sin(3.0 * x) + (g[:, None] * c)[:, None, :]


class _StubTokenizer:
    model_max_length = L

    def __call__(self, prompts, **kw):
        ids = torch.zeros((len(prompts), L), dtype=torch.long)
        return type("T", (), {"input_ids": ids})()


class _StubTextEncoder(torch.nn.Module):
    """Deterministic '' embedding shared with the jax side."""

    def __init__(self, uncond):
        super().__init__()
        self.uncond = torch.as_tensor(uncond)

    def forward(self, input_ids):
        return (self.uncond[: input_ids.shape[0]],)


def _run_reference(latents_np, cond_np, uncond_np, guidance_scale):
    from diffnext.pipelines.nova.pipeline_nova_pointcloud_gen import (
        NOVAPointCloudGenerationPipeline as RefPipe)
    from diffnext.schedulers.scheduling_ddpm import DDPMScheduler as RefDDPM

    pipe = RefPipe(transformer=_TorchStub(),
                   scheduler=RefDDPM(beta_schedule="squaredcos_cap_v2"),
                   text_encoder=_StubTextEncoder(uncond_np),
                   tokenizer=_StubTokenizer(), use_autoregressive=False)
    pipe.tokenizer_max_length = L
    # reference latents are channels-first (B, 3, N), `prepare_latents:310`
    lat = torch.as_tensor(np.swapaxes(latents_np, 1, 2))
    # the standard postprocess draws torch.randn_like (not randn_tensor);
    # zero it like the shim does so both sides are noise-free
    randn_like = torch.randn_like
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    try:
        out = pipe(["a chair"] * B, num_diffusion_steps=STEPS,
                   guidance_scale=guidance_scale, num_points=N,
                   point_cloud_size=N, latents=lat,
                   prompt_embeds=torch.as_tensor(cond_np),
                   use_autoregressive=False, output_type="numpy")
    finally:
        torch.randn_like = randn_like
    return np.stack(out.point_clouds), np.stack(out.colors)


def _run_ours(latents_np, cond_np, uncond_np, guidance_scale):
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    # clip_sample=False: the reference's step() skips its own
    # clip_sample=True config (scheduling_ddpm.py:282-296 has no clip
    # stage — a fork bug vs stock diffusers; ours honors the flag, so
    # matching its BEHAVIOR needs the flag off)
    pipe = NOVAPointCloudGenerationPipeline(
        _FlaxStub(), {}, DDPMScheduler(beta_schedule="squaredcos_cap_v2",
                                       clip_sample=False))
    embeds = (np.concatenate([uncond_np, cond_np])
              if guidance_scale > 1.0 else cond_np)
    out = pipe(prompt_embeds=embeds, num_points=N,
               num_diffusion_steps=STEPS, guidance_scale=guidance_scale,
               key=jax.random.PRNGKey(0), latents=jnp.asarray(latents_np),
               deterministic=True)
    return np.asarray(out.point_clouds), np.asarray(out.colors)


@pytest.mark.parametrize("guidance_scale", [1.0, 3.0])
def test_t2pc_pipeline_matches_reference_end_to_end(guidance_scale):
    rng = np.random.RandomState(0)
    latents = rng.randn(B, N, 3).astype(np.float32)
    cond = rng.randn(B, L, 3).astype(np.float32)
    uncond = rng.randn(B, L, 3).astype(np.float32)

    ref_pts, ref_cols = _run_reference(latents, cond, uncond, guidance_scale)
    got_pts, got_cols = _run_ours(latents, cond, uncond, guidance_scale)
    np.testing.assert_allclose(got_pts, ref_pts, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got_cols, ref_cols, atol=1e-5, rtol=1e-5)


def test_t2i_denoise_chain_matches_reference_with_real_weights():
    """SAME-WEIGHTS composed parity for the t2i token-diffusion chain.

    Builds the reference's real `NOVATransformer3DModel` at a tiny arch
    (registered into its own registries), transplants its state_dict into
    our NOVATransformer via models/torch_loading, then runs the reference's
    ACTUAL `Transformer3DModel.denoise` loop (`transformer_3d.py:103-113`:
    CFG expand -> DiffusionMLP -> guidance scale -> unpatchify -> CFM Euler
    step xD) against our denoise_step/guidance/scheduler composition with
    the same injected noise + conditioning. CFM is deterministic, so the
    full multi-step trajectory must match bitwise-ish."""
    from diffnext.models.guidance_scaler import GuidanceScaler
    from diffnext.models.transformers import transformer_nova as tn
    from diffnext.schedulers.scheduling_cfm import (
        FlowMatchEulerDiscreteScheduler as RefCFM)

    from nova_pointcloud_tpu.models.guidance import GuidanceConfig
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.models.torch_loading import load_torch_nova_weights
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    for reg, fn in ((tn.VIDEO_ENCODERS, tn.video_encoder),
                    (tn.IMAGE_ENCODERS, tn.image_encoder)):
        if not reg.has("vit_d2w64"):
            reg.register("vit_d2w64", fn, depth=2, embed_dim=64, num_heads=4)
    if not tn.IMAGE_DECODERS.has("mlp_d2w64"):
        tn.IMAGE_DECODERS.register("mlp_d2w64", tn.image_decoder,
                                   depth=2, embed_dim=64)

    torch.manual_seed(0)
    ref = tn.NOVATransformer3DModel(
        image_dim=4, image_size=32, image_stride=8, text_token_dim=32,
        text_token_len=8, image_base_size=(4, 4), video_base_size=(2, 2, 2),
        arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64")).eval()
    ref.sample_scheduler = RefCFM(shift=1.0)

    ours = NOVATransformer(arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
                           image_dim=4, image_base_size=(4, 4),
                           video_base_size=(2, 2, 2), patch_size=2,
                           text_token_dim=32, text_token_len=8,
                           noise_scheduler=FlowMatchEulerScheduler())
    params = load_torch_nova_weights(ours, ref.state_dict())

    bsz, steps, gs = 2, 6, 5.0
    ni, pd = ours.num_image_tokens, ours.patch_dim
    h, w = ours.latent_hw
    rng = np.random.RandomState(3)
    z = rng.randn(2 * bsz, ni, 64).astype(np.float32)  # [cond, uncond]
    x0 = rng.randn(bsz, 4, h, w).astype(np.float32)  # channels-first noise

    # reference: its own denoise loop, verbatim. Prime patch_embed's
    # height/width the way generate_frame's first patchify call would.
    ref.sample_scheduler.set_timesteps(steps)
    with torch.no_grad():
        ref.image_encoder.patch_embed(torch.as_tensor(x0))
        ref_out = ref.denoise(torch.as_tensor(z), torch.as_tensor(x0),
                              GuidanceScaler(guidance_scale=gs)).numpy()

    # ours: the pipeline's diff_body composition (pipelines/nova.py:157-166)
    sched = FlowMatchEulerScheduler(shift=1.0)
    s = sched.set_timesteps(steps)
    ts = jnp.asarray(s.timesteps, jnp.float32)
    guidance = GuidanceConfig(guidance_scale=gs)
    # channels-first (B, C, H, W) -> channels-last patchify
    from nova_pointcloud_tpu.models.embeddings import patchify

    x_t = patchify(jnp.asarray(np.moveaxis(x0, 1, -1)), 2)
    for j in range(steps):
        pred = ours.apply({"params": params}, guidance.expand(x_t),
                          jnp.full((2 * bsz,), ts[j]), jnp.asarray(z),
                          method=ours.denoise_step)
        pred = guidance.combine(pred.astype(jnp.float32),
                                jnp.float32(gs), ts[j])
        x_t = sched.step(pred, j, x_t, s)
    np.testing.assert_allclose(np.asarray(x_t), ref_out, atol=2e-4, rtol=2e-4)


def test_stub_math_is_the_same_on_both_frameworks():
    """The parity above is only meaningful if the stubs agree."""
    rng = np.random.RandomState(1)
    x = rng.randn(B, N, 3).astype(np.float32)
    text = rng.randn(B, L, 3).astype(np.float32)
    want = _stub_math_np(x, 500.0, text)
    tres = _TorchStub()(torch.as_tensor(np.swapaxes(x, 1, 2)),
                        torch.tensor(500.0),
                        encoder_hidden_states=torch.as_tensor(text))[0]
    np.testing.assert_allclose(np.swapaxes(tres.numpy(), 1, 2), want,
                               atol=1e-6)
    jres = _FlaxStub().apply({}, jnp.asarray(x), jnp.full((B,), 500.0),
                             jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(jres), want, atol=1e-6)
