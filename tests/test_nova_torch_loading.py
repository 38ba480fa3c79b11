"""Reference-checkpoint loading for NOVATransformer: numerics + structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nova_pointcloud_tpu.models.nova import NOVATransformer  # noqa: E402
from nova_pointcloud_tpu.models.torch_loading import (  # noqa: E402
    _vit_block,
    load_torch_nova_weights,
)
from nova_pointcloud_tpu.models.vit import Block  # noqa: E402
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler  # noqa: E402


def test_block_matches_reference_math():
    """Our Block == the reference's post-sublayer-norm block
    (x = x + LN(Attn(x)); x = x + LN(MLP(x)), `vision_transformer.py:89-92`)
    computed with torch ops and transplanted weights."""
    tn = torch.nn
    torch.manual_seed(0)
    dim, heads = 64, 4
    qkv, proj = tn.Linear(dim, dim * 3), tn.Linear(dim, dim)
    norm1, norm2 = tn.LayerNorm(dim), tn.LayerNorm(dim)
    fc1, fc2 = tn.Linear(dim, dim * 4), tn.Linear(dim * 4, dim)
    x_t = torch.randn(2, 10, dim)
    with torch.no_grad():
        q, k, v = qkv(x_t).view(2, 10, 3, heads, dim // heads).permute(
            2, 0, 3, 1, 4).unbind(0)
        o = tn.functional.scaled_dot_product_attention(q, k, v)
        attn_out = proj(o.transpose(1, 2).flatten(2))
        h = norm1(attn_out) + x_t
        ref = (norm2(fc2(tn.functional.gelu(fc1(h)))) + h).numpy()

    sd = {}
    for name, mod in [("attn.qkv", qkv), ("attn.proj", proj),
                      ("norm1", norm1), ("norm2", norm2),
                      ("mlp.fc1", fc1), ("mlp.fc2", fc2)]:
        sd[f"b.{name}.weight"] = mod.weight.detach()
        sd[f"b.{name}.bias"] = mod.bias.detach()
    params = jax.tree.map(jnp.asarray, _vit_block(sd, "b"))
    out, _ = Block(dim, heads).apply({"params": params},
                                     jnp.asarray(x_t.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=5e-3)


def test_video_mixer_matches_reference_math():
    """encode_video's mixer call == the reference's
    ``mixer(first_frame_states, later_frame_states)`` with eps=None
    (`transformer_3d.py:180-181`, `transformer_nova.py:89`,
    `normalization.py:31-36`), via transplanted torch weights."""
    tn = torch.nn
    torch.manual_seed(1)
    dim, rank = 32, 8
    lora = tn.Linear(dim, rank, bias=False)
    proj = tn.Linear(rank, 2 * dim)
    with torch.no_grad():
        proj.weight.mul_(0.5)  # nonzero so the test can't pass trivially
        proj.bias.normal_(0, 0.1)
    s = torch.randn(2, 3, 5, dim)  # (B, T, Nv, D) post-encoder states
    first, later = s[:, :1], s[:, 1:]
    with torch.no_grad():
        stats = proj(lora(tn.functional.silu(later)))
        scale, shift = stats.chunk(2, dim=-1)
        # eps=None -> norm is identity; x=first broadcasts over the T-1 axis
        ref = first * (1 + scale) + shift
        ref_full = torch.cat([first, ref], 1).numpy()

    from nova_pointcloud_tpu.models.normalization import AdaLayerNorm
    from nova_pointcloud_tpu.models.torch_loading import _ada_zero

    sd = {"m.proj.weight": proj.weight.detach(),
          "m.proj.bias": proj.bias.detach(),
          "m.lora.weight": lora.weight.detach()}
    params = {"ada": jax.tree.map(jnp.asarray, _ada_zero(sd, "m"))}
    mixer = AdaLayerNorm(dim, rank, eps=None)
    sj = jnp.asarray(s.numpy())
    mixed = mixer.apply({"params": params}, sj[:, :1], sj[:, 1:])
    out = jnp.concatenate([sj[:, :1], mixed], 1)
    np.testing.assert_allclose(np.asarray(out), ref_full, atol=1e-5, rtol=1e-5)


def _fake_state_dict(model: NOVATransformer) -> dict:
    """Reference-named random state_dict shaped for ``model``."""
    from nova_pointcloud_tpu.models.nova import MLP_ARCHES, VIT_ARCHES

    rng = np.random.RandomState(0)
    sd = {}

    def put(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

    def linear(name, i, o, bias=True):
        put(f"{name}.weight", o, i)
        if bias:
            put(f"{name}.bias", o)

    def ln(name, d):
        put(f"{name}.weight", d)
        put(f"{name}.bias", d)

    def vit(prefix, depth, d, heads):
        for i in range(depth):
            linear(f"{prefix}.blocks.{i}.attn.qkv", d, 3 * d)
            linear(f"{prefix}.blocks.{i}.attn.proj", d, d)
            ln(f"{prefix}.blocks.{i}.norm1", d)
            ln(f"{prefix}.blocks.{i}.norm2", d)
            linear(f"{prefix}.blocks.{i}.mlp.fc1", d, 4 * d)
            linear(f"{prefix}.blocks.{i}.mlp.fc2", 4 * d, d)
        ln(f"{prefix}.norm", d)

    dv, wv, hv = VIT_ARCHES[model.arch[0]]
    di, wi, hi = VIT_ARCHES[model.arch[1]]
    dd, wd = MLP_ARCHES[model.arch[2]]
    c, vp, ip = model.image_dim, model.video_patch_size, model.patch_size
    put("video_encoder.patch_embed.proj.weight", wv, c, vp, vp)
    put("video_encoder.patch_embed.proj.bias", wv)
    put("image_encoder.patch_embed.proj.weight", wi, c, ip, ip)
    put("image_encoder.patch_embed.proj.bias", wi)
    vit("video_encoder", dv, wv, hv)
    vit("image_encoder", di, wi, hi)
    # diffusion mlp
    put("image_decoder.patch_embed.proj.weight", wd, c, ip, ip)
    put("image_decoder.patch_embed.proj.bias", wd)
    for pr in ("timestep_proj", "condition_proj"):
        i = 256 if pr == "timestep_proj" else wi
        linear(f"image_decoder.time_cond_embed.{pr}.fc1", i, wd)
        linear(f"image_decoder.time_cond_embed.{pr}.fc2", wd, wd)
    for i in range(dd):
        linear(f"image_decoder.blocks.{i}.norm1.proj", wd, 3 * wd)
        linear(f"image_decoder.blocks.{i}.proj.fc1", wd, wd)
        linear(f"image_decoder.blocks.{i}.proj.fc2", wd, wd)
        ln(f"image_decoder.blocks.{i}.norm2", wd)
    linear("image_decoder.norm.proj", wd, 2 * wd)
    linear("image_decoder.head", wd, ip * ip * c)
    put("mask_embed.bos_token", 1, wi)
    put("mask_embed.mask_token", 1, wi)
    put("text_embed.weight", 512, model.text_token_dim)
    linear("text_embed.proj", model.text_token_dim, wi)
    ln("text_embed.norm", wi)
    linear("video_pos_embed.time_proj.0", 256, wv)
    linear("video_pos_embed.time_proj.2", wv, wv)
    ln("video_pos_embed.norm", wv)
    return sd


def test_full_nova_load_structure_and_forward():
    model = NOVATransformer(arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
                            image_dim=4, image_base_size=(4, 4),
                            video_base_size=(1, 2, 2), patch_size=2,
                            text_token_dim=32, text_token_len=8,
                            noise_scheduler=FlowMatchEulerScheduler())
    sd = _fake_state_dict(model)
    loaded = load_torch_nova_weights(model, sd)

    # structure parity with an init tree
    rngs = {n: jax.random.PRNGKey(i) for i, n in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    h, w = model.latent_hw
    ref = jax.jit(model.init)(rngs, jnp.zeros((1, 1, h, w, 4)),
                              jnp.zeros((1, 8, 32)))["params"]
    ref_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(ref)}
    new_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(loaded)}
    assert ref_flat == new_flat

    # loaded weights run the training loss finitely
    losses = model.apply({"params": loaded},
                         jax.random.normal(jax.random.PRNGKey(0), (1, 1, h, w, 4)),
                         jnp.zeros((1, 8, 32)),
                         rngs={k: v for k, v in rngs.items() if k != "params"})
    assert np.isfinite(float(losses["loss"]))
