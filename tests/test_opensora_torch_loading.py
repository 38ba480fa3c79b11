"""Torch-checkpoint loading for the OpenSoraPlan causal 3D VAE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_opensora import (  # noqa: E402
    AutoencoderKLOpenSora,
    CausalConv3d,
    FrameAttention,
)
from nova_pointcloud_tpu.models.autoencoders.torch_loading import (  # noqa: E402
    _conv3d,
    _dense,
    _norm,
    load_torch_opensora_weights,
)


def test_frame_attention_matches_torch():
    """FrameAttention == the reference Attention's frame-window path
    (`autoencoder_kl_opensora.py:41-66`) with transplanted weights."""
    tn = torch.nn
    torch.manual_seed(0)
    dim = 64
    gn = tn.GroupNorm(32, dim, eps=1e-6)
    to_q, to_k, to_v, to_out = [tn.Linear(dim, dim) for _ in range(4)]
    x_t = torch.randn(1, dim, 3, 4, 4)  # (B, C, T, H, W)
    with torch.no_grad():
        y = gn(x_t)
        # frame windows: (B, C, T, H, W) -> (B*T, H*W, C)
        y = y.permute(0, 2, 3, 4, 1).flatten(0, 1).flatten(1, 2).contiguous()
        q, k, v = to_q(y), to_k(y), to_v(y)
        o = tn.functional.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None])[:, 0]
        o = to_out(o)  # (B*T, H*W, C)
        ref = o.view(1, 3, 4, 4, dim).numpy()  # (B, T, H, W, C)

    sd = {"a.group_norm.weight": gn.weight.detach(),
          "a.group_norm.bias": gn.bias.detach()}
    for name, mod in [("to_q", to_q), ("to_k", to_k), ("to_v", to_v),
                      ("to_out", to_out)]:
        sd[f"a.{name}.weight"] = mod.weight.detach()
        sd[f"a.{name}.bias"] = mod.bias.detach()
    params = jax.tree.map(jnp.asarray, {
        "group_norm": _norm(sd, "a.group_norm"),
        "to_q": _dense(sd, "a.to_q"), "to_k": _dense(sd, "a.to_k"),
        "to_v": _dense(sd, "a.to_v"), "to_out": _dense(sd, "a.to_out")})
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    out = FrameAttention(dim, 1).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_causal_conv3d_matches_torch():
    """CausalConv3d == reference Conv3d with front replication pad
    (`autoencoder_kl_opensora.py:28-39`)."""
    tn = torch.nn
    torch.manual_seed(1)
    conv = tn.Conv3d(8, 16, 3, 1, (0, 1, 1))
    pad = tn.ReplicationPad3d((0,) * 4 + (2, 0))
    x_t = torch.randn(1, 8, 4, 6, 6)
    with torch.no_grad():
        ref = conv(pad(x_t)).numpy().transpose(0, 2, 3, 4, 1)
    sd = {"c.weight": conv.weight.detach(), "c.bias": conv.bias.detach()}
    params = jax.tree.map(jnp.asarray, {"conv": _conv3d(sd, "c")})
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    out = CausalConv3d(16, (3, 3, 3)).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def _tiny_osp_state_dict(dims=(32, 32, 64, 64), layers=1, lat=4):
    """Reference-named random state_dict for a tiny 2D+3D+3D config."""
    rng = np.random.RandomState(0)
    sd = {}

    def put(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.05

    def conv2d(name, i, o, k=3):
        put(f"{name}.weight", o, i, k, k)
        put(f"{name}.bias", o)

    def conv3d(name, i, o, k=3):
        kk = (k, k, k) if isinstance(k, int) else k
        put(f"{name}.weight", o, i, *kk)
        put(f"{name}.bias", o)

    def gn(name, d):
        put(f"{name}.weight", d)
        put(f"{name}.bias", d)

    def lin(name, d):
        put(f"{name}.weight", d, d)
        put(f"{name}.bias", d)

    def res(prefix, i, o, conv):
        gn(f"{prefix}.norm1", i)
        conv(f"{prefix}.conv1", i, o)
        gn(f"{prefix}.norm2", o)
        conv(f"{prefix}.conv2", o, o)
        if i != o:
            conv(f"{prefix}.conv_shortcut", i, o, 1)

    types = ["2D", "2D", "3D", "3D"]
    convs = {"2D": conv2d, "3D": conv3d}
    # encoder
    conv2d("encoder.conv_in", 3, dims[0])
    for i, t in enumerate(types):
        cin = dims[max(i - 1, 0)]
        for j in range(layers):
            res(f"encoder.down_blocks.{i}.resnets.{j}",
                cin if j == 0 else dims[i], dims[i], convs[t])
        if i < len(types) - 1:
            convs[types[i + 1]](
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
                dims[i], dims[i])
    for j in range(2):
        res(f"encoder.mid_block.resnets.{j}", dims[-1], dims[-1],
            convs[types[-1]])
    gn("encoder.mid_block.attentions.0.group_norm", dims[-1])
    for nm in ("to_q", "to_k", "to_v"):
        lin(f"encoder.mid_block.attentions.0.{nm}", dims[-1])
    lin("encoder.mid_block.attentions.0.to_out.0", dims[-1])
    gn("encoder.conv_norm_out", dims[-1])
    conv3d("encoder.conv_out", dims[-1], 2 * lat)
    # decoder (reversed order)
    rdims = list(reversed(dims))
    rtypes = list(reversed(types))
    conv3d("decoder.conv_in", lat, rdims[0])
    for j in range(2):
        res(f"decoder.mid_block.resnets.{j}", rdims[0], rdims[0],
            convs[rtypes[0]])
    gn("decoder.mid_block.attentions.0.group_norm", rdims[0])
    for nm in ("to_q", "to_k", "to_v"):
        lin(f"decoder.mid_block.attentions.0.{nm}", rdims[0])
    lin("decoder.mid_block.attentions.0.to_out.0", rdims[0])
    for i, t in enumerate(rtypes):
        cin = rdims[max(i - 1, 0)]
        for j in range(layers + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}",
                cin if j == 0 else rdims[i], rdims[i], convs[t])
        if i < len(rtypes) - 1:
            k = 3 if i < len(rtypes) - 2 or t == "2D" else (1, 3, 3)
            convs[t](f"decoder.up_blocks.{i}.upsamplers.0.conv",
                     rdims[i], rdims[i], k)
    gn("decoder.conv_norm_out", rdims[-1])
    conv2d("decoder.conv_out", rdims[-1], 3)
    conv3d("quant_conv", 2 * lat, 2 * lat, 1)
    conv3d("post_quant_conv", lat, lat, 1)
    return sd


@pytest.mark.full
def test_full_opensora_structural_load():
    model = AutoencoderKLOpenSora(
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D",
                          "DownEncoderBlock3D", "DownEncoderBlock3D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D",
                        "UpDecoderBlock3D", "UpDecoderBlock3D"),
        block_out_channels=(32, 32, 64, 64), layers_per_block=1,
        latent_channels=4, sample_min_t=17, latent_min_t=5)
    sd = _tiny_osp_state_dict()
    loaded = load_torch_opensora_weights(model, sd)

    x = jnp.zeros((1, 5, 32, 32, 3))
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    ref_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(ref)}
    new_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(loaded)}
    assert ref_flat == new_flat

    recon, dist = model.apply({"params": loaded},
                              jax.random.normal(jax.random.PRNGKey(1), x.shape))
    assert recon.shape == x.shape
    assert np.isfinite(np.asarray(recon)).all()
