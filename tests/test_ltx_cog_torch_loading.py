"""Torch-checkpoint loading for the LTX and CogVideoX 3D VAEs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_cogvideox import (  # noqa: E402
    AutoencoderKLCogVideoX)
from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_ltx import (  # noqa: E402
    AutoencoderKLLTXVideo,
    LTXConv3d,
)
from nova_pointcloud_tpu.models.autoencoders.torch_loading import (  # noqa: E402
    _conv3d,
    load_torch_cogvideox_weights,
    load_torch_ltx_weights,
)

rng = np.random.RandomState(7)


def _put(sd, name, *shape):
    sd[name] = rng.randn(*shape).astype(np.float32) * 0.05


def _conv3(sd, name, i, o, k=3):
    _put(sd, f"{name}.weight", o, i, k, k, k)
    _put(sd, f"{name}.bias", o)


def _lin(sd, name, i, o):
    _put(sd, f"{name}.weight", o, i)
    _put(sd, f"{name}.bias", o)


def test_ltx_conv3d_symmetric_matches_torch():
    """causal=False LTXConv3d == torch Conv3d with symmetric replicate pad
    (`autoencoder_kl_ltx.py:29-42`)."""
    tn = torch.nn
    torch.manual_seed(2)
    conv = tn.Conv3d(8, 8, 3, 1, (0, 1, 1))
    pad = tn.ReplicationPad3d((0,) * 4 + (1, 1))
    x_t = torch.randn(1, 8, 4, 6, 6)
    with torch.no_grad():
        ref = conv(pad(x_t)).numpy().transpose(0, 2, 3, 4, 1)
    sd = {"c.weight": conv.weight.detach(), "c.bias": conv.bias.detach()}
    params = jax.tree.map(jnp.asarray, {"conv": _conv3d(sd, "c")})
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    out = LTXConv3d(8, (3, 3, 3), causal=False).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def _ltx_state_dict(enc_dims, enc_depths, dec_dims, dec_depths, lat, patch=4):
    sd = {}

    def res(prefix, d, cond):
        _conv3(sd, f"{prefix}.conv1", d, d)
        _conv3(sd, f"{prefix}.conv2", d, d)
        if cond:
            _put(sd, f"{prefix}.scale_shift_table", 4, d)

    def temb(prefix, d):
        _lin(sd, f"{prefix}.timestep_proj.fc1", 256, d)
        _lin(sd, f"{prefix}.timestep_proj.fc2", d, d)

    _conv3(sd, "encoder.conv_in", 3 * patch**2, enc_dims[0])
    strides = [(1, 2, 2), (2, 1, 1), (2, 2, 2), (2, 2, 2)]
    for i in range(4):
        for j in range(enc_depths[i]):
            res(f"encoder.down_blocks.{i}.resnets.{j}", enc_dims[i], False)
        vol = int(np.prod(strides[i]))
        _conv3(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
               enc_dims[i], enc_dims[i + 1] // vol)
    for j in range(enc_depths[-1]):
        res(f"encoder.mid_block.resnets.{j}", enc_dims[-1], False)
    _conv3(sd, "encoder.conv_out", enc_dims[-1], lat + 1)

    rdims = list(reversed(dec_dims))
    _conv3(sd, "decoder.conv_in", lat, rdims[0])
    temb("decoder.mid_block.time_embed", rdims[0] * 4)
    for j in range(dec_depths[-1]):
        res(f"decoder.mid_block.resnets.{j}", rdims[0], True)
    for i in range(len(dec_depths) - 1):
        out = rdims[i] // 2
        _conv3(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
               rdims[i], out * 8)
        temb(f"decoder.up_blocks.{i}.time_embed", out * 4)
        for j in range(dec_depths[i]):
            res(f"decoder.up_blocks.{i}.resnets.{j}", out, True)
    temb("decoder.time_embed", rdims[-1] * 2)
    _put(sd, "decoder.scale_shift_table", 2, rdims[-1])
    sd["decoder.timestep_scale"] = np.float32(1000.0)
    _conv3(sd, "decoder.conv_out", rdims[-1], 3 * patch**2)
    return sd


@pytest.mark.full
def test_full_ltx_structural_load():
    model = AutoencoderKLLTXVideo(
        block_out_channels=(8, 16, 16, 32, 32),
        layers_per_block=(1, 1, 1, 1, 1),
        decoder_block_out_channels=(4, 8, 16, 32),
        decoder_layers_per_block=(1, 1, 1, 1),
        latent_channels=8, patch_size=4)
    sd = _ltx_state_dict((8, 16, 16, 32, 32), (1, 1, 1, 1, 1),
                         (4, 8, 16, 32), (1, 1, 1, 1), 8)
    loaded = load_torch_ltx_weights(model, sd)

    x = jnp.zeros((1, 9, 64, 64, 3))
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    ref_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(ref)}
    new_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(loaded)}
    assert ref_flat == new_flat

    recon, _ = model.apply({"params": loaded},
                           jax.random.normal(jax.random.PRNGKey(1), x.shape))
    assert recon.shape == x.shape
    assert np.isfinite(np.asarray(recon)).all()


def _cog_state_dict(dims=(32, 32, 32, 64), layers=1, lat=4):
    sd = {}

    def adagn(prefix, d, cond):
        _put(sd, f"{prefix}.weight", d)
        _put(sd, f"{prefix}.bias", d)
        if cond:
            _conv3(sd, f"{prefix}.scale", lat, d, 1)
            _conv3(sd, f"{prefix}.shift", lat, d, 1)

    def res(prefix, i, o, cond):
        adagn(f"{prefix}.norm1", i, cond)
        _conv3(sd, f"{prefix}.conv1", i, o)
        adagn(f"{prefix}.norm2", o, cond)
        _conv3(sd, f"{prefix}.conv2", o, o)
        if i != o:
            _conv3(sd, f"{prefix}.conv_shortcut", i, o, 1)

    n = len(dims)
    _conv3(sd, "encoder.conv_in", 3, dims[0])
    for i in range(n):
        cin = dims[max(i - 1, 0)]
        for j in range(layers):
            res(f"encoder.down_blocks.{i}.resnets.{j}",
                cin if j == 0 else dims[i], dims[i], False)
        if i < n - 1:
            _put(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
                 dims[i], dims[i], 3, 3)
            _put(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv.bias",
                 dims[i])
    for j in range(2):
        res(f"encoder.mid_block.resnets.{j}", dims[-1], dims[-1], False)
    adagn("encoder.conv_norm_out", dims[-1], False)
    _conv3(sd, "encoder.conv_out", dims[-1], 2 * lat)

    rdims = list(reversed(dims))
    _conv3(sd, "decoder.conv_in", lat, rdims[0])
    for j in range(2):
        res(f"decoder.mid_block.resnets.{j}", rdims[0], rdims[0], True)
    for i in range(n):
        cin = rdims[max(i - 1, 0)]
        for j in range(layers + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}",
                cin if j == 0 else rdims[i], rdims[i], True)
        if i < n - 1:
            _put(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
                 rdims[i], rdims[i], 3, 3)
            _put(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv.bias",
                 rdims[i])
    adagn("decoder.conv_norm_out", rdims[-1], True)
    _conv3(sd, "decoder.conv_out", rdims[-1], 3)
    return sd


@pytest.mark.full
def test_full_cogvideox_structural_load():
    model = AutoencoderKLCogVideoX(block_out_channels=(32, 32, 32, 64),
                                   layers_per_block=1, latent_channels=4)
    sd = _cog_state_dict()
    loaded = load_torch_cogvideox_weights(model, sd)

    x = jnp.zeros((1, 5, 32, 32, 3))
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    ref_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(ref)}
    new_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(loaded)}
    assert ref_flat == new_flat

    recon, _ = model.apply({"params": loaded},
                           jax.random.normal(jax.random.PRNGKey(1), x.shape))
    assert recon.shape[0] == 1 and recon.shape[-1] == 3
    assert np.isfinite(np.asarray(recon)).all()
