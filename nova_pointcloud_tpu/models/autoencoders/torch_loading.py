"""Load reference/HF torch AutoencoderKL checkpoints into our flax VAE.

The reference's 2D VAE (`diffnext/models/autoencoders/autoencoder_kl.py`)
ships as torch state_dicts (diffusers layout). This maps those tensors onto
nova_pointcloud_tpu.models.autoencoders.AutoencoderKL param trees:

- Conv2d (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
- Linear (O, I) -> Dense kernel (I, O)
- GroupNorm/LayerNorm weight -> scale
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _np(t):
    return np.asarray(t.float().numpy() if hasattr(t, "float") else t)


def _conv(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{name}.bias"])}


def _dense(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T,
            "bias": _np(sd[f"{name}.bias"])}


def _norm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _resblock(sd, prefix, has_shortcut):
    out = {"norm1": _norm(sd, f"{prefix}.norm1"),
           "conv1": _conv(sd, f"{prefix}.conv1"),
           "norm2": _norm(sd, f"{prefix}.norm2"),
           "conv2": _conv(sd, f"{prefix}.conv2")}
    if has_shortcut:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    return out


def _mid_block(sd, prefix, depth=1):
    out = {"resnets_0": _resblock(sd, f"{prefix}.resnets.0", False)}
    for i in range(depth):
        out[f"resnets_{i + 1}"] = _resblock(sd, f"{prefix}.resnets.{i + 1}",
                                            False)
        a = f"{prefix}.attentions.{i}"
        out[f"attentions_{i}"] = {
            "group_norm": _norm(sd, f"{a}.group_norm"),
            "to_q": _dense(sd, f"{a}.to_q"),
            "to_k": _dense(sd, f"{a}.to_k"),
            "to_v": _dense(sd, f"{a}.to_v"),
            "to_out": _dense(sd, f"{a}.to_out.0"),
        }
    return out


def load_torch_vae_weights(model, state_dict: Dict) -> Dict:
    """Build a param tree for AutoencoderKL from a torch state_dict."""
    sd = state_dict
    dims = list(model.block_out_channels)
    n = len(dims)
    layers = model.layers_per_block

    enc = {"conv_in": _conv(sd, "encoder.conv_in"),
           "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
           "conv_out": _conv(sd, "encoder.conv_out"),
           "mid_block": _mid_block(sd, "encoder.mid_block")}
    for i in range(n):
        in_dim = dims[max(i - 1, 0)]
        for j in range(layers):
            has_sc = j == 0 and in_dim != dims[i]
            enc[f"down_{i}_res_{j}"] = _resblock(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", has_sc)
        if i < n - 1:
            enc[f"down_{i}_resize"] = {"conv": _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}

    rdims = list(reversed(dims))
    dec = {"conv_in": _conv(sd, "decoder.conv_in"),
           "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
           "conv_out": _conv(sd, "decoder.conv_out"),
           "mid_block": _mid_block(sd, "decoder.mid_block")}
    for i in range(n):
        in_dim = rdims[max(i - 1, 0)]
        for j in range(layers + 1):
            has_sc = j == 0 and in_dim != rdims[i]
            dec[f"up_{i}_res_{j}"] = _resblock(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", has_sc)
        if i < n - 1:
            dec[f"up_{i}_resize"] = {"conv": _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}

    params = {"encoder": enc, "decoder": dec}
    if model.use_quant_conv:
        params["quant_conv"] = _conv(sd, "quant_conv")
    if model.use_post_quant_conv:
        params["post_quant_conv"] = _conv(sd, "post_quant_conv")
    return jax.tree.map(jnp.asarray, params)
