"""Load reference NOVA torch checkpoints into NOVATransformer param trees.

The reference ships diffusers-style torch checkpoints for
`NOVATransformer3DModel` (`transformer_nova.py:56`). This maps that
state_dict onto our flax tree:

- torch Linear (O, I)            -> Dense kernel (I, O)
- torch LayerNorm weight/bias    -> scale/bias
- Conv2d patch embeds (O,C,p,p)  -> Dense kernel (p*p*C, O) in our
  (p_h, p_w, c) patchify order (`embeddings.py:152-154` uses the same order)
- ViT blocks (ModuleList)        -> scan-stacked enc_layers/dec_layers halves
- TextEmbed null bank buffer `weight` -> null_prompt param
- Sequential time/motion MLPs `.0/.2` -> our *_fc1/_fc2

Verified by tests/test_nova_torch_loading.py: a torch-math replica of one
reference block reproduces our Block outputs with transplanted weights.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.nova import MLP_ARCHES, VIT_ARCHES, NOVATransformer


def _np(t):
    return np.asarray(t.float().numpy() if hasattr(t, "float") else t)


def _dense(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T,
            "bias": _np(sd[f"{name}.bias"])}


def _dense_nobias(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T}


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _patch_conv(sd, name):
    w = _np(sd[f"{name}.weight"])  # (O, C, p, p)
    o = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, o)  # (p*p*C, O)
    return {"kernel": kernel, "bias": _np(sd[f"{name}.bias"])}


def _stack(items):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *items)


def _vit_block(sd, prefix):
    return {
        "attn": {"qkv": _dense(sd, f"{prefix}.attn.qkv"),
                 "proj": _dense(sd, f"{prefix}.attn.proj")},
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {"fc1": _dense(sd, f"{prefix}.mlp.fc1"),
                "fc2": _dense(sd, f"{prefix}.mlp.fc2")},
    }


def _vit(sd, prefix, depth, encoder_depth: Optional[int] = None):
    enc_depth = depth // 2 if encoder_depth is None else encoder_depth
    blocks = [_vit_block(sd, f"{prefix}.blocks.{i}") for i in range(depth)]
    return {
        "enc_layers": {"block": _stack(blocks[:enc_depth])},
        "dec_layers": {"block": _stack(blocks[enc_depth:])},
        "norm": _ln(sd, f"{prefix}.norm"),
    }


def _ada_zero(sd, prefix, has_lora=False):
    out = {"proj": _dense(sd, f"{prefix}.proj")}
    if has_lora or f"{prefix}.lora.weight" in sd:
        out["lora"] = _dense_nobias(sd, f"{prefix}.lora")
    return out


def _projector(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.fc1"),
            "fc2": _dense(sd, f"{prefix}.fc2")}


def _diffusion_mlp(sd, prefix, depth):
    out = {
        "patch_proj": _patch_conv(sd, f"{prefix}.patch_embed.proj"),
        "time_cond_embed": {
            "timestep_proj": _projector(sd, f"{prefix}.time_cond_embed.timestep_proj"),
            "condition_proj": _projector(sd, f"{prefix}.time_cond_embed.condition_proj"),
        },
        "norm": _ada_zero(sd, f"{prefix}.norm"),
        "head": _dense(sd, f"{prefix}.head"),
    }
    for i in range(depth):
        out[f"blocks_{i}"] = {
            "norm1": _ada_zero(sd, f"{prefix}.blocks.{i}.norm1"),
            "proj": _projector(sd, f"{prefix}.blocks.{i}.proj"),
            "norm2": _ln(sd, f"{prefix}.blocks.{i}.norm2"),
        }
    return out


def load_torch_nova_weights(model: NOVATransformer, state_dict: Dict) -> Dict:
    """Build a NOVATransformer param tree from a reference state_dict."""
    sd = state_dict
    dv = VIT_ARCHES[model.arch[0]][0]
    di = VIT_ARCHES[model.arch[1]][0]
    dd = MLP_ARCHES[model.arch[2]][0]

    params = {
        "video_patch_embed": {"proj": _patch_conv(sd, "video_encoder.patch_embed.proj")},
        "image_patch_embed": {"proj": _patch_conv(sd, "image_encoder.patch_embed.proj")},
        "video_encoder": _vit(sd, "video_encoder", dv),
        "image_encoder": _vit(sd, "image_encoder", di),
        "image_decoder": _diffusion_mlp(sd, "image_decoder", dd),
        "mask_tokens": {"bos_token": _np(sd["mask_embed.bos_token"]),
                        "mask_token": _np(sd["mask_embed.mask_token"])},
    }
    if "text_embed.proj.weight" in sd:
        params["text_embed"] = {"null_prompt": _np(sd["text_embed.weight"]),
                                "proj": _dense(sd, "text_embed.proj"),
                                "norm": _ln(sd, "text_embed.norm")}
    if "label_embed.weight" in sd:
        params["label_embed"] = {"weight": _np(sd["label_embed.weight"]),
                                 "norm": _ln(sd, "label_embed.norm")}
    if not model.rotary_pos_embed:
        params["video_pos_embed"] = {
            "time_fc1": _dense(sd, "video_pos_embed.time_proj.0"),
            "time_fc2": _dense(sd, "video_pos_embed.time_proj.2"),
            "time_norm": _ln(sd, "video_pos_embed.norm"),
        }
    if "motion_embed.flow_proj.0.weight" in sd:
        params["motion_embed"] = {
            "flow_fc1": _dense(sd, "motion_embed.flow_proj.0"),
            "flow_fc2": _dense(sd, "motion_embed.flow_proj.2"),
            "fps_fc1": _dense(sd, "motion_embed.fps_proj.0"),
            "fps_fc2": _dense(sd, "motion_embed.fps_proj.2"),
        }
    if "video_encoder.mixer.proj.weight" in sd:
        params["mixer"] = {"ada": _ada_zero(sd, "video_encoder.mixer")}
    return jax.tree.map(jnp.asarray, params)
