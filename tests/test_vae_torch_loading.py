"""Torch-checkpoint loading parity for the 2D KL VAE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl import (  # noqa: E402
    AutoencoderKL,
    ResBlock,
    VAEAttention,
)
from nova_pointcloud_tpu.models.autoencoders.torch_loading import (  # noqa: E402
    _conv,
    _dense,
    _norm,
    load_torch_vae_weights,
)


def test_resblock_matches_torch():
    """Our ResBlock with transplanted weights == torch GN-SiLU-Conv math."""
    tn = torch.nn
    torch.manual_seed(0)
    norm1, conv1 = tn.GroupNorm(32, 64, eps=1e-6), tn.Conv2d(64, 64, 3, 1, 1)
    norm2, conv2 = tn.GroupNorm(32, 64, eps=1e-6), tn.Conv2d(64, 64, 3, 1, 1)
    x_t = torch.randn(1, 64, 8, 8)
    with torch.no_grad():
        h = conv1(tn.functional.silu(norm1(x_t)))
        ref = (conv2(tn.functional.silu(norm2(h))) + x_t).numpy()

    sd = {}
    for name, mod in [("norm1", norm1), ("conv1", conv1),
                      ("norm2", norm2), ("conv2", conv2)]:
        sd[f"p.{name}.weight"] = mod.weight.detach()
        sd[f"p.{name}.bias"] = mod.bias.detach()
    params = {"norm1": _norm(sd, "p.norm1"), "conv1": _conv(sd, "p.conv1"),
              "norm2": _norm(sd, "p.norm2"), "conv2": _conv(sd, "p.conv2")}
    params = jax.tree.map(jnp.asarray, params)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = ResBlock(64).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-4)


def test_attention_matches_torch():
    """VAEAttention with transplanted to_q/k/v/out == torch SDPA block."""
    tn = torch.nn
    torch.manual_seed(1)
    gn = tn.GroupNorm(32, 64, eps=1e-6)
    to_q, to_k, to_v, to_out = [tn.Linear(64, 64) for _ in range(4)]
    x_t = torch.randn(2, 64, 4, 4)
    with torch.no_grad():
        y = gn(x_t).flatten(2).transpose(1, 2)
        q, k, v = to_q(y), to_k(y), to_v(y)
        o = tn.functional.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None])[:, 0]
        ref = to_out(o).transpose(1, 2).reshape(2, 64, 4, 4).numpy()

    sd = {"a.group_norm.weight": gn.weight.detach(),
          "a.group_norm.bias": gn.bias.detach()}
    for name, mod in [("to_q", to_q), ("to_k", to_k), ("to_v", to_v),
                      ("to_out", to_out)]:
        sd[f"a.{name}.weight"] = mod.weight.detach()
        sd[f"a.{name}.bias"] = mod.bias.detach()
    params = {"group_norm": _norm(sd, "a.group_norm"),
              "to_q": _dense(sd, "a.to_q"), "to_k": _dense(sd, "a.to_k"),
              "to_v": _dense(sd, "a.to_v"), "to_out": _dense(sd, "a.to_out")}
    params = jax.tree.map(jnp.asarray, params)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = VAEAttention(64, 1).apply({"params": params}, x)
    # attention output += x is applied by the caller (MidBlock); torch ref
    # here computes the pre-residual value, like our module
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-4)


def test_full_vae_structural_load():
    """A random reference-layout state_dict loads and runs end to end."""
    vae = AutoencoderKL(block_out_channels=(32, 64), latent_channels=4,
                        layers_per_block=1)
    x = jnp.zeros((1, 16, 16, 3))
    ref_params = jax.jit(vae.init)(jax.random.PRNGKey(0), x)["params"]

    # build a torch-layout state_dict with shapes implied by the flax tree
    def to_torch_conv(kernel, bias):
        return torch.randn(*np.asarray(kernel).transpose(3, 2, 0, 1).shape), \
            torch.randn(len(bias))

    rng = np.random.RandomState(0)
    sd = {}

    def emit(path, leaf_tree, torch_prefix):
        sd[f"{torch_prefix}.weight"] = torch.as_tensor(
            rng.randn(*np.asarray(leaf_tree["kernel"]).transpose(
                3, 2, 0, 1).shape).astype(np.float32)) \
            if "kernel" in leaf_tree and np.asarray(
                leaf_tree["kernel"]).ndim == 4 else torch.as_tensor(
            rng.randn(*reversed(np.asarray(
                leaf_tree.get("kernel", leaf_tree.get("scale"))).shape
                if "kernel" in leaf_tree else
                np.asarray(leaf_tree["scale"]).shape)).astype(np.float32)) \
            if "kernel" in leaf_tree else torch.as_tensor(
            rng.randn(*np.asarray(leaf_tree["scale"]).shape).astype(np.float32))
        sd[f"{torch_prefix}.bias"] = torch.as_tensor(
            rng.randn(*np.asarray(leaf_tree["bias"]).shape).astype(np.float32))

    # walk our tree and emit matching torch names
    name_map = []

    def walk(tree, flax_path):
        if "kernel" in tree or "scale" in tree:
            name_map.append(flax_path)
            return
        for k, v in tree.items():
            walk(v, flax_path + (k,))

    walk(ref_params, ())

    def torch_name(path):
        part = list(path)
        top = part[0]
        if top in ("quant_conv", "post_quant_conv"):
            return top
        rest = part[1:]
        name = []
        for p in rest:
            if p.startswith("down_") and "_res_" in p:
                i, j = p.split("_res_")
                name.append(f"down_blocks.{i.split('_')[1]}.resnets.{j}")
            elif p.startswith("up_") and "_res_" in p:
                i, j = p.split("_res_")
                name.append(f"up_blocks.{i.split('_')[1]}.resnets.{j}")
            elif p.endswith("_resize"):
                i = p.split("_")[1]
                blocks = "down_blocks" if p.startswith("down") else "up_blocks"
                samp = "downsamplers" if p.startswith("down") else "upsamplers"
                name.append(f"{blocks}.{i}.{samp}.0")
            elif p.startswith("resnets_"):
                name.append(f"resnets.{p.split('_')[1]}")
            elif p.startswith("attentions_"):
                name.append(f"attentions.{p.split('_')[1]}")
            elif p == "to_out":
                name.append("to_out.0")
            else:
                name.append(p)
        return ".".join([top] + name)

    for path in name_map:
        leaf = ref_params
        for k in path:
            leaf = leaf[k]
        emit(path, leaf, torch_name(path))

    loaded = load_torch_vae_weights(vae, sd)
    # tree structures and shapes must match the init tree exactly
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_new = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(loaded)}
    assert len(flat_ref) == len(flat_new)
    for p, v in flat_ref:
        key = jax.tree_util.keystr(p)
        assert key in flat_new, key
        assert flat_new[key].shape == v.shape, key
    recon, dist = vae.apply({"params": loaded}, jnp.ones((1, 16, 16, 3)))
    assert np.all(np.isfinite(np.asarray(recon)))
