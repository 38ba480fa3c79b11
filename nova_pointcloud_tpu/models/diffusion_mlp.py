"""Per-token non-quantized diffusion head ("1D token-wise diffusion").

Behavioral parity with `diffnext/models/diffusion_mlp.py:26-99`: 6 AdaLN-gated
MLP blocks conditioned on (timestep, z), final AdaLN + linear head.

TPU-first difference: the reference gathers a dynamic-size token subset by
``pred_ids`` and scatters predictions back (`diffusion_mlp.py:89-99`). Here the
*caller* hands in a fixed-size padded token slice (ops/masking.pred_slice) and
handles the masked scatter — the head itself is a dense shape-static stack
that vmaps/scans cleanly over diffusion steps and CFG passes.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.embeddings import timestep_freq_embed
from nova_pointcloud_tpu.models.normalization import AdaLayerNormZero


class Projector(nn.Module):
    """fc1 -> SiLU -> fc2 (`diffusion_mlp.py:26-36`)."""

    dim: int
    mlp_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.mlp_dim or self.dim, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.out_dim or self.dim, dtype=self.dtype, name="fc2")(nn.silu(h))


class DiffusionBlock(nn.Module):
    """AdaLN-zero gated residual MLP block (`diffusion_mlp.py:39-53`).

    ``quantize`` runs the whole block as one VMEM-resident int8 Pallas
    kernel at serving time (stats projection + modulated LN + silu MLP +
    gated residual; ops/pallas/fused_block.fused_int8_diffusion_block).
    Serving only; identical param tree."""

    dim: int
    quantize: bool = False
    dtype: Any = None

    def setup(self):
        self.norm1 = AdaLayerNormZero(self.dim, num_stats=3)
        self.proj = Projector(self.dim, self.dim, self.dim, dtype=self.dtype)
        # torch nn.LayerNorm default eps (reference diffusion_mlp.py:46)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)

    def _fused(self, x: jax.Array, z: jax.Array) -> jax.Array:
        from nova_pointcloud_tpu.ops.pallas.fused_block import (
            fused_int8_diffusion_block)
        from nova_pointcloud_tpu.ops.quantization import quantize_weight

        n1 = self.norm1.variables["params"]
        pp = self.proj.variables["params"]
        n2 = self.norm2.variables["params"]
        ws = self.get_variable("qparams", "stats_q", None)
        if ws is not None:
            ss = self.get_variable("qparams", "stats_s")
            w1, s1 = (self.get_variable("qparams", "fc1_q"),
                      self.get_variable("qparams", "fc1_s"))
            w2, s2 = (self.get_variable("qparams", "fc2_q"),
                      self.get_variable("qparams", "fc2_s"))
        else:
            ws, ss = quantize_weight(n1["proj"]["kernel"])
            w1, s1 = quantize_weight(pp["fc1"]["kernel"])
            w2, s2 = quantize_weight(pp["fc2"]["kernel"])
        return fused_int8_diffusion_block(
            x, z, ws, ss, n1["proj"]["bias"], w1, s1, pp["fc1"]["bias"],
            w2, s2, pp["fc2"]["bias"], n2["scale"], n2["bias"],
            a_z=self.get_variable("qparams", "a_z", None),
            a_h=self.get_variable("qparams", "a_h", None),
            a_silu=self.get_variable("qparams", "a_silu", None),
            n2_eps=1e-5)

    def _calibration_forward(self, x: jax.Array, z: jax.Array) -> jax.Array:
        """XLA mirror of the fused int8 block recording the three quant-site
        activation ranges ("a_z" post-silu cond, "a_h" post-AdaLN hidden,
        "a_silu" post-silu mid) into the mutable "act_stats" collection
        (ops/quantization.merge_act_scales). Backend-agnostic."""
        from nova_pointcloud_tpu.ops.quantization import (int8_matmul,
                                                          quantize_weight)

        def record(name, v):
            self.sow("act_stats", name,
                     jnp.max(jnp.abs(v)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))

        n1 = self.norm1.variables["params"]
        pp = self.proj.variables["params"]
        d = x.shape[-1]
        zf = nn.silu(z.astype(jnp.float32))
        record("a_z", zf)
        stats = int8_matmul(zf, quantize_weight(n1["proj"]["kernel"]),
                            jnp.float32) + n1["proj"]["bias"]
        scale, shift, gate = jnp.split(stats, 3, axis=-1)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * (1.0 + scale) + shift
        record("a_h", h)
        a = nn.silu(int8_matmul(h, quantize_weight(pp["fc1"]["kernel"]),
                                jnp.float32) + pp["fc1"]["bias"])
        record("a_silu", a)
        o = int8_matmul(a, quantize_weight(pp["fc2"]["kernel"]),
                        jnp.float32) + pp["fc2"]["bias"]
        return (self.norm2(o) * gate + xf).astype(x.dtype)

    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        if (self.quantize and not self.is_initializing()
                and self.is_mutable_collection("act_stats")):
            return self._calibration_forward(x, z)
        if (self.quantize and not self.is_initializing()
                and jax.default_backend() == "tpu"):
            return self._fused(x, z)
        h, (gate,) = self.norm1(x, z)
        h = self.proj(h)
        return self.norm2(h) * gate + x


class TimeCondEmbed(nn.Module):
    """Fused timestep + condition embedding (`diffusion_mlp.py:56-75`)."""

    cond_dim: int
    embed_dim: int
    freq_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, timestep: jax.Array, z: jax.Array) -> jax.Array:
        freq = timestep_freq_embed(timestep, self.freq_dim).astype(z.dtype)
        t = Projector(self.freq_dim, self.embed_dim, self.embed_dim,
                      dtype=self.dtype, name="timestep_proj")(freq)
        if t.ndim == z.ndim - 1:
            t = t[:, None]
        return Projector(self.cond_dim, self.embed_dim, self.embed_dim,
                         dtype=self.dtype, name="condition_proj")(z) + t


class DiffusionMLP(nn.Module):
    """Dense per-token diffusion head.

    Inputs: x (B, P, in_dim) noisy patch tokens; timestep (B,) or (B, P);
    z (B, P, cond_dim) AR-transformer conditioning. Output (B, P, in_dim).
    """

    depth: int
    embed_dim: int
    cond_dim: int
    out_dim: int  # = patch_size**2 * image_dim (or point patch dim)
    quantize: bool = False  # int8 fused serving blocks (see DiffusionBlock)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array, z: jax.Array,
                 stg_rows: Optional[int] = None) -> jax.Array:
        """``stg_rows``: static count of trailing batch rows forming the
        spatiotemporal-guidance perturbed pass — those rows BYPASS the middle
        block entirely, the semantics of the reference's stg_skip
        (`diffusion_transformer.py:101-110`: the flagged block saves the 3rd
        chunk before and re-concatenates it after). The reference only wires
        stg_skip in its unused DiffusionTransformer, leaving its shipped STG
        pass a no-op; fixed here per policy (SURVEY §7 / VERDICT r3 weak #4).
        """
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_proj")(x)
        zc = TimeCondEmbed(self.cond_dim, self.embed_dim, dtype=self.dtype,
                           name="time_cond_embed")(timestep, z)
        for i in range(self.depth):
            blk = DiffusionBlock(self.embed_dim, quantize=self.quantize,
                                 dtype=self.dtype, name=f"blocks_{i}")
            if stg_rows and i == self.depth // 2:
                # perturbed rows skip this block (and skip its compute)
                h = jnp.concatenate(
                    [blk(h[:-stg_rows], zc[:-stg_rows]), h[-stg_rows:]],
                    axis=0)
            else:
                h = blk(h, zc)
        h, _ = AdaLayerNormZero(self.embed_dim, num_stats=2, name="norm")(h, zc)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="head")(h)
