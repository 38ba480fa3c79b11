"""Masked-AR point-cloud model: the NOVA engine with a point frontend.

The reference ships two disconnected stacks: the NOVA masked-AR +
token-diffusion engine for images/video (`transformer_3d.py`) and a flat-DDPM
point-cloud fork (`transformer_pointcloud_nova.py`). SURVEY.md §7's design
stance is one engine with modality frontends; this module is the point-cloud
frontend plugged into that engine:

- points (B, N, 3) are patchified into (B, N/p, p*3) tokens
- a VisionTransformer encoder runs MAE-style over visible patch tokens with
  text conditioning (same machinery as the image frontend)
- a DiffusionMLP denoises per-token point patches over the cosine masked-AR
  schedule (ops/masking), exactly like `generate_frame`/`denoise`
  (`transformer_3d.py:102-133`) but over point patches

This is the "generate_pointcloud_autoregressive" the reference *intends*
(`transformer_pointcloud_nova.py:641-700` never runs; its shapes don't
compose) realized with the proven NOVA machinery.
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionMLP
from nova_pointcloud_tpu.models.embeddings import MaskTokens, TextEmbed
from nova_pointcloud_tpu.models.pointcloud import PC_ARCHES, ClusterBlock
from nova_pointcloud_tpu.models.vit import VisionTransformer
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.ops.losses import masked_diffusion_mse

MLP_DEPTH = 6


class NOVAPointCloudARTransformer(nn.Module):
    """Masked-AR + per-token diffusion over point patches."""

    arch: str = "pc_d32w768"
    point_cloud_size: int = 2048
    patch_size: int = 16
    text_token_dim: Optional[int] = None
    text_token_len: int = 32
    num_clusters: int = 8
    loss_repeat: int = 4
    noise_scheduler: Any = None
    remat: bool = False
    quantize: bool = False  # int8 fused serving (ViT MLP + diffusion head)
    dtype: Any = None

    @property
    def num_tokens(self) -> int:
        return self.point_cloud_size // self.patch_size

    @property
    def patch_dim(self) -> int:
        return self.patch_size * 3

    def setup(self):
        depth, dim, heads = PC_ARCHES[self.arch]
        self.embed_dim = dim
        self.patch_proj = nn.Dense(dim, dtype=self.dtype, name="patch_proj")
        self.pos_embed_table = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.num_tokens, dim))
        self.encoder = VisionTransformer(depth, dim, heads, remat=self.remat,
                                         attn_impl="auto",
                                         quantize=self.quantize,
                                         dtype=self.dtype)
        self.decoder = DiffusionMLP(MLP_DEPTH, dim, cond_dim=dim,
                                    out_dim=self.patch_dim,
                                    quantize=self.quantize, dtype=self.dtype)
        self.mask_tokens = MaskTokens(dim)
        self.cluster = ClusterBlock(dim, heads, self.num_clusters,
                                    dtype=self.dtype)
        if self.text_token_dim:
            self.text_embed = TextEmbed(self.text_token_dim, dim,
                                        self.text_token_len)

    # -- frontends ------------------------------------------------------------
    def patchify(self, points: jax.Array) -> jax.Array:
        b, n, _ = points.shape
        return points.reshape(b, n // self.patch_size, self.patch_dim)

    def unpatchify(self, patches: jax.Array) -> jax.Array:
        b = patches.shape[0]
        return patches.reshape(b, self.point_cloud_size, 3)

    def tokens_from_patches(self, patches: jax.Array) -> jax.Array:
        return self.patch_proj(patches)

    def embed_text(self, text_embeds: jax.Array,
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
        if dropout_rng is not None:
            text_embeds = self.text_embed.drop_prompts(text_embeds, dropout_rng)
        return self.text_embed(text_embeds)

    def null_text(self, batch: int, length: Optional[int] = None) -> jax.Array:
        return self.text_embed(self.text_embed.null_embeds(batch, length))

    # -- engine steps -----------------------------------------------------------
    def encode_step(self, tokens: jax.Array, mask: jax.Array,
                    cond: Optional[jax.Array],
                    coords: Optional[jax.Array] = None) -> jax.Array:
        """Masked encoding of patch tokens (one AR step / training pass).

        coords: (B, N/p, 3) patch-center xyz for the cluster summary token
        (the pc fork's geometric prior, `transformer_pointcloud_nova.py:718-756`).
        """
        z = self.mask_tokens.apply_mask(tokens, mask)
        z = z + self.pos_embed_table[:, : z.shape[1]].astype(z.dtype)
        if coords is not None:
            z = z + self.cluster(coords, True).astype(z.dtype)
        visible = 1.0 - mask[..., 0]
        z, _ = self.encoder(z, c=cond, visible=visible)
        return z

    def denoise_step(self, x_t: jax.Array, timestep: jax.Array,
                     z: jax.Array) -> jax.Array:
        return self.decoder(x_t, timestep, z)

    # -- training ----------------------------------------------------------------
    def train_losses(self, points: jax.Array,
                     text_embeds: Optional[jax.Array] = None
                     ) -> Dict[str, jax.Array]:
        """MAM + token diffusion over point patches (`transformer_3d.py:79-100`)."""
        b = points.shape[0]
        patches = self.patchify(points)
        tokens = self.tokens_from_patches(patches)
        coords = jnp.mean(points.reshape(b, self.num_tokens, self.patch_size, 3),
                          axis=2)
        drop_rng = self.make_rng("dropout") if self.has_rng("dropout") else None
        cond = None
        if self.text_token_dim and text_embeds is not None:
            cond = self.embed_text(text_embeds, drop_rng)
        mask, _ = masking.sample_train_mask(self.make_rng("mask"), b,
                                            self.num_tokens)
        # Masked patches must contribute the same coords the sampler's canvas
        # does (zeros) — otherwise the ClusterBlock summary leaks the full
        # ground-truth shape at train time and the encoder sees an input
        # distribution at sampling it was never trained on.
        coords = coords * (1.0 - mask)
        self.sow("intermediates", "train_mask", mask)
        z = self.encode_step(tokens, mask, cond, coords)

        rep = self.loss_repeat
        z_r = jnp.tile(z, (rep, 1, 1))
        x_r = jnp.tile(patches, (rep, 1, 1))
        mask_r = jnp.tile(mask, (rep, 1, 1))
        t = self.noise_scheduler.sample_timesteps(self.make_rng("time"),
                                                  z_r.shape[:2])
        noise = jax.random.normal(self.make_rng("noise"), x_r.shape, jnp.float32)
        noised = self.noise_scheduler.add_noise(x_r.astype(jnp.float32), noise, t)
        if isinstance(noised, tuple):
            x_t, model_t = noised
            target = noise - x_r.astype(jnp.float32)
        else:
            x_t, model_t = noised, t
            target = noise
        pred = self.denoise_step(x_t.astype(z_r.dtype), model_t, z_r)
        return {"loss": masked_diffusion_mse(pred, target, mask_r)}

    def __call__(self, points: jax.Array,
                 text_embeds: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        return self.train_losses(points, text_embeds)
