"""NOVA core: masked-AR transformer with a per-token diffusion head.

Behavioral parity with the reference's model stack:
- `diffnext/models/transformers/transformer_3d.py` (Transformer3DModel:
  train_video / generate_video / generate_frame / denoise)
- `diffnext/models/transformers/transformer_nova.py` (arch registries, RoPE vs
  absolute positions, AdaLN video mixer, text/label embed wiring)

Structure: this module owns the parameters and exposes *step methods*
(`train_losses`, `encode_frame`, `encode_image_step`, `denoise_step`, ...)
that the pipelines orchestrate with `lax.scan` under one jit. Three nested
loops (frames x AR steps x diffusion steps) therefore compile to
scan(scan(scan)) with static shapes, instead of the reference's Python loops
(`transformer_3d.py:106,123,149`).
"""

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.diffusion_mlp import DiffusionMLP
from nova_pointcloud_tpu.models.embeddings import (
    MaskTokens,
    MotionEmbed,
    PatchEmbed,
    PosEmbed,
    TextEmbed,
    LabelEmbed,
    VideoPosEmbed,
    patchify,
    rope_positions,
    rope_weights,
)
from nova_pointcloud_tpu.models.normalization import AdaLayerNorm
from nova_pointcloud_tpu.models.vit import VisionTransformer
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.ops.attention import KVCache
from nova_pointcloud_tpu.ops.losses import masked_diffusion_mse

# arch name -> (depth, embed_dim, num_heads); parity with the registries at
# `transformer_nova.py:34-53`
VIT_ARCHES = {
    "vit_d16w768": (16, 768, 12),
    "vit_d16w1024": (16, 1024, 16),
    "vit_d16w1536": (16, 1536, 16),
    "vit_d32w768": (32, 768, 12),
    "vit_d32w1024": (32, 1024, 16),
    "vit_d32w1536": (32, 1536, 16),
    # tiny arches for tests / golden configs
    "vit_d2w64": (2, 64, 2),
    "vit_d4w128": (4, 128, 4),
    "vit_d48w1024": (48, 1024, 16),
    "vit_d48w1536": (48, 1536, 16),
}
MLP_ARCHES = {
    "mlp_d3w1280": (3, 1280),
    "mlp_d6w768": (6, 768),
    "mlp_d6w1024": (6, 1024),
    "mlp_d6w1536": (6, 1536),
    "mlp_d2w64": (2, 64),
    "mlp_d3w128": (3, 128),
}


class NOVATransformer(nn.Module):
    """Unified AR-diffusion core for the image / video frontends.

    Shapes are channels-last: latents (B, T, H, W, C); T=1 for images.
    """

    arch: Tuple[str, str, str]  # (video_encoder, image_encoder, image_decoder)
    image_dim: int = 4  # latent channels
    image_base_size: Tuple[int, int] = (16, 16)  # image patches (h, w)
    video_base_size: Tuple[int, int, int] = (1, 8, 8)  # (t, vh, vw) video patches
    patch_size: int = 2
    text_token_dim: Optional[int] = None
    text_token_len: int = 256
    num_classes: Optional[int] = None  # label conditioning (C2I) if no text
    rotary_pos_embed: bool = False
    video_mixer_rank: Optional[int] = None
    loss_repeat: int = 4
    noise_scheduler: Any = None  # DDPMScheduler | FlowMatchEulerScheduler
    remat: bool = False
    attn_impl: str = "auto"
    quantize: bool = False  # int8 fused-MLP serving in both ViTs (vit.Block)
    dtype: Any = None
    pp_runner: Any = None  # pipeline-parallel stack runner (training)
    attn_core: str = "bf16"  # static-softmax score-matmul precision (vit.Attention)
    num_experts: int = 0  # >1: MoE encoder MLPs (models/moe.py), EP-shardable

    # -- derived sizes ------------------------------------------------------
    @property
    def video_patch_size(self) -> int:
        return self.patch_size * 2  # `transformer_nova.py:76`

    @property
    def num_image_tokens(self) -> int:
        return self.image_base_size[0] * self.image_base_size[1]

    @property
    def num_video_tokens(self) -> int:  # per frame
        return self.video_base_size[1] * self.video_base_size[2]

    @property
    def latent_hw(self) -> Tuple[int, int]:
        return (self.image_base_size[0] * self.patch_size,
                self.image_base_size[1] * self.patch_size)

    @property
    def patch_dim(self) -> int:
        return self.patch_size**2 * self.image_dim

    @property
    def embed_dim(self) -> int:
        return VIT_ARCHES[self.arch[1]][1]

    @property
    def head_dim_v(self) -> int:
        _, w, h = VIT_ARCHES[self.arch[0]]
        return w // h

    @property
    def head_dim_i(self) -> int:
        _, w, h = VIT_ARCHES[self.arch[1]]
        return w // h

    def setup(self):
        dv, wv, hv = VIT_ARCHES[self.arch[0]]
        di, wi, hi = VIT_ARCHES[self.arch[1]]
        dd, wd = MLP_ARCHES[self.arch[2]]
        if wv != wi:
            raise ValueError("video/image encoder widths must match "
                             f"({self.arch[0]} vs {self.arch[1]})")
        self.video_patch_embed = PatchEmbed(wv, self.video_patch_size)
        self.image_patch_embed = PatchEmbed(wi, self.patch_size)
        self.video_encoder = VisionTransformer(dv, wv, hv, remat=self.remat,
                                               attn_impl=self.attn_impl,
                                               quantize=self.quantize,
                                               dtype=self.dtype,
                                               pp_runner=self.pp_runner,
                                               attn_core=self.attn_core,
                                               num_experts=self.num_experts)
        self.image_encoder = VisionTransformer(di, wi, hi, remat=self.remat,
                                               attn_impl=self.attn_impl,
                                               quantize=self.quantize,
                                               dtype=self.dtype,
                                               pp_runner=self.pp_runner,
                                               attn_core=self.attn_core,
                                               num_experts=self.num_experts)
        self.image_decoder = DiffusionMLP(dd, wd, cond_dim=wi,
                                          out_dim=self.patch_dim,
                                          quantize=self.quantize,
                                          dtype=self.dtype)
        self.mask_tokens = MaskTokens(wi)
        if self.text_token_dim:
            self.text_embed = TextEmbed(self.text_token_dim, wi,
                                        self.text_token_len)
        if self.num_classes and not self.text_token_dim:
            self.label_embed = LabelEmbed(wi, self.num_classes)
        if not self.rotary_pos_embed:
            self.video_pos_embed = VideoPosEmbed(wv, self.video_base_size)
            self.image_pos_embed = PosEmbed(wi, self.image_base_size)
        if self.video_base_size[0] > 1:
            self.motion_embed = MotionEmbed(wv)
        if self.video_mixer_rank is not None:
            self.mixer = AdaLayerNorm(wv, max(self.video_mixer_rank, 0) or None,
                                      eps=None)

    # -- conditioning -------------------------------------------------------
    def embed_text(self, text_embeds: jax.Array,
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
        """Raw encoder states -> model-dim text tokens (+ train CFG dropout)."""
        if dropout_rng is not None:
            text_embeds = self.text_embed.drop_prompts(text_embeds, dropout_rng)
        return self.text_embed(text_embeds)

    def null_text(self, batch: int, length: Optional[int] = None) -> jax.Array:
        """Model-dim null-prompt tokens (CFG negatives)."""
        return self.text_embed(self.text_embed.null_embeds(batch, length))

    def embed_label(self, labels: jax.Array,
                    dropout_rng: Optional[jax.Array] = None) -> jax.Array:
        return self.label_embed(labels, dropout_rng)

    def embed_motion(self, batch: int, flow=None, fps=None) -> jax.Array:
        return self.motion_embed(batch, flow, fps)

    # -- positional tables (pure; no params) --------------------------------
    def video_rope(self, num_frames: int, pad: int = 0):
        if not self.rotary_pos_embed:
            return None
        pos = rope_positions(num_frames, self.video_base_size[1:])
        return rope_weights(pos, self.head_dim_v, pad=pad)

    def image_rope(self, pad: int = 0):
        if not self.rotary_pos_embed:
            return None
        pos = rope_positions(1, self.image_base_size)
        return rope_weights(pos, self.head_dim_i, pad=pad)

    # -- TAM: temporal AR over frames ----------------------------------------
    def bos_frame(self, batch: int) -> jax.Array:
        """(B, 1, Nv, D) raw BOS tokens, no pos (`transformer_3d.py:152,172`)."""
        return self.mask_tokens.bos((batch, 1, self.num_video_tokens))

    def frame_tokens(self, tokens: jax.Array, frame_index,
                     total_frames: int) -> jax.Array:
        """Add per-frame time + space pos to raw (B, Nv, D) tokens (decode).

        The time table is built over ``total_frames`` so per-frame rows match
        the teacher-forced training tables (`embeddings.py:103-111`).
        ``frame_index`` may be traced (the sampler scans over frames). No-op
        for RoPE models (positions applied inside attention).
        """
        if self.rotary_pos_embed:
            return tokens
        table = self.video_pos_embed.time_embed(total_frames)  # (T, 1, D)
        row = jnp.take(table, frame_index, axis=0)
        tokens = tokens + row.astype(tokens.dtype)
        return self.video_pos_embed(tokens, add_time=False)

    def embed_video_frame(self, x_frame: jax.Array) -> jax.Array:
        """(B, H, W, C) -> raw (B, Nv, D) video patch tokens."""
        return self.video_patch_embed(x_frame)

    def encode_video(self, c_vid: jax.Array, c_text: Optional[jax.Array],
                     num_frames: int) -> jax.Array:
        """Teacher-forced video encoding with a block-causal mask.

        c_vid: (B, T, Nv, D) RAW [BOS, frames 0..T-2] tokens (pos added here,
        after the BOS concat, so time indices line up); returns states
        (B, T*Nv, D) after the optional AdaLN mixer (`transformer_3d.py:169-181`).
        """
        b, t, nv, d = c_vid.shape
        if not self.rotary_pos_embed:
            c_vid = self.video_pos_embed(c_vid)
        c_len = 0 if c_text is None else c_text.shape[1]
        bias = masking.block_causal_bias((nv,) * t, c_len) if t > 1 else None
        rope = self.video_rope(t, pad=c_len)
        states, _ = self.video_encoder(c_vid.reshape(b, t * nv, d), c=c_text,
                                       bias=bias, rope=rope)
        if self.video_mixer_rank is not None and t > 1:
            # mixer(x=first-frame states, z=later-frame states): the first
            # frame's states are re-modulated by stats from each later frame
            # (`transformer_3d.py:180-181` splits [1, T-1] and calls
            # mixer(first, later); x broadcasts over the T-1 axis).
            s = states.reshape(b, t, nv, d)
            mixed = self.mixer(s[:, :1], s[:, 1:])
            states = jnp.concatenate([s[:, :1], mixed], 1).reshape(b, t * nv, d)
        return states

    # -- MAM: masked AR within a frame ---------------------------------------
    def encode_image_step(self, tokens: jax.Array, mask: jax.Array,
                          cond: jax.Array,
                          visible_bucket: Optional[int] = None) -> jax.Array:
        """Masked-token image encoding for one AR step / training pass.

        tokens: (B, Ni, D) patch embeddings (NO pos yet); mask (B, Ni, 1) with
        1 = masked; cond (B, Lc, D) video/text states. Mask token substitution
        happens BEFORE pos add, matching `transformer_3d.py:125` +
        `vision_transformer.py:131`. ``visible_bucket``: static upper bound on
        the visible count — the encoder half then gathers visible tokens like
        the reference (`vision_transformer.py:133-143`) instead of masking the
        full sequence.
        """
        z = self.mask_tokens.apply_mask(tokens, mask)
        if not self.rotary_pos_embed:
            z = self.image_pos_embed(z)
        visible = 1.0 - mask[..., 0]
        rope = self.image_rope(pad=cond.shape[1]) if cond is not None else self.image_rope()
        z, _ = self.image_encoder(z, c=cond, visible=visible, rope=rope,
                                  visible_bucket=visible_bucket)
        return z

    def image_tokens(self, x: jax.Array) -> jax.Array:
        """(B, H, W, C) latent canvas -> (B, Ni, D) patch tokens (no pos)."""
        return self.image_patch_embed(x)

    def tokens_from_patches(self, patches: jax.Array) -> jax.Array:
        """(B, Ni, patch_dim) patchified canvas -> (B, Ni, D) tokens.

        Lets the sampler keep its canvas in patch space (pure reshapes away
        from pixel space), avoiding patchify/unpatchify churn per AR step.
        """
        return self.image_patch_embed(patches, pre_patchified=True)

    # -- diffusion head -------------------------------------------------------
    def denoise_step(self, x_t: jax.Array, timestep: jax.Array,
                     z: jax.Array, stg_rows: Optional[int] = None) -> jax.Array:
        """One model eval of the per-token diffusion head.

        x_t: (B, P, patch_dim); timestep (B,) or (B, P); z (B, P, D).
        ``stg_rows``: trailing rows forming the STG perturbed pass (they skip
        the middle decoder block; see DiffusionMLP).
        """
        return self.image_decoder(x_t, timestep, z, stg_rows=stg_rows)

    # -- KV-cached frame decode ----------------------------------------------
    def encode_frame(self, tokens: jax.Array, c_text: Optional[jax.Array],
                     caches: List[KVCache], cache_index: jax.Array,
                     frame_index) -> Tuple[jax.Array, List[KVCache]]:
        """Video-encoder pass for one frame with KV caches.

        tokens: (B, Nv, D); text prefix only on frame 0
        (`transformer_3d.py:155`). RoPE positions are the frame's own;
        ``frame_index`` may be traced (frame-scanned sampler).
        """
        pad = 0 if c_text is None else c_text.shape[1]
        rope = None
        if self.rotary_pos_embed:
            off = jnp.asarray([1.0, 0.0, 0.0], jnp.float32) * frame_index
            pos = rope_positions(1, self.video_base_size[1:]) + off
            rope = rope_weights(pos, self.head_dim_v, pad=pad)
        states, caches = self.video_encoder(tokens, c=c_text, rope=rope,
                                            caches=caches,
                                            cache_index=cache_index)
        return states, caches

    def mix_states(self, first: jax.Array, cur: jax.Array) -> jax.Array:
        """AdaLN state mixer at decode (`transformer_3d.py:156-158`).

        mixer(x=first-frame states, z=current-frame states) — the reference
        calls ``mixer(states["*"], c)`` where ``states["*"]`` is frame 0.
        """
        return self.mixer(first, cur)

    # -- training -------------------------------------------------------------
    def train_losses(self, x: jax.Array, text_embeds: Optional[jax.Array] = None,
                     labels: Optional[jax.Array] = None,
                     motion_flow: Optional[jax.Array] = None,
                     fps: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """TAM + MAM + token-wise diffusion loss (`transformer_3d.py:166-190`).

        x: (B, T, H, W, C) clean latents. RNG streams: "mask" (mask ratio +
        order), "time" (timesteps), "noise" (diffusion noise), "dropout"
        (CFG conditioning dropout).
        """
        if x.ndim == 4:
            x = x[:, None]
        b, t = x.shape[:2]
        ni, nv = self.num_image_tokens, self.num_video_tokens

        # conditioning tokens
        c_parts = []
        drop_rng = self.make_rng("dropout") if self.has_rng("dropout") else None
        if self.text_token_dim and text_embeds is not None:
            c_parts.append(self.embed_text(text_embeds, drop_rng))
        if self.num_classes and labels is not None:
            c_parts.append(self.embed_label(labels, drop_rng))
        if t > 1 and self.video_base_size[0] > 1:
            c_parts.append(self.embed_motion(b, motion_flow, fps))
        c_text = jnp.concatenate(c_parts, axis=1) if c_parts else None

        # TAM: [BOS, frames 0..T-2] -> per-frame states
        bov = self.bos_frame(b)
        if t > 1:
            vid = self.video_patch_embed(x[:, : t - 1])
            c_vid = jnp.concatenate([bov, vid], axis=1)
        else:
            c_vid = bov
            if self.is_initializing():
                # materialize video_patch_embed params even for T=1 so image
                # checkpoints stay video-capable (the reference always creates
                # it, `transformer_nova.py:77`)
                _ = self.video_patch_embed(x[:, :1])
        states = self.encode_video(c_vid, c_text, t)  # (B, T*Nv, D)

        # MAM: mask and encode every frame against its own states. Train mask
        # ratios are >= 0.7 (`embeddings.py:280`), so the visible count is
        # bounded by round(0.3*Ni): a static gather bucket recovers the
        # reference's visible-only encoder-half compute.
        z_tok = self.image_patch_embed(x).reshape(b * t, ni, -1)
        mask, _ = masking.sample_train_mask(self.make_rng("mask"), b * t, ni)
        cond = states.reshape(b * t, nv, -1)
        bucket = int(round((1.0 - masking.TRAIN_MASK_RATIO_MIN) * ni))
        z = self.encode_image_step(z_tok, mask, cond,
                                   visible_bucket=max(bucket, 1))  # (B*T, Ni, D)

        # 1D token-wise diffusion with loss_repeat (`transformer_3d.py:79-100`)
        rep = self.loss_repeat
        x_patches = patchify(x.reshape((b * t,) + x.shape[2:]), self.patch_size)
        z_r = jnp.tile(z, (rep, 1, 1))
        x_r = jnp.tile(x_patches, (rep, 1, 1))
        mask_r = jnp.tile(mask, (rep, 1, 1))
        tsteps = self.noise_scheduler.sample_timesteps(
            self.make_rng("time"), z_r.shape[:2])
        noise = jax.random.normal(self.make_rng("noise"), x_r.shape, jnp.float32)
        noised = self.noise_scheduler.add_noise(x_r.astype(jnp.float32), noise, tsteps)
        if isinstance(noised, tuple):  # flow matching returns (x_t, model_t)
            x_t, model_t = noised
            target = noise - x_r.astype(jnp.float32)
        else:
            x_t, model_t = noised, tsteps
            target = noise
        pred = self.denoise_step(x_t.astype(z_r.dtype), model_t, z_r)

        if t > 1:
            err = (pred.astype(jnp.float32) - target) ** 2
            err = jnp.mean(err, axis=-1, keepdims=True) * mask_r
            err = err / (jnp.sum(mask_r) + 1e-5)
            per_frame = err.reshape(rep * b, t, ni).sum(axis=(0, 2))  # (T,)
            return {"loss_t2i": per_frame[0] * t,
                    "loss_i2i": per_frame[1:].sum() * (t / (t - 1))}
        return {"loss": masked_diffusion_mse(pred, target, mask_r)}

    def __call__(self, x: jax.Array, text_embeds: Optional[jax.Array] = None,
                 labels: Optional[jax.Array] = None, **kwargs) -> Dict[str, jax.Array]:
        return self.train_losses(x, text_embeds, labels, **kwargs)

    def init_video_caches(self, batch: int, text_len: int,
                          num_frames: int, dtype=jnp.float32):
        """Stacked (enc, dec) KV caches for the video encoder."""
        depth, width, num_heads = VIT_ARCHES[self.arch[0]]
        max_len = text_len + num_frames * self.num_video_tokens
        head_dim = self.head_dim_v
        enc_depth = depth // 2

        def make(n_layers):
            shape = (n_layers, batch, num_heads, max_len, head_dim)
            return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

        return make(enc_depth), make(depth - enc_depth)
