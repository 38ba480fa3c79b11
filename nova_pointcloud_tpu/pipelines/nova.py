"""NOVA text-to-image / text-to-video inference pipeline.

Behavioral parity with `diffnext/pipelines/nova/pipeline_nova.py:54-239`:
cosine mask schedule, CFG prompt expansion with learned-null negatives,
the frames x AR-steps x diffusion-steps generation stack, image-prompt
prefill, and flow-shift control.

TPU-first: the entire per-frame sampler is ONE jitted lax.scan over AR steps
with an inner lax.scan over diffusion steps. Prediction sets are fixed-size
padded slices of a random order permutation (ops/masking), the canvas lives
in patch space, and CFG rides a batch-dim expansion. The reference's three
Python loops with per-step dynamic shapes (`transformer_3d.py:106,123,149`)
compile here to a single XLA program per (config, batch) pair.
"""

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.embeddings import unpatchify
from nova_pointcloud_tpu.models.guidance import GuidanceConfig
from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.schedulers.flow_match import FlowMatchEulerScheduler


@dataclasses.dataclass
class NOVAPipelineOutput:
    """Parity with `pipeline_utils.py:26-37`."""

    images: Optional[Any] = None
    frames: Optional[Any] = None
    latents: Optional[Any] = None


class NOVAPipeline:
    """Orchestrates a NOVATransformer + schedulers + (optional) VAE/encoder."""

    def __init__(self, model: NOVATransformer, params, scheduler,
                 vae=None, vae_params=None, text_encoder=None, mesh=None):
        from nova_pointcloud_tpu.utils.image_processor import VaeImageProcessor

        self.model = model
        self.params = params
        self.scheduler = scheduler
        self.vae = vae
        self.image_processor = VaeImageProcessor(vae, vae_params)
        self.text_encoder = text_encoder
        # multi-chip inference (BASELINE north-star: "shards the d48
        # transformer over ICI for the 1.4B model"): Megatron TP specs on
        # the scanned ViT stacks + batch on "data" inside the jitted
        # sampler; XLA places the qkv/MLP all-reduces on ICI.
        self.mesh = mesh
        # phased MAE-gather encoder in the AR sampler (see _make_sampler);
        # exposed for A/B tests and debugging. bucket_fracs are the static
        # visible-bucket divisors per phase (largest-first); a finer leading
        # bucket (e.g. (16, 8, 4, 2)) shortens the early-AR encoder passes
        # at the cost of one more compiled phase.
        self.enable_bucket_phases = True
        self.bucket_fracs = (8, 4, 2)
        # guidance truncation as a static two-phase diffusion scan (half
        # batch on the truncated tail); False falls back to the where-select
        # in guidance.combine — used by the equivalence test
        self.enable_trunc_split = True
        # calibrated static activation scales + softmax offsets (calibrate())
        self.act_scales = None
        self._samplers: Dict[Tuple, Any] = {}
        # jit everything touching params: eager dispatch is slow on TPU hosts
        self._embed_text = jax.jit(
            lambda p, e: model.apply({"params": p}, e, method=model.embed_text))
        self._null_text = jax.jit(
            lambda p, b, l: model.apply({"params": p}, b, l,
                                        method=model.null_text),
            static_argnums=(1, 2))
        self._embed_motion = jax.jit(
            lambda p, b, flow, fps: model.apply(
                {"params": p}, b, flow, fps, method=model.embed_motion),
            static_argnums=(1,))
        if vae is not None:
            def _enc(p, x, k):
                dist = vae.apply({"params": p}, x, method=vae.encode)
                return vae.scale(dist.sample(k))
            self._encode_image = jax.jit(_enc)

    def enable_host_offload(self) -> None:
        """TPU-native `enable_model_cpu_offload` (`pipeline_nova.py:31`):
        park the VAE and text-encoder weights in pinned HOST memory and
        stream them back into HBM only around their calls. The transformer
        stays resident — it runs every AR step. Frees HBM for bigger
        batches / the 1.4B transformer when serving the full stack
        (Phi-2 text encoder alone is 2.7B params)."""
        from nova_pointcloud_tpu.utils.offload import to_host

        ip = self.image_processor
        if ip.vae_params is not None:
            ip.vae_params = to_host(ip.vae_params)
            ip.host_offload = True
        te = self.text_encoder
        if te is not None and getattr(te, "params", None) is not None:
            te.params = to_host(te.params)
            te.host_offload = True

    # -- prompt handling ------------------------------------------------------
    def encode_prompt(self, prompt: Sequence[str], negative_prompt=None,
                      guidance: GuidanceConfig = GuidanceConfig(),
                      num_images_per_prompt: int = 1,
                      prompt_embeds: Optional[np.ndarray] = None) -> jax.Array:
        """Build the expanded model-dim conditioning (`pipeline_nova.py:175-220`)."""
        if prompt_embeds is None:
            prompt_embeds, _ = self.text_encoder.encode(list(prompt))
        c_cond = self._embed_text(self.params, jnp.asarray(prompt_embeds))
        if negative_prompt is not None:
            neg_embeds, _ = self.text_encoder.encode(list(negative_prompt))
            c_null = self._embed_text(self.params, jnp.asarray(neg_embeds))
        else:
            c_null = self._null_text(self.params, c_cond.shape[0], c_cond.shape[1])
        c = guidance.expand_text(c_cond, c_null)
        if num_images_per_prompt > 1:
            c = jnp.repeat(c, num_images_per_prompt, axis=0)
        return c

    def encode_image(self, image: np.ndarray, key: Optional[jax.Array] = None,
                     num_images_per_prompt: int = 1) -> jax.Array:
        """Encode an image prompt to scaled latents (`pipeline_nova.py:222-239`).

        image: (H, W, 3) uint8 -> (N, h, w, C) latents for the i2v prefill.
        The posterior is SAMPLED like the reference (`latent_dist.sample`),
        with a fixed key when none is given so the call stays deterministic;
        the whole encode is one jitted program (eager dispatch is ~50ms/op
        on this host).
        """
        x = jnp.asarray(image, jnp.float32) / 127.5 - 1.0
        key = key if key is not None else jax.random.PRNGKey(0)
        z = self._encode_image(self.image_processor.device_params(), x[None],
                               key)
        return jnp.repeat(z, num_images_per_prompt, axis=0)

    # -- sampler construction --------------------------------------------------
    def _make_sampler(self, batch: int, num_inference_steps: int,
                      num_diffusion_steps: int, max_latent_length: int,
                      guidance: GuidanceConfig, flow_shift: Optional[float],
                      prefill: bool):
        model, scheduler = self.model, self.scheduler
        ni, pd = model.num_image_tokens, model.patch_dim
        nv = model.num_video_tokens
        S, D, T = num_inference_steps, num_diffusion_steps, max_latent_length
        n_passes = guidance.num_passes
        is_flow = isinstance(scheduler, FlowMatchEulerScheduler)
        sched = scheduler.set_timesteps(
            D, **({"shift": flow_shift} if is_flow and flow_shift else {}))
        ts = jnp.asarray(sched.timesteps, jnp.float32)
        # Guidance truncation as a static batch chop (`guidance_scaler.py:
        # 59-65` maybe_disable): below the trunc timestep the reference keeps
        # only the cond chunk, so later diffusion steps run at 1/num_passes
        # batch. Timesteps are host numpy at trace time, so the boundary is a
        # static split of the inner diffusion scan: phase 1 runs the CFG
        # steps at num_passes x batch, phase 2 the truncated tail cond-only.
        # (The pc sampler got this in round 3; VERDICT r3 missing #2.)
        n_cfg_d = D
        if (self.enable_trunc_split and guidance.enabled
                and guidance.guidance_trunc > 0):
            n_cfg_d = int(np.sum(np.asarray(sched.timesteps)
                                 >= guidance.guidance_trunc))
        counts = masking.cosine_pred_counts(S, ni)
        # the reference drops zero-prediction steps and decays guidance over
        # the surviving count (`transformer_3d.py:120-124` all_num_preds);
        # counts are host numpy, so the scan length stays static.
        counts = counts[counts > 0]
        S = len(counts)
        starts, pad_p = masking.pred_boundaries(counts)
        counts_a = jnp.asarray(counts, jnp.int32)
        starts_a = jnp.asarray(starts, jnp.int32)
        # Phased MAE gather for the encoder half (round-3 t2i/t2v serving):
        # during sampling the visible count grows 0 -> ni over the AR steps
        # and the encoder half only needs visible tokens (the reference
        # gathers them, `vision_transformer.py:133-143`). lax.scan needs
        # uniform shapes, so the AR scan is split into phases with one
        # STATIC visible bucket each (ni/8, ni/4, ni/2, then the full
        # masking path) — numerically equal to full-length masking
        # (models/vit.py use_gather; tests/test_mae_gather.py), with the
        # early-phase encoder half at a fraction of the sequence length.
        bucket_phases = None
        if self.enable_bucket_phases and S > 1 and ni >= 64:
            plan, s_cur = [], 0
            for frac in self.bucket_fracs:
                bucket = ni // frac
                if bucket < 8:  # too small to be worth a compiled phase
                    continue
                # last step whose visible count still fits this bucket
                end = int(np.searchsorted(starts, bucket, side="right"))
                if end > s_cur:
                    plan.append((s_cur, end, bucket))
                    s_cur = end
            if s_cur < S:
                plan.append((s_cur, S, None))
            if len(plan) > 1:
                bucket_phases = plan

        def sched_step(pred, j, t, x, key):
            if is_flow:
                return scheduler.step(pred, j, x, sched)
            return scheduler.step(pred, t.astype(jnp.int32), x, key=key,
                                  schedule=sched)

        act_scales = self.act_scales
        act_margin = getattr(self, "_act_margin", 1.0)

        def sample(params, c_text, key, latents0=None):
            variables = {"params": params}
            if (getattr(model, "quantize", False)
                    and jax.default_backend() == "tpu"):
                # int8 weights once per call, OUTSIDE the AR/diffusion scans
                # (ops/quantization.quantize_serving_params docstring)
                from nova_pointcloud_tpu.ops.quantization import (
                    merge_act_scales, quantize_serving_params)
                qp = quantize_serving_params(params)
                if act_scales is not None:
                    # calibrated static activation scales + softmax offsets:
                    # fused kernels skip per-row amax reduces and attention
                    # runs the static-max kernel (calibrate())
                    qp = merge_act_scales(qp, act_scales, margin=act_margin)
                variables["qparams"] = qp
            apply = lambda method, *a, **kw: model.apply(  # noqa: E731
                variables, *a, method=method, **kw)

            def generate_frame(cond, key):
                """One frame: scan over AR steps (`transformer_3d.py:115-133`)."""
                k_order, k_loop = jax.random.split(key)
                order = masking.random_pred_order(k_order, batch, ni)
                canvas0 = jnp.zeros((batch, ni, pd), jnp.float32)
                mask0 = jnp.ones((batch, ni, 1), jnp.float32)

                def ar_body(carry, i, bucket=None):
                    canvas, mask, key = carry
                    key, k_noise, k_diff = jax.random.split(key, 3)
                    scale = guidance.decayed_scale((i + 1.0) / S)
                    tokens = apply(model.tokens_from_patches, canvas)
                    tokens_e = jnp.tile(tokens, (n_passes, 1, 1))
                    mask_e = jnp.tile(mask, (n_passes, 1, 1))
                    z = apply(model.encode_image_step, tokens_e, mask_e, cond,
                              visible_bucket=bucket)
                    ids, valid = masking.pred_slice(order, starts_a[i],
                                                    counts_a[i], pad_p)
                    ids_e = jnp.tile(ids, (n_passes, 1))
                    z_sel = jnp.take_along_axis(z, ids_e[..., None], axis=1)
                    x_t = jax.random.normal(k_noise, (batch, pad_p, pd), jnp.float32)

                    # STG: the 3rd pass is PERTURBED — it skips the middle
                    # decoder block (DiffusionMLP stg_rows), so combine's
                    # (cond - perturb) term is nonzero. The reference ships
                    # this as a silent no-op (stg_skip only exists in its
                    # unused DiT); fixed per policy.
                    # Only when the 3rd pass IS the STG pass: guidance off
                    # means n_passes == 1 (perturbing would corrupt the lone
                    # cond pass), and image guidance wins the 3rd-pass slot
                    # in combine() (`guidance_scaler.py:74-87`).
                    stg_rows = (batch if (guidance.enabled
                                          and guidance.spatiotemporal_guidance_scale
                                          and not guidance.image_guidance_scale)
                                else None)

                    def diff_body(carry, j):
                        x_t, key = carry
                        key, kd = jax.random.split(key)
                        t = ts[j]
                        pred = apply(model.denoise_step, guidance.expand(x_t),
                                     jnp.full((batch * n_passes,), t), z_sel,
                                     stg_rows=stg_rows)
                        pred = guidance.combine(pred.astype(jnp.float32), scale, t)
                        x_t = sched_step(pred, j, t, x_t, kd)
                        return (x_t, key), None

                    def diff_body_trunc(carry, j):
                        # truncated tail: cond-only denoise at 1x batch
                        # (z_sel layout is [cond | uncond | extra], so the
                        # leading chunk is the conditional pass)
                        x_t, key = carry
                        key, kd = jax.random.split(key)
                        t = ts[j]
                        pred = apply(model.denoise_step, x_t,
                                     jnp.full((batch,), t), z_sel[:batch])
                        x_t = sched_step(pred.astype(jnp.float32), j, t,
                                         x_t, kd)
                        return (x_t, key), None

                    carry_d = (x_t, k_diff)
                    if n_cfg_d > 0:
                        carry_d, _ = jax.lax.scan(diff_body, carry_d,
                                                  jnp.arange(n_cfg_d))
                    if n_cfg_d < D:
                        carry_d, _ = jax.lax.scan(diff_body_trunc, carry_d,
                                                  jnp.arange(n_cfg_d, D))
                    x_t, _ = carry_d
                    pred_mask = masking.scatter_mask(ids, valid, ni)
                    onehot = jax.nn.one_hot(ids, ni, dtype=jnp.float32)
                    onehot = onehot * valid[..., None]
                    scattered = jnp.einsum("bpn,bpd->bnd", onehot, x_t)
                    canvas = canvas * (1.0 - pred_mask) + scattered
                    return (canvas, mask * (1.0 - pred_mask), key), None

                carry = (canvas0, mask0, k_loop)
                if bucket_phases is None:
                    carry, _ = jax.lax.scan(ar_body, carry, jnp.arange(S))
                else:
                    for s_b, s_e, bucket in bucket_phases:
                        carry, _ = jax.lax.scan(partial(ar_body, bucket=bucket),
                                                carry, jnp.arange(s_b, s_e))
                return carry[0]

            nb = batch * n_passes
            if T == 1:
                if prefill:
                    # i2v degenerate case: frame 0 is the given image and
                    # there is nothing to generate (the reference's frame
                    # loop skips prefilled frames)
                    return latents0[:, None]
                bos = apply(model.bos_frame, nb)  # (nB, 1, Nv, D)
                cond = apply(model.encode_video, bos, c_text, 1)
                return generate_frame(cond, key)[:, None]  # (B, 1, Ni, pd)

            # temporal AR with KV caches (`transformer_3d.py:135-164`).
            # Frame 0 (BOS + text prefix) is a prologue; frames 1..T-1 run as
            # ONE lax.scan body, so the per-frame encoder + AR sampler nest
            # compiles once regardless of T (a Python unroll at T=9 stalls
            # the remote TPU compiler; see CLAUDE.md).
            text_len = c_text.shape[1]
            caches = model.init_video_caches(nb, text_len, T)
            key, k_frame0 = jax.random.split(key)
            tokens = apply(model.bos_frame, nb)[:, 0]
            bos_value = tokens[:1, :1]
            tokens = apply(model.frame_tokens, tokens, 0, T)
            if guidance.image_guidance_scale and guidance.enabled:
                # image-free middle pass = RAW bos, no time/space PE — the
                # reference's expand(padding=bos) runs after PE, frame 0
                # included (`transformer_3d.py:155-157`)
                raw = jnp.broadcast_to(
                    bos_value, (batch,) + tokens.shape[1:]).astype(tokens.dtype)
                tokens = jnp.concatenate(
                    [tokens[:batch], raw, tokens[2 * batch:]], axis=0)
            states0, caches = apply(model.encode_frame, tokens, c_text,
                                    caches, 0, 0)
            states_star = states0 if model.video_mixer_rank is not None else None
            latent0 = latents0 if prefill else generate_frame(states0, k_frame0)

            def frame_body(carry, t_idx):
                caches, cache_index, latent_prev, key = carry
                key, k_frame = jax.random.split(key)
                frame = unpatchify(latent_prev, model.patch_size,
                                   model.image_base_size)
                vtok = apply(model.embed_video_frame, frame)
                # PE first, expand after: the reference's image-guidance
                # pass-2 padding is the RAW bos token — its expand
                # (`transformer_3d.py:157`) runs after time/space PE was
                # added, so the padded pass carries no positional embedding.
                # (Also cheaper: frame_tokens runs at 1x batch.)
                tokens = apply(model.frame_tokens, vtok, t_idx, T)
                tokens = guidance.expand(tokens, padding=bos_value)
                states, caches = apply(model.encode_frame, tokens, None,
                                       caches, cache_index, t_idx)
                cond = states
                if model.video_mixer_rank is not None:
                    cond = apply(model.mix_states, states_star, states)
                latent = generate_frame(cond, k_frame)
                return (caches, cache_index + nv, latent, key), latent

            carry0 = (caches, jnp.int32(text_len + nv), latent0, key)
            _, rest = jax.lax.scan(frame_body, carry0, jnp.arange(1, T))
            rest = jnp.moveaxis(rest, 0, 1)  # (B, T-1, Ni, pd)
            return jnp.concatenate([latent0[:, None], rest], axis=1)

        if self.mesh is None:
            return jax.jit(sample)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nova_pointcloud_tpu.parallel.sharding import (batch_sharding,
                                                           param_sharding)
        mesh = self.mesh
        rep = NamedSharding(mesh, P())
        p_shard = param_sharding(self.params, mesh)
        in_sh = [p_shard, batch_sharding(mesh, 3), rep]
        if prefill:
            in_sh.append(batch_sharding(mesh, 3))
        return jax.jit(sample, in_shardings=tuple(in_sh),
                       out_shardings=batch_sharding(mesh, 4))

    # -- calibration --------------------------------------------------------------
    def calibrate(self, prompt: Optional[Sequence[str]] = None,
                  negative_prompt: Optional[Sequence[str]] = None,
                  prompt_embeds: Optional[np.ndarray] = None,
                  num_inference_steps: int = 16,
                  num_diffusion_steps: int = 25,
                  guidance_scale: float = 5.0,
                  key: Optional[jax.Array] = None,
                  margin: float = 1.05,
                  max_latent_length: int = 1):
        """Record activation ranges + max attention logits over one real
        (shortened) AR sampling trajectory; fold them into every subsequent
        sampler as static int8 scales and static softmax offsets.

        Runs the actual masked-AR algorithm (encoder pass, padded pred
        slice, diffusion loop, scatter) through mutable-"act_stats" applies
        — the block mirrors (models/vit.Block._calibration_mlp,
        models/diffusion_mlp.DiffusionBlock._calibration_forward) and the
        attention logit sow (models/vit.Attention). A 16-step schedule
        covers the same mask-ratio range as the 64-step one; activation
        ranges are mask-ratio-, not step-count-, dependent. One-time per
        loaded checkpoint; backend-agnostic."""
        from nova_pointcloud_tpu.ops.quantization import max_merge_stats

        model, scheduler = self.model, self.scheduler
        if isinstance(prompt, str):
            prompt = [prompt]
        key = key if key is not None else jax.random.PRNGKey(0)
        guidance = GuidanceConfig(guidance_scale=guidance_scale)
        c = self.encode_prompt(prompt, negative_prompt, guidance,
                               prompt_embeds=prompt_embeds)
        n_passes = guidance.num_passes
        batch = c.shape[0] // n_passes
        nb = batch * n_passes
        ni, pd = model.num_image_tokens, model.patch_dim
        D = num_diffusion_steps
        is_flow = isinstance(scheduler, FlowMatchEulerScheduler)
        sched = scheduler.set_timesteps(D)
        ts = jnp.asarray(sched.timesteps, jnp.float32)
        counts = masking.cosine_pred_counts(num_inference_steps, ni)
        counts = counts[counts > 0]
        S = len(counts)
        starts, pad_p = masking.pred_boundaries(counts)

        @jax.jit
        def prologue(params, c):
            bos = model.apply({"params": params}, nb, method=model.bos_frame)
            cond, vs = model.apply({"params": params}, bos, c, 1,
                                   method=model.encode_video,
                                   mutable=["act_stats"])
            return cond, vs["act_stats"]

        @jax.jit
        def ar_step(params, canvas, mask, cond, order, i_start, i_count,
                    scale, key):
            k_noise, k_diff = jax.random.split(key)
            tokens = model.apply({"params": params}, canvas,
                                 method=model.tokens_from_patches)
            tokens_e = jnp.tile(tokens, (n_passes, 1, 1))
            mask_e = jnp.tile(mask, (n_passes, 1, 1))
            z, vs_enc = model.apply({"params": params}, tokens_e, mask_e,
                                    cond, method=model.encode_image_step,
                                    mutable=["act_stats"])
            ids, valid = masking.pred_slice(order, i_start, i_count, pad_p)
            ids_e = jnp.tile(ids, (n_passes, 1))
            z_sel = jnp.take_along_axis(z, ids_e[..., None], axis=1)
            x_t = jax.random.normal(k_noise, (batch, pad_p, pd), jnp.float32)

            def dstats_shape():
                return model.apply(
                    {"params": params}, guidance.expand(x_t),
                    jnp.full((nb,), ts[0]), z_sel,
                    method=model.denoise_step, mutable=["act_stats"]
                )[1]["act_stats"]

            stats0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  jax.eval_shape(dstats_shape))

            def diff_body(carry, j):
                x_t, key, stats = carry
                key, kd = jax.random.split(key)
                t = ts[j]
                pred, vs = model.apply(
                    {"params": params}, guidance.expand(x_t),
                    jnp.full((nb,), t), z_sel,
                    method=model.denoise_step, mutable=["act_stats"])
                stats = jax.tree.map(jnp.maximum, stats, vs["act_stats"])
                pred = guidance.combine(pred.astype(jnp.float32), scale, t)
                if is_flow:
                    x_t = scheduler.step(pred, j, x_t, sched)
                else:
                    x_t = scheduler.step(pred, t.astype(jnp.int32), x_t,
                                         key=kd, schedule=sched)
                return (x_t, key, stats), None

            (x_t, _, dstats), _ = jax.lax.scan(
                diff_body, (x_t, k_diff, stats0), jnp.arange(D))
            pred_mask = masking.scatter_mask(ids, valid, ni)
            onehot = jax.nn.one_hot(ids, ni, dtype=jnp.float32)
            onehot = onehot * valid[..., None]
            scattered = jnp.einsum("bpn,bpd->bnd", onehot, x_t)
            canvas = canvas * (1.0 - pred_mask) + scattered
            return (canvas, mask * (1.0 - pred_mask),
                    vs_enc["act_stats"], dstats)

        cond, stats = prologue(self.params, c)
        key, k_order = jax.random.split(key)
        order = masking.random_pred_order(k_order, batch, ni)
        canvas = jnp.zeros((batch, ni, pd), jnp.float32)
        mask = jnp.ones((batch, ni, 1), jnp.float32)
        for i in range(S):
            key, k_step = jax.random.split(key)
            scale = guidance.decayed_scale((i + 1.0) / S)
            canvas, mask, senc, sdiff = ar_step(
                self.params, canvas, mask, cond,
                order, jnp.int32(starts[i]), jnp.int32(counts[i]),
                jnp.asarray(scale, jnp.float32), k_step)
            stats = max_merge_stats(stats, max_merge_stats(senc, sdiff))

        if max_latent_length > 1:
            # t2v: calibrate the KV-cached video-encoder path too (VERDICT
            # r3 next #3c). Frame 0's ranges come from the non-cached
            # prologue above; this runs frame 0 -> frame 1 through
            # encode_frame with live caches so the later-frame MLP quant
            # sites are recorded on a REAL sampled frame. (The cached
            # attention core stays dynamic — the a_smax sow is cache-gated
            # — and the 2-frame time table's range transfer to longer T
            # rides the clip margin.)
            nv, text_len = model.num_video_tokens, c.shape[1]

            @jax.jit
            def video_cal(params, canvas, c):
                caches = model.init_video_caches(nb, text_len, 2)
                bos = model.apply({"params": params}, nb,
                                  method=model.bos_frame)[:, 0]
                tok0 = model.apply({"params": params}, bos, 0, 2,
                                   method=model.frame_tokens)
                (_, caches), vs0 = model.apply(
                    {"params": params}, tok0, c, caches, 0, 0,
                    method=model.encode_frame, mutable=["act_stats"])
                frame = unpatchify(canvas, model.patch_size,
                                   model.image_base_size)
                vtok = model.apply({"params": params}, frame,
                                   method=model.embed_video_frame)
                tok1 = model.apply({"params": params}, vtok, 1, 2,
                                   method=model.frame_tokens)
                tok1 = jnp.tile(tok1, (n_passes, 1, 1))
                (_, _), vs1 = model.apply(
                    {"params": params}, tok1, None, caches,
                    jnp.int32(text_len + nv), 1,
                    method=model.encode_frame, mutable=["act_stats"])
                return max_merge_stats(vs0["act_stats"], vs1["act_stats"])

            stats = max_merge_stats(
                stats, video_cal(self.params, canvas, c))
        self.act_scales = jax.tree.map(
            lambda a: np.asarray(a, np.float32), stats)
        # amax sites get clipping headroom; merge_act_scales exempts the
        # a_smax logit offsets from the multiplicative margin
        self._act_margin = margin
        self._samplers.clear()  # rebuilt with static scales merged
        return self.act_scales

    def _get_sampler(self, **kw):
        key = tuple(sorted((k, str(v)) for k, v in kw.items()))
        key += (("bucket_phases", self.enable_bucket_phases),
                ("bucket_fracs", self.bucket_fracs),
                ("trunc_split", self.enable_trunc_split),
                ("static_acts", self.act_scales is not None))
        if key not in self._samplers:
            self._samplers[key] = self._make_sampler(**kw)
        return self._samplers[key]

    # -- main entry -------------------------------------------------------------
    def __call__(
        self,
        prompt: Optional[Sequence[str]] = None,
        num_inference_steps: int = 64,
        num_diffusion_steps: int = 25,
        max_latent_length: int = 1,
        guidance_scale: float = 5.0,
        guidance_trunc: float = 0.0,
        guidance_renorm: float = 1.0,
        image_guidance_scale: float = 0.0,
        spatiotemporal_guidance_scale: float = 0.0,
        min_guidance_scale: Optional[float] = None,
        flow_shift: Optional[float] = None,
        negative_prompt: Optional[Sequence[str]] = None,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[np.ndarray] = None,
        output_type: str = "latent",
        motion_flow: Optional[float] = 5.0,
        fps: Optional[float] = None,
    ) -> NOVAPipelineOutput:
        if isinstance(prompt, str):
            prompt = [prompt]
        key = key if key is not None else jax.random.PRNGKey(0)
        guidance = GuidanceConfig(
            guidance_scale=guidance_scale, guidance_trunc=guidance_trunc,
            guidance_renorm=guidance_renorm,
            image_guidance_scale=image_guidance_scale,
            spatiotemporal_guidance_scale=spatiotemporal_guidance_scale,
            min_guidance_scale=min_guidance_scale)
        c = self.encode_prompt(prompt, negative_prompt, guidance,
                               num_images_per_prompt, prompt_embeds)
        if (motion_flow is not None and self.model.video_base_size[0] > 1
                and "motion_embed" in self.params):
            # motion flow/fps conditioning tokens appended to the text
            # prefix (`transformer_3d.py:74-76`, app_nova_t2v.py:155).
            # Defaults to 5 like the reference (`pipeline_nova.py:67`):
            # video checkpoints are trained WITH motion conditioning, so
            # omitting it would serve out-of-distribution. Gated on the
            # MODEL being a video model — the reference appends motion
            # whenever `self.motion_embed` exists (`transformer_3d.py:73`),
            # even for a 1-frame render; image models never have it — AND
            # on the params actually carrying the embed (flax materializes
            # it only for checkpoints trained with motion conditioning).
            # Pass None to disable explicitly.
            nb = c.shape[0]
            m = self._embed_motion(
                self.params, nb,
                jnp.full((nb,), float(motion_flow), jnp.float32),
                None if fps is None else jnp.full((nb,), float(fps),
                                                  jnp.float32))
            c = jnp.concatenate([c, m.astype(c.dtype)], axis=1)
        if self.mesh is not None:
            # _embed_text committed c to one device; re-place it on the mesh
            # (jit in_shardings refuses committed args with foreign layout)
            from nova_pointcloud_tpu.parallel.sharding import batch_sharding

            c = jax.device_put(c, batch_sharding(self.mesh, 3))
        batch = c.shape[0] // guidance.num_passes
        prefill = latents is not None
        sampler = self._get_sampler(
            batch=batch, num_inference_steps=num_inference_steps,
            num_diffusion_steps=num_diffusion_steps,
            max_latent_length=max_latent_length, guidance=guidance,
            flow_shift=flow_shift, prefill=prefill)
        if prefill:
            from nova_pointcloud_tpu.models.embeddings import patchify

            latents0 = patchify(jnp.asarray(latents), self.model.patch_size)
            # positional: jit in_shardings (mesh mode) bind positionally
            out = sampler(self.params, c, key, latents0)
        else:
            out = sampler(self.params, c, key)
        # (B, T, Ni, pd) -> (B, T, H, W, C) latent frames
        b, t = out.shape[:2]
        frames = unpatchify(out.reshape((b * t,) + out.shape[2:]),
                            self.model.patch_size, self.model.image_base_size)
        frames = frames.reshape((b, t) + frames.shape[1:])
        if output_type == "latent":
            x = frames[:, 0] if max_latent_length == 1 else frames
            return NOVAPipelineOutput(latents=x)
        if max_latent_length == 1:
            decoded = self.image_processor.decode_latents(frames[:, 0])
            return NOVAPipelineOutput(
                images=self.image_processor.postprocess(decoded, output_type))
        decoded = self.image_processor.decode_latents(frames)
        return NOVAPipelineOutput(
            frames=self.image_processor.postprocess(decoded, "np"))
