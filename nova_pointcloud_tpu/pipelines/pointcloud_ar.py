"""Masked-AR text-to-point-cloud pipeline (one jitted scan-of-scans).

The point-cloud realization of the NOVA sampler
(`pipeline_nova.py:129-132` cosine schedule + `transformer_3d.py:115-133`
generate_frame + `:102-113` denoise), over point patches instead of image
patches — the working form of the reference's intended-but-broken AR
generation path (`pipeline_nova_pointcloud_gen.py:212-263`).
"""

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.guidance import GuidanceConfig
from nova_pointcloud_tpu.models.pointcloud_ar import NOVAPointCloudARTransformer
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.pipelines.pointcloud_gen import NOVAPointCloudPipelineOutput
from nova_pointcloud_tpu.schedulers.flow_match import FlowMatchEulerScheduler


class NOVAPointCloudARPipeline:
    """Masked-AR sampler over a NOVAPointCloudARTransformer."""

    def __init__(self, model: NOVAPointCloudARTransformer, params, scheduler,
                 text_encoder=None, normalizer=None):
        self.model = model
        self.params = params
        self.scheduler = scheduler
        self.text_encoder = text_encoder
        self.normalizer = normalizer
        self._samplers: Dict[Tuple, Any] = {}
        self._embed_text = jax.jit(
            lambda p, e: model.apply({"params": p}, e,
                                     method=model.embed_text))
        self._null_text = jax.jit(
            lambda p, b, l: model.apply({"params": p}, b, l,
                                        method=model.null_text),
            static_argnums=(1, 2))

    def _make_sampler(self, batch: int, ar_steps: int, diff_steps: int,
                      guidance: GuidanceConfig):
        model, scheduler = self.model, self.scheduler
        nt, pd = model.num_tokens, model.patch_dim
        n_passes = guidance.num_passes
        is_flow = isinstance(scheduler, FlowMatchEulerScheduler)
        sched = scheduler.set_timesteps(diff_steps)
        ts = jnp.asarray(sched.timesteps, jnp.float32)
        counts = masking.cosine_pred_counts(ar_steps, nt)
        starts, pad_p = masking.pred_boundaries(counts)
        counts_a, starts_a = jnp.asarray(counts, jnp.int32), jnp.asarray(starts)

        def sched_step(pred, j, t, x, key):
            if is_flow:
                return scheduler.step(pred, j, x, sched)
            return scheduler.step(pred, t.astype(jnp.int32), x, key=key,
                                  schedule=sched)

        def sample(params, c_text, key):
            variables = {"params": params}
            if (getattr(model, "quantize", False)
                    and jax.default_backend() == "tpu"):
                from nova_pointcloud_tpu.ops.quantization import (
                    quantize_serving_params)
                variables["qparams"] = quantize_serving_params(params)
            apply = lambda m, *a: model.apply(variables, *a, method=m)  # noqa: E731

            k_order, k_loop = jax.random.split(key)
            order = masking.random_pred_order(k_order, batch, nt)
            canvas0 = jnp.zeros((batch, nt, pd), jnp.float32)
            mask0 = jnp.ones((batch, nt, 1), jnp.float32)

            def ar_body(carry, i):
                canvas, mask, key = carry
                key, k_noise, k_diff = jax.random.split(key, 3)
                scale = guidance.decayed_scale((i + 1.0) / ar_steps)
                tokens = apply(model.tokens_from_patches, canvas)
                coords = jnp.mean(canvas.reshape(batch, nt, model.patch_size, 3),
                                  axis=2)
                tokens_e = jnp.tile(tokens, (n_passes, 1, 1))
                mask_e = jnp.tile(mask, (n_passes, 1, 1))
                coords_e = jnp.tile(coords, (n_passes, 1, 1))
                z = apply(model.encode_step, tokens_e, mask_e, c_text, coords_e)
                ids, valid = masking.pred_slice(order, starts_a[i], counts_a[i],
                                                pad_p)
                ids_e = jnp.tile(ids, (n_passes, 1))
                z_sel = jnp.take_along_axis(z, ids_e[..., None], axis=1)
                x_t = jax.random.normal(k_noise, (batch, pad_p, pd))

                def diff_body(carry, j):
                    x_t, key = carry
                    key, kd = jax.random.split(key)
                    t = ts[j]
                    pred = apply(model.denoise_step, guidance.expand(x_t),
                                 jnp.full((batch * n_passes,), t), z_sel)
                    pred = guidance.combine(pred.astype(jnp.float32), scale, t)
                    return (sched_step(pred, j, t, x_t, kd), key), None

                (x_t, _), _ = jax.lax.scan(diff_body, (x_t, k_diff),
                                           jnp.arange(diff_steps))
                # Canvas values feed the next AR step's encoder; training data
                # is clamped to [-1, 1], so keep generated patches in range.
                x_t = jnp.clip(x_t, -1.0, 1.0)
                pred_mask = masking.scatter_mask(ids, valid, nt)
                onehot = jax.nn.one_hot(ids, nt, dtype=jnp.float32)
                scattered = jnp.einsum("bpn,bpd->bnd", onehot * valid[..., None],
                                       x_t)
                canvas = canvas * (1.0 - pred_mask) + scattered
                return (canvas, mask * (1.0 - pred_mask), key), None

            (canvas, _, _), _ = jax.lax.scan(ar_body, (canvas0, mask0, k_loop),
                                             jnp.arange(ar_steps))
            points = apply(model.unpatchify, canvas)
            key, k_col = jax.random.split(key)
            colors = jnp.clip(jnp.abs(points), 0, 1)
            colors = jnp.clip(colors + 0.1 * jax.random.normal(k_col,
                                                               points.shape),
                              0, 1)
            return points, colors

        return jax.jit(sample)

    def __call__(self, prompt: Sequence[str],
                 num_inference_steps: int = 16,
                 num_diffusion_steps: int = 25,
                 guidance_scale: float = 5.0,
                 negative_prompt: Optional[Sequence[str]] = None,
                 key: Optional[jax.Array] = None,
                 output_type: str = "numpy",
                 denormalize: bool = False) -> NOVAPointCloudPipelineOutput:
        if isinstance(prompt, str):
            prompt = [prompt]
        key = key if key is not None else jax.random.PRNGKey(0)
        guidance = GuidanceConfig(guidance_scale=guidance_scale)
        embeds, _ = self.text_encoder.encode(list(prompt))
        c_cond = self._embed_text(self.params, jnp.asarray(embeds))
        if guidance.enabled:
            if negative_prompt is not None:
                neg, _ = self.text_encoder.encode(list(negative_prompt))
                c_null = self._embed_text(self.params, jnp.asarray(neg))
            else:
                c_null = self._null_text(self.params, c_cond.shape[0],
                                         c_cond.shape[1])
            c = guidance.expand_text(c_cond, c_null)
        else:
            c = c_cond
        kw = dict(batch=len(prompt), ar_steps=num_inference_steps,
                  diff_steps=num_diffusion_steps, guidance=guidance)
        skey = tuple(sorted((k, str(v)) for k, v in kw.items()))
        if skey not in self._samplers:
            self._samplers[skey] = self._make_sampler(**kw)
        points, colors = self._samplers[skey](self.params, c, key)
        if denormalize and self.normalizer is not None:
            points = self.normalizer.denormalize(points)
        if output_type == "numpy":
            return NOVAPointCloudPipelineOutput(np.asarray(points),
                                                np.asarray(colors))
        return NOVAPointCloudPipelineOutput(points, colors)
