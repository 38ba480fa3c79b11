"""Classifier-free guidance as pure batch-dim algebra.

Behavioral parity with `diffnext/models/guidance_scaler.py:21-87`: 2-pass CFG
with an optional 3rd pass (image guidance or spatiotemporal guidance),
per-AR-step linear guidance decay, truncation below a timestep threshold, and
renorm clamping.

TPU-first: everything is shape-static. The guidance scale is traced data, so
decay/truncation live inside scans; "disabling" guidance multiplies the
combination weights to identity instead of shrinking the batch
(`guidance_scaler.py:59-65` chops the batch, which XLA can't).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    guidance_scale: float = 1.0
    guidance_trunc: float = 0.0
    guidance_renorm: float = 1.0
    image_guidance_scale: float = 0.0
    spatiotemporal_guidance_scale: float = 0.0
    min_guidance_scale: Optional[float] = None

    @property
    def enabled(self) -> bool:
        return self.guidance_scale > 1.0

    @property
    def extra_pass(self) -> bool:
        return (self.image_guidance_scale + self.spatiotemporal_guidance_scale) > 0

    @property
    def num_passes(self) -> int:
        return 1 if not self.enabled else (3 if self.extra_pass else 2)

    def decayed_scale(self, decay) -> jax.Array:
        """Linear decay over AR progress (`guidance_scaler.py:42-44`).

        A falsy min_guidance_scale (None or 0) means NO decay, matching the
        reference's ``kwargs.get("min_guidance_scale") or guidance_scale``
        (`guidance_scaler.py:30`) — configs carrying min_guidance_scale=0
        must not decay guidance toward zero."""
        lo = self.min_guidance_scale or self.guidance_scale
        return (self.guidance_scale - lo) * decay + lo

    # -- batch expansion ----------------------------------------------------
    def expand(self, x: jax.Array, padding: Optional[jax.Array] = None) -> jax.Array:
        """Tile inputs across guidance passes along batch (`:46-50`).

        Layout: [cond | uncond | extra]. ``padding`` replaces the middle pass
        for image guidance (the image-free pass).
        """
        if not self.enabled:
            return x
        parts = [x] * self.num_passes
        if self.image_guidance_scale and padding is not None:
            parts[1] = jnp.broadcast_to(padding.astype(x.dtype), x.shape)
        return jnp.concatenate(parts, axis=0)

    def expand_text(self, c_cond: jax.Array, c_null: jax.Array) -> jax.Array:
        """Per-pass text embeddings (`:52-57`)."""
        if not self.enabled:
            return c_cond
        parts = [c_cond, c_null]
        if self.image_guidance_scale:
            parts.append(c_null)  # Null, Null
        elif self.spatiotemporal_guidance_scale:
            parts.append(c_cond)  # Null, Text
        return jnp.concatenate(parts, axis=0)

    # -- combination ---------------------------------------------------------
    def _renorm(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        if self.guidance_renorm >= 1.0:
            return x
        nx = jnp.linalg.norm(x.reshape(x.shape[0], -1), axis=-1)
        nc = jnp.linalg.norm(cond.reshape(cond.shape[0], -1), axis=-1)
        clamp = jnp.clip(nc / (nx + 1e-12), self.guidance_renorm, 1.0)
        return x * clamp.reshape((-1,) + (1,) * (x.ndim - 1))

    def combine(self, x: jax.Array, scale: Optional[jax.Array] = None,
                timestep: Optional[jax.Array] = None) -> jax.Array:
        """Collapse guidance passes back to the cond batch (`:74-87`).

        ``scale`` is the (possibly decayed) guidance scale as traced data;
        ``timestep`` enables truncation: below ``guidance_trunc`` the output
        falls back to the pure conditional prediction.
        """
        if not self.enabled:
            return x
        scale = jnp.asarray(self.guidance_scale if scale is None else scale,
                            jnp.float32).astype(x.dtype)
        chunks = jnp.split(x, self.num_passes, axis=0)
        if self.image_guidance_scale:
            cond, uncond, imgcond = chunks
            out = self._renorm(uncond + (cond - imgcond) * scale, cond)
            out = out + (imgcond - uncond) * self.image_guidance_scale
        elif self.spatiotemporal_guidance_scale:
            cond, uncond, perturb = chunks
            out = self._renorm(uncond + (cond - uncond) * scale, cond)
            out = out + (cond - perturb) * self.spatiotemporal_guidance_scale
        else:
            cond, uncond = chunks
            out = self._renorm(uncond + (cond - uncond) * scale, cond)
        if self.guidance_trunc and timestep is not None:
            out = jnp.where(timestep < self.guidance_trunc, chunks[0], out)
        return out
