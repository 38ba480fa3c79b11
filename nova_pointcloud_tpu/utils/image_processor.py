"""VAE image processing: latent decode micro-batching + postprocess.

Parity with `diffnext/image_processor.py:28-104`: decode latents through the
VAE in micro-batches (memory bound), convert [-1, 1] floats to uint8 numpy,
and optionally to PIL images.
"""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class VaeImageProcessor:
    """Decode + postprocess helper around a (vae_model, vae_params) pair."""

    def __init__(self, vae=None, vae_params=None, micro_batch: int = 2):
        self.vae, self.vae_params = vae, vae_params
        self.micro_batch = micro_batch
        self.host_offload = False  # weights parked in pinned host memory
        self._decode = None
        if vae is not None:
            self._decode = jax.jit(lambda p, z: vae.apply(
                {"params": p}, z, method=vae.decode))

    def device_params(self):
        """VAE params for a call: streamed back into HBM per call when
        offloaded (diffusers move-to-GPU-on-use semantics), else as stored."""
        if self.host_offload and self.vae_params is not None:
            from nova_pointcloud_tpu.utils.offload import to_device

            return to_device(self.vae_params)
        return self.vae_params

    def decode_latents(self, latents: jax.Array) -> jax.Array:
        """(B, ..., C) scaled latents -> (B, ..., 3) samples in [-1, 1]."""
        if self.vae is None:
            return latents
        z = self.vae.unscale(latents)
        params = self.device_params()
        outs = []
        for i in range(0, z.shape[0], self.micro_batch):
            outs.append(self._decode(params, z[i: i + self.micro_batch]))
        return jnp.concatenate(outs, axis=0)

    @staticmethod
    def to_uint8(x) -> np.ndarray:
        """[-1, 1] float -> uint8 numpy (`image_processor.py:78-90`)."""
        x = np.asarray(x, np.float32)
        return ((x + 1.0) * 127.5).clip(0, 255).astype(np.uint8)

    @staticmethod
    def to_pil(images: np.ndarray) -> List[Any]:
        """uint8 (B, H, W, 3) -> PIL images (`image_processor.py:92-104`)."""
        from PIL import Image

        return [Image.fromarray(im) for im in images]

    def postprocess(self, samples, output_type: str = "np"):
        arr = self.to_uint8(samples)
        return self.to_pil(arr) if output_type == "pil" else arr
