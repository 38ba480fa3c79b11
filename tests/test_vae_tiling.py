"""Temporal tiling consistency for the causal 3D VAE."""

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.autoencoders import AutoencoderKLOpenSora
import pytest


@pytest.mark.full
def test_tiled_encode_matches_single_window_prefix():
    """With windows of 5 frames and overlap 1, the first window's latents in
    a tiled encode must equal the untiled encode of those frames (causal
    convs guarantee prefix consistency; GroupNorm couples only within a
    window)."""
    vae = AutoencoderKLOpenSora(
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock3D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock3D"),
        block_out_channels=(32, 64), latent_channels=4,
        layers_per_block=1, sample_min_t=5, latent_min_t=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 16, 16, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(1), x[:, :5])["params"]
    enc = jax.jit(lambda p, v: vae.apply({"params": p}, v,
                                         method=vae.encode).mean)
    tiled = enc(params, x)          # windows [0:5], [4:9]
    single = enc(params, x[:, :5])  # untiled first window
    # first window occupies ceil(5/2)=3 latent frames
    np.testing.assert_allclose(np.asarray(tiled[:, :3]),
                               np.asarray(single[:, :3]), atol=1e-5)
    # total: 3 + (3 - 1 overlap) = 5 latent frames
    assert tiled.shape[1] == 5
