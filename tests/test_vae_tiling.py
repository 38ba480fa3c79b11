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


def test_windowed_decode_matches_tiled_decode():
    """Per-window jit decode in the image processor (one window's decoder
    activations in HBM at a time) must be numerically identical to the VAE's
    own single-program tiled decode."""
    from nova_pointcloud_tpu.utils.image_processor import VaeImageProcessor

    vae = AutoencoderKLOpenSora(
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock3D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock3D"),
        block_out_channels=(32, 64), latent_channels=4,
        layers_per_block=1, sample_min_t=5, latent_min_t=3)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 8, 8, 4))
    params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 3, 8, 8, 4)),
                           method=vae.decode))(jax.random.PRNGKey(3))["params"]
    proc = VaeImageProcessor(vae, params)
    ref = vae.apply({"params": params}, z, method=vae.decode)
    out = proc.decode_latents(vae.scale(z))  # decode_latents unscales first
    assert out.shape == ref.shape  # windows [0:3],[2:5],[4:7] -> full T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_postprocess_device_uint8_matches_host():
    """On-device uint8 conversion (4x smaller D2H) matches the host path
    within 1 LSB (f32 rounding at bucket boundaries)."""
    from nova_pointcloud_tpu.utils.image_processor import VaeImageProcessor

    proc = VaeImageProcessor()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 6, 6, 3),
                           minval=-1.2, maxval=1.2)
    dev = proc.postprocess(x)
    host = proc.to_uint8(np.asarray(x, np.float32))
    assert dev.dtype == np.uint8
    assert np.abs(dev.astype(np.int16) - host.astype(np.int16)).max() <= 1
