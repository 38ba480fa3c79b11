"""Tests for the VAE family: distributions, 2D KL VAE, causal 3D OpenSora VAE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.models.autoencoders import (
    AutoencoderKL,
    AutoencoderKLOpenSora,
    DiagonalGaussian,
    IdentityDistribution,
    tiled_temporal_apply,
)


class TestDistributions:
    def test_diagonal_gaussian(self):
        z = jnp.concatenate([jnp.full((2, 4, 4, 3), 1.5),
                             jnp.zeros((2, 4, 4, 3))], axis=-1)
        dist = DiagonalGaussian.from_params(z)
        np.testing.assert_allclose(dist.mean, 1.5)
        np.testing.assert_allclose(dist.std, 1.0)
        s = dist.sample(jax.random.PRNGKey(0))
        assert s.shape == (2, 4, 4, 3)
        assert abs(float(s.mean()) - 1.5) < 0.2
        assert np.all(np.isfinite(np.asarray(dist.kl())))

    def test_odd_channel_trick(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 5))
        dist = DiagonalGaussian.from_params(z)
        assert dist.mean.shape[-1] == 4  # padded 5 -> 8 channels -> mean 4

    def test_identity(self):
        z = jnp.ones((1, 2, 2, 4))
        d = IdentityDistribution(z)
        np.testing.assert_array_equal(d.sample(), z)

    def test_tiling_static_windows(self):
        calls = []

        def fn(x):
            calls.append(x.shape)
            return x[:, ::2]  # fake 2x temporal encoder keeping ceil(t/2)

        x = jnp.arange(9, dtype=jnp.float32).reshape(1, 9, 1, 1, 1)
        out = tiled_temporal_apply(fn, x, min_t=5, ovr_t=1, out_ovr_t=1)
        # windows [0:5], [4:9] -> 3 + (3-1) = 5 frames
        assert out.shape[1] == 5
        assert len(calls) == 2


class TestAutoencoderKL:
    def _vae(self):
        return AutoencoderKL(block_out_channels=(32, 64), latent_channels=4,
                             layers_per_block=1)

    def test_roundtrip_shapes(self):
        vae = self._vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
        params = jax.jit(vae.init)(jax.random.PRNGKey(1), x)["params"]
        recon, dist = jax.jit(vae.apply)({"params": params}, x)
        assert recon.shape == x.shape
        assert dist.mean.shape == (2, 8, 8, 4)  # one downsample (2 stages)
        assert bool(jnp.all(jnp.isfinite(recon)))

    def test_scale_unscale(self):
        vae = AutoencoderKL(scaling_factor=0.5, shift_factor=0.1)
        x = jnp.ones((1, 2, 2, 4))
        y = vae.unscale(vae.scale(x))
        np.testing.assert_allclose(y, x, rtol=1e-6)


class TestOpenSoraVAE:
    def _vae(self):
        # OSP-shaped 4-block config: 2 temporal downsamples (downsampler type
        # follows the NEXT block, `autoencoder_kl_opensora.py:158-160`) and,
        # on decode, 2 trilinear + 1 spatial-only upsample (`:188` kernel
        # rule) — 4x time / 8x space, symmetric like the real checkpoint.
        return AutoencoderKLOpenSora(
            down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D",
                              "DownEncoderBlock3D", "DownEncoderBlock3D"),
            up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D",
                            "UpDecoderBlock3D", "UpDecoderBlock3D"),
            block_out_channels=(32, 32, 64, 64), latent_channels=4,
            layers_per_block=1, sample_min_t=17, latent_min_t=5)

    @pytest.mark.full
    def test_video_roundtrip(self):
        vae = self._vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 32, 32, 3))
        params = jax.jit(vae.init)(jax.random.PRNGKey(1), x)["params"]
        enc = jax.jit(lambda p, x: vae.apply({"params": p}, x,
                                             method=vae.encode).mean)
        z = enc(params, x)
        # two 3D downsamples: T 5->3->2 (causal ceil), HW 32->4
        assert z.shape == (1, 2, 4, 4, 4)
        dec = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                             method=vae.decode))
        recon = dec(params, z)
        assert recon.shape == (1, 5, 32, 32, 3)
        assert bool(jnp.all(jnp.isfinite(recon)))

    def test_causal_conv(self):
        """CausalConv3d output frame j must not see inputs beyond frame j.

        (Full-VAE latents are only approximately causal because GroupNorm
        statistics couple time — true of the reference's 3D GroupNorm too.)
        """
        from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_opensora import (
            CausalConv3d)

        conv = CausalConv3d(8, (3, 3, 3))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 4, 4, 3))
        variables = conv.init(jax.random.PRNGKey(1), x)
        y1 = conv.apply(variables, x)
        x2 = x.at[:, 4:].set(0.0)
        y2 = conv.apply(variables, x2)
        np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                                   atol=1e-6)
        assert np.abs(np.asarray(y1[:, 4:]) - np.asarray(y2[:, 4:])).max() > 1e-4

    @pytest.mark.full
    def test_image_passthrough(self):
        vae = self._vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
        params = jax.jit(vae.init)(jax.random.PRNGKey(1),
                                   x[:, None].repeat(2, 1))["params"]
        dist = vae.apply({"params": params}, x, method=vae.encode)
        assert dist.mean.ndim == 4  # image in, image latents out


class TestLTXVAE:
    def _vae(self):
        from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_ltx import (
            AutoencoderKLLTXVideo)

        return AutoencoderKLLTXVideo(
            block_out_channels=(8, 16, 16, 32, 32),
            layers_per_block=(1, 1, 1, 1, 1),
            # decoder up blocks halve channels (dim -> dim//2), so reversed
            # dims must be strictly halving like the real LTX config
            decoder_block_out_channels=(4, 8, 16, 32),
            decoder_layers_per_block=(1, 1, 1, 1),
            latent_channels=8, patch_size=4)

    @pytest.mark.full
    def test_roundtrip(self):
        vae = self._vae()
        # encoder strides: spatial 2, temporal 2, st 2, st 2 -> T/8, HW/(4*8)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 64, 64, 3))
        params = jax.jit(vae.init)(jax.random.PRNGKey(1), x)["params"]
        dist = vae.apply({"params": params}, x, method=vae.encode)
        assert dist.mean.shape == (1, 2, 2, 2, 8)
        recon = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                               method=vae.decode))(
            params, dist.mean)
        # 3 up blocks (reference zips reversed dims with depths[:-1],
        # `autoencoder_kl_ltx.py:227-229`): exact inverse of the encoder
        assert recon.shape == (1, 9, 64, 64, 3)
        assert bool(jnp.all(jnp.isfinite(recon)))


class TestCogVideoXVAE:
    def _vae(self):
        from nova_pointcloud_tpu.models.autoencoders.autoencoder_kl_cogvideox import (
            AutoencoderKLCogVideoX)

        return AutoencoderKLCogVideoX(block_out_channels=(32, 32, 32, 64),
                                      layers_per_block=1, latent_channels=4)

    @pytest.mark.full
    def test_roundtrip(self):
        vae = self._vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 32, 32, 3))
        params = jax.jit(vae.init)(jax.random.PRNGKey(1), x)["params"]
        dist = vae.apply({"params": params}, x, method=vae.encode)
        # two temporal halvings (first-frame preserving): 5 -> 3 -> 2
        assert dist.mean.shape == (1, 2, 4, 4, 4)
        recon = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                               method=vae.decode))(
            params, dist.mean)
        assert recon.shape[2:] == (32, 32, 3)
        assert bool(jnp.all(jnp.isfinite(recon)))
