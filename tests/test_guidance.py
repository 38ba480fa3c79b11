"""GuidanceScaler algebra tests (SURVEY §4 obligation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.models.guidance import GuidanceConfig


def mk(cond, uncond, extra=None):
    parts = [jnp.full((1, 4), float(cond)), jnp.full((1, 4), float(uncond))]
    if extra is not None:
        parts.append(jnp.full((1, 4), float(extra)))
    return jnp.concatenate(parts, axis=0)


class TestCombine:
    def test_standard_cfg(self):
        g = GuidanceConfig(guidance_scale=5.0)
        out = g.combine(mk(2.0, 1.0))
        np.testing.assert_allclose(out, 1.0 + 5.0 * (2.0 - 1.0))

    def test_disabled_passthrough(self):
        g = GuidanceConfig(guidance_scale=1.0)
        x = jnp.ones((2, 4))
        np.testing.assert_array_equal(g.combine(x), x)

    def test_image_guidance(self):
        # uncond + (cond-imgcond)*s + (imgcond-uncond)*is (`guidance_scaler.py:78-81`)
        g = GuidanceConfig(guidance_scale=3.0, image_guidance_scale=2.0)
        assert g.num_passes == 3
        out = g.combine(mk(2.0, 1.0, 1.5))
        np.testing.assert_allclose(out, 1.0 + (2.0 - 1.5) * 3.0
                                    + (1.5 - 1.0) * 2.0)

    def test_spatiotemporal_guidance(self):
        # uncond + (cond-uncond)*s + (cond-perturb)*ss (`:82-85`)
        g = GuidanceConfig(guidance_scale=3.0,
                           spatiotemporal_guidance_scale=1.5)
        out = g.combine(mk(2.0, 1.0, 1.8))
        np.testing.assert_allclose(
            out, 1.0 + (2.0 - 1.0) * 3.0 + (2.0 - 1.8) * 1.5, rtol=1e-6)

    def test_truncation_select(self):
        g = GuidanceConfig(guidance_scale=5.0, guidance_trunc=100.0)
        below = g.combine(mk(2.0, 1.0), timestep=jnp.float32(50.0))
        np.testing.assert_allclose(below, 2.0)  # pure cond below threshold
        above = g.combine(mk(2.0, 1.0), timestep=jnp.float32(500.0))
        np.testing.assert_allclose(above, 6.0)

    def test_renorm_clamps(self):
        g = GuidanceConfig(guidance_scale=10.0, guidance_renorm=0.5)
        out = g.combine(mk(2.0, 1.0))
        # unrenormed = 11; cond norm 4; ratio 4/22 clamped to 0.5 -> 5.5
        np.testing.assert_allclose(out, 5.5, rtol=1e-5)

    def test_decay(self):
        g = GuidanceConfig(guidance_scale=5.0, min_guidance_scale=1.0)
        assert float(g.decayed_scale(0.0)) == pytest.approx(1.0)
        assert float(g.decayed_scale(0.5)) == pytest.approx(3.0)
        assert float(g.decayed_scale(1.0)) == pytest.approx(5.0)


class TestExpand:
    def test_expand_and_text(self):
        g = GuidanceConfig(guidance_scale=2.0)
        x = jnp.arange(8.0).reshape(2, 4)
        e = g.expand(x)
        assert e.shape == (4, 4)
        np.testing.assert_array_equal(e[:2], e[2:])
        c = g.expand_text(jnp.ones((2, 3)), jnp.zeros((2, 3)))
        assert c.shape == (4, 3)
        assert float(c[:2].sum()) == 6.0 and float(c[2:].sum()) == 0.0

    def test_image_guidance_padding(self):
        g = GuidanceConfig(guidance_scale=2.0, image_guidance_scale=1.0)
        x = jnp.ones((2, 4))
        pad = jnp.zeros((1, 4))
        e = g.expand(x, padding=pad)
        assert e.shape == (6, 4)
        np.testing.assert_array_equal(e[2:4], 0.0)  # middle pass padded
        c = g.expand_text(jnp.ones((2, 3)), jnp.zeros((2, 3)))
        np.testing.assert_array_equal(c[4:], 0.0)  # Null, Null

    def test_stg_text_layout(self):
        g = GuidanceConfig(guidance_scale=2.0,
                           spatiotemporal_guidance_scale=1.0)
        c = g.expand_text(jnp.ones((2, 3)), jnp.zeros((2, 3)))
        np.testing.assert_array_equal(c[4:], 1.0)  # Null, Text
