"""Closed-form identity tests for DDPM and flow-matching schedulers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.schedulers import DDPMScheduler, FlowMatchEulerScheduler, build_scheduler


class TestDDPM:
    def test_beta_schedules(self):
        for schedule in ("linear", "scaled_linear", "squaredcos_cap_v2", "sigmoid"):
            s = DDPMScheduler(beta_schedule=schedule, num_train_timesteps=100)
            assert s.betas.shape == (100,)
            assert np.all(s.betas > 0) and np.all(s.betas < 1)
            assert np.all(np.diff(s.alphas_cumprod) < 0)

    def test_zero_terminal_snr(self):
        s = DDPMScheduler(beta_schedule="linear", rescale_betas_zero_snr=True)
        assert s.alphas_cumprod[-1] == pytest.approx(0.0, abs=1e-6)

    def test_add_noise_identity(self):
        s = DDPMScheduler()
        x0 = jnp.ones((2, 8, 3))
        noise = jnp.zeros_like(x0)
        t = jnp.array([0, 999])
        xt = s.add_noise(x0, noise, t)
        # t=0: almost no noise -> close to x0 scaled by sqrt(abar_0)~1
        np.testing.assert_allclose(xt[0], np.sqrt(s.alphas_cumprod[0]), rtol=1e-5)
        np.testing.assert_allclose(xt[1], np.sqrt(s.alphas_cumprod[999]), rtol=1e-4)

    def test_add_noise_matches_closed_form(self):
        s = DDPMScheduler()
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 16, 3))
        noise = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 3))
        t = jnp.array([10, 100, 500, 900])
        xt = s.add_noise(x0, noise, t)
        for i, ti in enumerate([10, 100, 500, 900]):
            a = s.alphas_cumprod[ti]
            expected = np.sqrt(a) * x0[i] + np.sqrt(1 - a) * noise[i]
            np.testing.assert_allclose(xt[i], expected, rtol=1e-5)

    def test_set_timesteps_spacings(self):
        for spacing in ("linspace", "leading", "trailing"):
            s = DDPMScheduler(timestep_spacing=spacing)
            sched = s.set_timesteps(25)
            assert sched.timesteps.shape == (25,)
            assert np.all(np.diff(sched.timesteps) < 0)
            assert sched.timesteps.max() < 1000 and sched.timesteps.min() >= 0

    def test_step_epsilon_reconstructs_x0_at_end(self):
        """Deterministic reverse diffusion on a known x0 with oracle noise."""
        s = DDPMScheduler(clip_sample=False)
        sched = s.set_timesteps(50)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 32, 3)) * 0.5
        # Start from pure noise, feed the ORACLE epsilon at each step:
        # eps_t = (x_t - sqrt(abar) x0)/sqrt(1-abar). Reverse should walk to x0.
        x = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        for t in sched.timesteps:
            a = s.alphas_cumprod[t]
            eps = (x - np.sqrt(a) * x0) / np.sqrt(1 - a)
            x = s.step(eps, jnp.asarray(t), x, key=None, schedule=sched)
        np.testing.assert_allclose(x, x0, atol=1e-3)

    def test_velocity(self):
        s = DDPMScheduler()
        x0 = jnp.ones((1, 4, 3))
        noise = jnp.full_like(x0, 2.0)
        t = jnp.array([500])
        v = s.get_velocity(x0, noise, t)
        a = s.alphas_cumprod[500]
        np.testing.assert_allclose(v, np.sqrt(a) * 2 - np.sqrt(1 - a), rtol=1e-5)

    def test_sample_timesteps_range(self):
        s = DDPMScheduler()
        t = s.sample_timesteps(jax.random.PRNGKey(0), (1000,))
        assert int(t.min()) >= 0 and int(t.max()) < 1000

    # -- variance-type family (`scheduling_ddpm.py:211-234`) ---------------
    @staticmethod
    def _step_parts(s, t, shape, seed=7):
        """Posterior mean + the per-type noise std, extracted by probing the
        step with noise=0 and noise=1."""
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, shape)
        eps = jax.random.normal(jax.random.PRNGKey(seed + 1), shape)
        tt = jnp.asarray(t)
        mean = s.step(eps, tt, x, noise=jnp.zeros(shape))
        std = s.step(eps, tt, x, noise=jnp.ones(shape)) - mean
        return x, eps, mean, np.asarray(std)

    def test_fixed_large_log_is_sqrt_beta(self):
        """Glide max_log: std == sqrt(beta_t) == the fixed_large std (the
        reference's log(beta)**0.5 is NaN for beta<1; implemented intent)."""
        t, shape = 500, (1, 8, 3)
        s_log = DDPMScheduler(variance_type="fixed_large_log")
        s_lrg = DDPMScheduler(variance_type="fixed_large")
        _, _, _, std_log = self._step_parts(s_log, t, shape)
        _, _, _, std_lrg = self._step_parts(s_lrg, t, shape)
        assert np.all(np.isfinite(std_log))
        np.testing.assert_allclose(std_log, std_lrg, rtol=1e-6)
        # closed form: one training-step stride => beta_t = 1 - a_t/a_{t-1}
        beta_t = 1.0 - s_log.alphas_cumprod[t] / s_log.alphas_cumprod[t - 1]
        np.testing.assert_allclose(std_log, np.sqrt(beta_t), rtol=1e-5)

    def test_learned_variance_from_2c_output(self):
        """'learned': second half of a 2C-channel output IS the variance."""
        t, C = 400, 3
        s = DDPMScheduler(variance_type="learned", clip_sample=False)
        s_ref = DDPMScheduler(variance_type="fixed_small", clip_sample=False)
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (2, 8, C))
        eps = jax.random.normal(jax.random.PRNGKey(4), (2, 8, C))
        var = jnp.full((2, 8, C), 0.04)
        out_2c = jnp.concatenate([eps, var], axis=-1)
        noise = jax.random.normal(jax.random.PRNGKey(5), (2, 8, C))
        got = s.step(out_2c, jnp.asarray(t), x, noise=noise)
        # mean must match any fixed-variance scheduler's mean (same eps)
        mean = s_ref.step(eps, jnp.asarray(t), x, noise=jnp.zeros_like(x))
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(mean + 0.2 * noise), rtol=1e-5)

    def test_learned_range_interpolates_log_variance(self):
        """'learned_range' eq. 15 arXiv 2102.09672: head=+1 -> fixed_large
        std, head=-1 -> posterior (fixed_small) std, head=0 -> geometric
        mean of the two."""
        t, shape = 600, (1, 8, 3)
        s = DDPMScheduler(variance_type="learned_range", clip_sample=False)
        x = jax.random.normal(jax.random.PRNGKey(8), shape)
        eps = jax.random.normal(jax.random.PRNGKey(9), shape)
        tt = jnp.asarray(t)

        def std_for(head):
            out = jnp.concatenate([eps, jnp.full(shape, head)], axis=-1)
            m = s.step(out, tt, x, noise=jnp.zeros(shape))
            return np.asarray(s.step(out, tt, x, noise=jnp.ones(shape)) - m)

        a_t, a_prev = s.alphas_cumprod[t], s.alphas_cumprod[t - 1]
        beta_t = 1.0 - a_t / a_prev
        post_var = (1 - a_prev) / (1 - a_t) * beta_t
        np.testing.assert_allclose(std_for(1.0), np.sqrt(beta_t), rtol=1e-5)
        np.testing.assert_allclose(std_for(-1.0), np.sqrt(post_var), rtol=1e-5)
        np.testing.assert_allclose(std_for(0.0),
                                   (post_var * beta_t) ** 0.25, rtol=1e-5)

    def test_learned_requires_2c(self):
        s = DDPMScheduler(variance_type="learned")
        x = jnp.zeros((1, 4, 3))
        with pytest.raises(ValueError):
            s.step(jnp.zeros_like(x), jnp.asarray(10), x,
                   noise=jnp.zeros_like(x))


class TestFlowMatch:
    def test_shifted_sigmas(self):
        s = FlowMatchEulerScheduler(shift=3.0)
        sched = s.set_timesteps(25)
        assert sched.sigmas.shape == (26,)
        assert sched.sigmas[-1] == 0.0
        # shift=3: sigma_max = 3*1/(1+2*1) = 1.0
        assert sched.sigmas[0] == pytest.approx(1.0, rel=1e-5)
        assert np.all(np.diff(sched.sigmas) < 0)

    def test_add_noise_and_target(self):
        s = FlowMatchEulerScheduler()
        x0 = jnp.zeros((2, 8, 4))
        noise = jnp.ones_like(x0)
        t = jnp.array([0, 999])  # index into descending sigma table
        xt, model_t = s.add_noise(x0, noise, t)
        # table is descending: index 0 -> sigma=1.0 (max), index 999 -> 1/1000
        np.testing.assert_allclose(xt[0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(xt[1], 1.0 / 1000, rtol=1e-4)
        np.testing.assert_allclose(s.target(x0, noise), 1.0)
        assert model_t.shape == (2,)

    def test_euler_integration_exact_for_linear_flow(self):
        """With the true constant velocity (noise - x0), Euler is exact."""
        s = FlowMatchEulerScheduler(shift=1.0)
        sched = s.set_timesteps(25)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 16, 3))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        x = noise * sched.sigmas[0] + x0 * (1 - sched.sigmas[0])
        v = s.target(x0, noise)
        for i in range(sched.num_inference_steps):
            x = s.step(v, jnp.asarray(i), x, sched)
        np.testing.assert_allclose(x, x0, atol=1e-4)

    def test_logit_normal_sampling(self):
        s = FlowMatchEulerScheduler()
        t = s.sample_timesteps(jax.random.PRNGKey(0), (5000,))
        assert int(t.min()) >= 0 and int(t.max()) < 1000
        # logit-normal concentrates near the middle
        mid = jnp.mean((t > 250) & (t < 750))
        assert float(mid) > 0.6

    def test_scan_compatible(self):
        """The whole reverse process compiles as one lax.scan."""
        s = FlowMatchEulerScheduler(shift=2.0)
        sched = s.set_timesteps(10)

        @jax.jit
        def run(x):
            def body(x, i):
                return s.step(-x, i, x, sched), None

            return jax.lax.scan(body, x, jnp.arange(10))[0]

        out = run(jnp.ones((2, 4, 3)))
        assert out.shape == (2, 4, 3) and bool(jnp.all(jnp.isfinite(out)))


def test_builder_phases():
    cfg = {"_noise_class_name": "DDPMScheduler", "_sample_class_name": "FlowMatchEulerScheduler",
           "num_train_timesteps": 500}
    noise = build_scheduler(cfg, "noise")
    sample = build_scheduler(cfg, "sample")
    assert isinstance(noise, DDPMScheduler) and noise.num_train_timesteps == 500
    assert isinstance(sample, FlowMatchEulerScheduler)
