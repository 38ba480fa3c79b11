"""Tests for the training engine: schedules, EMA, optimizer, trainer loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nova_pointcloud_tpu.engine import (
    EMAState,
    Trainer,
    build_optimizer,
    constant_lr,
    cosine_lr,
    ema_init,
    ema_update,
    multistep_lr,
)
from nova_pointcloud_tpu.engine.optim import decay_mask


class TestSchedules:
    def test_warmup_ramp(self):
        s = constant_lr(1.0, warmup_steps=100, warmup_factor=0.001)
        assert float(s(0)) == pytest.approx(0.001)
        assert float(s(50)) == pytest.approx(0.5005, rel=1e-3)
        assert float(s(100)) == pytest.approx(1.0)
        assert float(s(5000)) == pytest.approx(1.0)

    def test_cosine(self):
        s = cosine_lr(1.0, max_steps=1000, lr_min=0.1, warmup_steps=0)
        assert float(s(0)) == pytest.approx(1.0)
        assert float(s(500)) == pytest.approx(0.55, rel=1e-2)
        assert float(s(1000)) == pytest.approx(0.1, rel=1e-3)

    def test_multistep(self):
        s = multistep_lr(1.0, milestones=[10, 20], gamma=0.1)
        assert float(s(5)) == pytest.approx(1.0)
        assert float(s(15)) == pytest.approx(0.1)
        assert float(s(25)) == pytest.approx(0.01, rel=1e-5)


class TestEMA:
    def test_update_interval(self):
        params = {"w": jnp.zeros(4)}
        ema = ema_init(params, decay=0.9, update_every=10)
        new_params = {"w": jnp.ones(4)}
        # step not on interval: unchanged
        ema2 = ema_update(ema, new_params, jnp.int32(5))
        np.testing.assert_array_equal(ema2.params["w"], 0.0)
        # on interval: blended
        ema3 = ema_update(ema, new_params, jnp.int32(10))
        np.testing.assert_allclose(ema3.params["w"], 0.1, rtol=1e-6)


def test_decay_mask_excludes_norms_and_bias():
    params = {"blocks_0": {"fc1": {"kernel": jnp.zeros((4, 4)),
                                   "bias": jnp.zeros(4)},
                           "norm1": {"scale": jnp.zeros((4, 4))}}}
    mask = decay_mask(params)
    assert mask["blocks_0"]["fc1"]["kernel"] is True
    assert mask["blocks_0"]["fc1"]["bias"] is False
    assert mask["blocks_0"]["norm1"]["scale"] is False


def test_build_optimizer_runs():
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)}}
    tx = build_optimizer(params, cosine_lr(1e-3, 100), weight_decay=0.01,
                         grad_clip=1.0, lr_scales={"dense": 0.5})
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    assert all(np.all(np.isfinite(u)) for u in jax.tree.leaves(updates))


class TestTrainer:
    def _setup(self, tmp_path=None):
        w_true = jnp.asarray([1.5, -2.0, 0.5])
        params = {"w": jnp.zeros(3)}

        def loss_fn(params, batch, key):
            pred = batch["x"] @ params["w"]
            return jnp.mean((pred - batch["y"]) ** 2), {}

        def data():
            rng = np.random.RandomState(0)
            while True:
                x = rng.randn(16, 3).astype(np.float32)
                yield {"x": jnp.asarray(x), "y": jnp.asarray(x) @ w_true}

        return loss_fn, params, data()

    def test_loop_learns(self, tmp_path):
        loss_fn, params, data = self._setup()
        tr = Trainer(loss_fn, params, optax.adam(0.1),
                     output_dir=str(tmp_path), max_steps=60, log_every=10,
                     save_every=50, ema_decay=0.99, ema_every=10)
        metrics = tr.train(data)
        assert metrics["loss"] < 0.05
        assert tr.step == 60

    def test_loop_learns_zero3(self):
        """Trainer(zero3=True): FSDP-style param sharding over the data
        axis still converges to the same place (larger params so the
        min_size gate engages on w)."""
        from nova_pointcloud_tpu.parallel import create_mesh

        w_true = jnp.asarray(np.random.RandomState(1).randn(2048) * 0.5)
        params = {"w": jnp.zeros(2048)}

        def loss_fn(params, batch, key):
            pred = batch["x"] @ params["w"]
            return jnp.mean((pred - batch["y"]) ** 2), {}

        def data():
            rng = np.random.RandomState(0)
            while True:
                x = rng.randn(16, 2048).astype(np.float32) / 45.0
                yield {"x": jnp.asarray(x), "y": jnp.asarray(x) @ w_true}

        mesh = create_mesh({"data": 8})
        tr = Trainer(loss_fn, params, optax.adam(0.1), mesh=mesh,
                     max_steps=60, log_every=10, save_every=10**6,
                     ema_decay=None, zero3=True)
        metrics = tr.train(data())
        assert np.isfinite(metrics["loss"])
        assert "data" in str(tr.params["w"].sharding.spec)

    def test_resume_latest(self, tmp_path):
        loss_fn, params, data = self._setup()
        tr = Trainer(loss_fn, params, optax.adam(0.1),
                     output_dir=str(tmp_path), max_steps=50, log_every=10,
                     save_every=25)
        tr.train(data)
        assert tr.ckpt.latest_step() == 50
        # new trainer resumes at step 50 with learned params
        tr2 = Trainer(loss_fn, params, optax.adam(0.1),
                      output_dir=str(tmp_path), max_steps=50, log_every=10,
                      save_every=25)
        assert tr2.step == 50
        np.testing.assert_allclose(np.asarray(tr2.params["w"]),
                                   np.asarray(tr.params["w"]), rtol=1e-6)
