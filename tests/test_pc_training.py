"""Tests for the pc training stack: composite loss, grad tools, eval harness."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nova_pointcloud_tpu.data.shapenet import GlobalNormalizer, make_synthetic_clouds
from nova_pointcloud_tpu.engine.grad_tools import (
    adaptive_lr_on_spike,
    grad_stats,
    per_layer_clip,
    sanitize_grads,
)
from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.pipelines.pointcloud_train import (
    NOVATrainPointCloudPipeline,
    PointCloudLossConfig,
    make_pc_loss_fn,
)
from nova_pointcloud_tpu.schedulers import DDPMScheduler

N = 64


def tiny_model():
    model = NOVAPointCloudTransformer(arch="pc_d2w64", point_cloud_size=N,
                                      patch_size=1, text_token_dim=32,
                                      dropout=0.0)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, N, 3)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 8, 32)))["params"]
    return model, params


class TestGradTools:
    def test_sanitize(self):
        grads = {"a": jnp.array([1.0, jnp.nan]), "b": jnp.ones(2)}
        clean, bad = sanitize_grads(grads)
        assert int(bad) == 1
        np.testing.assert_array_equal(clean["a"], [1.0, 0.0])

    def test_grad_stats(self):
        grads = {"enc": {"w": jnp.full((2,), 3.0)}, "dec": {"w": jnp.full((2,), 4.0)}}
        stats = grad_stats(grads, groups=("enc", "dec"))
        assert float(stats["grad_norm/enc"]) == pytest.approx(np.sqrt(18))
        assert float(stats["grad_norm"]) == pytest.approx(np.sqrt(50))

    def test_per_layer_clip(self):
        tx = per_layer_clip(1.0, {"head": 0.5})
        g = {"body": jnp.full((4,), 10.0), "head": jnp.full((4,), 10.0)}
        out, _ = tx.update(g, tx.init(g))
        assert float(jnp.linalg.norm(out["body"])) == pytest.approx(1.0, rel=1e-4)
        assert float(jnp.linalg.norm(out["head"])) == pytest.approx(0.5, rel=1e-4)

    def test_adaptive_lr_spike(self):
        tx = adaptive_lr_on_spike(explode_norm=1.0, decay=0.5)
        state = tx.init(None)
        big = {"w": jnp.full((4,), 100.0)}
        out, state = tx.update(big, state)
        assert float(state.multiplier) == 0.5
        small = {"w": jnp.full((4,), 0.001)}
        _, state = tx.update(small, state)
        assert float(state.multiplier) > 0.5  # recovers


class TestCompositeLoss:
    def test_metrics_and_finiteness(self):
        model, params = tiny_model()
        sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
        loss_fn = make_pc_loss_fn(model, sched,
                                  PointCloudLossConfig(num_subsets=8))
        batch = {"points": jax.random.normal(jax.random.PRNGKey(0), (2, N, 3)),
                 "text": jnp.zeros((2, 8, 32))}
        loss, metrics = jax.jit(loss_fn)(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        for k in ("loss_diffusion", "loss_chamfer", "loss_emd", "loss_ar"):
            assert k in metrics and np.isfinite(float(metrics[k]))

    def test_loss_target_follows_prediction_type(self):
        """The diffusion MSE must regress the scheduler's parameterization.

        Closed form with a zero-output stub model: loss_diffusion ==
        mean(target^2), where target is noise / x0 / v per prediction_type.
        (Round-5 class-agnostic diagnosis: the eps target carries the class
        signal scaled by sqrt(alpha_bar); v restores O(1) text gradient at
        high noise — docs/evaluation.md.)
        """
        class ZeroModel:
            def apply(self, *a, **k):
                return jnp.zeros_like(a[1])

        pts = jax.random.normal(jax.random.PRNGKey(0), (2, N, 3))
        batch = {"points": pts, "text": None}
        cfg = PointCloudLossConfig(use_ar_loss=False)
        seen = {}
        for ptype in ("epsilon", "sample", "v_prediction"):
            sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2",
                                  prediction_type=ptype)
            loss_fn = make_pc_loss_fn(ZeroModel(), sched, cfg)
            _, metrics = loss_fn({}, batch, jax.random.PRNGKey(1))
            # replicate the loss_fn's own draws (same key split order)
            k_t, k_n, _, _ = jax.random.split(jax.random.PRNGKey(1), 4)
            t = sched.sample_timesteps(k_t, (2,))
            noise = jax.random.normal(k_n, pts.shape)
            target = {"epsilon": noise, "sample": pts,
                      "v_prediction": sched.get_velocity(pts, noise, t)}[ptype]
            expect = float(jnp.mean(target ** 2))
            got = float(metrics["loss_diffusion"])
            assert got == pytest.approx(expect, rel=1e-5), ptype
            seen[ptype] = got
        assert len({round(v, 6) for v in seen.values()}) == 3  # distinct targets

    def test_composite_trains(self):
        model, params = tiny_model()
        sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
        loss_fn = make_pc_loss_fn(
            model, sched, PointCloudLossConfig(num_subsets=8, sinkhorn_iters=10))
        pts = jax.random.normal(jax.random.PRNGKey(0), (4, N, 3))
        pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        batch = {"points": pts, "text": jnp.zeros((4, 8, 32))}
        opt = optax.adam(2e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key)
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, upd), opt_state, loss

        losses = []
        for i in range(25):
            params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestTrainPipeline:
    def test_train_validate_sample(self, tmp_path):
        model, params = tiny_model()
        shapes = make_synthetic_clouds(8, N)
        normalizer = GlobalNormalizer().fit([s["points"] for s in shapes])
        pipe = NOVATrainPointCloudPipeline(
            model, params, text_encoder=DummyTextEncoder(32, 8),
            normalizer=normalizer, output_dir=str(tmp_path),
            loss_config=PointCloudLossConfig(num_subsets=8, sinkhorn_iters=5),
            max_steps=6, log_every=2, save_every=1000, ema_decay=0.99)

        def data():
            while True:
                pts = np.stack([s["points"] for s in shapes[:4]])
                yield {"points": normalizer.normalize(pts),
                       "prompts": [s["prompt"] for s in shapes[:4]]}

        metrics = pipe.train(data(), max_steps=6)
        assert np.isfinite(metrics["loss"])
        val = pipe.validate([{"points": np.stack([s["points"] for s in shapes[4:8]]),
                              "prompts": [s["prompt"] for s in shapes[4:8]]}])
        assert np.isfinite(val["loss"])
        out = pipe.sample(["a sphere"], num_points=N, num_diffusion_steps=3,
                          guidance_scale=2.0)
        assert out.point_clouds.shape == (1, N, 3)
        import os

        assert os.path.exists(tmp_path / "stats.json")


def test_eval_harness(tmp_path):
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import (
        PointCloudEvaluator, evaluate_batch)
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)

    model, params = tiny_model()
    pipe = NOVAPointCloudGenerationPipeline(
        model, params, DDPMScheduler(beta_schedule="squaredcos_cap_v2"),
        text_encoder=DummyTextEncoder(32, 8))
    refs = np.stack([s["points"] for s in make_synthetic_clouds(2, N)])
    ev = PointCloudEvaluator(pipe)
    out_json = str(tmp_path / "results.json")
    results = ev.run(["a sphere", "a box"], refs, guidance_scales=(1.0, 3.0),
                     num_points=N, num_diffusion_steps=3, output_json=out_json)
    assert len(results["sweep"]) == 2
    assert results["best_guidance_scale"] in (1.0, 3.0)
    import json, os

    assert os.path.exists(out_json)
    m = evaluate_batch(refs, refs)
    assert m["chamfer"] == pytest.approx(0.0, abs=1e-5)
    assert m["emd"] == pytest.approx(0.0, abs=1e-5)
