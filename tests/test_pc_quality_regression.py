"""Quality regression: a briefly-trained tiny pc model must beat noise on CD.

The goldens pin numerics of random-weight models; this guards learning
DYNAMICS — a change that silently ruins training (loss wiring, scheduler,
normalization) fails here even if shapes and numerics stay valid.
(VERDICT r1 weak #7; reference yardstick `test_optimize.py:478-545`.)
"""

import numpy as np
import pytest

CD_IMPROVEMENT = 0.75  # trained CD must be <= 75% of the noise baseline


@pytest.mark.full
def test_trained_tiny_model_beats_noise_on_cd():
    import jax
    import jax.numpy as jnp
    import optax

    from nova_pointcloud_tpu.data.shapenet import (GlobalNormalizer,
                                                   make_batches,
                                                   make_synthetic_clouds)
    from nova_pointcloud_tpu.engine.trainer import Trainer
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import evaluate_batch
    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.ops import losses as L
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    n_pts, steps = 128, 300
    shapes = make_synthetic_clouds(32, n_pts, seed=0)
    normalizer = GlobalNormalizer().fit([s["points"] for s in shapes])
    text_encoder = DummyTextEncoder(64, 8)
    scheduler = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    model = NOVAPointCloudTransformer(arch="pc_d2w64", point_cloud_size=n_pts,
                                      patch_size=1, text_token_dim=64,
                                      dropout=0.0)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, n_pts, 3)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 8, 64)))["params"]

    def loss_fn(p, batch, key):
        k_t, k_n, k_d = jax.random.split(key, 3)
        pts = batch["points"]
        t = scheduler.sample_timesteps(k_t, (pts.shape[0],))
        noise = jax.random.normal(k_n, pts.shape)
        x_t = scheduler.add_noise(pts, noise, t)
        pred = model.apply({"params": p}, x_t, t, batch["text_embeds"],
                           rngs={"dropout": k_d})
        loss = jnp.mean((pred - noise) ** 2)
        return loss, {"loss_diffusion": loss}

    trainer = Trainer(loss_fn, params, optax.adamw(2e-3), output_dir=None,
                      max_steps=steps, log_every=1000, save_every=0,
                      ema_decay=None, seed=0)

    def data():
        for b in make_batches(shapes, 16, n_pts, seed=0):
            yield {"points": np.clip(normalizer.normalize(b["points"]),
                                     -1, 1).astype(np.float32),
                   "text_embeds": text_encoder.encode(b["prompts"])[0]}

    trainer.train(data(), steps)

    pipe = NOVAPointCloudGenerationPipeline(
        model, trainer.params, scheduler, text_encoder=text_encoder)
    refs_shapes = make_synthetic_clouds(8, n_pts, seed=9)
    refs = np.clip(normalizer.normalize(
        np.stack([s["points"] for s in refs_shapes])), -1, 1).astype(np.float32)
    out = pipe([s["prompt"] for s in refs_shapes], num_points=n_pts,
               num_diffusion_steps=25, guidance_scale=2.0,
               key=jax.random.PRNGKey(3), postprocess="eval")
    trained = evaluate_batch(np.asarray(out.point_clouds), refs,
                             max_emd_points=128)

    noise = np.clip(np.random.RandomState(0).randn(*refs.shape),
                    -2, 2).astype(np.float32)
    baseline = evaluate_batch(noise, refs, max_emd_points=128)

    assert np.isfinite(trained["chamfer"])
    assert trained["chamfer"] < CD_IMPROVEMENT * baseline["chamfer"], (
        f"trained CD {trained['chamfer']:.4f} vs noise "
        f"{baseline['chamfer']:.4f}")

    # int8-vs-bf16 delta guard (VERDICT r2 weak #5): serving the SAME
    # trained weights through the quantized model must not degrade sampled
    # CD by more than 10%. On CPU this exercises the w8a8 Int8Dense MLP
    # rounding (the Pallas fused kernels are TPU-only but share the same
    # quantize_weight math, parity-tested in test_fused_block).
    q_model = NOVAPointCloudTransformer(
        arch="pc_d2w64", point_cloud_size=n_pts, patch_size=1,
        text_token_dim=64, dropout=0.0, quantize=True)
    q_pipe = NOVAPointCloudGenerationPipeline(
        q_model, trainer.params, scheduler, text_encoder=text_encoder)
    q_out = q_pipe([s["prompt"] for s in refs_shapes], num_points=n_pts,
                   num_diffusion_steps=25, guidance_scale=2.0,
                   key=jax.random.PRNGKey(3), postprocess="eval")
    q_cd = evaluate_batch(np.asarray(q_out.point_clouds), refs,
                          max_emd_points=128)["chamfer"]
    delta = abs(q_cd - trained["chamfer"]) / trained["chamfer"]
    assert delta <= 0.10, (
        f"int8 CD {q_cd:.4f} vs bf16 {trained['chamfer']:.4f} "
        f"(delta {delta:.1%} > 10%)")


@pytest.mark.full
def test_trained_tiny_masked_ar_beats_noise_on_cd():
    """Same guard for the masked-AR path (leak regression would fail this:
    with the round-2 cluster-coords leak, this model trains to low loss but
    samples at noise level)."""
    import jax
    import jax.numpy as jnp
    import optax

    from nova_pointcloud_tpu.data.shapenet import (GlobalNormalizer,
                                                   make_batches,
                                                   make_synthetic_clouds)
    from nova_pointcloud_tpu.engine.trainer import Trainer
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import evaluate_batch
    from nova_pointcloud_tpu.models.pointcloud_ar import (
        NOVAPointCloudARTransformer)
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.ops.pointops import morton_sort
    from nova_pointcloud_tpu.pipelines.pointcloud_ar import (
        NOVAPointCloudARPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    n_pts, steps = 128, 400
    shapes = make_synthetic_clouds(32, n_pts, seed=0)
    normalizer = GlobalNormalizer().fit([s["points"] for s in shapes])
    text_encoder = DummyTextEncoder(64, 8)
    scheduler = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    model = NOVAPointCloudARTransformer(
        arch="pc_d2w64", point_cloud_size=n_pts, patch_size=8,
        text_token_dim=64, text_token_len=8, noise_scheduler=scheduler)
    rngs = {n: jax.random.PRNGKey(i) for i, n in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    params = jax.jit(model.init)(rngs, jnp.zeros((2, n_pts, 3)),
                                 jnp.zeros((2, 8, 64)))["params"]

    def loss_fn(p, batch, key):
        ks = jax.random.split(key, 4)
        r = dict(zip(("mask", "time", "noise", "dropout"), ks))
        out = model.apply({"params": p}, batch["points"],
                          batch["text_embeds"], rngs=r)
        return out["loss"], out

    trainer = Trainer(loss_fn, params, optax.adamw(2e-3), output_dir=None,
                      max_steps=steps, log_every=1000, save_every=0,
                      ema_decay=None, seed=0)
    sort_fn = jax.jit(morton_sort)

    def data():
        for b in make_batches(shapes, 16, n_pts, seed=0):
            pts = np.clip(normalizer.normalize(b["points"]),
                          -1, 1).astype(np.float32)
            yield {"points": np.asarray(sort_fn(pts)),
                   "text_embeds": text_encoder.encode(b["prompts"])[0]}

    trainer.train(data(), steps)

    pipe = NOVAPointCloudARPipeline(model, trainer.params, scheduler,
                                    text_encoder=text_encoder)
    refs_shapes = make_synthetic_clouds(8, n_pts, seed=9)
    refs = np.clip(normalizer.normalize(
        np.stack([s["points"] for s in refs_shapes])), -1, 1).astype(np.float32)
    out = pipe([s["prompt"] for s in refs_shapes], num_inference_steps=8,
               num_diffusion_steps=25, guidance_scale=2.0,
               key=jax.random.PRNGKey(3))
    trained = evaluate_batch(np.asarray(out.point_clouds), refs,
                             max_emd_points=128)

    noise = np.clip(np.random.RandomState(0).randn(*refs.shape),
                    -2, 2).astype(np.float32)
    baseline = evaluate_batch(noise, refs, max_emd_points=128)

    assert np.isfinite(trained["chamfer"])
    assert trained["chamfer"] < CD_IMPROVEMENT * baseline["chamfer"], (
        f"trained masked-AR CD {trained['chamfer']:.4f} vs noise "
        f"{baseline['chamfer']:.4f}")


def test_recorded_static_acts_artifact_within_delta():
    """The committed flagship artifact must show the calibrated-static int8
    path within 10% of bf16 on sampled CD (guards against committing a
    quality-regressing static-quant recipe as 'the' serving config —
    bench.py serves --static-acts by default)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "pc_flagship_quality_r3_static.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("artifact not recorded on this checkout")
    r = json.load(open(path))
    bf16 = r["bf16"]["best_chamfer"]
    static = r["int8_static"]["best_chamfer"]
    delta = abs(static - bf16) / bf16
    assert delta <= 0.10, (static, bf16, delta)
