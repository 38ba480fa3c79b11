"""Tests for the NOVA train pipelines, builder, and C2I pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.pipelines.builder import (
    build_pipeline,
    build_transformer,
    init_transformer,
)
from nova_pointcloud_tpu.pipelines.nova_c2i import NOVAC2IPipeline
from nova_pointcloud_tpu.pipelines.train_nova import (
    NOVATrainC2IPipeline,
    NOVATrainT2IPipeline,
    freeze_mask,
)
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

TINY_CFG = {
    "model": {
        "image_dim": 4, "image_size": [32, 32], "image_stride": 8,
        "text_token_dim": 32, "text_token_len": 8,
        "rotary_pos_embed": False, "video_base_size": [1, 2, 2],
        "image_base_size": [4, 4],
        "arch": ["vit_d2w64", "vit_d2w64", "mlp_d2w64"],
    },
    "scheduler": {"_noise_class_name": "FlowMatchEulerScheduler",
                  "_sample_class_name": "FlowMatchEulerScheduler"},
    "pipeline": {"name": "NOVAPipeline"},
}


def test_builder_inference_pipeline():
    pipe, params = build_pipeline(TINY_CFG, seed=0)
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder

    pipe.text_encoder = DummyTextEncoder(32, 8)
    out = pipe(["a dog"], num_inference_steps=4, num_diffusion_steps=2,
               guidance_scale=2.0, key=jax.random.PRNGKey(0))
    assert out.latents.shape == (1, 8, 8, 4)


def test_builder_pointcloud_pipeline():
    cfg = {"model": {"arch": "pc_d2w64", "point_cloud_size": 64,
                     "patch_size": 1, "text_token_dim": 32},
           "scheduler": {"_noise_class_name": "DDPMScheduler",
                         "beta_schedule": "squaredcos_cap_v2"},
           "pipeline": {"name": "NOVAPointCloudGenerationPipeline"}}
    pipe, params = build_pipeline(cfg, seed=0)
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder

    pipe.text_encoder = DummyTextEncoder(32, 8)
    out = pipe(["a chair"], num_points=64, num_diffusion_steps=2,
               guidance_scale=2.0, key=jax.random.PRNGKey(0))
    assert out.point_clouds.shape == (1, 64, 3)


def _tiny_model():
    model = build_transformer(dict(TINY_CFG["model"]),
                              FlowMatchEulerScheduler())
    return model, init_transformer(model)


class TestTrainT2I:
    def test_trains_and_freezes(self, tmp_path):
        model, params = _tiny_model()
        pipe = NOVATrainT2IPipeline(
            model, params, optimizer=optax.adam(1e-3),
            output_dir=str(tmp_path), max_steps=5, log_every=2,
            save_every=100, ema_decay=None)
        h, w = model.latent_hw
        frozen_before = jax.tree.map(
            np.asarray, pipe.params["text_embed"]["norm"])

        def data():
            rng = np.random.RandomState(0)
            while True:
                yield {"moments": jnp.asarray(
                    rng.randn(2, h, w, 8).astype(np.float32)),
                    "text_embeds": jnp.asarray(
                        rng.randn(2, 8, 32).astype(np.float32))}

        metrics = pipe.train(data(), max_steps=5)
        assert np.isfinite(metrics["loss"])
        # frozen text-embed LN unchanged (`pipeline_train_t2i.py:63-66`)
        frozen_after = pipe.params["text_embed"]["norm"]
        for a, b in zip(jax.tree.leaves(frozen_before),
                        jax.tree.leaves(frozen_after)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # a non-frozen param did change
        k0 = np.asarray(params["image_encoder"]["norm"]["scale"])
        k1 = np.asarray(pipe.params["image_encoder"]["norm"]["scale"])
        assert np.abs(k0 - k1).max() > 0


def test_freeze_mask_paths():
    params = {"text_embed": {"norm": {"scale": jnp.ones(2)},
                             "proj": {"kernel": jnp.ones((2, 2))}},
              "mask_tokens": {"bos_token": jnp.ones((1, 2))}}
    mask = freeze_mask(params, ("text_embed/norm",))
    assert mask["text_embed"]["norm"]["scale"] is False
    assert mask["text_embed"]["proj"]["kernel"] is True
    assert mask["mask_tokens"]["bos_token"] is True


class TestC2I:
    def test_generate(self):
        cfg = dict(TINY_CFG["model"])
        cfg.pop("text_token_dim"), cfg.pop("text_token_len")
        cfg["num_classes"] = 10
        sched = FlowMatchEulerScheduler()
        model = build_transformer(cfg, sched)
        params = init_transformer(model)
        pipe = NOVAC2IPipeline(model, params, sched)
        out = pipe([3, 7], num_inference_steps=4, num_diffusion_steps=2,
                   guidance_scale=2.0, key=jax.random.PRNGKey(0))
        assert out.latents.shape == (2, 8, 8, 4)
        assert bool(jnp.all(jnp.isfinite(out.latents)))

    def test_c2i_training(self):
        cfg = dict(TINY_CFG["model"])
        cfg.pop("text_token_dim"), cfg.pop("text_token_len")
        cfg["num_classes"] = 10
        model = build_transformer(cfg, FlowMatchEulerScheduler())
        params = init_transformer(model)
        pipe = NOVATrainC2IPipeline(model, params, optimizer=optax.adam(1e-3),
                                    max_steps=3, log_every=1, save_every=100,
                                    ema_decay=None)
        h, w = model.latent_hw

        def data():
            rng = np.random.RandomState(0)
            while True:
                yield {"moments": jnp.asarray(
                    rng.randn(2, h, w, 8).astype(np.float32)),
                    "labels": jnp.asarray([1, 2], jnp.int32)}

        metrics = pipe.train(data(), max_steps=3)
        assert np.isfinite(metrics["loss"])
