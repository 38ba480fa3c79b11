"""Every shipped config must build a model whose param tree materializes
(via eval_shape — no full-size allocation on the test CPU)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from nova_pointcloud_tpu.pipelines.builder import build_transformer
from nova_pointcloud_tpu.schedulers import builder as sched_builder
from nova_pointcloud_tpu.utils.config import load_config

CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "nova_pointcloud_tpu", "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    cfg = load_config(path)
    sched = sched_builder.build_scheduler(dict(cfg.get("scheduler", {})), "noise")
    mcfg = dict(cfg["model"])
    if "point_cloud_size" in mcfg:  # pc configs
        from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer

        model = NOVAPointCloudTransformer(
            arch=mcfg["arch"], point_cloud_size=mcfg["point_cloud_size"],
            patch_size=mcfg.get("patch_size", 1),
            text_token_dim=mcfg.get("text_token_dim"))
        n = mcfg["point_cloud_size"]
        shapes = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               jnp.zeros((1, n, 3)), jnp.zeros((1,), jnp.int32),
                               jnp.zeros((1, 16, mcfg.get("text_token_dim", 256)))))
    else:
        model = build_transformer(mcfg, sched)
        t = model.video_base_size[0]
        h, w = model.latent_hw
        kwargs = {}
        if model.text_token_dim:
            kwargs["text_embeds"] = jnp.zeros(
                (1, model.text_token_len, model.text_token_dim))
        rngs = {name: jax.random.PRNGKey(i) for i, name in
                enumerate(("params", "mask", "time", "noise", "dropout"))}
        shapes = jax.eval_shape(
            lambda: model.init(rngs, jnp.zeros((1, t, h, w, model.image_dim)),
                               **kwargs))
    import numpy as np

    total = sum(int(np.prod(s.shape)) for s in
                jax.tree_util.tree_leaves(shapes["params"]))
    # named sizes must land near their advertised parameter budgets
    name = os.path.basename(path)
    if "w768" in name:
        assert 0.25e9 < total < 0.45e9
    elif "w1024" in name and "pc" not in name:
        assert 0.5e9 < total < 0.8e9
    elif "w1536" in name:
        assert 1.1e9 < total < 1.8e9
    elif "pc" in name:
        assert 0.55e9 < total < 0.7e9
