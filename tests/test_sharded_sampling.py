"""Multi-chip INFERENCE sharding: samplers jitted over a Mesh.

BASELINE north-star clause: "multi-chip inference shards the d48
transformer over ICI for the 1.4B model". These tests run the full t2pc
and t2i samplers on an 8-virtual-device {data:4, tensor:2} mesh (Megatron
TP over the scanned stacks + batch on "data") and assert outputs match the
single-device sampler — the sharding changes the schedule, not the math.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.parallel import create_mesh
from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
    NOVAPointCloudGenerationPipeline)
from nova_pointcloud_tpu.schedulers import DDPMScheduler

MESH_SHAPE = {"data": 4, "tensor": 2}


def _pc_model(n_points=64, dim_tag="pc_d2w64"):
    model = NOVAPointCloudTransformer(
        arch=dim_tag, point_cloud_size=n_points, patch_size=1,
        text_token_dim=32, dropout=0.0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, n_points, 3)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 32)))["params"]
    params["output_proj"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), params["output_proj"]["kernel"].shape)
    return model, params


def test_t2pc_sampler_sharded_matches_unsharded():
    model, params = _pc_model()
    mesh = create_mesh(MESH_SHAPE)
    enc = DummyTextEncoder(32, 8)
    sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    prompts = ["a chair", "a car", "a lamp", "a sofa"]  # batch 4 -> CFG 8
    kw = dict(num_points=64, num_diffusion_steps=4, guidance_scale=3.0,
              key=jax.random.PRNGKey(7))

    ref = NOVAPointCloudGenerationPipeline(
        model, params, sched, text_encoder=enc)(prompts, **kw)
    got = NOVAPointCloudGenerationPipeline(
        model, params, sched, text_encoder=enc, mesh=mesh)(prompts, **kw)
    np.testing.assert_allclose(got.point_clouds, ref.point_clouds,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got.colors, ref.colors, atol=2e-4, rtol=1e-3)


def test_t2pc_sharded_params_are_actually_distributed():
    """TP params must land sharded on the mesh, not replicated everywhere."""
    from nova_pointcloud_tpu.parallel.sharding import param_sharding

    model, params = _pc_model()
    mesh = create_mesh(MESH_SHAPE)
    shardings = param_sharding(params, mesh)
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda s: hasattr(s, "spec")))
    assert any("tensor" in str(s) for s in specs), specs


@pytest.mark.full
def test_t2i_sampler_sharded_matches_unsharded():
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler
    from tests.test_nova_e2e import make_model

    sched = FlowMatchEulerScheduler()
    model, params = make_model(scheduler=sched)
    enc = DummyTextEncoder(32, 8)
    mesh = create_mesh(MESH_SHAPE)
    prompts = ["a cat", "a dog", "a fox", "a bat"]
    kw = dict(num_inference_steps=4, num_diffusion_steps=3,
              guidance_scale=2.0, key=jax.random.PRNGKey(11))

    ref = NOVAPipeline(model, params, sched, text_encoder=enc)(
        prompts, **kw).latents
    got = NOVAPipeline(model, params, sched, text_encoder=enc, mesh=mesh)(
        prompts, **kw).latents
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
