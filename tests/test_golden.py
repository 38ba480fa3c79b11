"""Golden-value regression tests: fixed-seed tiny configs.

SURVEY.md §4 obligation: deterministic goldens so refactors can't silently
change sampler numerics. All values captured on the CPU backend with
jax_threefry_partitionable=True (conftest). Tolerances are loose enough for
compiler-version drift but tight enough to catch math changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
    NOVAPointCloudGenerationPipeline)
from nova_pointcloud_tpu.schedulers import DDPMScheduler, FlowMatchEulerScheduler
from tests.test_nova_e2e import make_model

RTOL = 2e-3


def test_t2i_sampler_golden():
    sched = FlowMatchEulerScheduler()
    model, params = make_model(scheduler=sched)
    pipe = NOVAPipeline(model, params, sched,
                        text_encoder=DummyTextEncoder(32, 8))
    out = pipe(["golden prompt"], num_inference_steps=6, num_diffusion_steps=3,
               guidance_scale=2.0, key=jax.random.PRNGKey(42)).latents
    assert float(out.mean()) == pytest.approx(0.0418499559, rel=RTOL)
    assert float(out.std()) == pytest.approx(1.4469946622, rel=RTOL)
    assert float(out[0, 0, 0, 0]) == pytest.approx(-1.0159100294, rel=RTOL)
    assert float(out[0, 4, 4, 2]) == pytest.approx(-1.3801244497, rel=RTOL)


def test_t2pc_sampler_golden():
    model = NOVAPointCloudTransformer(arch="pc_d2w64", point_cloud_size=64,
                                      patch_size=1, text_token_dim=32,
                                      dropout=0.0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                                 jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 8, 32)))["params"]
    # randomize the zero-init head so the golden pins MODEL numerics, not
    # just the scheduler trajectory of the trivial predictor
    params["output_proj"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), params["output_proj"]["kernel"].shape)
    pipe = NOVAPointCloudGenerationPipeline(
        model, params, DDPMScheduler(beta_schedule="squaredcos_cap_v2"),
        text_encoder=DummyTextEncoder(32, 8))
    out = pipe(["golden"], num_points=64, num_diffusion_steps=4,
               guidance_scale=2.0, key=jax.random.PRNGKey(42)).point_clouds
    # re-pinned after the final-norm + zero-init head fix (round 3): a
    # random-weight model now starts at the trivial (zero-eps) predictor
    assert float(out.mean()) == pytest.approx(0.0294864327, rel=0.05)
    assert float(out.std()) == pytest.approx(0.6227853298, rel=RTOL)
    assert float(out[0, 0, 0]) == pytest.approx(-0.0567525700, rel=0.05)
    assert float(out[0, 33, 1]) == pytest.approx(-0.4724294245, rel=RTOL)


def test_scheduler_tables_golden():
    """Scheduler table spot values (vs the reference formulas)."""
    ddpm = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    assert float(ddpm.alphas_cumprod[0]) == pytest.approx(0.99997, abs=1e-4)
    assert float(ddpm.alphas_cumprod[500]) == pytest.approx(0.5, abs=0.01)
    cfm = FlowMatchEulerScheduler(shift=3.0)
    s = cfm.set_timesteps(25)
    assert float(s.sigmas[0]) == pytest.approx(1.0, rel=1e-5)
    # linspace midpoint sigma 0.50056 shifted: 3s/(1+2s)
    mid = (1000 - 12 * (999.0 / 24)) / 1000
    assert float(s.sigmas[12]) == pytest.approx(3 * mid / (1 + 2 * mid), rel=1e-3)
