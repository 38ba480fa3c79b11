"""Conditioning parameterization A/B: eps- vs v-prediction at micro scale.

The round-5 discriminative eval exposed class-AGNOSTIC generation under the
eps recipe (results/pc_cond_smallscale_cpu_r5.json, docs/evaluation.md): in
eps space the class signal is scaled by sqrt(alpha_bar) and vanishes at the
high-noise steps where the prompt is the only information. This script
trains matched tiny models (box/cylinder/sphere) under each parameterization
and scores both with evaluation.pointcloud_eval.conditioning_report.

Result (round 5, second session; results/pc_cond_param_ab_cpu_r5.json):
v-prediction reaches conditioning_accuracy 1.0 (class separation 0.145) at
700 steps where the eps recipe sits at chance — the reference's guidance
sweep intent (`test_optimize.py:478-545`) becomes actually exercisable.

Usage: STEPS=700 NPTS=96 BATCH=32 python scripts/cond_micro_ab.py [eps|v|both]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nova_pointcloud_tpu.utils import platform  # noqa: E402

os.environ.setdefault("NOVA_PLATFORM", "cpu")
platform.ensure_cpu_if_forced()

import jax, jax.numpy as jnp
import numpy as np
import optax

from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.schedulers.ddpm import DDPMScheduler
from nova_pointcloud_tpu.pipelines.pointcloud_train import make_pc_loss_fn, PointCloudLossConfig
from nova_pointcloud_tpu.pipelines.pointcloud_gen import NOVAPointCloudGenerationPipeline
from nova_pointcloud_tpu.data.shapenet import make_synthetic_clouds
from nova_pointcloud_tpu.evaluation.pointcloud_eval import conditioning_report

N_POINTS = int(os.environ.get("NPTS", "128"))
BATCH = int(os.environ.get("BATCH", "48"))
STEPS = int(os.environ.get("STEPS", "1500"))
ARCH = os.environ.get("ARCH", "pc_d4w256")
COND_DROPOUT = 0.1


def run_recipe(name, prediction_type, loss_cfg=None, lr=3e-4, seed=0):
    enc = DummyTextEncoder(256, 16)
    sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2",
                          prediction_type=prediction_type)
    model = NOVAPointCloudTransformer(
        arch=ARCH, point_cloud_size=N_POINTS, patch_size=1,
        text_token_dim=256, dropout=0.0)
    key = jax.random.PRNGKey(seed)
    params = jax.jit(model.init)(key, jnp.zeros((1, N_POINTS, 3)),
                                 jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 16, 256)))["params"]
    loss_fn = make_pc_loss_fn(model, sched,
                              loss_cfg or PointCloudLossConfig(use_ar_loss=False))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, k):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, k)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed + 1)
    kinds = ["box", "cylinder", "sphere"]
    t0 = time.time()
    for i in range(STEPS):
        shapes = make_synthetic_clouds(BATCH, N_POINTS, seed=rng.randint(1 << 30))
        pts = np.stack([s["points"] for s in shapes])
        prompts = [("" if rng.rand() < COND_DROPOUT else s["prompt"]) for s in shapes]
        emb, _ = enc.encode(prompts)
        batch = {"points": jnp.asarray(pts), "text": jnp.asarray(emb)}
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k)
        if i % 250 == 0 or i == STEPS - 1:
            print(f"[{name}] step {i} loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    pipe = NOVAPointCloudGenerationPipeline(model, params, scheduler=sched,
                                            text_encoder=enc)
    refs = {}
    for kcls in kinds:
        shapes = make_synthetic_clouds(24, N_POINTS, seed=999)
        refs[kcls] = np.stack([s["points"] for s in shapes if s["synset"] == kcls])
    rep = conditioning_report(pipe, refs, num_points=N_POINTS,
                              samples_per_class=8, guidance_scale=3.0,
                              key=jax.random.PRNGKey(7))
    out = {k: rep[k] for k in ("conditioning_accuracy", "class_separation",
                               "null_degradation", "conditioned_ok",
                               "diag_cd", "null_cd")}
    print(f"[{name}] {json.dumps(out, default=float)}", flush=True)
    return rep


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    results = {}
    if which in ("eps", "both"):
        results["eps"] = run_recipe("eps", "epsilon")
    if which in ("v", "both"):
        results["v"] = run_recipe("v", "v_prediction")
    with open(f"/tmp/cond_micro_{which}.json", "w") as f:
        json.dump(results, f, default=float, indent=1)
