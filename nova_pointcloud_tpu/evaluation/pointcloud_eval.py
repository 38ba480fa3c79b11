"""Point-cloud quantitative evaluation harness.

Capability parity with `/root/reference/test_optimize.py`:
- stats.json normalizer loading for a fixed coordinate system (`:39-74`)
- CD (density-weighted option, `:354-383`) and exact Hungarian EMD
  (`:385-415`) against test-split clouds
- guidance-scale sweep picking the best CD (`:478-545`)
- JSON results dump (`:694-707`)

Exact EMD runs on host (scipy Hungarian, eval-only); CD runs on device.
"""

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.data.shapenet import GlobalNormalizer
from nova_pointcloud_tpu.ops import losses as L


@dataclasses.dataclass
class EvalResult:
    guidance_scale: float
    chamfer: float
    chamfer_weighted: float
    emd: float
    seconds: float


def evaluate_batch(pred: np.ndarray, target: np.ndarray,
                   max_emd_points: int = 512) -> Dict[str, float]:
    """CD + density-weighted CD (device) and Hungarian EMD (host, subsampled).

    EMD subsamples to ``max_emd_points`` per cloud — exact Hungarian is
    O(n^3); the reference evaluates at similar scales.
    """
    pred_j, tgt_j = jnp.asarray(pred), jnp.asarray(target)
    cd = float(jnp.mean(L.chamfer_distance(pred_j, tgt_j)))
    cdw = float(jnp.mean(L.density_weighted_chamfer(pred_j, tgt_j)))
    emds = []
    for p, t in zip(pred, target):
        if len(p) > max_emd_points:
            idx = np.random.RandomState(0).choice(len(p), max_emd_points, False)
            p, t = p[idx], t[np.random.RandomState(1).choice(
                len(t), max_emd_points, False)]
        emds.append(L.hungarian_emd_host(p, t))
    return {"chamfer": cd, "chamfer_weighted": cdw, "emd": float(np.mean(emds))}


class PointCloudEvaluator:
    """Guidance-sweep evaluator over a generation pipeline."""

    def __init__(self, pipeline, stats_path: Optional[str] = None):
        self.pipeline = pipeline
        if stats_path and os.path.exists(stats_path):
            self.pipeline.normalizer = GlobalNormalizer.load(stats_path)

    def run(
        self,
        prompts: Sequence[str],
        references: np.ndarray,  # (B, N, 3), same coordinate system
        guidance_scales: Sequence[float] = (1.0, 2.0, 3.0, 5.0),
        num_points: int = 2048,
        num_diffusion_steps: int = 25,
        key: Optional[jax.Array] = None,
        output_json: Optional[str] = None,
        postprocess: str = "eval",  # test_optimize.py:344 clamp, no tanh
        deterministic: bool = False,  # zero-variance reverse DDPM
        guidance_trunc: float = 0.0,  # half-batch CFG truncation threshold
    ) -> Dict:
        key = key if key is not None else jax.random.PRNGKey(0)
        sweep: List[EvalResult] = []
        for gs in guidance_scales:
            t0 = time.time()
            out = self.pipeline(list(prompts), num_points=num_points,
                                num_diffusion_steps=num_diffusion_steps,
                                guidance_scale=gs, key=key,
                                postprocess=postprocess,
                                deterministic=deterministic,
                                guidance_trunc=guidance_trunc)
            metrics = evaluate_batch(np.asarray(out.point_clouds),
                                     np.asarray(references))
            sweep.append(EvalResult(gs, metrics["chamfer"],
                                    metrics["chamfer_weighted"], metrics["emd"],
                                    time.time() - t0))
        best = min(sweep, key=lambda r: r.chamfer)
        results = {
            "sweep": [dataclasses.asdict(r) for r in sweep],
            "best_guidance_scale": best.guidance_scale,
            "best_chamfer": best.chamfer,
            "best_emd": best.emd,
            "num_prompts": len(prompts),
            "num_points": num_points,
            "guidance_trunc": guidance_trunc,
        }
        if output_json:
            with open(output_json, "w") as f:
                json.dump(results, f, indent=2)
        return results


def conditioning_report(
    pipeline,
    refs_by_class: Dict[str, np.ndarray],  # class -> (B, N, 3) references
    prompt_for: Optional[Dict[str, str]] = None,  # class -> prompt
    num_points: int = 2048,
    num_diffusion_steps: int = 25,
    guidance_scale: float = 3.0,
    samples_per_class: int = 8,
    key: Optional[jax.Array] = None,
    generate_fn=None,  # override: (prompts, key) -> (B, N, 3), for tests
) -> Dict:
    """Discriminative text-conditioning eval: cross-class CD matrix + a
    null-conditioning ablation control.

    The reference's guidance sweep (`test_optimize.py:478-545`) only scores
    paired CD, which stays flat when conditioning saturates — or when it is
    DEAD and every class's references are near the generated marginal. This
    report distinguishes the two:

    - ``cross_cd[i][j]``: mean CD of clouds generated for class i's prompt
      against class j's references. ``conditioning_accuracy`` = fraction of
      rows whose DIAGONAL is the row minimum — 1.0 for live conditioning,
      ~chance for a dead text path.
    - null control: the same generation with the text dropped (empty prompt
      == the CFG uncond embedding, guidance 1.0). ``null_degradation`` =
      mean over classes of (null CD to class refs - conditioned diagonal
      CD); must be clearly positive when conditioning matters.

    ``conditioned_ok`` (the CI guard) fails when conditioning is ablated:
    accuracy must be perfect AND the null control must degrade by at least
    25% of the class-separation scale (mean offdiag - mean diag).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    classes = sorted(refs_by_class)
    prompt_for = prompt_for or {c: f"a {c}" for c in classes}

    def gen(prompts, k):
        if generate_fn is not None:
            return np.asarray(generate_fn(prompts, k))
        out = pipeline(list(prompts), num_points=num_points,
                       num_diffusion_steps=num_diffusion_steps,
                       guidance_scale=(1.0 if all(p == "" for p in prompts)
                                       else guidance_scale),
                       key=k, postprocess="eval")
        return np.asarray(out.point_clouds)

    def mean_cd(a, b):
        # mean over all (generated, reference) pairs, not index-paired:
        # conditioning is a distribution-level property
        na, nb = len(a), len(b)
        aa = np.repeat(a, nb, axis=0)
        bb = np.tile(b, (na, 1, 1))
        return float(jnp.mean(L.chamfer_distance(jnp.asarray(aa),
                                                 jnp.asarray(bb))))

    keys = jax.random.split(key, len(classes) + 1)
    cross = np.zeros((len(classes), len(classes)))
    for i, c in enumerate(classes):
        gen_i = gen([prompt_for[c]] * samples_per_class, keys[i])
        for j, cj in enumerate(classes):
            cross[i, j] = mean_cd(gen_i, refs_by_class[cj][:samples_per_class])

    null_gen = gen([""] * samples_per_class, keys[-1])
    null_cd = np.array([mean_cd(null_gen, refs_by_class[c][:samples_per_class])
                        for c in classes])

    diag = np.diag(cross)
    offdiag = cross[~np.eye(len(classes), dtype=bool)]
    accuracy = float(np.mean(np.argmin(cross, axis=1) == np.arange(len(classes))))
    separation = float(offdiag.mean() - diag.mean())
    null_degradation = float(np.mean(null_cd - diag))
    ok = bool(accuracy == 1.0 and separation > 0
              and null_degradation > 0.25 * separation)
    return {
        "classes": classes,
        "cross_cd": cross.tolist(),
        "conditioning_accuracy": accuracy,
        "diag_cd": diag.tolist(),
        "null_cd": null_cd.tolist(),
        "class_separation": separation,
        "null_degradation": null_degradation,
        "conditioned_ok": ok,
    }
