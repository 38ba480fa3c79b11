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
