#!/usr/bin/env python
"""Real-vs-generated point-cloud comparison (the `demo.py` equivalent).

Parity with `/root/reference/demo.py:580-720`: per-sample CD/EMD against
reference clouds, two-stage "stable" generation with topology cleanup
(outlier removal, centering, unit normalization, `demo.py:381-446`), and
depth-colored side-by-side renders (matplotlib if available, PLY always).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topology_fix(points, k_outlier: int = 8, outlier_sigma: float = 2.0):
    """Outlier removal + centering + unit-norm (`demo.py:381-446`)."""
    import numpy as np

    d = np.linalg.norm(points[:, None] - points[None], axis=-1)
    knn = np.sort(d, axis=1)[:, 1: k_outlier + 1].mean(1)
    keep = knn < knn.mean() + outlier_sigma * knn.std()
    pts = points[keep] if keep.sum() > len(points) // 2 else points
    if len(pts) < len(points):  # resample dropped points from survivors
        idx = np.random.RandomState(0).randint(0, len(pts),
                                               len(points) - len(pts))
        pts = np.concatenate([pts, pts[idx]])
    pts = pts - pts.mean(0)
    scale = np.abs(pts).max() + 1e-8
    return pts / scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", nargs="+", default=["a sphere", "a box"])
    ap.add_argument("--arch", default="pc_d2w64")
    ap.add_argument("--num-points", type=int, default=256)
    ap.add_argument("--num-diffusion-steps", type=int, default=10)
    ap.add_argument("--guidance-scale", type=float, default=3.0)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--stats", default=None, help="stats.json normalizer")
    ap.add_argument("--output-dir", default="output/demo")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nova_pointcloud_tpu.data.shapenet import (
        GlobalNormalizer, make_synthetic_clouds)
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import evaluate_batch
    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler
    from nova_pointcloud_tpu.utils.export import export_to_ply

    os.makedirs(args.output_dir, exist_ok=True)
    model = NOVAPointCloudTransformer(
        arch=args.arch, point_cloud_size=args.num_points, patch_size=1,
        text_token_dim=256, dropout=0.0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, args.num_points, 3)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16, 256)))["params"]
    if args.checkpoint:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint))
        params = restored.get("ema", restored.get("params", restored))
    normalizer = GlobalNormalizer.load(args.stats) if args.stats else None
    pipe = NOVAPointCloudGenerationPipeline(
        model, params, DDPMScheduler(beta_schedule="squaredcos_cap_v2"),
        text_encoder=DummyTextEncoder(256, 16), normalizer=normalizer)

    refs = make_synthetic_clouds(len(args.prompt), args.num_points)
    out = pipe(args.prompt, num_points=args.num_points,
               num_diffusion_steps=args.num_diffusion_steps,
               guidance_scale=args.guidance_scale,
               key=jax.random.PRNGKey(args.seed),
               denormalize=normalizer is not None)

    for i, prompt in enumerate(args.prompt):
        gen = topology_fix(np.asarray(out.point_clouds[i]))
        ref = refs[i]["points"]
        metrics = evaluate_batch(gen[None], ref[None])
        print(f"[{prompt}] CD={metrics['chamfer']:.4f} "
              f"EMD={metrics['emd']:.4f}")
        export_to_ply(gen, os.path.join(args.output_dir, f"gen_{i}.ply"),
                      colors=np.asarray(out.colors[i]))
        export_to_ply(ref, os.path.join(args.output_dir, f"ref_{i}.ply"))
        try:  # depth-colored side-by-side render (`demo.py:448-531`)
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig = plt.figure(figsize=(8, 4))
            for j, (pts, title) in enumerate([(ref, "real"), (gen, "generated")]):
                axp = fig.add_subplot(1, 2, j + 1, projection="3d")
                axp.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=pts[:, 2],
                            cmap="viridis", s=2)
                axp.set_title(f"{title}: {prompt}")
                axp.set_axis_off()
            fig.savefig(os.path.join(args.output_dir, f"compare_{i}.png"),
                        dpi=120, bbox_inches="tight")
            plt.close(fig)
        except Exception as e:  # matplotlib optional
            print("render skipped:", e)
    print("outputs in", args.output_dir)


if __name__ == "__main__":
    main()
