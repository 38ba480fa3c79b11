#!/usr/bin/env python
"""Train the masked-AR point-cloud model on the same synthetic clouds as the
flat-DDPM trainer and evaluate CD/EMD, for the AR-vs-flat comparison
(`test_optimize.py`-style sweep on the same stats.json coordinate system)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="pc_d8w768")
    ap.add_argument("--max-points", type=int, default=1024)
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--stats", default="output/pc_r2/stats.json")
    ap.add_argument("--out", default="results/pc_ar_quality_r2.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nova_pointcloud_tpu.data.shapenet import (GlobalNormalizer,
                                                   make_batches,
                                                   make_synthetic_clouds)
    from nova_pointcloud_tpu.engine.lr_schedules import cosine_lr
    from nova_pointcloud_tpu.engine.trainer import Trainer
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import evaluate_batch
    from nova_pointcloud_tpu.models.pointcloud_ar import (
        NOVAPointCloudARTransformer)
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.pointcloud_ar import (
        NOVAPointCloudARPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    normalizer = GlobalNormalizer.load(args.stats)
    text_encoder = DummyTextEncoder(256, 16)
    scheduler = DDPMScheduler(beta_schedule="squaredcos_cap_v2")
    model = NOVAPointCloudARTransformer(
        arch=args.arch, point_cloud_size=args.max_points,
        patch_size=args.patch_size, text_token_dim=256, text_token_len=16,
        noise_scheduler=scheduler, remat=True)
    rngs = {n: jax.random.PRNGKey(i) for i, n in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    params = jax.jit(model.init)(rngs, jnp.zeros((2, args.max_points, 3)),
                                 jnp.zeros((2, 16, 256)))["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"masked-AR {args.arch}: {n_params/1e6:.1f}M params")

    def loss_fn(p, batch, key):
        ks = jax.random.split(key, 4)
        rngs = dict(zip(("mask", "time", "noise", "dropout"), ks))
        losses = model.apply({"params": p}, batch["points"],
                             batch["text_embeds"], rngs=rngs)
        return losses["loss"], losses

    schedule = cosine_lr(args.lr, args.max_steps, warmup_steps=200)
    trainer = Trainer(loss_fn, params,
                      optax.chain(optax.clip_by_global_norm(5.0),
                                  optax.adamw(schedule, weight_decay=0.01)),
                      output_dir=None, lr_schedule=schedule,
                      max_steps=args.max_steps, log_every=100,
                      save_every=0, ema_decay=None, seed=args.seed)

    shapes = make_synthetic_clouds(64, args.max_points, args.seed)

    from nova_pointcloud_tpu.ops.pointops import morton_sort

    sort_fn = jax.jit(morton_sort, backend="cpu")

    def data():
        for batch in make_batches(shapes, args.batch_size, args.max_points,
                                  args.seed):
            pts = np.clip(normalizer.normalize(batch["points"]),
                          -1.0, 1.0).astype(np.float32)  # `train_newloss.py:919`
            # z-order sort so each 16-point patch token is a spatially
            # compact group (CD/EMD are order-invariant; see morton_sort)
            pts = np.asarray(sort_fn(pts))
            emb, _ = text_encoder.encode(batch["prompts"])
            yield {"points": pts, "text_embeds": emb}

    trainer.train(data(), args.max_steps)

    pipe = NOVAPointCloudARPipeline(model, trainer.params, scheduler,
                                    text_encoder=text_encoder,
                                    normalizer=normalizer)
    refs_shapes = make_synthetic_clouds(24, args.max_points, args.seed + 7)
    prompts = [s["prompt"] for s in refs_shapes]
    refs = np.clip(normalizer.normalize(
        np.stack([s["points"] for s in refs_shapes])), -1.0, 1.0).astype(np.float32)
    results = {"arch": args.arch, "params_m": round(n_params / 1e6, 1),
               "steps": args.max_steps, "mode": "masked_ar",
               "sweep": []}
    for gs in (1.0, 2.0, 3.0, 5.0):
        out = pipe(prompts, num_inference_steps=16, num_diffusion_steps=25,
                   guidance_scale=gs, key=jax.random.PRNGKey(11))
        m = evaluate_batch(np.asarray(out.point_clouds), refs)
        m["guidance_scale"] = gs
        results["sweep"].append(m)
        print("gs", gs, m)
    best = min(results["sweep"], key=lambda r: r["chamfer"])
    results["best_chamfer"] = best["chamfer"]
    results["best_emd"] = best["emd"]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
