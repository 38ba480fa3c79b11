#!/usr/bin/env python
"""Standalone text-to-point-cloud trainer (the `train_newloss.py` CLI).

CLI parity with `/root/reference/train_newloss.py:1552-1645`: max_points,
num_subsets, lr, batch size, epochs, early stopping patience, output dir;
swaps the torch DataLoader + host Hungarian for device-side batching and
Sinkhorn EMD. Falls back to procedural synthetic clouds when no ShapeNet
tree is given (bootstrap like the reference's Dummy* encoders).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None, help="ShapeNet 15k npy root")
    ap.add_argument("--categories", nargs="+", default=["all"])
    ap.add_argument("--output-dir", default="output/pc")
    ap.add_argument("--arch", default="pc_d8w768")
    ap.add_argument("--max-points", type=int, default=1024)
    ap.add_argument("--patch-size", type=int, default=1)
    ap.add_argument("--num-subsets", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--max-steps", type=int, default=10000)
    ap.add_argument("--val-every", type=int, default=500)
    ap.add_argument("--patience", type=int, default=8)
    ap.add_argument("--grad-clip", type=float, default=50.0)
    ap.add_argument("--ema-decay", type=float, default=0.99)
    ap.add_argument("--ema-every", type=int, default=10,
                    help="EMA update cadence in steps. The round-2 default "
                         "of 100 left the EMA dominated by the INIT after a "
                         "2400-step run (0.99^24 = 79% init weight)")
    ap.add_argument("--lr-min-ratio", type=float, default=0.1,
                    help="cosine floor as a fraction of peak lr; the "
                         "round-2 anneal-to-zero tail overfit point "
                         "samplings while sampled CD degraded")
    ap.add_argument("--cond-dropout", type=float, default=0.1,
                    help="per-sample probability of replacing the prompt "
                         "with '' so the CFG uncond branch is trained")
    ap.add_argument("--prediction-type", default="epsilon",
                    choices=("epsilon", "sample", "v_prediction"),
                    help="diffusion parameterization. v_prediction keeps an "
                         "O(1) text gradient at high noise (the eps target "
                         "scales the class signal by sqrt(alpha_bar)) — the "
                         "round-5 class-agnostic conditioning fix")
    ap.add_argument("--fresh-data", dest="fresh_data", action="store_true",
                    default=None,
                    help="stream freshly-sampled procedural clouds every "
                         "batch (infinite data; default ON for synthetic "
                         "bootstrap, OFF when --data-root is given)")
    ap.add_argument("--no-fresh-data", dest="fresh_data", action="store_false")
    ap.add_argument("--select-on", choices=("cd", "val_loss"), default="cd",
                    help="best-checkpoint/early-stop criterion: sampled "
                         "chamfer on EMA weights (default) or composite "
                         "val loss (the round-2 criterion — it kept "
                         "improving while sampled quality degraded)")
    ap.add_argument("--eval-shapes", type=int, default=24)
    ap.add_argument("--eval-steps", type=int, default=25)
    ap.add_argument("--eval-guidance", type=float, nargs="+",
                    default=[1.0, 3.0])
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-block gradient checkpointing")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--offload-opt-state", action="store_true",
                    help="park the Adam moments in pinned host memory "
                         "(ZeRO-Offload analogue; frees HBM for batch/"
                         "points at d48w1536 scale)")
    args = ap.parse_args()
    if args.fresh_data is None:
        args.fresh_data = args.data_root is None

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nova_pointcloud_tpu.data.shapenet import (
        GlobalNormalizer, ShapeNet15kPointClouds, make_batches,
        make_synthetic_clouds)
    from nova_pointcloud_tpu.engine.grad_tools import (
        adaptive_lr_on_spike, per_layer_clip)
    from nova_pointcloud_tpu.engine.lr_schedules import cosine_lr
    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.pointcloud_train import (
        NOVATrainPointCloudPipeline, PointCloudLossConfig)

    os.makedirs(args.output_dir, exist_ok=True)

    if args.data_root:
        train_ds = ShapeNet15kPointClouds(args.data_root, args.categories,
                                          split="train")
        val_ds = ShapeNet15kPointClouds(args.data_root, args.categories,
                                        split="val")
        sample_clouds = [train_ds[i]["points"] for i in
                         range(min(64, len(train_ds)))]
    else:
        print("no --data-root: training on synthetic bootstrap clouds")
        shapes = make_synthetic_clouds(64, args.max_points, args.seed)
        sample_clouds = [s["points"] for s in shapes]

        class _ListDS(list):
            def __getitem__(self, i):
                return list.__getitem__(self, i)

        train_ds = _ListDS(shapes)
        val_ds = _ListDS(make_synthetic_clouds(16, args.max_points,
                                               args.seed + 1))

    normalizer = GlobalNormalizer().fit(sample_clouds)
    normalizer.save(os.path.join(args.output_dir, "stats.json"))

    text_encoder = DummyTextEncoder(256, 16)
    model = NOVAPointCloudTransformer(
        arch=args.arch, point_cloud_size=args.max_points,
        patch_size=args.patch_size, text_token_dim=256,
        remat=not args.no_remat)
    x0 = jnp.zeros((2, args.max_points, 3))
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)},
        x0, jnp.zeros((2,), jnp.int32), jnp.zeros((2, 16, 256)))["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model {args.arch}: {n_params/1e6:.1f}M params")

    schedule = cosine_lr(args.lr, args.max_steps,
                         lr_min=args.lr * args.lr_min_ratio, warmup_steps=200)
    optimizer = optax.chain(
        per_layer_clip(args.grad_clip,
                       {"output_proj": 0.5, "time_": 0.3}),
        adaptive_lr_on_spike(explode_norm=args.grad_clip),
        optax.adamw(schedule, weight_decay=0.01),
    )
    from nova_pointcloud_tpu.schedulers import DDPMScheduler
    sched = DDPMScheduler(beta_schedule="squaredcos_cap_v2",
                          prediction_type=args.prediction_type)
    # sidecar so eval_pc_quality samples with the SAME parameterization the
    # checkpoint was trained for (an eps-sampler on a v-model is silent
    # garbage)
    with open(os.path.join(args.output_dir, "train_config.json"), "w") as f:
        json.dump({"prediction_type": args.prediction_type,
                   "arch": args.arch, "patch_size": args.patch_size,
                   "max_points": args.max_points}, f)
    pipe = NOVATrainPointCloudPipeline(
        model, params, scheduler=sched,
        text_encoder=text_encoder, normalizer=normalizer,
        output_dir=args.output_dir, optimizer=optimizer,
        loss_config=PointCloudLossConfig(num_subsets=args.num_subsets),
        max_steps=args.max_steps, log_every=20, save_every=args.val_every,
        ema_decay=args.ema_decay, ema_every=args.ema_every,
        lr_schedule=schedule, seed=args.seed,
        offload_opt_state=args.offload_opt_state)

    drop_rng = np.random.RandomState(args.seed + 1234)

    def norm_batches(ds, seed, cond_dropout=0.0):
        for batch in make_batches(ds, args.batch_size, args.max_points, seed):
            # clamp to [-1, 1] after normalization like the reference
            # (`train_newloss.py:919`): the sampler's tanh/clamp postprocess
            # assumes the data distribution lives in [-1, 1]
            batch["points"] = np.clip(normalizer.normalize(batch["points"]),
                                      -1.0, 1.0)
            if cond_dropout > 0:
                # train the CFG uncond branch on exactly what sampling feeds
                # it: the encoder's "" embedding (encode_prompt semantics)
                batch["prompts"] = [
                    "" if drop_rng.rand() < cond_dropout else p
                    for p in batch["prompts"]]
            yield batch

    def fresh_batches(seed, cond_dropout=0.0):
        """Infinite stream of freshly-sampled procedural clouds.

        The round-2 flagship memorized the FIXED point samplings of 64
        cached clouds (diffusion MSE kept improving while sampled CD
        degraded); resampling every batch makes the target the underlying
        surface distribution, which is what the sampler is scored on.
        """
        batch_seed = seed
        while True:
            batch_seed += 1
            shapes = make_synthetic_clouds(args.batch_size, args.max_points,
                                           batch_seed)
            pts = np.stack([s["points"] for s in shapes])
            pts = np.clip(normalizer.normalize(pts), -1.0, 1.0)
            prompts = [s["prompt"] for s in shapes]
            if cond_dropout > 0:
                prompts = ["" if drop_rng.rand() < cond_dropout else p
                           for p in prompts]
            yield {"points": pts.astype(np.float32), "prompts": prompts}

    # in-training sampled-quality eval: EMA weights through the generation
    # pipeline at eval postprocess, CD vs a FIXED held-out set. Selection
    # seed differs from scripts/eval_pc_quality.py's default (123) so model
    # selection never sees the reported eval set.
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import PointCloudEvaluator
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    eval_shapes = make_synthetic_clouds(args.eval_shapes, args.max_points,
                                        args.seed + 7)
    eval_prompts = [s["prompt"] for s in eval_shapes]
    eval_refs = np.clip(normalizer.normalize(
        np.stack([s["points"] for s in eval_shapes])), -1.0, 1.0)
    eval_model = NOVAPointCloudTransformer(
        arch=args.arch, point_cloud_size=args.max_points,
        patch_size=args.patch_size, text_token_dim=256, dropout=0.0,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else None)
    eval_pipe = NOVAPointCloudGenerationPipeline(
        eval_model, None,
        DDPMScheduler(beta_schedule="squaredcos_cap_v2",
                      prediction_type=args.prediction_type),
        text_encoder=text_encoder)
    evaluator = PointCloudEvaluator(eval_pipe)

    def sampled_cd(step):
        w = pipe.trainer.ema.params if pipe.trainer.ema is not None \
            else pipe.params
        if eval_model.dtype == jnp.bfloat16:
            w = jax.tree.map(lambda p: p.astype(jnp.bfloat16), w)
        eval_pipe.params = w
        try:
            r = evaluator.run(eval_prompts, eval_refs,
                              guidance_scales=tuple(args.eval_guidance),
                              num_points=args.max_points,
                              num_diffusion_steps=args.eval_steps,
                              key=jax.random.PRNGKey(args.seed + step))
        finally:
            # release the bf16 weight copy: at flagship scale (612M) keeping
            # it alive through the next training leg OOMs the chip
            eval_pipe.params = None
            del w
        return r["best_chamfer"], r["best_guidance_scale"], r["best_emd"]

    train_stream = (fresh_batches(args.seed, args.cond_dropout)
                    if args.fresh_data
                    else norm_batches(train_ds, args.seed, args.cond_dropout))

    # early stopping + best checkpoint on sampled CD over EMA weights
    # (reference selects on val loss, `train_newloss.py:1407-1434`; round-2
    # showed val loss and sampled geometry diverge — VERDICT r2 weak #2)
    best_metric, bad_rounds = float("inf"), 0
    step = pipe.trainer.step  # resume-aware
    while step < args.max_steps and bad_rounds < args.patience:
        target = min(step + args.val_every, args.max_steps)
        pipe.train(train_stream, max_steps=target)
        step = pipe.trainer.step
        val_batches = []
        vb = norm_batches(val_ds, args.seed + 99)
        for _ in range(4):
            val_batches.append(next(vb))
        val = pipe.validate(val_batches)
        line = ", ".join(f"{k}={v:.4f}" for k, v in val.items())
        if args.select_on == "cd":
            cd, gs, emd = sampled_cd(step)
            line += f", sampled_cd={cd:.4f} (gs={gs}, emd={emd:.4f})"
            metric = cd
        else:
            metric = val["loss"]
        print(f"[val @ {step}] {line}", flush=True)
        if metric < best_metric - 1e-5:
            best_metric, bad_rounds = metric, 0
            pipe.trainer.save_best(metric)
        else:
            bad_rounds += 1
    print(f"done at step {step}; best {args.select_on} {best_metric:.4f}")


if __name__ == "__main__":
    main()
