#!/usr/bin/env python
"""Quality evaluation of a trained point-cloud checkpoint: CD/EMD sweep,
bf16 vs int8 serving, noise baseline. Writes a results JSON for CI.

Mirrors the reference's `test_optimize.py:478-545` guidance sweep + JSON
dump (`:694-707`) on the fixed stats.json coordinate system.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", default="output/pc_r2")
    ap.add_argument("--arch", default="pc_d8w768")
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--patch-size", type=int, default=1)
    ap.add_argument("--num-shapes", type=int, default=24)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--out", default="results/pc_quality_r2.json")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--latest", action="store_true",
                    help="evaluate the latest periodic checkpoint even when "
                         "a best-on-CD slot exists")
    ap.add_argument("--use-ema", action="store_true",
                    help="evaluate the EMA weights saved alongside params "
                         "(sampled quality tracks EMA better than the raw "
                         "weights at annealed-LR tails)")
    ap.add_argument("--guidance", type=float, nargs="+",
                    default=(1.0, 2.0, 3.0, 5.0),
                    help="guidance scales to sweep (reference sweep: "
                         "test_optimize.py:478-545)")
    ap.add_argument("--guidance-trunc", type=float, default=0.0,
                    help="disable CFG below this timestep (half-batch "
                         "truncated serving; guidance_scaler.py:59-65)")
    ap.add_argument("--static-acts", dest="static_acts", action="store_true",
                    help="also score the int8 path with CALIBRATED static "
                         "activation scales (pipeline.calibrate) as a third "
                         "'int8_static' row")
    ap.add_argument("--conditioning", action="store_true",
                    help="also run the discriminative conditioning report: "
                         "cross-class CD matrix + null-text ablation control "
                         "(evaluation.pointcloud_eval.conditioning_report); "
                         "fails the eval when the text path is dead")
    ap.add_argument("--deterministic", action="store_true",
                    help="zero-variance reverse DDPM (DDIM-style ancestral "
                         "mean): removes the per-step sampling noise floor "
                         "from the measured geometry")
    ap.add_argument("--attn-core", choices=("f32", "bf16", "int8"),
                    default="bf16",
                    help="fused-kernel attention-core precision for the "
                         "int8 rows (bench.py --attn-core A/B; CD guard "
                         "for the round-4 core variants)")
    ap.add_argument("--prediction-type", default=None,
                    choices=("epsilon", "sample", "v_prediction"),
                    help="override the checkpoint's train_config.json "
                         "parameterization (default: read the sidecar, "
                         "else epsilon)")
    args = ap.parse_args()

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nova_pointcloud_tpu.data.shapenet import (GlobalNormalizer,
                                                   make_synthetic_clouds)
    from nova_pointcloud_tpu.engine.checkpoint import CheckpointManager
    from nova_pointcloud_tpu.evaluation.pointcloud_eval import (
        PointCloudEvaluator, evaluate_batch)
    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    on_tpu = jax.default_backend() == "tpu"
    normalizer = GlobalNormalizer.load(
        os.path.join(args.checkpoint_dir, "stats.json"))
    # sample with the parameterization the checkpoint was TRAINED for
    # (train_pointcloud.py writes the sidecar; eps-sampling a v-model is
    # silent garbage). CLI --prediction-type still wins if given.
    prediction_type = args.prediction_type
    tc_path = os.path.join(args.checkpoint_dir, "train_config.json")
    if prediction_type is None:
        if os.path.exists(tc_path):
            with open(tc_path) as f:
                prediction_type = json.load(f).get("prediction_type", "epsilon")
        else:
            prediction_type = "epsilon"
    print(f"# prediction_type={prediction_type}")
    shapes = make_synthetic_clouds(args.num_shapes, args.num_points,
                                   args.seed)
    prompts = [s["prompt"] for s in shapes]
    refs = np.clip(normalizer.normalize(
        np.stack([s["points"] for s in shapes])), -1.0, 1.0).astype(np.float32)  # `train_newloss.py:919`

    def build(quantize):
        model = NOVAPointCloudTransformer(
            arch=args.arch, point_cloud_size=args.num_points,
            patch_size=args.patch_size,
            text_token_dim=256, dropout=0.0, quantize=quantize,
            attn_core=args.attn_core,
            dtype=jnp.bfloat16 if on_tpu else None)
        x = jnp.zeros((1, args.num_points, 3))
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16, 256)))["params"]
        ckpt = CheckpointManager(args.checkpoint_dir)
        template = {"params": params}
        if args.use_ema:
            template["ema"] = params
        # prefer the quality-selected slot (best sampled CD over EMA weights,
        # scripts/train_pointcloud.py) over the latest periodic save
        out = None if args.latest else ckpt.restore_best(template=template)
        if out is None:
            out = ckpt.restore(template=template)
        if out is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
        params = out["state"]["ema" if args.use_ema else "params"]
        step = out["step"]
        if on_tpu:
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        pipe = NOVAPointCloudGenerationPipeline(
            model, params,
            DDPMScheduler(beta_schedule="squaredcos_cap_v2",
                          prediction_type=prediction_type),
            text_encoder=DummyTextEncoder(256, 16))
        return pipe, step

    results = {"arch": args.arch, "num_points": args.num_points,
               "diffusion_steps": args.steps,
               "attn_core": args.attn_core,
               "backend": jax.default_backend()}

    # noise baseline: what CD/EMD does pure noise score?
    noise = np.clip(np.random.RandomState(0).randn(*refs.shape),
                    -2, 2).astype(np.float32)
    results["noise_baseline"] = evaluate_batch(noise, refs)

    variants = [("bf16", False, False), ("int8", True, False)]
    if args.static_acts:
        variants.append(("int8_static", True, True))
    for tag, quantize, static in variants:
        if quantize and not on_tpu:
            continue
        pipe, step = build(quantize)
        if static:
            pipe.calibrate(
                prompt_embeds=pipe.encode_prompt(prompts),
                num_points=args.num_points, num_diffusion_steps=args.steps)
        results["checkpoint_step"] = step
        ev = PointCloudEvaluator(pipe)
        r = ev.run(prompts, refs, guidance_scales=tuple(args.guidance),
                   num_points=args.num_points,
                   num_diffusion_steps=args.steps,
                   key=jax.random.PRNGKey(args.seed),
                   deterministic=args.deterministic,
                   guidance_trunc=args.guidance_trunc)
        results[tag] = r
        print(tag, "best_cd=%.4f best_emd=%.4f @gs=%s" % (
            r["best_chamfer"], r["best_emd"], r["best_guidance_scale"]))

        if args.conditioning:
            from nova_pointcloud_tpu.evaluation.pointcloud_eval import (
                conditioning_report)

            refs_by_class = {}
            for s, ref in zip(shapes, refs):
                refs_by_class.setdefault(s["synset"], []).append(ref)
            refs_by_class = {k: np.stack(v) for k, v in refs_by_class.items()}
            rep = conditioning_report(
                pipe, refs_by_class, num_points=args.num_points,
                num_diffusion_steps=args.steps,
                guidance_scale=r["best_guidance_scale"],
                key=jax.random.PRNGKey(args.seed + 1))
            results[tag + "_conditioning"] = rep
            print(tag, "conditioning acc=%.2f sep=%.4f null_deg=%.4f ok=%s"
                  % (rep["conditioning_accuracy"], rep["class_separation"],
                     rep["null_degradation"], rep["conditioned_ok"]))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
