#!/usr/bin/env python
"""Flagship benchmark: 2048-point text-to-point-cloud at 0.6B, samples/sec/chip.

Metric (BASELINE.json): samples/sec/chip for 2048-pt t2pc at 0.6B + p50
latency per sample. The pipeline measured is the full parity path of
`pipeline_nova_pointcloud_gen.py`: CFG x2 DDPM with 25 diffusion steps,
postprocess, colors — all one jitted program on one chip, timed through a
4-byte D2H checksum (the axon relay does not honor block_until_ready).

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md), so
the baseline is the reference DESIGN on H100, grounded in a measured torch
datapoint rather than guesswork:

  * Measured (torch.utils.flop_counter.FlopCounterMode on the reference's own
    `NOVAPointCloudTransformer(point_cloud_size=2048)` from
    `transformer_pointcloud_nova.py:533`, CPU torch, this host):
    335.1 GFLOP/forward at B=1 and 72.1M params. The reference embeds EVERY
    point as a token (per-point Linear + pos table `:562-565`), so its
    per-sample cost scales as 2 * params * 2048 tokens.
  * Scaled to the metric's 0.6B params (same per-point design):
    2*611.7e6*2048 + attention 4*2048^2*1024*48 = ~3.33 TFLOP/forward,
    x 50 forwards (25 DDPM steps x CFG 2) = ~166.5 TFLOP/sample.
  * H100 credit: 60% fp16 MFU (generous for eager torch at seq 2048 — the
    reference has no torch.compile, fused norms, or CUDA graphs) of
    989.5 TFLOP/s => 594 TF/s => 166.5/594 = 0.280 s/sample
    => ~3.57 samples/s; rounded UP to 4.0 to stay conservative.

  This repo runs the same workload spec (0.6B params, 2048 points, 25 steps,
  CFG x2) at ~7.9 TFLOP/sample via 16-point token patching — a TPU-first
  algorithmic redesign, counted as part of the framework under test (the
  reference's own registry ViT variant also patches, `:395-405`, but its
  shipped pipeline model does not). For transparency the JSON also reports
  `vs_patched_h100`: the ratio against a hypothetical reference that adopted
  the same patching on H100 (7.9 TFLOP/sample at a generous 25% eager MFU
  => ~32 samples/s, the round-1 baseline).

Prints ONE JSON line.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

# reference design (per-point tokens) at 0.6B on H100, measured-FLOPs derivation
H100_EST_SAMPLES_PER_SEC = 4.0
# round-1 charitable baseline: reference WITH our token patching on H100
H100_PATCHED_EST_SAMPLES_PER_SEC = 32.0

# t2i / t2v reference cost models (scripts/measure_reference_flops.py:
# FlopCounterMode on the reference's own VisionTransformer/DiffusionMLP at
# the bench token counts, assembled per the transformer_3d.py:116-164 loop):
#   t2i sd512-class: 64 AR x enc(d32w1024, L1312) x CFG2 + 25 x mlp(d6w1024,
#     L1024) x CFG2 + video BOS pass = 139.1 TFLOP/image
#   t2v osp480 9fr: 9 x [64 AR x enc(L2056) x2 + 25 x mlp(d3w1280) x2 + vid]
#     = 1951.9 TFLOP/video
# H100 credit: 60% fp16 MFU of 989.5 TF/s (generous for eager torch), same
# convention as the t2pc baseline above.
T2I_REF_TFLOP_PER_IMAGE = 139.13
T2I_H100_EST_IMAGES_PER_SEC = 4.27
T2V_REF_TFLOP_PER_VIDEO = 1951.9
T2V_H100_EST_VIDEOS_PER_SEC = 0.304  # 3.29 s/video

# TRAIN-step cost models (scripts/measure_reference_flops.py --train:
# FlopCounterMode on the reference's own NOVATransformer3DModel d48w1024
# in train mode at the bench shapes — TAM + MAM + loss_repeat=4 diffusion
# MLP, `transformer_3d.py:165-190`). Train-mode MaskEmbed MAE-gathers only
# the visible encoder tokens, so per-sample FLOPs depend on the truncnorm
# mask-ratio draw — the figures are MEANS over seeded draws (8 for t2i, 3
# for t2v). train = 3x fwd (bwd credited at 2x); same 60% eager H100 MFU
# credit as the sampling baselines (generous: the reference trains eager
# DeepSpeed ZeRO-2 bf16 with grad checkpointing, which REPLAYS the
# forward — its real cost is 4x fwd).
#   t2i sd512-class: fwd 1078.7 GFLOP -> 3.236 TFLOP/sample
TRAIN_T2I_REF_TFLOP_PER_SAMPLE = 3.236
TRAIN_T2I_H100_EST_SAMPLES_PER_SEC = 183.5
#   t2v osp480-class 9 latent frames (block-causal TAM + per-frame MAM):
#     fwd 13362.4 GFLOP -> 40.087 TFLOP/sample
TRAIN_T2V_REF_TFLOP_PER_SAMPLE = 40.087
TRAIN_T2V_H100_EST_SAMPLES_PER_SEC = 14.81
#   t2i 1.4B d48w1536 sdxl1024-class (64x64 patches, params 1446.3M):
#     fwd 9544.6 GFLOP -> 28.634 TFLOP/sample
TRAIN_T2I_14B_REF_TFLOP_PER_SAMPLE = 28.634
TRAIN_T2I_14B_H100_EST_SAMPLES_PER_SEC = 20.73


def _last_json_line(text):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue  # keep scanning: stray '{...' noise after the line
    return None


def _resilient_outer() -> int:
    """Outage-resilient driver entry (VERDICT r3 next #1).

    The axon TPU tunnel has multi-hour outages and its remote compiler
    occasionally stalls forever on a fresh program (CLAUDE.md). A driver
    capture landing in either previously turned into rc=1 and erased the
    round's perf evidence (round 3). Instead: health-poll the tunnel in a
    subprocess, run the actual bench as a bounded child, and retry on
    failure or stall until a global deadline. The persistent XLA compile
    cache makes retries cheap — a killed attempt's compiled programs are
    reused by the next one.

    Env knobs: NOVA_BENCH_DEADLINE_S (total budget, default 14400
    — the axon outages run long; round 3 lost its evidence to a
    2h-deadline capture landing mid-outage),
    NOVA_BENCH_ATTEMPT_S (per-attempt timeout, default 2700),
    NOVA_TPU_POLL_S (health poll cadence, default 120).
    """
    from nova_pointcloud_tpu.utils.platform import wait_for_tpu

    deadline = time.monotonic() + float(
        os.environ.get("NOVA_BENCH_DEADLINE_S", "14400"))
    per_attempt = float(os.environ.get("NOVA_BENCH_ATTEMPT_S", "2700"))
    poll_s = float(os.environ.get("NOVA_TPU_POLL_S", "120"))
    env = dict(os.environ, NOVA_BENCH_INNER="1")
    attempt, last_rc, last_out = 0, 1, ""
    hard_failures = 0  # consecutive fast rc!=0 exits while the TPU is healthy
    while time.monotonic() < deadline - 30:
        attempt += 1
        # Reserve room for one full attempt: poll only up to
        # deadline - per_attempt, then try anyway (the probe could be
        # wrong, and a doomed attempt still reports a real traceback).
        up = wait_for_tpu(
            max_wait_s=max(0.0, deadline - time.monotonic() - per_attempt
                           - 30), poll_s=poll_s,
            probe_timeout_s=float(
                os.environ.get("NOVA_TPU_PROBE_TIMEOUT_S", "150")),
            log=lambda m: print(f"# wait_for_tpu: {m}", file=sys.stderr))
        print(f"# attempt {attempt}: tpu_healthy={up}", file=sys.stderr)
        budget = min(per_attempt, deadline - time.monotonic() - 10)
        if budget <= 30:
            break
        with tempfile.TemporaryFile("w+") as f:
            t_child = time.monotonic()
            try:
                rc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)]
                    + sys.argv[1:], stdout=f, env=env,
                    timeout=budget).returncode
            except subprocess.TimeoutExpired:
                hard_failures = 0
                print(f"# attempt {attempt}: killed after {budget:.0f}s "
                      "(remote-compiler stall profile); retrying",
                      file=sys.stderr)
                continue
            child_s = time.monotonic() - t_child
            f.seek(0)
            out = f.read()
        last_rc, last_out = rc, out
        if rc == 0 and _last_json_line(out) is not None:
            sys.stdout.write(out)
            return 0
        # A fast nonzero exit while the tunnel is HEALTHY is a deterministic
        # bug (e.g. a VMEM-OOM compile error from a bad block-shape
        # override), not an outage — retrying for hours would just block
        # the queue. Outages look like probe-down or stalls/timeouts.
        if up and rc != 0 and child_s < 900:
            hard_failures += 1
            if hard_failures >= 2:
                print(f"# attempt {attempt}: rc={rc} in {child_s:.0f}s with "
                      "a healthy TPU twice in a row — deterministic "
                      "failure, giving up", file=sys.stderr)
                break
        else:
            hard_failures = 0
        print(f"# attempt {attempt}: rc={rc}, json={_last_json_line(out) is not None}; "
              "retrying", file=sys.stderr)
    sys.stdout.write(last_out)
    return last_rc or 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true",
                    help="tiny model / 2 steps, CI smoke")
    ap.add_argument("--mode", choices=("t2pc", "t2i", "t2v", "train"),
                    default="t2pc")
    ap.add_argument("--arch", default="pc_d48w1024",
                    help="t2pc arch; pc_d48w1536 benches the 1.4B config "
                         "(the north-star d48w1536 scale) on one chip")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 128 for t2pc (measured +5%% over 64 at "
                         "flagship shapes, round 5), 4 for t2i, 1 for t2v, "
                         "reference per-GPU batch for train")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--ar-steps", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--guidance-trunc", type=float, default=None,
                    help="disable CFG below this timestep — the "
                         "reference's maybe_disable chops to the cond chunk "
                         "(guidance_scaler.py:59-65), so truncated steps run "
                         "at half batch. Default 600: measured CD-neutral on "
                         "the trained flagship (results/pc_flagship_quality_"
                         "r3_trunc600.json); 0 disables. The JSON reports "
                         "vs_patched_h100_same_recipe alongside, crediting a "
                         "hypothetical reference with the same truncation. "
                         "Default: 600 for t2pc (CD-validated), 0 for "
                         "t2i/t2v (no on-host quality metric to validate a "
                         "recipe change; pass explicitly to measure the "
                         "half-batch split, tests/test_guidance_trunc_nova)")
    ap.add_argument("--quantize", dest="quantize", action="store_true",
                    default=True,
                    help="int8 fused-kernel serving path (default; the "
                         "flagship serving config)")
    ap.add_argument("--no-quantize", dest="quantize", action="store_false",
                    help="bf16 variant")
    ap.add_argument("--static-acts", dest="static_acts",
                    action="store_true", default=True,
                    help="t2pc int8: calibrate static activation scales on "
                         "one sampling trajectory first; the fused kernels "
                         "then skip their per-row amax reduces (default; "
                         "CD-neutral per results/pc_flagship_quality_r3_"
                         "static.json)")
    ap.add_argument("--no-static-acts", dest="static_acts",
                    action="store_false", help="per-row dynamic quant")
    ap.add_argument("--attn-core", choices=("f32", "bf16", "int8"),
                    default="bf16",
                    help="t2pc fused-kernel attention-core precision "
                         "(ops/pallas/fused_block._attn_core_head): bf16 "
                         "default (2x MXU rate vs round-3 f32), int8 for "
                         "the 4x-rate A/B")
    ap.add_argument("--bucket-fracs", default=None,
                    help="t2i/t2v: comma-separated phased-MAE-gather bucket "
                         "divisors (default 8,4,2; e.g. 16,8,4,2 adds a "
                         "finer early phase — NOVAPipeline.bucket_fracs)")
    ap.add_argument("--train-no-remat", action="store_true",
                    help="--mode train: disable per-block gradient "
                         "checkpointing (recompute-free backward; needs "
                         "smaller batch to fit HBM — A/B the remat cost)")
    ap.add_argument("--train-arch", choices=("t2i", "t2v", "t2i-1.4b"),
                    default="t2i",
                    help="--mode train flavor: t2i = sd512-class d48w1024 "
                         "(reference per-GPU batch 8), t2v = osp480-class "
                         "9-latent-frame video step (reference per-GPU "
                         "batch 3, configs/nova_d48w1024_osp480.yaml), "
                         "t2i-1.4b = d48w1536 sdxl1024-class (64x64 "
                         "patches; fp32 Adam is ~22GB — pair with "
                         "--offload-opt-state on a 16GB chip)")
    ap.add_argument("--offload-opt-state", action="store_true",
                    help="--mode train: park the Adam moments in pinned "
                         "HOST memory (ZeRO-Offload analogue; fits fp32 "
                         "Adam for the 1.4B d48w1536 config on one 16GB "
                         "chip). Reports the throughput cost of the "
                         "host<->HBM streaming.")
    ap.add_argument("--e2e", action="store_true",
                    help="t2i/t2v: full serving envelope incl. on-chip VAE "
                         "decode + uint8 postprocess (the reference "
                         "pipeline's __call__ scope, pipeline_nova.py:"
                         "140-144); reports the decode share of latency")
    args = ap.parse_args()
    if not args.dry_run and not os.environ.get("NOVA_BENCH_INNER"):
        # Real-TPU runs go through the outage-resilient wrapper; the child
        # re-enters main() with NOVA_BENCH_INNER=1. --dry-run (CPU smoke)
        # stays direct so CI never waits on the tunnel.
        sys.exit(_resilient_outer())
    if args.dry_run:
        # CI smoke must not depend on the TPU tunnel. Must happen BEFORE
        # enable_compilation_cache: that initializes the backend (it asks
        # jax.default_backend()), after which the platform can't change.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    if args.guidance_trunc is None:
        # 800 is CD-guarded: identical chamfer to trunc 600 at every dtype
        # and guidance scale on both guarded checkpoints
        # (results/pc_flagship_quality_r5_trunc{600,800}.json, r3 400/600)
        args.guidance_trunc = 800.0 if args.mode == "t2pc" else 0.0
    from nova_pointcloud_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "t2i":
        return bench_t2i(args)
    if args.mode == "t2v":
        return bench_t2v(args)
    if args.mode == "train":
        return bench_train(args)

    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    if args.dry_run:
        # CI smoke must not depend on the TPU tunnel (the host sitecustomize
        # clobbers JAX_PLATFORMS=cpu, so override via jax.config)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    on_tpu = jax.default_backend() == "tpu"
    if args.dry_run:
        arch, batch, steps, points = "pc_d2w64", 2, 2, 256
    else:
        arch, batch, steps, points = (args.arch, args.batch or 128,
                                      args.steps, args.points)

    model = NOVAPointCloudTransformer(
        arch=arch, point_cloud_size=points, patch_size=16 if not args.dry_run else 1,
        text_token_dim=256, dropout=0.0, quantize=args.quantize,
        attn_core=args.attn_core,
        dtype=jnp.bfloat16 if on_tpu else None)
    x = jnp.zeros((batch, points, 3))
    t = jnp.zeros((batch,), jnp.int32)
    text = jnp.zeros((batch, 32, 256))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, text)["params"]
    if on_tpu:  # serving mode: bf16 weights halve param HBM traffic
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"# arch={arch} params={n_params/1e6:.1f}M batch={batch} "
          f"steps={steps} points={points} backend={jax.default_backend()}",
          file=sys.stderr)

    pipe = NOVAPointCloudGenerationPipeline(
        model, params, DDPMScheduler(beta_schedule="squaredcos_cap_v2"),
        text_encoder=DummyTextEncoder(256, 32))
    prompts = [f"a chair {i}" for i in range(batch)]
    if args.static_acts and args.quantize:
        t0 = time.perf_counter()
        pipe.calibrate(prompt_embeds=pipe.encode_prompt(prompts),
                       num_points=points, num_diffusion_steps=steps)
        print(f"# calibrate={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # The axon relay does not honor jax.block_until_ready (CLAUDE.md), so
    # timing must force a device-to-host transfer. D2H bandwidth through the
    # tunnel is ~27MB/s: transferring the full (B, N, 3) cloud would dominate,
    # so reduce to one scalar on device (depends on every output element) and
    # pull 4 bytes.
    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def run(key):
        out = pipe(prompts, num_points=points, num_diffusion_steps=steps,
                   guidance_scale=7.5, guidance_trunc=args.guidance_trunc,
                   key=key, output_type="jax")
        np.asarray(checksum(out.point_clouds))  # D2H forces completion
        return out

    t0 = time.perf_counter()
    run(jax.random.PRNGKey(0))  # compile
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(i + 1))
        times.append(time.perf_counter() - t0)
    p50_batch = float(np.percentile(times, 50))
    samples_per_sec = batch / p50_batch
    p50_latency_ms = p50_batch / batch * 1000
    # analytic model FLOPs: (2x batch for CFG steps + 1x for truncated
    # steps) transformer forwards of ~2*params*tokens matmul FLOPs
    # (attention core adds <2% at T=128)
    tokens = points // model.patch_size
    n_cfg = steps
    if args.guidance_trunc > 0:
        ts = np.asarray(pipe.scheduler.set_timesteps(steps).timesteps)
        n_cfg = int(np.sum(ts >= args.guidance_trunc))
    forwards = 2 * n_cfg + (steps - n_cfg)
    tflop_per_sample = 2 * n_params * tokens * forwards / 1e12
    achieved_tflops = tflop_per_sample * samples_per_sec
    print(f"# compile={compile_s:.1f}s p50_batch={p50_batch*1000:.1f}ms "
          f"p50/sample={p50_latency_ms:.2f}ms "
          f"~{achieved_tflops:.0f} TFLOP/s effective", file=sys.stderr)
    size_tag = "1.4B" if "1536" in arch else "0.6B"
    print(json.dumps({
        "metric": f"t2pc_2048pt_{size_tag}_samples_per_sec_per_chip"
                  + ("" if args.quantize else "_bf16"),
        "serving_dtype": "w8a8-int8 fused pallas MLP" if args.quantize
                         else "bf16",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec/chip",
        # baselines are derived at 611.7M params; FLOPs (and so the H100
        # estimate) scale ~linearly with params for other arches
        "vs_baseline": round(samples_per_sec / (
            H100_EST_SAMPLES_PER_SEC * 611.7e6 / n_params), 3),
        "vs_patched_h100": round(samples_per_sec / (
            H100_PATCHED_EST_SAMPLES_PER_SEC * 611.7e6 / n_params), 3),
        # with guidance truncation on, the shipped reference recipe (full
        # CFG every step: its pc loop `:156-175` never truncates) costs
        # 2*steps forwards while ours costs `forwards`; this field credits
        # a hypothetical H100 reference using the SAME truncated recipe
        "vs_patched_h100_same_recipe": round(samples_per_sec / (
            H100_PATCHED_EST_SAMPLES_PER_SEC * (2 * steps) / forwards
            * 611.7e6 / n_params), 3),
        "baseline_note": "H100 est. for the reference per-point design at "
                         "0.6B (measured 335.1 GFLOP/fwd at 72.1M via torch "
                         "FlopCounterMode; see bench.py docstring)",
        "p50_latency_ms_per_sample": round(p50_latency_ms, 3),
        "tflop_per_sample": round(tflop_per_sample, 2),
        "achieved_tflop_s": round(achieved_tflops, 1),
        "mfu_vs_v5e_int8_peak": round(achieved_tflops / 394.0, 3),
        "mfu_vs_v5e_bf16_peak": round(achieved_tflops / 197.0, 3),
        "batch": batch, "diffusion_steps": steps, "points": points,
        "guidance_trunc": args.guidance_trunc,
        "attn_core": args.attn_core,
        "static_acts": bool(args.static_acts and args.quantize),
        "params_m": round(n_params / 1e6, 1),
        "backend": jax.default_backend(),
    }))


def bench_t2i(args):
    """Secondary benchmark: NOVA d48w1024 sd512-class text-to-image sampler
    (32x32 latent patches, 64 AR x 25 diffusion steps, CFG x2), one chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    if args.dry_run:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    on_tpu = jax.default_backend() == "tpu"
    batch = args.batch or (2 if args.dry_run else 4)
    scheduler = FlowMatchEulerScheduler()
    if args.dry_run:
        args.ar_steps, args.steps, args.repeats = 3, 2, 1
        model = NOVATransformer(
            arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
            image_dim=4, image_base_size=(4, 4), video_base_size=(1, 2, 2),
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler)
    else:
        model = NOVATransformer(
            arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
            image_dim=4, image_base_size=(32, 32), video_base_size=(1, 16, 16),
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler, quantize=args.quantize and on_tpu,
            attn_core=args.attn_core if args.attn_core != "f32" else "bf16",
            dtype=jnp.bfloat16 if on_tpu else None)
    from nova_pointcloud_tpu.pipelines.builder import init_transformer

    params = init_transformer(model, seed=0, batch=1)
    if on_tpu:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    vae = vae_params = None
    if args.e2e:
        # SD-class 2D VAE decode (latent 64x64x4 -> 512x512x3 uint8), the
        # reference __call__'s scope (`pipeline_nova.py:140-144`)
        from nova_pointcloud_tpu.models.autoencoders import AutoencoderKL

        vae = AutoencoderKL(latent_channels=4,
                            dtype=jnp.bfloat16 if on_tpu else None)
        vae_params = jax.jit(
            lambda k: vae.init(k, jnp.zeros((1, 8, 8, 4)),
                               method=vae.decode))(
            jax.random.PRNGKey(7))["params"]
        if on_tpu:
            vae_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                      vae_params)
    pipe = NOVAPipeline(model, params, scheduler, vae=vae,
                        vae_params=vae_params,
                        text_encoder=DummyTextEncoder(256, 32))
    if args.bucket_fracs:
        pipe.bucket_fracs = tuple(
            int(x) for x in args.bucket_fracs.split(","))
    prompts = [f"a scene {i}" for i in range(batch)]
    print(f"# t2i d48w1024 params={n_params/1e6:.1f}M batch={batch} "
          f"ar={args.ar_steps} diff={args.steps} e2e={args.e2e}",
          file=sys.stderr)
    if args.static_acts and args.quantize and on_tpu:
        t0 = time.perf_counter()
        pipe.calibrate(prompts, num_inference_steps=16,
                       num_diffusion_steps=args.steps)
        print(f"# calibrate={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run(key, output_type="latent"):
        out = pipe(prompts, num_inference_steps=args.ar_steps,
                   num_diffusion_steps=args.steps, guidance_scale=5.0,
                   guidance_trunc=args.guidance_trunc,
                   key=key, output_type=output_type)
        if output_type == "latent":
            return np.asarray(out.latents)  # D2H forces completion
        return np.asarray(out.images[0][:2, :2])  # uint8 on host already

    t0 = time.perf_counter()
    run(jax.random.PRNGKey(0))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(i + 1))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    decode_share = None
    if args.e2e:
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(0), "np")
        compile_s_e2e = time.perf_counter() - t0
        e2e_times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(i + 1), "np")
            e2e_times.append(time.perf_counter() - t0)
        p50_lat = p50
        p50 = float(np.percentile(e2e_times, 50))
        decode_share = max(0.0, 1.0 - p50_lat / p50)
        print(f"# e2e compile={compile_s_e2e:.1f}s latent={p50_lat*1000:.0f}"
              f"ms e2e={p50*1000:.0f}ms decode_share={decode_share:.2%}",
              file=sys.stderr)
    sps = batch / p50
    print(f"# compile={compile_s:.1f}s p50_batch={p50*1000:.0f}ms",
          file=sys.stderr)
    achieved = T2I_REF_TFLOP_PER_IMAGE * sps
    print(json.dumps({
        "metric": "t2i_512_0.6B_samples_per_sec_per_chip"
                  + ("" if args.quantize else "_bf16")
                  + ("_e2e" if args.e2e else ""),
        "e2e": args.e2e, "decode_share_of_latency":
            None if decode_share is None else round(decode_share, 3),
        "serving_dtype": ("w8a8-int8 fused pallas ViT MLP"
                         if args.quantize and on_tpu else "bf16"),
        "value": round(sps, 3), "unit": "samples/sec/chip",
        "static_acts": bool(args.static_acts and args.quantize and on_tpu),
        "attn_core": args.attn_core if args.attn_core != "f32" else "bf16",
        "vs_baseline": round(sps / T2I_H100_EST_IMAGES_PER_SEC, 3),
        "baseline_note": "H100 est. for the reference design (measured "
                         "139.1 TFLOP/image via torch FlopCounterMode at "
                         "bench shapes; 60% eager MFU credit — see "
                         "scripts/measure_reference_flops.py). Note an H100 "
                         "has 5x a v5e chip's peak FLOP/s; see mfu fields "
                         "for the efficiency comparison.",
        "tflop_per_sample": T2I_REF_TFLOP_PER_IMAGE,
        "achieved_tflop_s": round(achieved, 1),
        "mfu_vs_v5e_int8_peak": round(achieved / 394.0, 3),
        "mfu_vs_v5e_bf16_peak": round(achieved / 197.0, 3),
        "p50_latency_ms_per_sample": round(p50 / batch * 1000, 1),
        "guidance_trunc": args.guidance_trunc,
        "batch": batch, "ar_steps": args.ar_steps, "diffusion_steps": args.steps,
        "params_m": round(n_params / 1e6, 1), "backend": jax.default_backend(),
    }))


def bench_t2v(args):
    """Full-scale video: NOVA d48w1024-osp480 (33x768x480 -> 9 latent frames
    of 15x24 video / 30x48 image patches, RoPE + AdaLN mixer, CFG x2),
    reference shapes from `configs/nova_d48w1024_osp480.yaml`. One chip;
    reports videos/sec + per-frame latency."""
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    if args.dry_run:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    on_tpu = jax.default_backend() == "tpu"
    batch = args.batch or 1
    frames = 2 if args.dry_run else 9
    scheduler = FlowMatchEulerScheduler()
    if args.dry_run:
        args.ar_steps, args.steps, args.repeats = 3, 2, 1
        model = NOVATransformer(
            arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
            image_dim=4, image_base_size=(4, 4), video_base_size=(2, 2, 2),
            patch_size=2, text_token_dim=2560, text_token_len=16,
            rotary_pos_embed=True, video_mixer_rank=8,
            noise_scheduler=scheduler)
    else:
        model = NOVATransformer(
            arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
            image_dim=4, image_base_size=(30, 48), video_base_size=(9, 15, 24),
            patch_size=2, text_token_dim=2560, text_token_len=256,
            rotary_pos_embed=True, video_mixer_rank=24,
            noise_scheduler=scheduler, quantize=args.quantize and on_tpu,
            attn_core=args.attn_core if args.attn_core != "f32" else "bf16",
            dtype=jnp.bfloat16 if on_tpu else None)
    from nova_pointcloud_tpu.pipelines.builder import init_transformer

    params = init_transformer(model, seed=0, batch=1)
    if on_tpu:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    vae = vae_params = None
    if args.e2e:
        # temporal-tiled causal 3D decode: 9x60x96x4 latents -> 33x480x768
        # frames (reference osp480 scope)
        from nova_pointcloud_tpu.models.autoencoders import AutoencoderKLOpenSora

        vae = AutoencoderKLOpenSora(latent_channels=4,
                                    dtype=jnp.bfloat16 if on_tpu else None)
        vae_params = jax.jit(
            lambda k: vae.init(k, jnp.zeros((1, 2, 8, 8, 4)),
                               method=vae.decode))(
            jax.random.PRNGKey(7))["params"]
        if on_tpu:
            vae_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                      vae_params)
    pipe = NOVAPipeline(model, params, scheduler, vae=vae,
                        vae_params=vae_params,
                        text_encoder=DummyTextEncoder(
                            2560, model.text_token_len))
    if args.bucket_fracs:
        pipe.bucket_fracs = tuple(
            int(x) for x in args.bucket_fracs.split(","))
    prompts = [f"a drone shot {i}" for i in range(batch)]
    print(f"# t2v d48w1024-osp480 params={n_params/1e6:.1f}M batch={batch} "
          f"frames={frames} ar={args.ar_steps} diff={args.steps} "
          f"e2e={args.e2e}", file=sys.stderr)
    if args.static_acts and args.quantize and on_tpu:
        # Covers the image encoder + diffusion head on a real trajectory
        # AND the KV-cached video-encoder path (max_latent_length=2 runs
        # frame 0 -> 1 through encode_frame with live caches). The cached
        # attention core keeps the dynamic path (no a_smax use there).
        t0 = time.perf_counter()
        pipe.calibrate(prompts, num_inference_steps=16,
                       num_diffusion_steps=args.steps, max_latent_length=2)
        print(f"# calibrate={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def run(key, output_type="latent"):
        out = pipe(prompts, num_inference_steps=args.ar_steps,
                   num_diffusion_steps=args.steps, guidance_scale=5.0,
                   guidance_trunc=args.guidance_trunc,
                   max_latent_length=frames, flow_shift=5.0,
                   key=key, output_type=output_type)
        if output_type == "latent":
            np.asarray(checksum(out.latents))
            return out
        return np.asarray(out.frames[0][0, :2, :2])  # uint8 np already

    t0 = time.perf_counter()
    run(jax.random.PRNGKey(0))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(max(args.repeats, 2)):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(i + 1))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    decode_share = None
    if args.e2e:
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(0), "np")
        compile_e2e = time.perf_counter() - t0
        e2e_times = []
        for i in range(max(args.repeats, 2)):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(i + 1), "np")
            e2e_times.append(time.perf_counter() - t0)
        p50_lat, p50 = p50, float(np.percentile(e2e_times, 50))
        decode_share = max(0.0, 1.0 - p50_lat / p50)
        print(f"# e2e compile={compile_e2e:.1f}s latent={p50_lat:.1f}s "
              f"e2e={p50:.1f}s decode_share={decode_share:.2%}",
              file=sys.stderr)
    print(f"# compile={compile_s:.1f}s p50_video={p50:.1f}s", file=sys.stderr)
    vps = batch / p50
    achieved = T2V_REF_TFLOP_PER_VIDEO * vps
    print(json.dumps({
        "metric": "t2v_osp480_0.6B_videos_per_sec_per_chip"
                  + ("" if args.quantize else "_bf16")
                  + ("_e2e" if args.e2e else ""),
        "e2e": args.e2e, "decode_share_of_latency":
            None if decode_share is None else round(decode_share, 3),
        "serving_dtype": ("w8a8-int8 fused pallas ViT MLP"
                         if args.quantize and on_tpu else "bf16"),
        "value": round(batch / p50, 4), "unit": "videos/sec/chip",
        "static_acts": bool(args.static_acts and args.quantize and on_tpu),
        "attn_core": args.attn_core if args.attn_core != "f32" else "bf16",
        "vs_baseline": round(vps / T2V_H100_EST_VIDEOS_PER_SEC, 3),
        "baseline_note": "H100 est. for the reference design (measured "
                         "1951.9 TFLOP/video, torch FlopCounterMode at "
                         "osp480 shapes, 60% eager MFU credit; "
                         "scripts/measure_reference_flops.py)",
        "tflop_per_sample": T2V_REF_TFLOP_PER_VIDEO,
        "achieved_tflop_s": round(achieved, 1),
        "mfu_vs_v5e_int8_peak": round(achieved / 394.0, 3),
        "mfu_vs_v5e_bf16_peak": round(achieved / 197.0, 3),
        "p50_latency_s_per_video": round(p50 / batch, 2),
        "p50_latency_ms_per_frame": round(p50 / batch / frames * 1000, 1),
        "guidance_trunc": args.guidance_trunc,
        "compile_s": round(compile_s, 1),
        "batch": batch, "frames": frames, "ar_steps": args.ar_steps,
        "diffusion_steps": args.steps,
        "params_m": round(n_params / 1e6, 1),
        "backend": jax.default_backend(),
    }))


def bench_train(args):
    """Training-step throughput (one chip, fwd+bwd+AdamW, remat on the
    scanned stacks), at the reference's own per-GPU batch:

    - --train-arch t2i: NOVA d48w1024 sd512-class step (TAM + MAM +
      loss_repeat=4 diffusion losses), batch 8
      (`configs/nova_d48w1024_sdxl1024.yaml` bs=8 x128 accum).
    - --train-arch t2v: osp480-class 9-latent-frame video step (block-causal
      TAM over bos+frames, AdaLN mixer, motion conditioning), batch 3
      (`configs/nova_d48w1024_osp480.yaml` bs=3 x128 accum).

    The step measured is the exact `engine/trainer.py` jitted step the real
    train entry uses (`scripts/train.py`), fed the records-loader batch
    layout (fp16 VAE moments + caption embeds [+ motion_flow/fps],
    data/records.py)."""
    from nova_pointcloud_tpu.engine.lr_schedules import constant_lr
    from nova_pointcloud_tpu.engine.optim import build_optimizer
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.pipelines.builder import init_transformer
    from nova_pointcloud_tpu.pipelines.train_nova import (
        NOVATrainT2IPipeline, NOVATrainT2VPipeline)
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    if args.dry_run:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    on_tpu = jax.default_backend() == "tpu"
    video = args.train_arch == "t2v"
    xl = args.train_arch == "t2i-1.4b"
    if args.batch:
        batch = args.batch
    elif args.dry_run:
        batch = 1 if video else 2
    elif xl:
        batch = 2  # 4096-token samples; reference trains bs=8 on 80GB GPUs
    else:
        batch = 3 if video else 8  # the reference configs' per-GPU batch
    scheduler = FlowMatchEulerScheduler()
    if args.dry_run:
        args.repeats = 1
        model = NOVATransformer(
            arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
            image_dim=4, image_base_size=(4, 4),
            video_base_size=(3, 2, 2) if video else (1, 2, 2),
            video_mixer_rank=8 if video else None,
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler)
    elif video:
        # osp480 geometry (configs/nova_d48w1024_osp480.yaml): 9 latent
        # frames of 60x96 latents; RoPE + rank-24 AdaLN mixer. text token
        # shapes match the FLOP-measurement model (measure_reference_flops).
        model = NOVATransformer(
            arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
            image_dim=4, image_base_size=(30, 48),
            video_base_size=(9, 15, 24), rotary_pos_embed=True,
            video_mixer_rank=24,
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler, remat=not args.train_no_remat,
            dtype=jnp.bfloat16 if on_tpu else None)
    elif xl:
        # 1.4B sdxl1024 geometry (configs/nova_d48w1536_sdxl1024.yaml):
        # 64x64 image patches, d48w1536 stacks
        model = NOVATransformer(
            arch=("vit_d16w1536", "vit_d32w1536", "mlp_d6w1536"),
            image_dim=4, image_base_size=(64, 64), video_base_size=(1, 32, 32),
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler, remat=not args.train_no_remat,
            dtype=jnp.bfloat16 if on_tpu else None)
    else:
        model = NOVATransformer(
            arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
            image_dim=4, image_base_size=(32, 32), video_base_size=(1, 16, 16),
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler, remat=not args.train_no_remat,
            dtype=jnp.bfloat16 if on_tpu else None)
    params = init_transformer(model, seed=0, batch=1)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    optimizer = build_optimizer(params, constant_lr(1e-4),
                                weight_decay=0.02, betas=(0.9, 0.95))
    pipe_cls = NOVATrainT2VPipeline if video else NOVATrainT2IPipeline
    pipe = pipe_cls(
        model, params, optimizer=optimizer, output_dir=None,
        ema_decay=None, resume=False,
        offload_opt_state=args.offload_opt_state)
    # the Trainer holds its own (donation-safe) copy — free the original or
    # params sit in HBM twice (fatal at 1.4B: 2 x 5.8GB fp32)
    del params
    trainer = pipe.trainer
    h, w = model.latent_hw
    t_frames = model.video_base_size[0] if video else None
    lat_shape = ((batch, t_frames, h, w, model.image_dim) if video
                 else (batch, h, w, model.image_dim))
    rng = np.random.default_rng(0)
    data = {
        # records layout: fp16 cached VAE moments (mean, logvar)
        "moments": jnp.asarray(np.concatenate(
            [rng.standard_normal(lat_shape) * 0.8,
             np.full(lat_shape, -6.0)], axis=-1).astype(np.float16)),
        "text_embeds": jnp.asarray(rng.standard_normal(
            (batch, model.text_token_len, model.text_token_dim))
            .astype(np.float32)),
    }
    if video:
        data["motion_flow"] = jnp.full((batch,), 5.0, jnp.float32)
        data["fps"] = jnp.full((batch,), 12.0, jnp.float32)
    from nova_pointcloud_tpu.models.nova import VIT_ARCHES
    depth = VIT_ARCHES[model.arch[0]][0] + VIT_ARCHES[model.arch[1]][0]
    print(f"# train-{args.train_arch} d{depth}w{model.embed_dim} "
          f"params={n_params/1e6:.1f}M batch={batch} remat={model.remat} "
          f"offload={args.offload_opt_state}", file=sys.stderr)

    params_t, opt_state = trainer.params, trainer.opt_state
    key = jax.random.PRNGKey(0)

    def step(params_t, opt_state, i):
        params_t, opt_state, metrics = trainer._step_fn(
            params_t, opt_state, data, jax.random.fold_in(key, i))
        # scalar D2H forces completion (axon relay ignores block_until_ready)
        loss = float(np.asarray(metrics["loss"]))
        return params_t, opt_state, loss

    t0 = time.perf_counter()
    params_t, opt_state, loss0 = step(params_t, opt_state, 0)
    compile_s = time.perf_counter() - t0
    n_steps = max(args.repeats, 5) if not args.dry_run else 2
    times = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        params_t, opt_state, loss = step(params_t, opt_state, i + 1)
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    sps = batch / p50
    # XLA's own FLOP count for the whole step (fwd+bwd+AdamW) when the
    # runtime exposes it; MFU from it is exact for OUR program
    xla_flops = None
    try:
        comp = trainer._step_fn.lower(
            params_t, opt_state, data, key).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_flops = float(ca["flops"]) if ca and "flops" in ca else None
    except Exception as e:  # the axon relay may not expose cost analysis
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
    ref_tflop, ref_sps, metric = {
        "t2i": (TRAIN_T2I_REF_TFLOP_PER_SAMPLE,
                TRAIN_T2I_H100_EST_SAMPLES_PER_SEC,
                "t2i_train_0.6B_samples_per_sec_per_chip"),
        "t2v": (TRAIN_T2V_REF_TFLOP_PER_SAMPLE,
                TRAIN_T2V_H100_EST_SAMPLES_PER_SEC,
                "t2v_train_0.6B_samples_per_sec_per_chip"),
        "t2i-1.4b": (TRAIN_T2I_14B_REF_TFLOP_PER_SAMPLE,
                     TRAIN_T2I_14B_H100_EST_SAMPLES_PER_SEC,
                     "t2i_train_1.4B_samples_per_sec_per_chip"),
    }[args.train_arch]
    achieved_ref = ref_tflop * sps
    achieved_xla = xla_flops / 1e12 / p50 if xla_flops else None
    print(f"# compile={compile_s:.1f}s p50_step={p50*1000:.0f}ms "
          f"loss0={loss0:.3f} loss={loss:.3f}", file=sys.stderr)
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 2), "unit": "samples/sec/chip",
        "vs_baseline": round(sps / ref_sps, 3),
        "baseline_note": "H100 est. for the reference train step (measured "
                         f"{ref_tflop} TFLOP/sample via torch "
                         "FlopCounterMode on the reference model in train "
                         "mode, mean over mask draws, 60% eager MFU credit; "
                         "scripts/measure_reference_flops.py --train). An "
                         "H100 has 5x a v5e chip's peak; see mfu fields for "
                         "the efficiency comparison.",
        "tflop_per_sample_ref": ref_tflop,
        "achieved_tflop_s_ref_equiv": round(achieved_ref, 1),
        "xla_tflop_per_step": (round(xla_flops / 1e12, 3)
                               if xla_flops else None),
        "achieved_tflop_s_xla": (round(achieved_xla, 1)
                                 if achieved_xla else None),
        "mfu_vs_v5e_bf16_peak": (round(achieved_xla / 197.0, 3)
                                 if achieved_xla else
                                 round(achieved_ref / 197.0, 3)),
        "p50_step_ms": round(p50 * 1000, 1), "compile_s": round(compile_s, 1),
        "batch": batch, "remat": bool(model.remat), "loss_repeat": 4,
        "offload_opt_state": bool(args.offload_opt_state),
        "params_m": round(n_params / 1e6, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
