"""Decompose t2i sampler latency at bench shapes (differential D2H timing).

Times, at the exact serving shapes of ``bench.py --mode t2i``:

  (a) the full jitted sampler (one batch),
  (b) the masked-AR encoder pass  x 64 AR steps,
  (c) the diffusion head          x (64 AR x 25 diffusion) steps,
  (d) the encode_video prologue   x 1,

so the gap (a) - (b+c+d) isolates scheduler/scatter/glue overhead. This is
the tool that found the round-3 t2i bottleneck (98% of time in the ViT
pass, VPU-bound online softmax) — see ROADMAP.md.

``--static`` first runs ``NOVAPipeline.calibrate()`` and profiles with the
merged static activation scales + softmax offsets (the default serving
path); omit it to profile dynamic per-row int8 quantization.

Timing convention per CLAUDE.md: ``jax.block_until_ready`` does not block
through the axon relay, so every timed call is forced with a tiny D2H
checksum. Run on the real TPU.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.guidance import GuidanceConfig
from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.pipelines.builder import init_transformer
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler
from nova_pointcloud_tpu.utils.platform import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ar-steps", type=int, default=64)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--no-quantize", dest="quantize", action="store_false",
                    default=True)
    ap.add_argument("--static", action="store_true",
                    help="calibrate first; profile the static-scales path")
    ap.add_argument("--bucket", type=int, default=0,
                    help="also time the encoder at this visible-bucket "
                         "width (the phased MAE gather the sampler uses)")
    args = ap.parse_args()
    enable_compilation_cache()

    scheduler = FlowMatchEulerScheduler()
    model = NOVATransformer(
        arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
        image_dim=4, image_base_size=(32, 32), video_base_size=(1, 16, 16),
        patch_size=2, text_token_dim=256, text_token_len=32,
        noise_scheduler=scheduler, quantize=args.quantize,
        dtype=jnp.bfloat16)
    params = init_transformer(model, seed=0, batch=1)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    pipe = NOVAPipeline(model, params, scheduler,
                        text_encoder=DummyTextEncoder(256, 32))
    prompts = [f"a scene {i}" for i in range(args.batch)]
    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    AR, DIFF = args.ar_steps, args.steps
    ni, pd, width = model.num_image_tokens, model.patch_dim, 1024
    nb = args.batch * 2  # CFG passes
    print(f"# batch={args.batch} nb={nb} ni={ni} quant={args.quantize} "
          f"static={args.static}", file=sys.stderr)

    variables = {"params": params}
    if args.quantize:
        from nova_pointcloud_tpu.ops.quantization import (
            merge_act_scales, quantize_serving_params)

        qp = jax.jit(quantize_serving_params)(params)
        if args.static:
            t0 = time.perf_counter()
            pipe.calibrate(prompts, num_inference_steps=16,
                           num_diffusion_steps=DIFF)
            print(f"# calibrate={time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            qp = merge_act_scales(qp, pipe.act_scales,
                                  margin=getattr(pipe, "_act_margin", 1.05))
        variables["qparams"] = qp

    def timed(name, fn, *a, r=3):
        np.asarray(checksum(fn(*a)))  # compile + warm
        best = 1e9
        for _ in range(r):
            t0 = time.perf_counter()
            np.asarray(checksum(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>22}: {best * 1000:8.1f} ms", flush=True)
        return best

    # (a) full sample
    def full(key):
        return pipe(prompts, num_inference_steps=AR,
                    num_diffusion_steps=DIFF, key=key,
                    output_type="latent").latents

    t_full = timed("full sample", full, jax.random.PRNGKey(0))

    # (d) prologue: encode_video over BOS + text prefix
    c_text = pipe.encode_prompt(prompts,
                                guidance=GuidanceConfig(guidance_scale=5.0))

    @jax.jit
    def prologue(variables, c):
        bos = model.apply(variables, nb, method=model.bos_frame)
        return model.apply(variables, bos, c, 1, method=model.encode_video)

    t_pro = timed("encode_video (1x)", prologue, variables, c_text)
    cond = prologue(variables, c_text)

    # (b) encoder: AR scan of tokens_from_patches + encode_image_step
    canvas = jnp.zeros((args.batch, ni, pd), jnp.bfloat16)
    mask = jnp.ones((args.batch, ni, 1), jnp.float32)

    def make_enc_scan(bucket):
        @jax.jit
        def enc_scan(variables, canvas, mask, cond):
            def body(c, _):
                tokens = model.apply(variables, c,
                                     method=model.tokens_from_patches)
                z = model.apply(variables, jnp.tile(tokens, (2, 1, 1)),
                                jnp.tile(mask, (2, 1, 1)), cond,
                                method=model.encode_image_step,
                                visible_bucket=bucket or None)
                return c + 1e-6 * z[:args.batch, :, :pd].astype(c.dtype), None

            out, _ = jax.lax.scan(body, canvas, None, length=AR)
            return out

        return enc_scan

    t_enc = timed(f"encode_image x{AR}", make_enc_scan(0),
                  variables, canvas, mask, cond)
    if args.bucket:
        timed(f"encode (bucket {args.bucket})", make_enc_scan(args.bucket),
              variables, canvas, mask, cond)

    # (c) diffusion head: denoise_step x (AR*DIFF) at the padded pred size
    counts = masking.cosine_pred_counts(AR, ni)
    counts = counts[counts > 0]
    _, pad_p = masking.pred_boundaries(counts)
    print(f"# pad_p={pad_p} S={len(counts)}", file=sys.stderr)
    x_t = jnp.zeros((nb, pad_p, pd), jnp.float32)
    z_sel = jnp.zeros((nb, pad_p, width), jnp.bfloat16)

    @jax.jit
    def diff_scan(variables, x_t, z_sel):
        def body(c, j):
            pred = model.apply(variables, c, jnp.full((nb,), 500.0), z_sel,
                               method=model.denoise_step)
            return c + 1e-6 * pred.astype(c.dtype), None

        out, _ = jax.lax.scan(body, x_t, jnp.arange(AR * DIFF))
        return out

    t_diff = timed(f"denoise x{AR * DIFF}", diff_scan, variables, x_t, z_sel)

    acc = t_pro + t_enc + t_diff
    print(f"# accounted {acc * 1000:.0f} / {t_full * 1000:.0f} ms "
          f"({acc / t_full:.0%}); samples/s={args.batch / t_full:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
