"""Decompose t2v sampler latency at bench shapes (differential D2H timing).

The t2v analogue of scripts/profile_t2i.py (the tool that found the round-3
t2i bottleneck). Times, at the exact serving shapes of ``bench.py --mode
t2v`` (osp480: 9 latent frames, 1440 image patches + 360 video tokens per
frame, CFG x2):

  (a) the full jitted sampler (one video),
  (b) the KV-cached video-encoder path: encode_frame x (T-1) with live
      caches (the "decode" side of the temporal AR),
  (c) the per-frame masked-AR encoder pass x AR steps (the dominant matmul
      machine), at the full length and at each phased-gather bucket,
  (d) the diffusion head x (AR x diffusion) steps,
  (e) optionally the OpenSora temporal-tiled VAE decode (--e2e scope),

so (a) - (b+c+d)*frames isolates glue. Documents the decode-vs-encode split
VERDICT r4 next #5 asks for. Timing per CLAUDE.md: every timed call is
forced with a tiny D2H checksum (block_until_ready does not block through
the axon relay). Run on the real TPU.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.embeddings import unpatchify
from nova_pointcloud_tpu.models.guidance import GuidanceConfig
from nova_pointcloud_tpu.models.nova import NOVATransformer, VIT_ARCHES
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.pipelines.builder import init_transformer
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler
from nova_pointcloud_tpu.utils.platform import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--ar-steps", type=int, default=64)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--no-quantize", dest="quantize", action="store_false",
                    default=True)
    ap.add_argument("--static", action="store_true")
    ap.add_argument("--attn-core", choices=("bf16", "int8"), default="bf16")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke shapes")
    args = ap.parse_args()
    if args.tiny:  # BEFORE any backend touch (cache setup probes the backend)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    enable_compilation_cache()

    scheduler = FlowMatchEulerScheduler()
    if args.tiny:
        args.ar_steps, args.steps, args.frames = 4, 2, 3
        model = NOVATransformer(
            arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
            image_dim=4, image_base_size=(4, 4), video_base_size=(3, 2, 2),
            patch_size=2, text_token_dim=64, text_token_len=8,
            rotary_pos_embed=True, video_mixer_rank=8,
            noise_scheduler=scheduler)
    else:
        model = NOVATransformer(
            arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
            image_dim=4, image_base_size=(30, 48), video_base_size=(9, 15, 24),
            patch_size=2, text_token_dim=2560, text_token_len=256,
            rotary_pos_embed=True, video_mixer_rank=24,
            noise_scheduler=scheduler, quantize=args.quantize,
            attn_core=args.attn_core, dtype=jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"
    params = init_transformer(model, seed=0, batch=1)
    if on_tpu:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    pipe = NOVAPipeline(model, params, scheduler,
                        text_encoder=DummyTextEncoder(
                            model.text_token_dim, model.text_token_len))
    prompts = [f"a drone shot {i}" for i in range(args.batch)]
    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    AR, DIFF, T = args.ar_steps, args.steps, args.frames
    ni, pd = model.num_image_tokens, model.patch_dim
    nv, width = model.num_video_tokens, VIT_ARCHES[model.arch[1]][1]
    nb = args.batch * 2  # CFG passes
    print(f"# batch={args.batch} nb={nb} ni={ni} nv={nv} T={T} "
          f"quant={args.quantize} static={args.static} "
          f"core={args.attn_core}", file=sys.stderr)

    variables = {"params": params}
    if args.quantize and on_tpu:
        from nova_pointcloud_tpu.ops.quantization import (
            merge_act_scales, quantize_serving_params)

        qp = jax.jit(quantize_serving_params)(params)
        if args.static:
            t0 = time.perf_counter()
            pipe.calibrate(prompts, num_inference_steps=16,
                           num_diffusion_steps=DIFF, max_latent_length=2)
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
        print(f"{name:>26}: {best * 1000:8.1f} ms", flush=True)
        return best

    # (a) full sample
    def full(key):
        return pipe(prompts, num_inference_steps=AR, num_diffusion_steps=DIFF,
                    guidance_scale=5.0, max_latent_length=T, flow_shift=5.0,
                    key=key, output_type="latent").latents

    t_full = timed("full video sample", full, jax.random.PRNGKey(0))

    # (b) the KV-cached video-encoder decode path: frame scan of
    # embed+frame_tokens+encode_frame+mixer WITHOUT the masked-AR sampler
    c_text = pipe.encode_prompt(prompts,
                                guidance=GuidanceConfig(guidance_scale=5.0))
    text_len = c_text.shape[1]

    @jax.jit
    def video_decode_scan(variables, c_text, latent):
        apply = lambda m, *a, **kw: model.apply(variables, *a, method=m, **kw)  # noqa: E731
        caches = model.apply(variables, nb, text_len, T,
                             method=model.init_video_caches)
        tokens = apply(model.bos_frame, nb)[:, 0]
        bos_value = tokens[:1, :1]
        tokens = apply(model.frame_tokens, tokens, 0, T)
        states0, caches = apply(model.encode_frame, tokens, c_text, caches,
                                0, 0)

        def body(carry, t_idx):
            caches, idx, lat = carry
            frame = unpatchify(lat, model.patch_size, model.image_base_size)
            vtok = apply(model.embed_video_frame, frame)
            tokens = apply(model.frame_tokens, vtok, t_idx, T)
            tokens = jnp.concatenate(
                [tokens, jnp.broadcast_to(bos_value, tokens.shape)], axis=0
            )[:nb]
            states, caches = apply(model.encode_frame, tokens, None, caches,
                                   idx, t_idx)
            if model.video_mixer_rank is not None:
                states = apply(model.mix_states, states0, states)
            lat = lat + (1e-6 * jnp.sum(states)).astype(lat.dtype)
            return (caches, idx + nv, lat), None

        carry, _ = jax.lax.scan(body, (caches, jnp.int32(text_len + nv),
                                       latent), jnp.arange(1, T))
        return carry[2]

    latent = jnp.zeros((args.batch, ni, pd), jnp.float32)
    t_vid = timed(f"encode_frame path x{T - 1}", video_decode_scan,
                  variables, c_text, latent)

    # cond states for the per-frame pieces
    @jax.jit
    def prologue(variables, c_text):
        apply = lambda m, *a, **kw: model.apply(variables, *a, method=m, **kw)  # noqa: E731
        caches = model.apply(variables, nb, text_len, T,
                             method=model.init_video_caches)
        tokens = apply(model.bos_frame, nb)[:, 0]
        tokens = apply(model.frame_tokens, tokens, 0, T)
        states0, _ = apply(model.encode_frame, tokens, c_text, caches, 0, 0)
        return states0

    cond = prologue(variables, c_text)

    # (c) masked-AR encoder pass per frame, full length + phased buckets
    canvas = jnp.zeros((args.batch, ni, pd),
                       jnp.bfloat16 if on_tpu else jnp.float32)
    mask = jnp.ones((args.batch, ni, 1), jnp.float32)

    def make_enc_scan(bucket, length):
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

            out, _ = jax.lax.scan(body, canvas, None, length=length)
            return out

        return enc_scan

    t_enc = timed(f"encode_image full x{AR}", make_enc_scan(0, AR),
                  variables, canvas, mask, cond)
    for frac in (8, 4, 2):
        if ni // frac >= 8:
            timed(f"encode_image bucket ni/{frac} x{AR}",
                  make_enc_scan(ni // frac, AR), variables, canvas, mask,
                  cond)

    # (d) diffusion head x (AR x DIFF) at the padded pred size
    counts = masking.cosine_pred_counts(AR, ni)
    counts = counts[counts > 0]
    _, pad_p = masking.pred_boundaries(counts)
    print(f"# pad_p={pad_p} S={len(counts)}", file=sys.stderr)
    x_t = jnp.zeros((nb, pad_p, pd), jnp.float32)
    z_sel = jnp.zeros((nb, pad_p, width),
                      jnp.bfloat16 if on_tpu else jnp.float32)

    @jax.jit
    def diff_scan(variables, x_t, z_sel):
        def body(c, j):
            pred = model.apply(variables, c, jnp.full((nb,), 500.0), z_sel,
                               method=model.denoise_step)
            return c + 1e-6 * pred.astype(c.dtype), None

        out, _ = jax.lax.scan(body, x_t, jnp.arange(AR * DIFF))
        return out

    t_diff = timed(f"denoise x{AR * DIFF}", diff_scan, variables, x_t, z_sel)

    per_frame = t_enc + t_diff
    acc = t_vid + T * per_frame
    print(f"# per-frame masked-AR (enc+diff) = {per_frame * 1000:.0f} ms; "
          f"video-encoder (KV-cached decode) = {t_vid * 1000:.0f} ms "
          f"({t_vid / t_full:.1%} of full)", flush=True)
    print(f"# accounted {acc * 1000:.0f} / {t_full * 1000:.0f} ms "
          f"({acc / t_full:.0%}); s/video={t_full / args.batch:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
