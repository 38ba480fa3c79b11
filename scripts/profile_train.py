"""Decompose the t2i/t2v TRAIN step latency at bench shapes.

bench.py --mode train measured 12.8 samples/s (t2i d48w1024, batch 8,
~8% XLA-counted bf16 MFU) in round 5 — this tool attributes the step:

  (a) the full jitted Trainer step (fwd+bwd+AdamW, remat),
  (b) TAM: encode_video fwd+bwd,
  (c) MAM: encode_image_step (bucketed MAE gather) fwd+bwd,
  (d) the loss_repeat x diffusion head fwd+bwd,
  (e) the AdamW update alone (fp32 m/v/params HBM traffic),

each as its own jitted value_and_grad with a scalarized loss. D2H-forced
timing per CLAUDE.md. Run on the real TPU.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nova_pointcloud_tpu.engine.lr_schedules import constant_lr
from nova_pointcloud_tpu.engine.optim import build_optimizer
from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.ops import masking
from nova_pointcloud_tpu.pipelines.builder import init_transformer
from nova_pointcloud_tpu.pipelines.train_nova import NOVATrainT2IPipeline
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler
from nova_pointcloud_tpu.utils.platform import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:  # BEFORE any backend touch (cache setup probes the backend)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    enable_compilation_cache()

    scheduler = FlowMatchEulerScheduler()
    if args.tiny:
        model = NOVATransformer(
            arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"), image_dim=4,
            image_base_size=(4, 4), video_base_size=(1, 2, 2), patch_size=2,
            text_token_dim=64, text_token_len=8, noise_scheduler=scheduler)
    else:
        model = NOVATransformer(
            arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024"),
            image_dim=4, image_base_size=(32, 32), video_base_size=(1, 16, 16),
            patch_size=2, text_token_dim=256, text_token_len=32,
            noise_scheduler=scheduler, remat=not args.no_remat,
            dtype=jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"
    B = args.batch
    ni, nv = model.num_image_tokens, model.num_video_tokens
    pd = model.patch_dim
    params = init_transformer(model, seed=0, batch=1)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"# params={n_params / 1e6:.1f}M batch={B} ni={ni} "
          f"remat={not args.no_remat}", file=sys.stderr)

    optimizer = build_optimizer(params, constant_lr(1e-4),
                                weight_decay=0.02, betas=(0.9, 0.95))
    pipe = NOVATrainT2IPipeline(model, params, optimizer=optimizer,
                                output_dir=None, ema_decay=None, resume=False)
    trainer = pipe.trainer
    h, w = model.latent_hw
    rng = np.random.default_rng(0)
    lat = (B, h, w, model.image_dim)
    batch = {
        "moments": jnp.asarray(np.concatenate(
            [rng.standard_normal(lat) * 0.8, np.full(lat, -6.0)],
            axis=-1).astype(np.float16)),
        "text_embeds": jnp.asarray(rng.standard_normal(
            (B, model.text_token_len, model.text_token_dim)).astype(np.float32)),
    }
    checksum = jax.jit(lambda t: sum(jnp.sum(l.astype(jnp.float32))
                                     for l in jax.tree.leaves(t)))

    def timed(name, fn, *a, r=3):
        np.asarray(checksum(fn(*a)))
        best = 1e9
        for _ in range(r):
            t0 = time.perf_counter()
            np.asarray(checksum(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>28}: {best * 1000:8.1f} ms", flush=True)
        return best

    # (a) the full trainer step (params/opt_state NOT donated here: reuse).
    # opt state from the RAW optimizer (the pipeline wraps it with freeze
    # masks whose state the raw update() would reject).
    p0 = trainer.params
    o0 = jax.jit(optimizer.init)(p0)
    loss_fn = pipe.loss_fn

    @jax.jit
    def full_step(params, opt_state, batch, key):
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t_full = timed("full train step", full_step, p0, o0, batch,
                   jax.random.PRNGKey(0))

    variables = {"params": p0}
    cast = jnp.bfloat16 if on_tpu else jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, h, w, 4), jnp.float32)
    text = np.asarray(batch["text_embeds"])

    # component fwd+bwd pieces (grad wrt params, scalarized outputs)
    def comp(name, fwd):
        @jax.jit
        def vg(params, *a):
            return jax.grad(
                lambda p: jnp.sum(fwd(p, *a).astype(jnp.float32) ** 2))(params)

        return timed(name, vg, p0)

    from nova_pointcloud_tpu.models.nova import VIT_ARCHES

    width = VIT_ARCHES[model.arch[1]][1]

    def tam_fwd(p):
        bov = model.apply({"params": p}, B, method=model.bos_frame)
        c_text = model.apply({"params": p}, jnp.asarray(text),
                             method=model.embed_text)
        return model.apply({"params": p}, bov, c_text, 1,
                           method=model.encode_video)

    t_tam = comp("TAM encode_video f+b", tam_fwd)

    mask, _ = masking.sample_train_mask(jax.random.PRNGKey(2), B, ni)
    z_tok = jax.random.normal(jax.random.PRNGKey(3), (B, ni, pd), cast)
    cond = jax.random.normal(jax.random.PRNGKey(4), (B, nv, width), cast)
    bucket = max(int(round((1.0 - masking.TRAIN_MASK_RATIO_MIN) * ni)), 1)

    def mam_fwd(p):
        tok = model.apply({"params": p}, z_tok, method=model.tokens_from_patches)
        return model.apply({"params": p}, tok, mask, cond,
                           method=model.encode_image_step,
                           visible_bucket=bucket)

    t_mam = comp("MAM encode_image f+b", mam_fwd)

    rep = model.loss_repeat
    x_t = jax.random.normal(jax.random.PRNGKey(5), (rep * B, ni, pd), cast)
    z_r = jax.random.normal(jax.random.PRNGKey(6), (rep * B, ni, width), cast)
    tsteps = jnp.full((rep * B, ni), 0.4, jnp.float32)

    def diff_fwd(p):
        return model.apply({"params": p}, x_t, tsteps, z_r,
                           method=model.denoise_step)

    t_diff = comp(f"diffusion head x{rep} f+b", diff_fwd)

    # (e) optimizer update alone on a ready grad tree
    grads = jax.tree.map(jnp.zeros_like, p0)

    @jax.jit
    def opt_only(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    t_opt = timed("AdamW update only", opt_only, p0, o0, grads)

    acc = t_tam + t_mam + t_diff + t_opt
    print(f"# accounted {acc * 1000:.0f} / {t_full * 1000:.0f} ms "
          f"({acc / t_full:.0%}); samples/s={B / t_full:.2f}", flush=True)


if __name__ == "__main__":
    main()
