#!/usr/bin/env python
"""Generation CLI: text-to-image / video / point-cloud from a config.

The CLI face of the reference's Gradio apps (`scripts/app_nova_t2i.py`,
`app_nova_t2v.py`, the missing `app_nova_pointcloud.py` the README promises)
— one entry that builds a pipeline from a config and writes outputs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--prompt", nargs="+", required=True)
    ap.add_argument("--negative-prompt", default=None)
    ap.add_argument("--output-dir", default="output/samples")
    ap.add_argument("--num-inference-steps", type=int, default=64)
    ap.add_argument("--num-diffusion-steps", type=int, default=25)
    ap.add_argument("--guidance-scale", type=float, default=5.0)
    ap.add_argument("--max-latent-length", type=int, default=1)
    ap.add_argument("--num-points", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    args = ap.parse_args()

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import jax

    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.builder import build_pipeline
    from nova_pointcloud_tpu.utils.config import load_config
    from nova_pointcloud_tpu.utils.export import export_to_image, export_to_ply, export_to_video

    cfg = load_config(args.config)
    # force an inference pipeline even from a training config
    name = cfg.get("pipeline", {}).get("name", "NOVAPipeline")
    if name.startswith("NOVATrain"):
        name = "NOVAC2IPipeline" if "C2I" in name else "NOVAPipeline"
        cfg.setdefault("pipeline", {})["name"] = name
    params = None
    pipe, params = build_pipeline(cfg, params=params, seed=args.seed)
    if args.checkpoint:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint))
        params = restored.get("ema", restored.get("params", restored))
        pipe.params = params
    if getattr(pipe, "text_encoder", None) is None and \
            "PointCloud" in type(pipe).__name__:
        pipe.text_encoder = DummyTextEncoder(256, 32)
    elif getattr(pipe, "text_encoder", None) is None and \
            hasattr(pipe, "encode_prompt"):
        tok_dim = cfg["model"].get("text_token_dim", 256)
        pipe.text_encoder = DummyTextEncoder(tok_dim, 32)

    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    name = type(pipe).__name__
    if "PointCloud" in name:
        out = pipe(args.prompt, num_points=args.num_points,
                   num_diffusion_steps=args.num_diffusion_steps,
                   guidance_scale=args.guidance_scale, key=key)
        for i, (pts, col) in enumerate(zip(out.point_clouds, out.colors)):
            p = export_to_ply(pts, os.path.join(args.output_dir, f"pc_{i}.ply"),
                              colors=col)
            print("wrote", p)
    else:
        out = pipe(args.prompt,
                   num_inference_steps=args.num_inference_steps,
                   num_diffusion_steps=args.num_diffusion_steps,
                   guidance_scale=args.guidance_scale,
                   max_latent_length=args.max_latent_length,
                   negative_prompt=[args.negative_prompt] * len(args.prompt)
                   if args.negative_prompt else None,
                   key=key, output_type="np")
        if out.images is not None:
            for i, img in enumerate(out.images):
                p = export_to_image(img, os.path.join(args.output_dir,
                                                      f"image_{i}.png"))
                print("wrote", p)
        else:
            for i, frames in enumerate(out.frames):
                p = export_to_video(frames, os.path.join(args.output_dir,
                                                         f"video_{i}.mp4"))
                print("wrote", p)


if __name__ == "__main__":
    main()
