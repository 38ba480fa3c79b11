#!/usr/bin/env python
"""Interactive NOVA web app (t2i / t2pc), the reference Gradio apps' equivalent.

Capability parity with `scripts/app_nova_t2i.py:84-153` / `app_nova_t2v.py`
(prompt box, negative prompt, guidance scale, sampling steps, seed, live
preview) rebuilt on the stdlib http.server: TPU hosts in this image have no
gradio, and a dependency-free app keeps the serving path deployable anywhere.

    python scripts/app_nova.py --mode t2pc --port 7860
    python scripts/app_nova.py --mode t2i --checkpoint <orbax dir>

GET /          interactive page
POST /api/generate   {"prompt": ..., "guidance_scale": ..., "seed": ...}
    -> t2pc: {"points": [[x,y,z]...], "colors": ...}  (+ rendered scatter)
    -> t2i:  {"image": "<base64 png>"}
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE = """<!doctype html>
<html><head><title>NOVA {mode}</title><style>
body{{font-family:sans-serif;max-width:720px;margin:2em auto}}
textarea,input{{width:100%;margin:4px 0}}button{{padding:8px 18px}}
#out img{{max-width:100%}}</style></head><body>
<h2>NOVA {mode} (nova_pointcloud_tpu)</h2>
<textarea id="prompt" rows="2" placeholder="a chair"></textarea>
<input id="negative" placeholder="negative prompt (optional)">
<label>guidance <input id="guidance" type="number" value="7.5" step="0.5"></label>
<label>steps <input id="steps" type="number" value="25"></label>
<label>seed <input id="seed" type="number" value="0"></label>
<span id="t2v" style="display:{t2v_display}">
<label>frames <input id="frames" type="number" value="5" min="1" max="9"></label>
<label>motion flow <input id="motion" type="number" value="5" min="1" max="10"></label>
</span>
<button onclick="go()">Generate</button>
<pre id="status"></pre><div id="out"></div>
<script>
async function go(){{
  document.getElementById('status').textContent = 'generating...';
  const body = {{prompt: document.getElementById('prompt').value,
    negative_prompt: document.getElementById('negative').value,
    guidance_scale: +document.getElementById('guidance').value,
    num_steps: +document.getElementById('steps').value,
    seed: +document.getElementById('seed').value,
    frames: +(document.getElementById('frames')||{{value:1}}).value,
    motion_flow: +(document.getElementById('motion')||{{value:5}}).value}};
  const r = await fetch('/api/generate', {{method:'POST',
    headers:{{'Content-Type':'application/json'}}, body: JSON.stringify(body)}});
  const j = await r.json();
  document.getElementById('status').textContent =
    j.error || ('done in ' + j.seconds.toFixed(2) + 's');
  if (j.video) document.getElementById('out').innerHTML =
    '<img src="data:image/gif;base64,' + j.video + '">';
  else if (j.image) document.getElementById('out').innerHTML =
    '<img src="data:image/png;base64,' + j.image + '">';
  else if (j.points) document.getElementById('out').innerHTML =
    '<pre>' + j.points.length + ' points; first 5: ' +
    JSON.stringify(j.points.slice(0,5)) + '</pre>' +
    (j.render ? '<img src="data:image/png;base64,' + j.render + '">' : '');
}}
</script></body></html>"""


def build_t2pc(args):
    import jax.numpy as jnp

    from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
        NOVAPointCloudGenerationPipeline)
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    import jax

    on_tpu = jax.default_backend() == "tpu"
    model = NOVAPointCloudTransformer(
        arch=args.arch, point_cloud_size=args.num_points,
        patch_size=args.patch_size, text_token_dim=256, dropout=0.0,
        quantize=on_tpu, dtype=jnp.bfloat16 if on_tpu else None)
    params = _load_or_init_pc(model, args)
    normalizer = None
    stats = os.path.join(os.path.dirname(args.checkpoint or ""), "stats.json")
    if args.checkpoint and os.path.exists(stats):
        from nova_pointcloud_tpu.data.shapenet import GlobalNormalizer

        normalizer = GlobalNormalizer.load(stats)
    return NOVAPointCloudGenerationPipeline(
        model, params, DDPMScheduler(beta_schedule="squaredcos_cap_v2"),
        text_encoder=DummyTextEncoder(256, 16), normalizer=normalizer)


def _load_or_init_pc(model, args):
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, args.num_points, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                                 jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 16, 256)))["params"]
    if args.checkpoint:
        from nova_pointcloud_tpu.engine.checkpoint import CheckpointManager

        ckpt = CheckpointManager(os.path.dirname(args.checkpoint)
                                 if args.checkpoint.endswith("checkpoint-")
                                 else args.checkpoint)
        out = ckpt.restore(template={"params": params})
        if out:
            params = out["state"]["params"]
            print(f"loaded checkpoint-{out['step']}")
    if jax.default_backend() == "tpu":
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    return params


def build_t2i(args):
    import jax
    import jax.numpy as jnp

    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.builder import init_transformer
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    on_tpu = jax.default_backend() == "tpu"
    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(
        arch=("vit_d16w768", "vit_d32w768", "mlp_d6w768"), image_dim=4,
        image_base_size=(16, 16), video_base_size=(1, 8, 8), patch_size=2,
        text_token_dim=256, text_token_len=32, noise_scheduler=sched,
        quantize=on_tpu, dtype=jnp.bfloat16 if on_tpu else None)
    params = init_transformer(model, seed=0)
    return NOVAPipeline(model, params, sched,
                        text_encoder=DummyTextEncoder(256, 32))


def build_t2v(args):
    """Video app backend (`app_nova_t2v.py:113-183` parity: frames +
    motion-flow controls, GIF preview out)."""
    import jax
    import jax.numpy as jnp

    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
    from nova_pointcloud_tpu.pipelines.builder import init_transformer
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
    from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

    on_tpu = jax.default_backend() == "tpu"
    sched = FlowMatchEulerScheduler()
    if args.tiny:
        model = NOVATransformer(
            arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"), image_dim=4,
            image_base_size=(4, 4), video_base_size=(9, 2, 2), patch_size=2,
            text_token_dim=256, text_token_len=32, video_mixer_rank=8,
            noise_scheduler=sched)
    else:
        model = NOVATransformer(
            arch=("vit_d16w768", "vit_d32w768", "mlp_d6w768"), image_dim=4,
            image_base_size=(16, 16), video_base_size=(9, 8, 8), patch_size=2,
            text_token_dim=256, text_token_len=32, video_mixer_rank=8,
            noise_scheduler=sched,
            quantize=on_tpu, dtype=jnp.bfloat16 if on_tpu else None)
    params = init_transformer(model, seed=0)
    return NOVAPipeline(model, params, sched,
                        text_encoder=DummyTextEncoder(256, 32))


def frames_to_gif(latents) -> str:
    """(T, H, W, C) latent frames -> normalized RGB animated GIF (no VAE)."""
    import numpy as np
    from PIL import Image

    x = np.asarray(latents)[0][..., :3]  # (T, H, W, 3)
    x = (x - x.min()) / max(float(x.max() - x.min()), 1e-6)
    imgs = [Image.fromarray((f * 255).astype("uint8")).resize(
        (256, 256), Image.NEAREST) for f in x]
    buf = io.BytesIO()
    imgs[0].save(buf, format="GIF", save_all=True, append_images=imgs[1:],
                 duration=250, loop=0)
    return base64.b64encode(buf.getvalue()).decode()


def render_points(points) -> str:
    """Depth-colored scatter like `demo.py:448-531`; '' if matplotlib absent."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return ""
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2],
               c=points[:, 2], cmap="viridis", s=2)
    ax.set_axis_off()
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=80)
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def latent_to_png(latents) -> str:
    """Latent canvas -> normalized RGB png (no VAE configured)."""
    import numpy as np
    from PIL import Image

    x = np.asarray(latents)[0, ..., :3]
    x = (x - x.min()) / max(x.max() - x.min(), 1e-6)
    img = Image.fromarray((x * 255).astype("uint8"))
    img = img.resize((256, 256), Image.NEAREST)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("t2pc", "t2i", "t2v"), default="t2pc")
    ap.add_argument("--arch", default="pc_d8w768")
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--patch-size", type=int, default=1)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="d2w64 test model (CI / CPU smoke)")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import time

    import jax
    import numpy as np

    pipe = {"t2pc": build_t2pc, "t2i": build_t2i,
            "t2v": build_t2v}[args.mode](args)
    lock = threading.Lock()  # one TPU program at a time

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            data = body.encode() if isinstance(body, str) else body
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            self._send(200, PAGE.format(
                mode=args.mode,
                t2v_display="inline" if args.mode == "t2v" else "none"),
                "text/html")

        def do_POST(self):
            if self.path != "/api/generate":
                return self._send(404, json.dumps({"error": "not found"}))
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            prompt = req.get("prompt") or "a chair"
            neg = req.get("negative_prompt") or None
            key = jax.random.PRNGKey(int(req.get("seed", 0)))
            t0 = time.perf_counter()
            try:
                with lock:
                    if args.mode == "t2pc":
                        out = pipe([prompt], negative_prompt=[neg] if neg else None,
                                   num_points=args.num_points,
                                   num_diffusion_steps=int(req.get("num_steps", 25)),
                                   guidance_scale=float(req.get("guidance_scale", 7.5)),
                                   key=key,
                                   denormalize=pipe.normalizer is not None)
                        pts = np.asarray(out.point_clouds[0])
                        resp = {"points": np.round(pts, 4).tolist(),
                                "render": render_points(pts)}
                    elif args.mode == "t2v":
                        frames = max(1, min(int(req.get("frames", 5)),
                                            pipe.model.video_base_size[0]))
                        out = pipe([prompt], negative_prompt=[neg] if neg else None,
                                   num_inference_steps=int(req.get("num_steps", 32)),
                                   num_diffusion_steps=25,
                                   guidance_scale=float(req.get("guidance_scale", 5.0)),
                                   max_latent_length=frames, flow_shift=5.0,
                                   motion_flow=float(req.get("motion_flow", 5)),
                                   key=key, output_type="latent")
                        lat = out.latents
                        resp = {"video": frames_to_gif(
                            lat if lat.ndim == 5 else lat[:, None]),
                            "frames": frames}
                    else:
                        out = pipe([prompt], negative_prompt=[neg] if neg else None,
                                   num_inference_steps=int(req.get("num_steps", 32)),
                                   num_diffusion_steps=25,
                                   guidance_scale=float(req.get("guidance_scale", 5.0)),
                                   key=key, output_type="latent")
                        resp = {"image": latent_to_png(out.latents)}
            except Exception as e:  # surface errors to the UI
                return self._send(500, json.dumps({"error": str(e)}))
            resp["seconds"] = time.perf_counter() - t0
            self._send(200, json.dumps(resp))

    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving NOVA {args.mode} on http://{args.host}:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
