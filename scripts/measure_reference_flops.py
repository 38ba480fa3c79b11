#!/usr/bin/env python
"""Measure the torch reference's per-forward FLOPs for the t2i/t2v cost model.

The reference publishes quality numbers but NO throughput (BASELINE.md), so
`bench.py` grounds its vs_baseline ratios in analytic H100 estimates derived
from MEASURED torch FLOPs — the same method the t2pc baseline already uses
(FlopCounterMode on the reference's own modules, then scale by the sampler's
loop structure). This script produces the measured datapoints:

- image_encoder (vit_d32w1024) forward at the t2i canvas token count,
- video_encoder (vit_d16w1024) forward at the BOS/frame token count,
- image_decoder (mlp_d6w1024) forward at the canvas token count.

Run on CPU torch (reference imports via tests/_diffusers_shim). Results are
embedded as constants in bench.py with the derivation in its docstring.
"""

import os
import sys

# the reference's RotaryEmbed3D.call_impl is @torch.compile'd
# (embeddings.py:36), which breaks under FlopCounterMode's dispatch mode —
# run everything eager for counting
os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import _diffusers_shim  # noqa: E402

_diffusers_shim.install()
sys.path.append("/root/reference")

import torch  # noqa: E402
from torch.utils.flop_counter import FlopCounterMode  # noqa: E402


def count(fn):
    with FlopCounterMode(display=False) as m:
        fn()
    return m.get_total_flops()


def measure_train():
    """Reference t2i TRAIN-step FLOPs at the bench workload (d48w1024,
    sd512-class 32x32 patches, loss_repeat=4).

    Builds the reference's own NOVATransformer3DModel
    (`transformer_nova.py:56-103`) in train mode and counts one full
    training forward (`transformer_3d.py:165-190`: TAM over the bos frame,
    MAM over masked canvas tokens, loss_repeat x diffusion MLP + MSE).
    Backward is credited at the standard 2x forward, so
    train TFLOP/sample = 3 x forward. The result seeds
    bench.py's TRAIN_REF_TFLOP_PER_SAMPLE constant.
    """
    import numpy as np
    from diffnext.models.transformers import transformer_nova as tn
    from diffnext.schedulers.scheduling_cfm import (
        FlowMatchEulerDiscreteScheduler)

    # the train MAE mask ratio comes from scipy's GLOBAL numpy RNG
    # (embeddings.py truncnorm .rvs) and the encoder gathers only visible
    # tokens, so per-call FLOPs vary with the draw — seed and AVERAGE
    np.random.seed(0)
    torch.manual_seed(0)
    model = tn.NOVATransformer3DModel(
        image_dim=4, image_size=512, image_stride=8,
        text_token_dim=256, text_token_len=32,
        image_base_size=(32, 32), video_base_size=(1, 16, 16),
        arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024")).train()
    model.noise_scheduler = FlowMatchEulerDiscreteScheduler(shift=1.0)
    n_params = sum(p.numel() for p in model.parameters())

    def step():
        # forward mutates its inputs dict/tensors (x.unsqueeze_); use fresh
        x = torch.randn(1, 4, 64, 64)
        c = torch.randn(1, 32, 1024)
        model({"x": x, "c": [c]})

    # train-mode MaskEmbed returns (masked_x, prev_ids): the encoder half
    # MAE-gathers only the visible tokens, so per-call FLOPs depend on the
    # sampled mask ratio — report the mean over draws
    fwd = float(np.mean([count(step) for _ in range(8)]))
    total = 3 * fwd  # fwd + bwd(2x); optimizer update is negligible
    print(f"\n[t2i train d48w1024] params={n_params/1e6:.1f}M "
          f"fwd={fwd/1e9:.2f} GFLOP (mean of 8 mask draws)  "
          f"train(3x)={total/1e12:.4f} TFLOP/sample")
    h100 = 989.5e12 * 0.6
    print(f"H100 @60% MFU eager: {h100/total:.1f} samples/s")

    # t2v osp480 train step: 9 latent frames, TAM over bos+8 frames with
    # block-causal mask + AdaLN mixer, MAM/diffusion per frame
    # (`transformer_3d.py:165-190`). Motion-embed tokens are a negligible
    # few-token MLP and are omitted here.
    model_v = tn.NOVATransformer3DModel(
        image_dim=4, image_size=(480, 768), image_stride=8,
        text_token_dim=256, text_token_len=32,
        image_base_size=(30, 48), video_base_size=(9, 15, 24),
        rotary_pos_embed=True, video_mixer_rank=24,
        arch=("vit_d16w1024", "vit_d32w1024", "mlp_d6w1024")).train()
    model_v.noise_scheduler = FlowMatchEulerDiscreteScheduler(shift=1.0)

    def step_v():
        x = torch.randn(1, 4, 9, 60, 96)
        c = torch.randn(1, 32, 1024)
        model_v({"x": x, "c": [c]})

    fwd_v = float(np.mean([count(step_v) for _ in range(3)]))
    total_v = 3 * fwd_v
    print(f"[t2v train d48w1024-osp480 9fr] fwd={fwd_v/1e9:.2f} GFLOP "
          f"(mean of 3 mask draws)  "
          f"train(3x)={total_v/1e12:.4f} TFLOP/sample")
    print(f"H100 @60% MFU eager: {h100/total_v:.2f} samples/s")
    del model_v

    # 1.4B t2i sdxl1024-class step (`configs/nova_d48w1536_sdxl1024.yaml`):
    # 64x64 image patches, d48w1536 stacks. Seeds bench.py's
    # TRAIN_T2I_14B_* constants (the --train-arch t2i-1.4b +
    # --offload-opt-state capability proof).
    model_xl = tn.NOVATransformer3DModel(
        image_dim=4, image_size=1024, image_stride=8,
        text_token_dim=256, text_token_len=32,
        image_base_size=(64, 64), video_base_size=(1, 32, 32),
        arch=("vit_d16w1536", "vit_d32w1536", "mlp_d6w1536")).train()
    model_xl.noise_scheduler = FlowMatchEulerDiscreteScheduler(shift=1.0)
    n_params_xl = sum(p.numel() for p in model_xl.parameters())

    def step_xl():
        x = torch.randn(1, 4, 128, 128)
        c = torch.randn(1, 32, 1536)
        model_xl({"x": x, "c": [c]})

    fwd_xl = float(np.mean([count(step_xl) for _ in range(3)]))
    total_xl = 3 * fwd_xl
    print(f"[t2i train d48w1536-sdxl1024] params={n_params_xl/1e6:.1f}M "
          f"fwd={fwd_xl/1e9:.2f} GFLOP (mean of 3 mask draws)  "
          f"train(3x)={total_xl/1e12:.4f} TFLOP/sample")
    print(f"H100 @60% MFU eager: {h100/total_xl:.2f} samples/s")


def main():
    if "--train" in sys.argv:
        return measure_train()
    from diffnext.models.diffusion_mlp import DiffusionMLP
    from diffnext.models.vision_transformer import VisionTransformer

    torch.manual_seed(0)
    results = {}

    # t2i "sd512-class" bench workload: 32x32 image patches (1024 tokens),
    # 16x16 video patches (256 tokens), width 1024, patch 2 -> latent 64x64
    with torch.no_grad():
        img_enc = VisionTransformer(32, 1024, 16, patch_size=2,
                                    image_size=(64, 64), image_dim=4).eval()
        x = torch.randn(1, 4, 64, 64)
        c = torch.randn(1, 256 + 32, 1024)  # video states + text prefix
        results["image_encoder_d32w1024_L1312"] = count(lambda: img_enc(x, c))

        vid_enc = VisionTransformer(16, 1024, 16, patch_size=4,
                                    image_size=(64, 64), image_dim=4).eval()
        xv = torch.randn(1, 4, 64, 64)
        cv = torch.randn(1, 32, 1024)  # text tokens
        results["video_encoder_d16w1024_L288"] = count(lambda: vid_enc(xv, cv))

        mlp = DiffusionMLP(6, 1024, cond_dim=1024, patch_size=2,
                           image_dim=4).eval()
        xm = torch.randn(1, 4, 64, 64)
        z = torch.randn(1, 1024, 1024)
        t = torch.zeros(1)
        results["image_decoder_mlp_d6w1024_L1024"] = count(
            lambda: mlp(xm, t, z))

        # t2v osp480 shapes: image stack at 30x48=1440 patch tokens,
        # video stack at 360 video tokens + 256 text
        img_enc_v = VisionTransformer(32, 1024, 16, patch_size=2,
                                      image_size=(60, 96), image_dim=4).eval()
        xv2 = torch.randn(1, 4, 60, 96)
        cv2 = torch.randn(1, 360 + 256, 1024)
        results["image_encoder_d32w1024_L2056_osp480"] = count(
            lambda: img_enc_v(xv2, cv2))

        vid_enc_v = VisionTransformer(16, 1024, 16, patch_size=4,
                                      image_size=(60, 96), image_dim=4).eval()
        cv3 = torch.randn(1, 256, 1024)
        results["video_encoder_d16w1024_L616_osp480"] = count(
            lambda: vid_enc_v(xv2, cv3))

        mlp_v = DiffusionMLP(3, 1280, cond_dim=1024, patch_size=2,
                             image_dim=4).eval()
        z2 = torch.randn(1, 1440, 1024)
        results["image_decoder_mlp_d3w1280_L1440_osp480"] = count(
            lambda: mlp_v(xv2, t, z2))

    for k, v in results.items():
        print(f"{k}: {v/1e9:.2f} GFLOP")

    # assemble the sampler cost (reference loop structure,
    # transformer_3d.py:116-164): S AR steps x [enc fwd] + per-token
    # diffusion D steps, all x2 CFG passes
    S, D = 64, 25
    enc = results["image_encoder_d32w1024_L1312"]
    vid = results["video_encoder_d16w1024_L288"]
    mlp_f = results["image_decoder_mlp_d6w1024_L1024"]
    # the reference denoises the FULL canvas through the MLP every diffusion
    # step (denoise() gets pred_ids but DiffusionMLP gathers only for the
    # selected tokens; x stays full-image in scheduler space) — count the
    # gathered-token version: total predicted tokens across AR steps = 1024,
    # so MLP cost ~= full-canvas fwd per diffusion sweep
    t2i = 2 * (S * enc + D * mlp_f) + 2 * vid
    print(f"\n[t2i sd512-class] {t2i/1e12:.2f} TFLOP/image "
          f"(S={S} AR, D={D} diff, CFG2)")
    h100 = 989.5e12 * 0.6
    print(f"H100 @60% MFU eager: {h100/t2i:.2f} images/s")

    T, Sv, Dv = 9, 64, 25
    enc_v = results["image_encoder_d32w1024_L2056_osp480"]
    vid_v = results["video_encoder_d16w1024_L616_osp480"]
    mlp_fv = results["image_decoder_mlp_d3w1280_L1440_osp480"]
    t2v = T * (2 * (Sv * enc_v + Dv * mlp_fv) + 2 * vid_v)
    print(f"[t2v osp480 9 frames] {t2v/1e12:.2f} TFLOP/video")
    print(f"H100 @60% MFU eager: {t2v/h100:.2f} s/video")


if __name__ == "__main__":
    main()
