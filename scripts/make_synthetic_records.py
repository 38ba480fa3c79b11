#!/usr/bin/env python
"""Write a synthetic NovaRecords dataset (cached VAE moments + caption
embeds [+ motion_flow]) for end-to-end `scripts/train.py` runs on hosts
without a real feature dump.

The reference trains from codewithgpu records of exactly these fields
(`diffnext/data/flex_transforms.py:31-66`); this emits the same content in
the NovaRecords TLV format (data/records.py). Moments are generated from a
deterministic per-class latent pattern + noise so a model can actually fit
them (loss decreases), not pure white noise.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_pointcloud_tpu.data.records import RecordWriter  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/synthetic_records")
    ap.add_argument("--num", type=int, default=512)
    ap.add_argument("--height", type=int, default=32, help="latent height")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--frames", type=int, default=0,
                    help=">0 writes video moments (T, H, W, 2C) + motion_flow")
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--text-dim", type=int, default=256)
    ap.add_argument("--text-len", type=int, default=32)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    c2 = 2 * args.channels
    # per-class structured latent means + caption embeddings
    yy, xx = np.mgrid[0: args.height, 0: args.width].astype(np.float32)
    yy, xx = yy / args.height, xx / args.width
    class_means = []
    for k in range(args.classes):
        freq = 1 + k % 4
        phase = 2 * np.pi * k / args.classes
        base = np.sin(2 * np.pi * freq * yy + phase) * np.cos(
            2 * np.pi * freq * xx)
        chans = [base * (0.5 + 0.1 * c) for c in range(args.channels)]
        # logvar channels pinned low so sampled latents stay near the mean
        chans += [np.full_like(base, -6.0)] * args.channels
        class_means.append(np.stack(chans, axis=-1))  # (H, W, 2C)
    class_text = rng.randn(args.classes, args.text_len,
                           args.text_dim).astype(np.float32)
    class_text_long = class_text + 0.1 * rng.randn(
        args.classes, args.text_len, args.text_dim).astype(np.float32)

    w = RecordWriter(args.out)
    for i in range(args.num):
        k = i % args.classes
        if args.frames > 0:
            moments = np.stack([
                class_means[k] + 0.05 * rng.randn(args.height, args.width,
                                                  c2).astype(np.float32)
                for _ in range(args.frames)])
        else:
            moments = class_means[k] + 0.05 * rng.randn(
                args.height, args.width, c2).astype(np.float32)
        fields = {
            "moments": moments.astype(np.float16),
            "caption_embed": class_text[k].astype(np.float16),
            "caption_embed_long": class_text_long[k].astype(np.float16),
            "label": np.int32(k),
            "text": f"synthetic class {k}",
        }
        if args.frames > 0:
            fields["motion_flow"] = np.float32(4.0 + k % 3)
        w.write(fields)
    w.close({"kind": "synthetic", "classes": args.classes,
             "frames": args.frames})
    print(f"wrote {args.num} records to {args.out}")


if __name__ == "__main__":
    main()
