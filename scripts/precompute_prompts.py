#!/usr/bin/env python
"""Precompute prompt embeddings offline for GenEval/VBench sampling.

Mirrors the reference's eval flow (`/root/reference/docs/evaluation.md:4-69`:
encode every benchmark prompt with the frozen Phi encoder once, then sample
with `prompt_embeds=` so the 2.7B text encoder never loads next to the
generator). Output is one .npz with `embeds` (N, L, D) float16, `lengths`
(N,) int32 and the prompt list, consumed by
`nova_pointcloud_tpu.evaluation.samplers.{sample_geneval,sample_vbench}`.

Inputs: a prompts file (JSON list, JSONL with "prompt" fields, or plain
text one-per-line) and a local Phi checkpoint + tokenizer directory
(zero-egress host: nothing is downloaded). Without --phi-checkpoint the
deterministic DummyTextEncoder is used — same file format, useful for
pipeline smoke tests.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_prompts(path: str):
    with open(path) as f:
        text = f.read()
    try:
        data = json.loads(text)
        if isinstance(data, list):
            return [p if isinstance(p, str) else p["prompt"] for p in data]
        if isinstance(data, dict) and "prompts" in data:
            return list(data["prompts"])
    except json.JSONDecodeError:
        pass
    prompts = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
            prompts.append(rec["prompt"] if isinstance(rec, dict) else rec)
        except json.JSONDecodeError:
            prompts.append(line)
    return prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", required=True,
                    help="JSON list / JSONL with 'prompt' / one-per-line txt")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--phi-checkpoint", default=None,
                    help="local dir or file with torch Phi weights")
    ap.add_argument("--tokenizer", default=None,
                    help="local HF tokenizer dir (required with "
                         "--phi-checkpoint)")
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import numpy as np

    prompts = load_prompts(args.prompts)
    print(f"{len(prompts)} prompts from {args.prompts}")

    if args.phi_checkpoint:
        import torch
        from transformers import AutoTokenizer

        from nova_pointcloud_tpu.models.text_encoders.phi import (
            PhiEncoderModel, PhiTextEncoder, load_torch_phi_weights)

        if not args.tokenizer:
            raise SystemExit("--tokenizer is required with --phi-checkpoint")
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token
        path = args.phi_checkpoint
        if os.path.isdir(path):
            bins = [f for f in sorted(os.listdir(path))
                    if f.endswith((".bin", ".pt", ".pth"))]
            state = {}
            for b in bins:
                state.update(torch.load(os.path.join(path, b),
                                        map_location="cpu"))
        else:
            state = torch.load(path, map_location="cpu")
        model = PhiEncoderModel()
        params = load_torch_phi_weights(model, state)
        encoder = PhiTextEncoder(model, params, tokenizer,
                                 num_tokens=args.max_tokens)
    else:
        from nova_pointcloud_tpu.models.text_encoders.dummy import (
            DummyTextEncoder)

        print("no --phi-checkpoint: using DummyTextEncoder (smoke mode)")
        encoder = DummyTextEncoder(256, args.max_tokens)

    embeds, lengths = [], []
    for i in range(0, len(prompts), args.batch_size):
        e, l = encoder.encode(prompts[i: i + args.batch_size])
        embeds.append(np.asarray(e, np.float16))
        lengths.append(np.asarray(l, np.int32))
        if i and i % (10 * args.batch_size) == 0:
            print(f"  {i}/{len(prompts)}")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out,
                        embeds=np.concatenate(embeds),
                        lengths=np.concatenate(lengths),
                        prompts=np.asarray(prompts, dtype=object))
    print(f"wrote {args.out}: embeds {np.concatenate(embeds).shape}")


if __name__ == "__main__":
    main()
