"""Benchmark-harness samplers: GenEval images and VBench videos.

Parity with `evaluations/geneval/sample.py:45-87` and
`evaluations/vbench/sample.py:46-86`: batch prompts (optionally precomputed
prompt embeddings made offline, `docs/evaluation.md:4-69`), N samples per
prompt, PNG/mp4 outputs laid out for the external scorers. Fixes the string
``pipe_cls`` bug (`evaluations/geneval/sample.py:63`) by taking a pipeline
object.
"""

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from nova_pointcloud_tpu.utils.export import export_to_image, export_to_video


def sample_geneval(
    pipeline,
    metadata: Sequence[Dict],
    output_dir: str,
    samples_per_prompt: int = 4,
    prompt_embeds: Optional[np.ndarray] = None,
    seed: int = 0,
    **call_kwargs,
) -> List[str]:
    """GenEval layout: out/<idx>/samples/<k>.png + metadata.jsonl entries."""
    paths = []
    for idx, entry in enumerate(metadata):
        sample_dir = os.path.join(output_dir, f"{idx:05d}", "samples")
        os.makedirs(sample_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"{idx:05d}", "metadata.jsonl"),
                  "w") as f:
            f.write(json.dumps(entry) + "\n")
        pe = None if prompt_embeds is None else prompt_embeds[idx: idx + 1]
        out = pipeline([entry["prompt"]] * 1,
                       num_images_per_prompt=samples_per_prompt,
                       prompt_embeds=None if pe is None else
                       np.repeat(pe, 1, 0),
                       key=jax.random.PRNGKey(seed + idx),
                       output_type="np", **call_kwargs)
        for k, img in enumerate(out.images):
            paths.append(export_to_image(
                img, os.path.join(sample_dir, f"{k:04d}.png")))
    return paths


def sample_vbench(
    pipeline,
    prompts: Sequence[str],
    output_dir: str,
    samples_per_prompt: int = 5,
    max_latent_length: int = 9,
    fps: int = 12,
    seed: int = 0,
    **call_kwargs,
) -> List[str]:
    """VBench layout: out/<prompt>-<k>.mp4 (`evaluations/vbench/sample.py`)."""
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for prompt in prompts:
        for k in range(samples_per_prompt):
            out = pipeline([prompt], max_latent_length=max_latent_length,
                           key=jax.random.PRNGKey(seed + k),
                           output_type="np", **call_kwargs)
            name = f"{prompt.replace('/', ' ')[:180]}-{k}.mp4"
            paths.append(export_to_video(out.frames[0],
                                         os.path.join(output_dir, name),
                                         fps=fps))
    return paths
