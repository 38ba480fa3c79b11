"""End-to-end eval harness: prompt precompute -> GenEval/VBench layouts.

Round-1 weak #8: the samplers were layout-only and untested. These tests run
the FULL flow the reference documents (`docs/evaluation.md:4-69`): encode
prompts offline (scripts/precompute_prompts.py logic), sample a tiny NOVA
pipe via ``prompt_embeds=``, and check the external-scorer directory layouts.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.evaluation.samplers import (sample_geneval,
                                                     sample_vbench)
from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.models.text_encoders.dummy import DummyTextEncoder
from nova_pointcloud_tpu.pipelines.builder import init_transformer
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline
from nova_pointcloud_tpu.schedulers import FlowMatchEulerScheduler

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_pipe():
    sched = FlowMatchEulerScheduler()
    model = NOVATransformer(
        arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"), image_dim=4,
        image_base_size=(4, 4), video_base_size=(2, 2, 2), patch_size=2,
        text_token_dim=256, text_token_len=8, noise_scheduler=sched)
    params = init_transformer(model, seed=0)
    return NOVAPipeline(model, params, sched,
                        text_encoder=DummyTextEncoder(256, 8))


def test_precompute_then_geneval_layout(tmp_path, tiny_pipe):
    prompts_file = tmp_path / "prompts.jsonl"
    metadata = [{"prompt": "a red chair", "tag": "color"},
                {"prompt": "two dogs", "tag": "counting"}]
    prompts_file.write_text("\n".join(json.dumps(m) for m in metadata))
    embeds_file = tmp_path / "embeds.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/precompute_prompts.py"),
         "--prompts", str(prompts_file), "--out", str(embeds_file),
         "--max-tokens", "8"], check=True, env=env, capture_output=True)
    blob = np.load(embeds_file, allow_pickle=True)
    assert blob["embeds"].shape == (2, 8, 256)
    assert list(blob["prompts"]) == [m["prompt"] for m in metadata]

    out_dir = tmp_path / "geneval"
    paths = sample_geneval(
        tiny_pipe, metadata, str(out_dir), samples_per_prompt=2,
        prompt_embeds=blob["embeds"].astype(np.float32),
        num_inference_steps=2, num_diffusion_steps=2, guidance_scale=1.0)
    assert len(paths) == 4
    for idx in range(2):
        meta = out_dir / f"{idx:05d}" / "metadata.jsonl"
        assert meta.exists()
        assert json.loads(meta.read_text())["prompt"] == metadata[idx]["prompt"]
        pngs = sorted((out_dir / f"{idx:05d}" / "samples").iterdir())
        assert len(pngs) == 2 and all(p.suffix == ".png" for p in pngs)


def test_vbench_layout(tmp_path, tiny_pipe):
    out_dir = tmp_path / "vbench"
    paths = sample_vbench(
        tiny_pipe, ["a cat running"], str(out_dir), samples_per_prompt=2,
        max_latent_length=2, num_inference_steps=2, num_diffusion_steps=2,
        guidance_scale=1.0)
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p)
        assert "a cat running" in os.path.basename(p)
