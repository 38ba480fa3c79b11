"""Pipeline construction from declarative configs.

Parity with `diffnext/pipelines/builder.py:31-125`, minus the symlink
composition (our components are flax modules + param trees, not HF
subdirectories): build model/scheduler/vae/text-encoder from a config dict
and assemble an inference or training pipeline. Fixes the reference's
undefined PIPELINES decorator (`pipeline_train_t2v.py:27`) and missing
NOVAPointCloudPipeline export (`README.md:100` vs `pipelines/__init__.py:18`).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.models.pointcloud import NOVAPointCloudTransformer
from nova_pointcloud_tpu.schedulers.builder import build_scheduler
from nova_pointcloud_tpu.utils.config import Config


def build_pp_runner(config: Dict, mesh) -> Any:
    """StackRunner from a ``mesh: {pipe: N, ...}`` config, else None.

    Training-config knobs (``training:``): pp_num_micro (default 2x pipe),
    pp_num_chunks (>1 selects the interleaved/circular schedule).
    """
    if mesh is None or mesh.shape.get("pipe", 1) <= 1:
        return None
    from nova_pointcloud_tpu.parallel.stack_runner import make_stack_runner

    tcfg = dict(config.get("training", {}))
    return make_stack_runner(
        mesh,
        num_micro=int(tcfg.get("pp_num_micro", 0)) or None,
        num_chunks=int(tcfg.get("pp_num_chunks", 1)),
        remat=bool(tcfg.get("gradient_checkpointing", 1)))


def build_transformer(cfg: Dict, noise_scheduler=None,
                      dtype=None, pp_runner=None) -> NOVATransformer:
    """Build a NOVATransformer from a reference-style transformer config.

    Accepts the reference's fields (`configs/nova_d48w1024_sdxl1024.yaml`):
    image_dim, image_size, image_stride, text_token_dim/len, rotary_pos_embed,
    image_base_size, video_base_size, arch.
    """
    cfg = dict(cfg)
    image_stride = cfg.pop("image_stride", 8)
    cfg.pop("image_size", None)  # derivable: base_size * patch * stride
    patch_size = 15 // image_stride + 1  # `transformer_nova.py:75`
    return NOVATransformer(
        arch=tuple(cfg.pop("arch")),
        image_dim=cfg.pop("image_dim", 4),
        image_base_size=tuple(cfg.pop("image_base_size")),
        video_base_size=tuple(cfg.pop("video_base_size", (1, 8, 8))),
        patch_size=patch_size,
        text_token_dim=cfg.pop("text_token_dim", None),
        text_token_len=cfg.pop("text_token_len", 256),
        num_classes=cfg.pop("num_classes", None),
        rotary_pos_embed=cfg.pop("rotary_pos_embed", False),
        video_mixer_rank=cfg.pop("video_mixer_rank", None),
        loss_repeat=cfg.pop("loss_repeat", 4),
        noise_scheduler=noise_scheduler,
        remat=bool(cfg.pop("gradient_checkpointing", 0)),
        attn_impl=cfg.pop("attn_impl", "auto"),  # "ring[:axis]" = SP t2v
        dtype=dtype,
        pp_runner=pp_runner,
    )


def init_transformer(model: NOVATransformer, seed: int = 0,
                     batch: int = 1) -> Any:
    """Initialize params with a minimal dummy batch (jitted)."""
    t = model.video_base_size[0]
    h, w = model.latent_hw
    x = jnp.zeros((batch, t, h, w, model.image_dim))
    kwargs = {}
    if model.text_token_dim:
        kwargs["text_embeds"] = jnp.zeros(
            (batch, model.text_token_len, model.text_token_dim))
    elif model.num_classes:
        kwargs["labels"] = jnp.zeros((batch,), jnp.int32)
    rngs = {name: jax.random.PRNGKey(i) for i, name in
            enumerate(("params", "mask", "time", "noise", "dropout"))}
    return jax.jit(lambda r, x: model.init(r, x, **kwargs))(rngs, x)["params"]


def build_pipeline(config: Dict, params=None, seed: int = 0,
                   dtype=None, mesh=None) -> Tuple[Any, Any]:
    """Build (pipeline, params) from a top-level config.

    config["pipeline"]["name"]: one of the PIPELINES registry names or
    "NOVAPipeline"/"NOVAC2IPipeline"/"NOVAPointCloudGenerationPipeline".
    ``mesh`` with a pipe axis > 1 routes the model's scanned stacks through
    the pipeline-parallel runner (training).
    """
    config = Config.wrap(config)
    pipe_name = config["pipeline"].get("name", "NOVAPipeline")
    sched_cfg = dict(config.get("scheduler", {}))
    noise_sched = build_scheduler(sched_cfg, "noise")
    sample_sched = build_scheduler(sched_cfg, "sample")
    pp_runner = build_pp_runner(config, mesh)

    if "PointCloud" in pipe_name:
        mcfg = dict(config["model"])
        model = NOVAPointCloudTransformer(
            arch=mcfg.get("arch", "pc_d8w768"),
            point_cloud_size=mcfg.get("point_cloud_size", 2048),
            patch_size=mcfg.get("patch_size", 1),
            text_token_dim=mcfg.get("text_token_dim", 256),
            pp_runner=pp_runner,
            dtype=dtype)
        if params is None:
            x = jnp.zeros((1, model.point_cloud_size, 3))
            text = jnp.zeros((1, 16, model.text_token_dim)) \
                if model.text_token_dim else None
            params = jax.jit(model.init)(
                {"params": jax.random.PRNGKey(seed),
                 "dropout": jax.random.PRNGKey(seed + 1)},
                x, jnp.zeros((1,), jnp.int32), text)["params"]
        from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
            NOVAPointCloudGenerationPipeline)

        return NOVAPointCloudGenerationPipeline(model, params, noise_sched), params

    model = build_transformer(dict(config["model"]), noise_sched, dtype,
                              pp_runner=pp_runner)
    if params is None:
        # init on the PLAIN model: params must materialize the scanned
        # layout before the PP runner can consume them (the runner branch
        # in the stacks is guarded by is_initializing(), but init without a
        # live mesh context must not trace shard_map at all)
        plain = (build_transformer(dict(config["model"]), noise_sched,
                                   dtype, pp_runner=None)
                 if pp_runner else model)
        params = init_transformer(plain, seed)

    if pipe_name == "NOVAC2IPipeline":
        from nova_pointcloud_tpu.pipelines.nova_c2i import NOVAC2IPipeline

        return NOVAC2IPipeline(model, params, sample_sched), params
    if pipe_name.startswith("NOVATrain"):
        from nova_pointcloud_tpu.pipelines.train_nova import PIPELINES

        cls = PIPELINES.get(pipe_name)
        return cls(model, params, **dict(config["pipeline"].get("params", {}))), params
    from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline

    return NOVAPipeline(model, params, sample_sched), params
