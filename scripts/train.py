#!/usr/bin/env python
"""Config-driven training entry (the `scripts/train.py` equivalent).

CLI parity with the reference (`scripts/train.py:87-101` +
`docs/training.md:72-95`): ``python scripts/train.py config=<yaml> a.b=v``
dotted overrides, resume-latest, seeding, param counting.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nova_pointcloud_tpu.utils.platform import (
        enable_compilation_cache, ensure_cpu_if_forced)

    ensure_cpu_if_forced()
    enable_compilation_cache()
    import jax
    import numpy as np

    from nova_pointcloud_tpu.engine.lr_schedules import constant_lr, cosine_lr
    from nova_pointcloud_tpu.engine.optim import build_optimizer
    from nova_pointcloud_tpu.parallel import create_mesh
    from nova_pointcloud_tpu.pipelines.builder import build_pipeline
    from nova_pointcloud_tpu.utils.config import get_config
    from nova_pointcloud_tpu.utils.logging import get_logger

    cfg = get_config(sys.argv[1:])
    exp = cfg.get("experiment", {})
    out_dir = exp.get("output_dir", f"output/{exp.get('name', 'run')}")
    logger = get_logger("train", out_dir, jax.process_index())

    tcfg = cfg.get("training", {})
    seed = int(tcfg.get("seed", 0))
    np.random.seed(seed)

    mesh_cfg = dict(cfg.get("mesh", {"data": -1, "tensor": 1}))
    mesh = create_mesh(mesh_cfg)
    logger.info("mesh: %s over %d devices", dict(mesh.shape),
                len(jax.devices()))

    ocfg = cfg.get("optimizer", {})
    lcfg = cfg.get("lr_scheduler", {})
    max_steps = int(tcfg.get("max_train_steps", 10000))
    lr = float(ocfg.get("lr", 1e-4))
    if lcfg.get("kind", "constant") == "cosine":
        schedule = cosine_lr(lr, max_steps,
                             warmup_steps=int(lcfg.get("warmup_steps", 0)))
    else:
        schedule = constant_lr(lr, int(lcfg.get("warmup_steps", 0)))

    # Build model + params first so the optimizer can mask/group them.
    # A ``mesh: {pipe: N}`` axis routes scanned stacks through the
    # pipeline-parallel runner (pipelines/builder.build_pp_runner).
    pipe, params = build_pipeline(cfg, seed=seed, mesh=mesh)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("params: %.1fM", n_params / 1e6)

    optimizer = build_optimizer(
        params, schedule, weight_decay=float(ocfg.get("weight_decay", 0.0)),
        betas=tuple(ocfg.get("betas", (0.9, 0.95))),
        accum_steps=int(tcfg.get("gradient_accumulation_steps", 1)))

    # Rebuild as a *train* pipeline with the optimizer + mesh wired in.
    name = cfg["pipeline"].get("name", "")
    if not name.startswith("NOVATrain"):
        logger.info("pipeline %s is inference-only; nothing to train", name)
        return
    from nova_pointcloud_tpu.pipelines.train_nova import PIPELINES

    ema_cfg = cfg.get("ema", {})
    train_pipe = PIPELINES.get(name)(
        pipe.model if hasattr(pipe, "model") else pipe, params,
        optimizer=optimizer, mesh=mesh, output_dir=out_dir,
        max_steps=max_steps, log_every=int(exp.get("log_every", 20)),
        save_every=int(exp.get("save_every", 1000)),
        ema_decay=float(ema_cfg.get("decay", 0.98)),
        ema_every=int(ema_cfg.get("update_every", 100)),
        lr_schedule=schedule, seed=seed,
        resume=exp.get("resume_from_checkpoint") == "latest",
        # ZeRO-Offload analogue: Adam moments in pinned host memory
        # (training.offload_opt_state: true) — fits fp32 Adam for the
        # 1.4B d48w1536 config on one 16GB chip
        offload_opt_state=bool(tcfg.get("offload_opt_state", False)),
        # ZeRO-3/FSDP: params sharded over "data" (training.zero3: true)
        zero3=bool(tcfg.get("zero3", False)))

    data_cfg = cfg.get("train_dataloader", {})
    dataset_path = data_cfg.get("dataset")
    if not dataset_path:
        logger.warning("no train_dataloader.dataset configured; exiting "
                       "after build (smoke mode)")
        return
    from nova_pointcloud_tpu.data.records import feature_batches

    batch = int(tcfg.get("batch_size", 8))
    data = feature_batches(dataset_path, batch, seed=seed, mesh=mesh)
    train_pipe.train(data, max_steps)


if __name__ == "__main__":
    main()
