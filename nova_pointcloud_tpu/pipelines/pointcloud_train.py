"""Point-cloud training pipeline: composite loss + defensive training loop.

Capability parity with the pc training stack:
- `diffnext/pipelines/nova/pipeline_train_pointcloud.py:27-175`: dataset
  normalization state carried with the checkpoint, save/load incl. stats,
  gradient-checkpoint config, a working ``sample`` (the reference's calls a
  nonexistent method, `:140`)
- `/root/reference/train_newloss.py`: composite loss (0.85 diffusion +
  0.12 Chamfer + 0.08 EMD + 0.2 AR-consistency, `:395-555`), NaN guards,
  per-layer clipping, gradient monitoring, adaptive LR, early stopping,
  validation cadence (`:1033-1466`)

TPU-first: loss + guards + monitors all run inside ONE jitted sharded step;
EMD is on-device Sinkhorn (ops/losses) instead of the reference's per-batch
host Hungarian round-trip (`train_newloss.py:368-376`).
"""

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nova_pointcloud_tpu.data.shapenet import GlobalNormalizer
from nova_pointcloud_tpu.engine.grad_tools import grad_stats, sanitize_grads
from nova_pointcloud_tpu.engine.trainer import Trainer
from nova_pointcloud_tpu.ops import losses as L
from nova_pointcloud_tpu.ops import pointops
from nova_pointcloud_tpu.schedulers.ddpm import DDPMScheduler


@dataclasses.dataclass
class PointCloudLossConfig:
    """Weights matching `train_newloss.py:395-427`."""

    diffusion: float = 0.85
    chamfer: float = 0.12
    emd: float = 0.08
    ar_consistency: float = 0.2
    num_subsets: int = 16
    use_ar_loss: bool = True
    sinkhorn_iters: int = 30
    sinkhorn_eps: float = 0.05


def make_pc_loss_fn(model, scheduler: DDPMScheduler,
                    cfg: PointCloudLossConfig = PointCloudLossConfig(),
                    monitor_groups=("point_embed", "blocks_0", "output_proj")):
    """Build loss_fn(params, batch, key) -> (loss, metrics) for Trainer.

    batch: {"points": (B, N, 3) normalized clouds, "text": (B, L, Dt)}.
    The composite loss noisifies with the real scheduler (the reference
    hand-rolls a linear blend that bypasses it, `train_newloss.py:919-955` —
    we implement the intent), predicts eps, and reconstructs x0 for the
    geometric terms.
    """

    def loss_fn(params, batch, key):
        pts, text = batch["points"], batch.get("text")
        b = pts.shape[0]
        k_t, k_n, k_p, k_d = jax.random.split(key, 4)
        t = scheduler.sample_timesteps(k_t, (b,))
        noise = jax.random.normal(k_n, pts.shape)
        x_t = scheduler.add_noise(pts, noise, t)
        pred = model.apply({"params": params}, x_t, t, text,
                           deterministic=False, rngs={"dropout": k_d})
        # Regress against the scheduler's parameterization, not a hardcoded
        # eps target. v-prediction matters for CONDITIONING on this data:
        # in eps space the class signal is scaled by sqrt(alpha_bar) and
        # vanishes exactly at the high-noise steps where the prompt is the
        # only information; in v space the t=T target IS (minus) the clean
        # shape, so the text pathway gets O(1) gradient (round-5
        # class-agnostic diagnosis, docs/evaluation.md).
        if scheduler.prediction_type == "epsilon":
            target = noise
        elif scheduler.prediction_type == "sample":
            target = pts
        elif scheduler.prediction_type == "v_prediction":
            target = scheduler.get_velocity(pts, noise, t)
        else:
            raise ValueError(
                f"Unsupported prediction type {scheduler.prediction_type}.")
        loss_diff = jnp.mean((pred - target) ** 2)

        # reconstruct x0 from the eps prediction for geometric losses
        x0_hat = scheduler.predict_x0(pred, t, x_t)
        loss_cd = jnp.mean(L.chamfer_distance(x0_hat, pts))
        loss_emd = jnp.mean(L.sinkhorn_emd(x0_hat, pts, cfg.sinkhorn_eps,
                                           cfg.sinkhorn_iters))
        loss = (cfg.diffusion * loss_diff + cfg.chamfer * loss_cd
                + cfg.emd * loss_emd)
        metrics = {"loss_diffusion": loss_diff, "loss_chamfer": loss_cd,
                   "loss_emd": loss_emd}
        if cfg.use_ar_loss and pts.shape[1] % cfg.num_subsets == 0:
            _, subset_ids = pointops.dynamic_partition(k_p, pts.shape[1],
                                                       cfg.num_subsets)
            loss_ar = L.ar_consistency_loss(x0_hat, subset_ids)
            loss = loss + cfg.ar_consistency * loss_ar
            metrics["loss_ar"] = loss_ar
        return loss, metrics

    def guarded_loss_fn(params, batch, key):
        # value path is shared; gradient sanitation happens in the trainer's
        # optimizer chain (engine/grad_tools); here we guard the loss value
        loss, metrics = loss_fn(params, batch, key)
        finite = jnp.isfinite(loss)
        metrics["nonfinite_loss"] = (~finite).astype(jnp.float32)
        loss = jnp.where(finite, loss, 0.0)
        return loss, metrics

    return guarded_loss_fn


class NOVATrainPointCloudPipeline:
    """Train-side pc pipeline: trainer + normalizer + sampling, one object.

    API parity with `pipeline_train_pointcloud.py`: holds the dataset
    normalization stats (saved beside checkpoints as stats.json), exposes
    ``train`` / ``validate`` / ``sample`` / ``save`` / ``load``.
    """

    def __init__(self, model, params, scheduler: Optional[DDPMScheduler] = None,
                 text_encoder=None, normalizer: Optional[GlobalNormalizer] = None,
                 output_dir: Optional[str] = None,
                 loss_config: PointCloudLossConfig = PointCloudLossConfig(),
                 optimizer: Optional[optax.GradientTransformation] = None,
                 mesh=None, **trainer_kw):
        self.model = model
        self.scheduler = scheduler or DDPMScheduler(beta_schedule="squaredcos_cap_v2")
        self.text_encoder = text_encoder
        self.normalizer = normalizer or GlobalNormalizer()
        self.output_dir = output_dir
        self.loss_fn = make_pc_loss_fn(model, self.scheduler, loss_config)
        optimizer = optimizer or optax.adamw(1e-4, weight_decay=0.01)
        self.trainer = Trainer(self.loss_fn, params, optimizer, mesh=mesh,
                               output_dir=output_dir, **trainer_kw)
        if output_dir and self.normalizer.fitted:
            import os

            self.normalizer.save(os.path.join(output_dir, "stats.json"))

    @property
    def params(self):
        return self.trainer.params

    def encode_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Host-side prompt encode + device arrays."""
        out = {"points": jnp.asarray(batch["points"])}
        if self.text_encoder is not None and "prompts" in batch:
            embeds, _ = self.text_encoder.encode(batch["prompts"])
            out["text"] = jnp.asarray(embeds)
        return out

    def train(self, data: Iterator[Dict[str, Any]], max_steps: int):
        def device_iter():
            for batch in data:
                yield self.encode_batch(batch)

        return self.trainer.train(device_iter(), max_steps)

    def validate(self, batches, key=None) -> Dict[str, float]:
        """Mean composite-loss metrics over held-out batches
        (`train_newloss.py:1328-1360`)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        # cache the jitted fn: a fresh jax.jit per validate() re-traces and
        # re-compiles through the (slow) remote TPU compiler every round
        if not hasattr(self, "_val_fn"):
            self._val_fn = jax.jit(self.loss_fn)
        val = self._val_fn
        agg: Dict[str, list] = {}
        for batch in batches:
            key, k = jax.random.split(key)
            loss, metrics = val(self.params, self.encode_batch(batch), k)
            agg.setdefault("loss", []).append(float(loss))
            for name, v in metrics.items():
                agg.setdefault(name, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}

    def sample(self, prompts, num_points: int = 2048, **kw):
        """Working replacement for the dangling ``model.generate_point_clouds``
        call at `pipeline_train_pointcloud.py:140`."""
        from nova_pointcloud_tpu.pipelines.pointcloud_gen import (
            NOVAPointCloudGenerationPipeline)

        pipe = NOVAPointCloudGenerationPipeline(
            self.model, self.params, self.scheduler,
            text_encoder=self.text_encoder, normalizer=self.normalizer)
        return pipe(prompts, num_points=num_points, denormalize=True, **kw)
