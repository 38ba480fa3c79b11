"""Training pipelines for the NOVA image/video/class-conditional frontends.

Parity targets:
- `diffnext/pipelines/nova/pipeline_train_t2i.py:27-91`: loss fn over cached
  VAE moments (sample latents from the stored distribution then vae.scale),
  3-level gradient checkpointing, freeze rules (text-embed LN + video
  pos/patch embed for T2I), pipeline_preprocess hook
- `pipeline_train_t2v.py:28-90`: video latents + motion flow (also fixes the
  undefined @PIPELINES.register decorator at `:27` — ours exists)
- `pipeline_train_c2i.py:27-78`: label conditioning

TPU-first: freezing is an optax mask (zeroed updates), checkpointing is
nn.remat on the scanned block stacks, and the whole loss runs inside the
sharded train step.
"""

from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from nova_pointcloud_tpu.engine.trainer import Trainer
from nova_pointcloud_tpu.models.autoencoders.modeling_utils import DiagonalGaussian
from nova_pointcloud_tpu.models.nova import NOVATransformer
from nova_pointcloud_tpu.utils.registry import Registry

PIPELINES = Registry("pipelines")

# freeze rules: param path substrings -> no updates (`pipeline_train_t2i.py:63-66`)
T2I_FROZEN = ("text_embed/norm", "video_pos_embed", "video_patch_embed")
T2V_FROZEN = ("text_embed/norm",)


def freeze_mask(params, frozen_substrings) -> Any:
    """optax mask tree: True = trainable."""
    def keep(path, _):
        ps = "/".join(getattr(k, "key", str(k)) for k in path)
        return not any(s in ps for s in frozen_substrings)

    return jax.tree_util.tree_map_with_path(keep, params)


def apply_freeze(optimizer: optax.GradientTransformation, params,
                 frozen_substrings) -> optax.GradientTransformation:
    if not frozen_substrings:
        return optimizer
    mask = freeze_mask(params, frozen_substrings)
    labels = jax.tree.map(lambda keep: "train" if keep else "freeze", mask)
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels)


class _NOVATrainBase:
    """Shared machinery: latents from cached moments, Trainer plumbing."""

    frozen: tuple = ()
    moe_aux_coef: float = 0.01  # Switch-style load-balance loss weight

    def __init__(self, model: NOVATransformer, params, vae=None,
                 vae_params=None, text_encoder=None,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 mesh=None, output_dir: Optional[str] = None, **trainer_kw):
        self.model = model
        self.vae, self.vae_params = vae, vae_params
        self.text_encoder = text_encoder
        optimizer = optimizer or optax.adamw(1e-4, b1=0.9, b2=0.95,
                                             weight_decay=0.02)
        optimizer = apply_freeze(optimizer, params, self.frozen)
        self.trainer = Trainer(self.loss_fn, params, optimizer, mesh=mesh,
                               output_dir=output_dir, **trainer_kw)

    @property
    def params(self):
        return self.trainer.params

    # -- latents ------------------------------------------------------------
    def prepare_latents(self, batch: Dict, key: jax.Array) -> jax.Array:
        """Latents from cached VAE moments or raw (`pipeline_train_t2i.py:71-78`).

        batch["moments"]: (B[, T], H, W, 2C) cached encoder outputs; sampled
        and vae.scale()d on device. Falls back to batch["latents"].
        """
        if "latents" in batch:
            return batch["latents"]
        dist = DiagonalGaussian.from_params(batch["moments"])
        z = dist.sample(key)
        if self.vae is not None:
            z = self.vae.scale(z)
        return z

    def conditioning(self, batch: Dict) -> Dict:
        raise NotImplementedError

    def loss_fn(self, params, batch, key):
        k_lat, k_mask, k_time, k_noise, k_drop = jax.random.split(key, 5)
        x = self.prepare_latents(batch, k_lat)
        if x.ndim == 4:
            x = x[:, None]
        rngs = {"mask": k_mask, "time": k_time, "noise": k_noise,
                "dropout": k_drop}
        losses, state = self.model.apply({"params": params}, x, rngs=rngs,
                                         mutable=["aux_loss"],
                                         **self.conditioning(batch))
        aux = state.get("aux_loss")
        if aux:  # MoE load-balancing loss (models/moe.py), per-layer sown
            leaves = jax.tree_util.tree_leaves(aux)
            losses = dict(losses, moe_aux=self.moe_aux_coef
                          * sum(jnp.sum(l) for l in leaves))
        total = sum(losses.values())
        return total, losses

    # -- loop ---------------------------------------------------------------
    def train(self, data: Iterator[Dict], max_steps: Optional[int] = None):
        return self.trainer.train(data, max_steps)


@PIPELINES.register("NOVATrainT2IPipeline")
class NOVATrainT2IPipeline(_NOVATrainBase):
    frozen = T2I_FROZEN

    def conditioning(self, batch):
        return {"text_embeds": batch["text_embeds"]}


@PIPELINES.register("NOVATrainT2VPipeline")
class NOVATrainT2VPipeline(_NOVATrainBase):
    frozen = T2V_FROZEN

    def conditioning(self, batch):
        return {"text_embeds": batch["text_embeds"],
                "motion_flow": batch.get("motion_flow"),
                "fps": batch.get("fps")}


@PIPELINES.register("NOVATrainC2IPipeline")
class NOVATrainC2IPipeline(_NOVATrainBase):
    frozen = ()

    def conditioning(self, batch):
        return {"labels": batch["labels"]}
