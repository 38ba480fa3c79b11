"""Class-conditional ImageNet generation pipeline (C2I).

Parity with `diffnext/pipelines/nova/pipeline_nova_c2i.py:25-124`: label ids
feed the LabelEmbed table; the CFG negative is the null class
(``num_classes``).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nova_pointcloud_tpu.models.guidance import GuidanceConfig
from nova_pointcloud_tpu.pipelines.nova import NOVAPipeline, NOVAPipelineOutput


class NOVAC2IPipeline(NOVAPipeline):
    """NOVAPipeline whose prompt is a class-label id list."""

    def __init__(self, model, params, scheduler, vae=None, vae_params=None,
                 mesh=None):
        super().__init__(model, params, scheduler, vae, vae_params,
                         text_encoder=None, mesh=mesh)
        self._embed_label = jax.jit(
            lambda p, ids: self.model.apply({"params": p}, ids,
                                            method=self.model.embed_label))

    def encode_prompt(self, prompt: Sequence[int], negative_prompt=None,
                      guidance: GuidanceConfig = GuidanceConfig(),
                      num_images_per_prompt: int = 1,
                      prompt_embeds=None) -> jax.Array:
        labels = jnp.asarray(np.asarray(prompt, np.int32))
        c_cond = self._embed_label(self.params, labels)
        # negative = null class id (`pipeline_nova_c2i.py:96-124`)
        null = jnp.full_like(labels, self.model.num_classes)
        c_null = self._embed_label(self.params, null)
        c = guidance.expand_text(c_cond, c_null)
        if num_images_per_prompt > 1:
            c = jnp.repeat(c, num_images_per_prompt, axis=0)
        return c
