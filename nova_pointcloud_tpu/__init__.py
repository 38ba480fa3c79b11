"""NOVA-PointCloud-TPU: a TPU-native autoregressive diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
zailaiyiwan123/NOVA_pointcloud (NOVA "NOn-quantized Video Autoregressive model"
plus its 3D point-cloud generation branch), designed TPU-first:

- masked-AR + per-token diffusion with static shapes (scan/cond, no dynamic gathers)
- bf16 compute on the MXU, Pallas kernels for the attention hot paths
- multi-chip scaling via jax.sharding Mesh + collectives over ICI (DP/FSDP/TP)

Reference capability map: see SURVEY.md at the repo root. Nothing in this tree
is a translation of the reference's torch code; file:line citations in
docstrings point at the behaviors being matched.
"""

__version__ = "0.1.0"

from nova_pointcloud_tpu.utils.registry import Registry  # noqa: F401
