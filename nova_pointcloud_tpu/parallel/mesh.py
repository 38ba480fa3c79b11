"""Device mesh construction — the TPU-native "distributed backend".

Replaces the reference's NCCL/DeepSpeed/Accelerate substrate
(`accelerate_configs/*.yaml`, SURVEY.md §2.6): instead of a process-group
config, the backend is a `jax.sharding.Mesh` plus sharding rules
(parallel/sharding.py). Collectives are inserted by XLA from shardings and
ride ICI within a slice / DCN across slices.

Axes:
- "dcn":    cross-process / cross-slice data parallel (the reference's
  2-node story, `accelerate_configs/multi_nodes/8_gpus_node_0.yaml:6-9`).
  Always the OUTERMOST axis; devices are ordered by process so collectives
  over every other axis stay within a process/slice (ride ICI) while only
  the "dcn" reduction crosses the slow interconnect.
- "data":   data parallel (grad all-reduce; optimizer-state sharding = ZeRO)
- "tensor": tensor parallel (attention heads / MLP hidden sharded over ICI)

Dataset sharding parity (`accelerate_utils.get_ddp_shards`,
`flex_loaders.py:80-83`): `local_shard_indices` keys record partitions on
`jax.process_index()`.
"""

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(shape: Optional[Dict[str, int]] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh. ``shape`` maps axis name -> size; one axis may be -1.

    Default: all devices on the "data" axis with a trivial "tensor" axis,
    i.e. pure DP — the reference's only model-scale strategy (ZeRO-2 DP,
    `accelerate_configs/8_gpus_zero2.yaml:2-5`).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = dict(shape or {"data": -1, "tensor": 1})
    if "dcn" in shape:
        # The cross-process axis must be outermost and the device order must
        # group each process's devices contiguously, so that every non-dcn
        # collective stays within one process/slice (ICI) and only the dcn
        # reduction crosses DCN. ``shape`` dict order is the mesh axis order.
        if next(iter(shape)) != "dcn":
            raise ValueError('the "dcn" axis must be the first (outermost) '
                             f"mesh axis, got order {tuple(shape)}")
        if shape["dcn"] == -1:
            shape["dcn"] = jax.process_count()
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    known = int(np.prod([v for v in shape.values() if v > 0]))
    for k, v in shape.items():
        if v == -1:
            shape[k] = len(devices) // known
    total = int(np.prod(list(shape.values())))
    if total != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    mesh_devices = np.asarray(devices).reshape(tuple(shape.values()))
    return Mesh(mesh_devices, tuple(shape.keys()))


def local_shard_indices(num_examples: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> np.ndarray:
    """Record indices owned by this host (per-host dataset sharding)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, num_examples, pc)


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis] if axis in mesh.shape else 1
