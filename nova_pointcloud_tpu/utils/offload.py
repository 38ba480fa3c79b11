"""Host-memory offload helpers (the TPU-native CPU-offload analogue).

The reference fits consumer GPUs with diffusers' accelerate offload
(`diffnext/pipelines/nova/pipeline_nova.py:31` ``model_cpu_offload_seq``)
and trains under DeepSpeed, whose ZeRO-Offload parks optimizer state in
host RAM. The TPU equivalent is XLA memory kinds: arrays placed in
``pinned_host`` live in host RAM but stay inside the jit boundary — the
compiler streams them over PCIe/ICI when the program needs them, no
Python-level staging.

Two consumers:
- ``parallel/sharding.py`` ``make_sharded_train_step(offload_opt_state=)``:
  AdamW moments held in pinned_host (fp32 Adam for the 1.4B d48w1536
  config needs ~22 GB — more than one v5e's 16 GB HBM; offloading m/v
  makes single-chip 1.4B training fit).
- pipelines' ``enable_host_offload()``: VAE / text-encoder weights parked
  in host memory and streamed in only for their calls (the diffusers
  semantics).
"""

from typing import Any, Optional

import jax

PINNED_HOST = "pinned_host"
DEVICE = "device"


def _sharding_for(x: jax.Array, kind: str, device=None):
    sh = getattr(x, "sharding", None)
    if sh is not None and hasattr(sh, "with_memory_kind"):
        try:
            return sh.with_memory_kind(kind)
        except Exception:
            pass
    device = device or jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(device, memory_kind=kind)


def to_memory_kind(tree: Any, kind: str, device=None, min_ndim: int = 0) -> Any:
    """device_put every array leaf into ``kind`` memory, keeping its
    (mesh) sharding layout when it has one. Leaves below ``min_ndim`` stay
    put (optimizer scalars such as the Adam step count must keep device
    placement — the SPMD partitioner rejects placement annotations on
    unsharded scalars, and 4 bytes buy nothing offloaded).

    One batched ``jax.device_put`` call for the whole tree: eager dispatch
    is ~50ms/op on TPU hosts (CLAUDE.md), so per-leaf puts over an Adam
    tree would cost seconds per call."""
    moved, keep = [], []
    leaves, treedef = jax.tree.flatten(tree)
    for x in leaves:
        m = hasattr(x, "shape") and getattr(x, "ndim", 0) >= min_ndim
        keep.append(not m)
        if m:
            moved.append(x)
    if moved:
        shardings = [_sharding_for(x, kind, device) for x in moved]
        moved = iter(jax.device_put(moved, shardings))
    out = [x if k else next(moved) for x, k in zip(leaves, keep)]
    return jax.tree.unflatten(treedef, out)


def stream_to_device(tree: Any) -> Any:
    """Inside-jit half of opt-state offload: explicit host->device space
    transfer for every non-scalar leaf (the typed memory-space semantics
    reject mixed-space ops). The latency-hiding scheduler orders each
    leaf's H2D right before its consumer, so HBM never holds the whole
    tree at once. Scalars (the Adam step count) stay resident."""
    from jax.memory import Space

    return jax.tree.map(
        lambda x: jax.device_put(x, Space.Device) if x.ndim >= 1 else x,
        tree)


def to_host(tree: Any, device=None, min_ndim: int = 0) -> Any:
    """Park a param tree in pinned host memory."""
    return to_memory_kind(tree, PINNED_HOST, device, min_ndim)


def to_device(tree: Any, device=None) -> Any:
    """Bring a (possibly host-parked) param tree back into device HBM."""
    return to_memory_kind(tree, DEVICE, device)


def memory_kind(x) -> Optional[str]:
    sh = getattr(x, "sharding", None)
    return getattr(sh, "memory_kind", None) if sh is not None else None
