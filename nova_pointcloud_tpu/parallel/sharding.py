"""Sharding rules + sharded train step (DP / ZeRO / TP over a Mesh).

The reference's parallelism inventory (SURVEY.md §2.6) maps to:
- DeepSpeed ZeRO-2 (`accelerate_configs/8_gpus_zero2.yaml`):
  params replicated, Adam moments sharded over "data"
  (``opt_state_sharding``) — XLA inserts the reduce-scatter/all-gather.
- grad all-reduce: implicit from data-sharded batch + replicated params.
- TP (new capability for d48w1536, BASELINE north-star): attention qkv/out
  and MLP hidden dims sharded over "tensor" (``tp_spec_for_param``).
- metric gather (`train_engine.py:127`): jnp.mean under jit = a psum.

No communication code is written anywhere — only PartitionSpecs.
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def tp_spec_for_param(path_str: str, value: jax.Array, mesh: Mesh,
                      axis: str = "tensor") -> P:
    """Megatron-style TP PartitionSpec for a parameter by name/shape.

    Column-parallel (shard output dim): qkv projections, MLP fc1.
    Row-parallel (shard input dim): attention out-proj, MLP fc2.
    Everything else replicated.
    """
    size = mesh.shape.get(axis, 1)
    pipe_size = mesh.shape.get("pipe", 1)
    ep_size = mesh.shape.get("expert", 1)
    if (size <= 1 and pipe_size <= 1 and ep_size <= 1) or value.ndim < 2:
        return P()
    # only shard the transformer block stacks; tiny embed MLPs (time/pos/text
    # projections) would just force resharding churn
    in_blocks = ("layers/" in path_str or "blocks" in path_str
                 or "/block/" in path_str)
    if not in_blocks:
        return P()
    if "moe/" in path_str:
        # Expert parallelism (models/moe.MoEMLP): expert-stacked weights
        # shard their leading E axis over the "expert" mesh axis; the expert
        # hidden dim H additionally carries the Megatron TP annotation
        # (w1 (E, D, H) column-, w2 (E, H, D) row-parallel) so EP x TP
        # composes. Kernels may carry scan-depth / pipe leading axes in
        # front, hence the from-the-right indexing. The router stays
        # replicated (it is tiny and every token needs it).
        ep = mesh.shape.get("expert", 1)
        spec = [None] * value.ndim
        is_w = any(f"moe/{n}" in path_str for n in ("w1", "w2"))
        is_b = any(f"moe/{n}" in path_str for n in ("b1", "b2"))
        e_dim = value.ndim - 3 if is_w else value.ndim - 2 if is_b else None
        if e_dim is not None and e_dim >= 0:
            if ep > 1 and value.shape[e_dim] % ep == 0:
                spec[e_dim] = "expert"
            h_dim = (-1 if ("moe/w1" in path_str or "moe/b1" in path_str)
                     else -2 if "moe/w2" in path_str else None)
            if (h_dim is not None and size > 1
                    and value.shape[h_dim] % size == 0):
                spec[h_dim] = axis
            if (pipe_size > 1 and spec[0] is None and e_dim != 0
                    and value.shape[0] % pipe_size == 0):
                spec[0] = "pipe"
        return P(*spec) if any(spec) else P()
    col = (any(f"{n}/kernel" in path_str for n in
               ("qkv", "fc1", "query", "key", "value")) and size > 1)
    row = (("proj/kernel" in path_str and "attn" in path_str) or
           ("fc2/kernel" in path_str) or ("out/kernel" in path_str)) \
        and size > 1
    # kernels may carry a leading (depth,) axis from nn.scan block stacks:
    # column-parallel = last dim (output features), row-parallel = second-to-
    # last dim (input features) either way. When the mesh has a "pipe" axis
    # (pipeline parallelism, parallel/stack_runner), the depth axis itself
    # is sharded over it — each stage's devices then hold only their own
    # layers, composing PP x TP x DP at the parameter level.
    lead = ("pipe" if (pipe_size > 1 and value.ndim >= 2
                       and value.shape[0] % pipe_size == 0) else None)
    spec = [None] * value.ndim
    if col and value.shape[-1] % size == 0:
        spec[-1] = axis
    elif row and value.shape[-2] % size == 0:
        spec[-2] = axis
    if lead is not None and spec[0] is None:
        spec[0] = lead
    if any(spec):
        return P(*spec)
    return P()


def param_sharding(params, mesh: Mesh, tp_axis: str = "tensor"):
    """NamedSharding tree for params: TP specs where they apply, else replicated."""
    def spec(path, v):
        return NamedSharding(mesh, tp_spec_for_param(_path_str(path), v, mesh,
                                                     tp_axis))

    return jax.tree_util.tree_map_with_path(spec, params)


def zero3_param_sharding(params, mesh: Mesh, axis: str = "data",
                         tp_axis: str = "tensor", min_size: int = 2048):
    """ZeRO-3 / FSDP-style parameter sharding (beyond the reference's ZeRO-2).

    On top of the Megatron TP spec, shard the largest still-unsharded dim of
    every parameter with >= ``min_size`` elements over the data axis. Under
    jit, XLA inserts the per-use all-gather and reduce-scatters the grads —
    the collective schedule DeepSpeed ZeRO-3 implements by hand
    (`accelerate_configs/*` stop at zero_stage 2). Params below ``min_size``
    stay replicated (gather churn would dominate their memory win).
    """
    size = mesh.shape.get(axis, 1)

    def spec(path, v):
        base = tp_spec_for_param(_path_str(path), v, mesh, tp_axis)
        dims = list(base) + [None] * (v.ndim - len(base))
        if size > 1 and v.ndim >= 1 and int(np.prod(v.shape)) >= min_size:
            for d in sorted(range(v.ndim), key=lambda d: -v.shape[d]):
                if dims[d] is None and v.shape[d] % size == 0 \
                        and v.shape[d] >= size:
                    dims[d] = axis
                    break
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(spec, params)


def _zero_spec(value: jax.Array, mesh: Mesh, axis: str) -> P:
    """Shard the largest divisible dim of an optimizer-state leaf over ``axis``."""
    size = mesh.shape.get(axis, 1)
    if size <= 1 or value.ndim == 0:
        return P()
    dims = sorted(range(value.ndim), key=lambda d: -value.shape[d])
    for d in dims:
        if value.shape[d] % size == 0 and value.shape[d] >= size:
            spec = [None] * value.ndim
            spec[d] = axis
            return P(*spec)
    return P()


def opt_state_sharding(opt_state, mesh: Mesh, axis: str = "data"):
    """ZeRO-style optimizer-state sharding over the data axis.

    The TPU-native equivalent of DeepSpeed ZeRO-2 (SURVEY.md §2.6): Adam
    m/v live sharded; XLA reduce-scatters grads into the update and
    all-gathers fresh params.
    """
    def spec(v):
        if not hasattr(v, "ndim"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _zero_spec(v, mesh, axis))

    return jax.tree_util.tree_map(spec, opt_state)


def batch_sharding(mesh: Mesh, ndim: int, axis="data"):
    """Batch-dim sharding. ``axis`` may be a tuple to shard the batch over a
    composite axis, e.g. ("dcn", "data") for cross-process + in-slice DP."""
    if isinstance(axis, str) and "dcn" in mesh.shape and axis == "data":
        axis = ("dcn", "data")  # multi-slice meshes split the batch over both
    return NamedSharding(mesh, P(*([axis] + [None] * (ndim - 1))))


def make_sharded_train_step(
    loss_fn: Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params,
    tp_axis: str = "tensor",
    zero_axis: str = "data",
    donate: bool = True,
    offload_opt_state: bool = False,
    zero3: bool = False,
):
    """Build (init_fn, step_fn) with DP + ZeRO + TP shardings.

    ``loss_fn(params, batch, key) -> (loss, metrics)``. The returned step is
    jitted with explicit in/out shardings; per-device batches enter sharded on
    the data axis and metrics come back fully reduced (XLA psum).

    ``offload_opt_state=True`` additionally parks the (ZeRO-sharded) Adam
    moments in pinned host memory — the TPU-native DeepSpeed ZeRO-Offload
    (fp32 Adam for the 1.4B d48w1536 config is ~22 GB, over one v5e's
    16 GB HBM; offloaded m/v make single-chip 1.4B training fit). XLA
    streams the state through the update inside the same jitted step.

    ``zero3=True`` additionally shards the PARAMETERS over the data axis
    (``zero3_param_sharding``): 1/N params + 1/N grads + 1/N opt state per
    device, with XLA inserting the per-use all-gathers — full ZeRO-3/FSDP
    semantics from PartitionSpecs alone.
    """
    p_shard = (zero3_param_sharding(params, mesh, zero_axis, tp_axis)
               if zero3 else param_sharding(params, mesh, tp_axis))

    def init_fn(params):
        return optimizer.init(params)

    opt_state = jax.eval_shape(init_fn, params)
    o_shard = opt_state_sharding(opt_state, mesh, zero_axis)

    def step(params, opt_state, batch, key):
        if offload_opt_state:
            from nova_pointcloud_tpu.utils.offload import stream_to_device

            opt_state = stream_to_device(opt_state)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if offload_opt_state:
            # the multi-device offload jit has no out_shardings (see below)
            # — keep the params layout stable from inside the program
            params = jax.lax.with_sharding_constraint(params, p_shard)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    if not offload_opt_state:
        jit_init = jax.jit(init_fn, out_shardings=o_shard)
        jit_step = jax.jit(
            step,
            in_shardings=(p_shard, o_shard, None, None),
            out_shardings=(p_shard, o_shard, None),
            donate_argnums=(0, 1) if donate else (),
        )
        return jit_init, jit_step

    # -- ZeRO-Offload: opt state enters in pinned host memory ---------------
    o_host = jax.tree.map(
        lambda s, l: (s.with_memory_kind("pinned_host")
                      if getattr(l, "ndim", 0) >= 1 else s),
        o_shard, opt_state)

    if mesh.devices.size == 1 and jax.default_backend() == "tpu":
        # Single-chip mesh (the 1.4B-on-16GB case): the SPMD partitioner
        # never runs, so XLA manages host placement end-to-end — init
        # writes the m/v straight to host (never materialized in HBM) and
        # the step streams them through the update.
        jit_init = jax.jit(init_fn, out_shardings=o_host)
        jit_step = jax.jit(
            step,
            in_shardings=(p_shard, o_host, None, None),
            out_shardings=(p_shard, o_host, None),
            donate_argnums=(0, 1) if donate else (),
        )
        return jit_init, jit_step

    # Multi-device mesh: the m/v tree (already ZeRO-sharded 1/N per chip)
    # lives in host RAM between steps and streams into the update through
    # the jitted step's host-space inputs. Outputs are left unconstrained
    # and written back to host from Python — the SPMD partitioner in this
    # XLA build rejects the output-placement annotations explicit
    # memory-kind out_shardings emit (side-effect custom calls without /
    # with replicated sharding). The HBM win is during fwd+bwd; the new
    # m/v materialize device-side (1/N each) only at the update tail.
    raw_init = jax.jit(init_fn, out_shardings=o_shard)  # ZeRO layout first
    raw_step = jax.jit(
        step,
        in_shardings=(p_shard, o_host, None, None),
        # a pinned_host input can't alias a device output — donate params only
        donate_argnums=(0,) if donate else (),
    )

    def _park(opt_state):
        # recommit to exactly the declared in_shardings, ONE batched
        # device_put (eager dispatch is ~50ms/op on TPU hosts)
        return jax.device_put(opt_state, o_host)

    def init_host(params):
        return _park(raw_init(params))

    def step_host(params, opt_state, batch, key):
        params, opt_state, metrics = raw_step(params, opt_state, batch, key)
        return params, _park(opt_state), metrics

    return init_host, step_host


def shard_params(params, mesh: Mesh, tp_axis: str = "tensor"):
    """Place a (host) param tree onto the mesh with TP/replicated layout."""
    shardings = param_sharding(params, mesh, tp_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
