"""MoE MLP + expert parallelism (models/moe.py, beyond parity).

Covers: dispatch/combine math (single expert == dense; k=E mixture ==
explicit weighted sum of expert FFNs), the Switch load-balancing aux loss,
EP param specs, EP-sharded == unsharded, and a NOVA t2i train step with MoE
encoders (aux loss reaches the total)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from nova_pointcloud_tpu.models.moe import MoEMLP
from nova_pointcloud_tpu.models.vit import MLP, VisionTransformer
from nova_pointcloud_tpu.parallel import (batch_sharding, create_mesh,
                                          make_sharded_train_step,
                                          param_sharding)


def _init(module, x, **kw):
    return jax.jit(module.init)(jax.random.PRNGKey(0), x, **kw)


def test_single_expert_equals_dense():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    moe = MoEMLP(dim=8, num_experts=1, mlp_ratio=2.0, top_k=1,
                 capacity_factor=2.0)
    v = _init(moe, x)
    dense = MLP(dim=8, mlp_ratio=2.0)
    dp = {"fc1": {"kernel": v["params"]["w1"][0],
                  "bias": v["params"]["b1"][0]},
          "fc2": {"kernel": v["params"]["w2"][0],
                  "bias": v["params"]["b2"][0]}}
    y_moe = moe.apply({"params": v["params"]}, x)
    y_dense = dense.apply({"params": dp}, x)
    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                               atol=1e-5)


def test_topk_all_experts_is_gated_mixture():
    # k = E with ample capacity: output == sum_e gate_e * FFN_e(x) exactly
    E, D = 3, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, D))
    moe = MoEMLP(dim=D, num_experts=E, mlp_ratio=2.0, top_k=E,
                 capacity_factor=float(E))
    v = _init(moe, x)
    p = v["params"]
    y = moe.apply({"params": p}, x)

    logits = x @ p["router"]["kernel"]
    gates = jax.nn.softmax(logits, axis=-1)  # (B, N, E), sums to 1
    want = jnp.zeros_like(x)
    for e in range(E):
        h = jax.nn.gelu(x @ p["w1"][e] + p["b1"][e], approximate=False)
        want = want + gates[..., e:e + 1] * (h @ p["w2"][e] + p["b2"][e])
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-4)


def test_aux_loss_uniform_router_is_one():
    # Switch LB loss: with uniform router probs, E * sum_e f_e * P_e ==
    # sum_e f_e == 1 for any assignment
    E, D = 4, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, D))
    moe = MoEMLP(dim=D, num_experts=E, mlp_ratio=1.0, top_k=1)
    v = _init(moe, x)
    p = jax.tree_util.tree_map(lambda a: a, v["params"])
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    _, state = moe.apply({"params": p}, x, mutable=["aux_loss"])
    (aux,) = jax.tree_util.tree_leaves(state["aux_loss"])
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)


def test_capacity_drop_keeps_residual_shape():
    # capacity 1 slot per expert: most tokens dropped, output finite + shaped
    moe = MoEMLP(dim=8, num_experts=2, mlp_ratio=1.0, top_k=1,
                 capacity_factor=0.01)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 8))
    v = _init(moe, x)
    y = moe.apply({"params": v["params"]}, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def _tiny_vit_moe(num_experts=4):
    model = VisionTransformer(depth=2, embed_dim=16, num_heads=2,
                              mlp_ratio=2.0, num_experts=num_experts)
    x = jnp.zeros((4, 12, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_ep_param_specs():
    mesh = create_mesh({"data": 2, "expert": 2, "tensor": 2})
    model, params, _ = _tiny_vit_moe()
    shardings = param_sharding(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
             for path, s in flat}
    w1 = [s for pth, s in specs.items() if pth.endswith("moe/w1")]
    # scanned stacks: (L, E, D, H) -> expert on axis 1, tensor on H
    assert w1 and all(s[1] == "expert" and s[-1] == "tensor" for s in w1)
    w2 = [s for pth, s in specs.items() if pth.endswith("moe/w2")]
    assert w2 and all(s[1] == "expert" and s[-2] == "tensor" for s in w2)
    router = [s for pth, s in specs.items() if "router" in pth]
    assert router and all(s == P() for s in router)


def test_ep_sharded_equals_unsharded():
    model, params, _ = _tiny_vit_moe()
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 12, 16))
    ref, _ = model.apply({"params": params}, x)

    mesh = create_mesh({"data": 2, "expert": 2, "tensor": 2})
    p_shard = param_sharding(params, mesh)
    params_s = jax.device_put(params, p_shard)
    x_s = jax.device_put(x, batch_sharding(mesh, x.ndim))
    y, _ = jax.jit(lambda p, a: model.apply({"params": p}, a),
                   in_shardings=(p_shard, batch_sharding(mesh, x.ndim)))(
                       params_s, x_s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_nova_moe_train_step_has_aux_loss():
    from nova_pointcloud_tpu.models.nova import NOVATransformer
    from nova_pointcloud_tpu.pipelines.train_nova import NOVATrainT2IPipeline
    from nova_pointcloud_tpu.schedulers import DDPMScheduler

    model = NOVATransformer(arch=("vit_d2w64", "vit_d2w64", "mlp_d2w64"),
                            image_base_size=(4, 4), patch_size=1,
                            text_token_dim=16, text_token_len=4,
                            noise_scheduler=DDPMScheduler(),
                            num_experts=2)
    x = jnp.zeros((2, 1, 4, 4, 4))
    te = jnp.zeros((2, 4, 16))
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
         "time": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3),
         "dropout": jax.random.PRNGKey(4)}, x, text_embeds=te)["params"]
    pipe = NOVATrainT2IPipeline(model, params,
                                optimizer=optax.adam(1e-4))
    total, losses = pipe.loss_fn(
        params, {"latents": x, "text_embeds": te}, jax.random.PRNGKey(6))
    assert "moe_aux" in losses and bool(jnp.isfinite(total))
    assert float(losses["moe_aux"]) > 0.0
