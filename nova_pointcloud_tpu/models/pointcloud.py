"""Point-cloud diffusion transformers.

Rebuilds the capabilities of the reference pc fork
(`diffnext/models/transformers/transformer_pointcloud_nova.py`):
- NOVAPointCloudTransformer (`:533-786`): per-point/patch embedding, learned
  positions, learnable 8-center soft spatial clustering (cdist -> softmax ->
  weighted centers -> MLP -> cross-cluster attention -> broadcast), time +
  text conditioning, pre-LN encoder stack, linear head to xyz
- depth-aware sincos 3D positional encoding (`:349-389`)
- EdgeAligner (`:155-223`) and subset-level AutoregressiveDiffusion
  (`:226-302`) for the dynamic-partition AR generation mode

Intent-over-bug deviations (SURVEY.md §7 "reference bugs to not replicate"):
- cluster coordinates are the real patch-mean xyz, not the first 3 channels of
  the 768-d embedding (`:721`),
- the timestep enters through a sinusoidal frequency embed rather than a raw
  Linear(1, D) of t in [0, 1000) (`:600-604`),
- with patching, the head emits patch_size*3 per token so the output point
  count equals the input count (`:444,512-515` silently shrinks the cloud),
- text conditioning mean-pools the prompt tokens, as the trained fork models
  do (`demo.py:281-291`); `:765` references an undefined text_pos_embed.

Registry arches follow `:37-60` plus larger flagship sizes for the
0.6B / 1.4B benchmark configs.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nova_pointcloud_tpu.models.embeddings import timestep_freq_embed
from nova_pointcloud_tpu.ops.pointops import cdist, knn

# name -> (depth, embed_dim, num_heads); pc_d8w768 matches the trained fork
# model (`transformer_pointcloud_nova.py:590-598`), d32* the registry
# (`:37-47`), d48* the NOVA-scale flagships (BASELINE.json configs).
PC_ARCHES = {
    "pc_d8w768": (8, 768, 12),
    "pc_d32w768": (32, 768, 12),
    "pc_d32w1024": (32, 1024, 16),
    "pc_d32w1536": (32, 1536, 16),
    "pc_d48w768": (48, 768, 12),
    "pc_d48w1024": (48, 1024, 16),
    "pc_d48w1536": (48, 1536, 16),
    "pc_d2w64": (2, 64, 2),  # tests
    "pc_d4w256": (4, 256, 4),  # conditioning micro-A/B (scripts/cond_micro_ab.py)
}


class DepthAwarePosEncoding(nn.Module):
    """Sincos encoding of xyz with learnable per-axis scales (`:349-389`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        scales = self.param("axis_scales", nn.initializers.ones, (3,))
        scaled = coords * scales.astype(coords.dtype)
        d6 = self.embed_dim // 6
        div = (10000.0 ** (jnp.arange(d6, dtype=jnp.float32) * 6 / self.embed_dim))
        parts = []
        for axis in range(3):
            angle = scaled[..., axis:axis + 1] / div
            parts += [jnp.sin(angle), jnp.cos(angle)]
        pe = jnp.concatenate(parts, axis=-1)
        pad = self.embed_dim - pe.shape[-1]
        if pad:
            pe = jnp.pad(pe, [(0, 0)] * (pe.ndim - 1) + [(0, pad)])
        return pe


class ClusterBlock(nn.Module):
    """Learnable soft spatial clustering (`:567-587,718-756`).

    coords (B, N, 3) -> one global cluster summary (B, 1, D): soft-assign
    points to K learnable centers, form weighted center xyz per cluster,
    lift via MLP, mix clusters with self-attention, mean-pool.
    """

    embed_dim: int
    num_heads: int
    num_clusters: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, coords: jax.Array, deterministic: bool = True) -> jax.Array:
        centers = self.param("cluster_centers", nn.initializers.normal(0.1),
                             (self.num_clusters, 3))
        d = cdist(coords, jnp.broadcast_to(centers[None],
                                           (coords.shape[0],) + centers.shape))
        w = jax.nn.softmax(-d, axis=-1)  # (B, N, K)
        wsum = jnp.sum(w, axis=1) + 1e-8  # (B, K)
        wcenters = jnp.einsum("bnk,bnd->bkd", w, coords) / wsum[..., None]
        h = nn.Dense(64, name="feat_fc1")(wcenters)
        h = nn.Dropout(0.1, deterministic=deterministic)(
            nn.relu(nn.LayerNorm(name="feat_ln1")(h)))
        h = nn.LayerNorm(name="feat_ln2")(nn.Dense(self.embed_dim, name="feat_fc2")(h))
        h = nn.MultiHeadDotProductAttention(
            self.num_heads, dtype=self.dtype, name="cluster_attn")(h, h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(h)
        return jnp.mean(h, axis=1, keepdims=True)  # (B, 1, D)


class PreLNBlock(nn.Module):
    """norm_first TransformerEncoderLayer equivalent (`:590-598`).

    ``quantize`` switches the MLP matmuls (2/3 of block FLOPs) to the int8
    serving path; on TPU at inference the whole MLP sub-block runs as ONE
    fused Pallas kernel (ops/pallas/fused_block.fused_ln_int8_mlp: LN ->
    dynamic int8 quant -> matmul -> relu -> quant -> matmul -> residual,
    no intermediate HBM round trips). Parameter trees stay identical across
    all paths, so bf16 checkpoints serve quantized with no conversion step.

    Attention routes through ops/attention.make_flax_attention_fn: XLA SDPA
    at short sequences, the Pallas flash kernel at >=1024 keys on TPU
    (replaces the reference's torch SDPA at `vision_transformer.py:63`).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    quantize: bool = False
    attn_impl: str = "auto"
    dtype: Any = None
    # precision of the fused serving kernel's attention-core matmuls:
    # "bf16" (default, 2x MXU rate vs round-3's f32; the non-fused paths
    # already run bf16 attention), "int8" (4x, per-row q/k/p quant), "f32"
    attn_core: str = "bf16"

    def setup(self):
        from nova_pointcloud_tpu.ops.attention import make_flax_attention_fn
        from nova_pointcloud_tpu.ops.quantization import Int8Dense

        hidden = int(self.dim * self.mlp_ratio)
        self.norm1 = nn.LayerNorm()
        self.attn = nn.MultiHeadDotProductAttention(
            self.num_heads, dropout_rate=self.dropout, dtype=self.dtype,
            attention_fn=make_flax_attention_fn(self.attn_impl))
        self.norm2 = nn.LayerNorm()
        if self.quantize:
            dt = self.dtype or jnp.bfloat16
            self.fc1 = Int8Dense(hidden, dtype=dt)
            self.fc2 = Int8Dense(self.dim, dtype=dt)
        else:
            self.fc1 = nn.Dense(hidden, dtype=self.dtype)
            self.fc2 = nn.Dense(self.dim, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _fused_attention(self, x: jax.Array) -> jax.Array:
        """Serving-path attention: the ENTIRE PreLN attention sub-block
        (LN -> int8 QKV -> per-head softmax(qk^T)v -> int8 out-proj ->
        residual) as one VMEM-resident Pallas kernel
        (ops/pallas/fused_block.fused_attention_block) — no qkv or
        attention-output HBM round trips. Measured 1.33 vs 1.75 ms/layer at
        flagship shapes against the previous split path (LN+QKV kernel ->
        XLA attention core -> out-proj kernel). Weights come pre-quantized
        from the "qparams" collection when the caller provides one
        (ops/quantization.quantize_serving_params — hoists quantization out
        of the sampling scan); else they quantize in-graph. Either way the
        flax MHA param tree is unchanged, so bf16 checkpoints serve through
        this path with no conversion."""
        from nova_pointcloud_tpu.ops.pallas.fused_block import (
            attention_block_vmem_bytes, fused_attention_block,
            fused_ln_int8_matmul, int8_matmul_residual)
        from nova_pointcloud_tpu.ops.quantization import quantize_weight

        d = self.dim
        heads = self.num_heads
        lnp = self.norm1.variables["params"]
        ap = self.attn.variables["params"]
        bqkv = jnp.concatenate(
            [ap[k]["bias"].reshape(d) for k in ("query", "key", "value")])
        wqkv_q = self.get_variable("qparams", "wqkv_q", None)
        if wqkv_q is not None:
            wqkv_s = self.get_variable("qparams", "wqkv_s")
            out_q = self.get_variable("qparams", "out_q")
            out_s = self.get_variable("qparams", "out_s")
        else:
            wqkv = jnp.concatenate(
                [ap[k]["kernel"].reshape(d, d)
                 for k in ("query", "key", "value")], axis=1)  # (D, 3D)
            wqkv_q, wqkv_s = quantize_weight(wqkv)
            out_q, out_s = quantize_weight(ap["out"]["kernel"].reshape(d, d))
        t = x.shape[-2]
        if attention_block_vmem_bytes(t, d) <= 14 * 2**20:
            return fused_attention_block(x, lnp["scale"], lnp["bias"],
                                         wqkv_q, wqkv_s, bqkv, out_q, out_s,
                                         ap["out"]["bias"].reshape(d),
                                         num_heads=heads,
                                         a_in=self.get_variable(
                                             "qparams", "a_ln1", None),
                                         a_av=self.get_variable(
                                             "qparams", "a_av", None),
                                         core=self.attn_core,
                                         a_smax=self.get_variable(
                                             "qparams", "a_smax", None))
        # long sequences (e.g. per-point tokens): the one-kernel sub-block
        # would overflow VMEM; use the split serving path (LN+QKV kernel,
        # XLA attention core with bf16 softmax, out-proj+residual kernel)
        qkv = fused_ln_int8_matmul(x, lnp["scale"], lnp["bias"],
                                   wqkv_q, wqkv_s, bqkv)  # (B, T, 3D)
        b, t, _ = qkv.shape
        hd = d // heads
        q, k, v = [a.reshape(b, t, heads, hd)
                   for a in jnp.split(qkv, 3, axis=-1)]
        q = q * (hd ** -0.5)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        av = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        return int8_matmul_residual(av, x, out_q, out_s,
                                    ap["out"]["bias"].reshape(d))

    def _calibration_forward(self, x: jax.Array) -> jax.Array:
        """XLA mirror of the int8 serving path that records per-site
        activation ranges into the mutable "act_stats" collection.

        The four sow sites are exactly the fused kernels' activation-quant
        points (post-LN1 input, attention output, post-LN2 input, post-relu
        mid). Stats feed ops/quantization.merge_act_scales; after merging,
        the serving kernels run calibrated per-tensor static quantization
        instead of per-row dynamic. Backend-agnostic (no Pallas), so
        calibration works on CPU too."""
        from nova_pointcloud_tpu.ops.quantization import (int8_matmul,
                                                          quantize_weight)

        d, heads = self.dim, self.num_heads

        def record(name, v):
            self.sow("act_stats", name,
                     jnp.max(jnp.abs(v)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))

        ap = self.attn.variables["params"]
        xf = x.astype(jnp.float32)
        h = self.norm1(xf)
        record("a_ln1", h)
        wqkv = jnp.concatenate(
            [ap[k]["kernel"].reshape(d, d)
             for k in ("query", "key", "value")], axis=1)
        bqkv = jnp.concatenate(
            [ap[k]["bias"].reshape(d) for k in ("query", "key", "value")])
        qkv = int8_matmul(h, quantize_weight(wqkv), jnp.float32) + bqkv
        b, t, _ = qkv.shape
        hd = d // heads
        q, k, v = [a.reshape(b, t, heads, hd)
                   for a in jnp.split(qkv, 3, axis=-1)]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        # max attention logit -> static softmax offset (fused_attention_block
        # a_smax; merge_act_scales exempts it from the amax margin)
        self.sow("act_stats", "a_smax", jnp.max(logits).astype(jnp.float32),
                 reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(-1e30))
        probs = jax.nn.softmax(logits, axis=-1)
        av = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        record("a_av", av)
        out_k = ap["out"]["kernel"].reshape(d, d)
        xf = xf + (int8_matmul(av, quantize_weight(out_k), jnp.float32)
                   + ap["out"]["bias"].reshape(d))
        h2 = self.norm2(xf)
        record("a_ln2", h2)
        p1 = self.fc1.variables["params"]
        p2 = self.fc2.variables["params"]
        a = jnp.maximum(
            int8_matmul(h2, quantize_weight(p1["kernel"]), jnp.float32)
            + p1["bias"], 0.0)
        record("a_mid", a)
        o = int8_matmul(a, quantize_weight(p2["kernel"]), jnp.float32) \
            + p2["bias"]
        return (xf + o).astype(x.dtype)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if (self.quantize and not self.is_initializing()
                and self.is_mutable_collection("act_stats")):
            return self._calibration_forward(x)
        use_fused = (self.quantize and deterministic
                     and not self.is_initializing()
                     and jax.default_backend() == "tpu")
        if use_fused:
            x = self._fused_attention(x)
        else:
            h = self.norm1(x)
            h = self.attn(h, h, deterministic=deterministic)
            x = x + self.drop(h, deterministic=deterministic)

        if use_fused:
            from nova_pointcloud_tpu.ops.pallas.fused_block import (
                fused_ln_int8_mlp)
            from nova_pointcloud_tpu.ops.quantization import quantize_weight

            lnp = self.norm2.variables["params"]
            p1 = self.fc1.variables["params"]
            p2 = self.fc2.variables["params"]
            q1v = self.get_variable("qparams", "fc1_q", None)
            if q1v is not None:
                q1s = self.get_variable("qparams", "fc1_s")
                q2v = self.get_variable("qparams", "fc2_q")
                q2s = self.get_variable("qparams", "fc2_s")
            else:
                q1v, q1s = quantize_weight(p1["kernel"])
                q2v, q2s = quantize_weight(p2["kernel"])
            return fused_ln_int8_mlp(x, lnp["scale"], lnp["bias"],
                                     q1v, q1s, p1["bias"],
                                     q2v, q2s, p2["bias"],
                                     a_in=self.get_variable(
                                         "qparams", "a_ln2", None),
                                     a_mid=self.get_variable(
                                         "qparams", "a_mid", None))

        h = self.norm2(x)
        # relu, not gelu: the reference's nn.TransformerEncoderLayer
        # (`transformer_pointcloud_nova.py:590-598`) leaves activation at the
        # torch default (relu). Also ~30ms/pass cheaper than exact gelu at
        # flagship shapes (erf is transcendental-heavy on the VPU).
        h = self.drop(nn.relu(self.fc1(h)), deterministic=deterministic)
        h = self.fc2(h)
        return x + self.drop(h, deterministic=deterministic)


class _ScanBlockBody(nn.Module):
    """nn.scan adapter: (carry, _) -> (carry, None) over one PreLNBlock."""

    dim: int
    num_heads: int
    dropout: float
    deterministic: bool
    remat: bool = False
    quantize: bool = False
    attn_impl: str = "auto"
    dtype: Any = None
    attn_core: str = "bf16"

    @nn.compact
    def __call__(self, carry, _):
        cls = nn.remat(PreLNBlock, static_argnums=(2,)) if self.remat \
            else PreLNBlock
        out = cls(self.dim, self.num_heads, dropout=self.dropout,
                  quantize=self.quantize, attn_impl=self.attn_impl,
                  dtype=self.dtype, attn_core=self.attn_core,
                  name="block")(carry, self.deterministic)
        return out, None


class BlockStack(nn.Module):
    """Depth-stacked PreLN blocks via nn.scan.

    Compiling ONE block and scanning beats unrolling 32-48 layers into the
    HLO: compile time drops ~depth-fold (a 48-layer unroll took >30min through
    the remote TPU compiler; the scanned form compiles in seconds) with
    identical math. Params carry a leading (depth,) axis.
    """

    depth: int
    dim: int
    num_heads: int
    dropout: float = 0.1
    remat: bool = False
    quantize: bool = False
    attn_impl: str = "auto"
    dtype: Any = None
    attn_core: str = "bf16"  # fused-kernel attention-core precision
    pp_runner: Any = None  # parallel/stack_runner.StackRunner (training PP)

    @nn.compact
    def __call__(self, h: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.pp_runner is not None and not self.is_initializing():
            # pipeline-parallel path: hand the scanned stack's (depth, ...)
            # params to the GPipe/interleaved runner. Dropout is disabled
            # here — PP training runs the blocks deterministically (the
            # schedule replays blocks across microbatches; per-call rng
            # threading through the ring is not supported).
            depth_params = self.variables["params"]["layers"]["block"]
            dim, heads = self.dim, self.num_heads
            impl, dtype = self.attn_impl, self.dtype

            def block_apply(p, hh):
                return PreLNBlock(dim, heads, dropout=0.0, attn_impl=impl,
                                  dtype=dtype).apply({"params": p}, hh, True)

            return self.pp_runner(block_apply, depth_params, h)
        body = nn.scan(
            _ScanBlockBody,
            variable_axes={"params": 0, "qparams": 0, "act_stats": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )(self.dim, self.num_heads, self.dropout, deterministic, self.remat,
          self.quantize, self.attn_impl, self.dtype, self.attn_core,
          name="layers")
        h, _ = body(h, None)
        return h


class NOVAPointCloudTransformer(nn.Module):
    """Unified pc diffusion backbone; (B, N, 3) noisy points -> (B, N, 3) pred."""

    arch: str = "pc_d8w768"
    point_cloud_size: int = 2048
    patch_size: int = 1  # points per token; 1 = per-point like the fork model
    text_token_dim: Optional[int] = None
    text_pool: str = "masked"  # "masked" (real token slots) | "mean" (legacy)
    num_clusters: int = 8
    use_depth_pe: bool = False
    dropout: float = 0.1
    remat: bool = False
    quantize: bool = False  # int8 MLP serving path (fused Pallas on TPU)
    attn_impl: str = "auto"  # ops/attention dispatcher policy
    attn_core: str = "bf16"  # fused-kernel attention-core precision
    dtype: Any = None
    pp_runner: Any = None  # pipeline-parallel stack runner (training)

    @property
    def num_tokens(self) -> int:
        return self.point_cloud_size // self.patch_size

    @property
    def dims(self) -> Tuple[int, int, int]:
        if self.arch not in PC_ARCHES:
            raise KeyError(f"unknown pc arch {self.arch!r}; known: "
                           f"{sorted(PC_ARCHES)}")
        return PC_ARCHES[self.arch]

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array,
                 text_embeds: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        depth, dim, heads = self.dims
        b, n, _ = x.shape
        p = self.patch_size
        tok = x.reshape(b, n // p, p * 3)
        coords = jnp.mean(x.reshape(b, n // p, p, 3), axis=2)  # patch centers

        h = nn.Dense(dim, dtype=self.dtype, name="point_embed")(tok)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.num_tokens, dim))
        h = h + pos[:, : h.shape[1]].astype(h.dtype)
        if self.use_depth_pe:
            h = h + DepthAwarePosEncoding(dim, name="depth_pe")(coords).astype(h.dtype)

        h = h + ClusterBlock(dim, heads, self.num_clusters, dtype=self.dtype,
                             name="cluster")(coords, deterministic).astype(h.dtype)

        t_freq = timestep_freq_embed(timestep.astype(jnp.float32), 256)
        t_emb = nn.Dense(dim, dtype=self.dtype, name="time_fc1")(t_freq.astype(h.dtype))
        t_emb = nn.Dense(dim, dtype=self.dtype, name="time_fc2")(nn.silu(t_emb))
        h = h + t_emb[:, None, :]

        if text_embeds is not None and self.text_token_dim:
            t = nn.Dense(dim, dtype=self.dtype, name="text_embed")(text_embeds)
            if self.text_pool == "masked":
                # Pool over REAL token slots only. Encoders pad unused slots
                # with all-zero rows (dummy.py / phi.py encode contract); a
                # plain mean over all L slots diluted a 2-token prompt ~L/2×
                # and the conditioning guard sat at chance on every trained
                # checkpoint (round 5, docs/evaluation.md). Reference pools
                # too (`demo.py:281-291`) but over real tokens.
                live = jnp.any(text_embeds != 0, axis=-1, keepdims=True)
                live = live.astype(t.dtype)
                denom = jnp.maximum(jnp.sum(live, axis=1, keepdims=True), 1.0)
                pooled = jnp.sum(t * live, axis=1, keepdims=True) / denom
            else:  # "mean": legacy whole-slot mean (pre-round-5 checkpoints)
                pooled = jnp.mean(t, axis=1, keepdims=True)
            h = h + pooled

        h = BlockStack(depth, dim, heads, dropout=self.dropout,
                       remat=self.remat, quantize=self.quantize,
                       attn_impl=self.attn_impl, dtype=self.dtype,
                       attn_core=self.attn_core, pp_runner=self.pp_runner,
                       name="blocks")(h, deterministic)

        # Final LayerNorm + zero-init head. The reference's post-LN
        # nn.TransformerEncoderLayer stack (`transformer_pointcloud_nova.py:
        # 590-598`) normalizes at the END of every layer, so its bare output
        # head sees unit-scale features. This PreLN stack accumulates an
        # unnormalized residual stream that grows with depth — at d48 a
        # xavier head produced initial eps-MSE ~264 (vs 1.0 for predicting
        # zero) and the recovery burned most of the training budget
        # (round-2 flagship runs). Standard PreLN closure: norm, then a
        # zero-init projection so training starts at the trivial predictor.
        h = nn.LayerNorm(dtype=self.dtype, name="final_norm")(h)
        out = nn.Dense(p * 3, dtype=self.dtype, name="output_proj",
                       kernel_init=nn.initializers.zeros)(h)
        return out.reshape(b, n, 3).astype(jnp.float32)


class EdgeAligner(nn.Module):
    """Cross-subset boundary blending (`:155-223`).

    Edge feature per point = feature - mean(kNN neighbor features); current
    subset queries the union of neighbor-subset edge features via attention;
    adds a linear lift of the xyz coordinates.
    """

    embed_dim: int
    num_heads: int = 8
    k: int = 8
    dtype: Any = None

    def edge_features(self, points: jax.Array, feats: jax.Array) -> jax.Array:
        k = min(self.k, points.shape[1])
        _, idx = knn(points, points, k)  # (B, N, k)
        neigh = jax.vmap(lambda f, i: f[i])(feats, idx)  # (B, N, k, D)
        return feats - jnp.mean(neigh, axis=2)

    @nn.compact
    def __call__(self, cur_points: jax.Array, cur_feats: jax.Array,
                 neigh_points: jax.Array, neigh_feats: jax.Array,
                 neigh_valid: Optional[jax.Array] = None) -> jax.Array:
        """neigh_* are concatenated neighbor subsets (B, M, ...); ``neigh_valid``
        (B, M) masks not-yet-generated slots (static-shape AR)."""
        cur_edge = self.edge_features(cur_points, cur_feats)
        neigh_edge = self.edge_features(neigh_points, neigh_feats)
        mask = None
        if neigh_valid is not None:
            mask = neigh_valid[:, None, None, :] > 0  # (B, 1, 1, M)
        aligned = nn.MultiHeadDotProductAttention(
            self.num_heads, dtype=self.dtype, name="biattn")(
            cur_edge, neigh_edge, mask=mask)
        spatial = nn.Dense(self.embed_dim, dtype=self.dtype,
                           name="spatial_embed")(cur_points)
        return aligned + spatial


class ARSubsetDiffusion(nn.Module):
    """Subset-level autoregressive conditioning (`:226-302`).

    Aggregates previously generated subsets into a global context token via
    self-attention, edge-aligns the current subset against them, and adds a
    subset-progress time embedding before the base transformer runs.
    """

    embed_dim: int
    num_heads: int = 12
    dtype: Any = None

    @nn.compact
    def __call__(self, cur_feats: jax.Array, gen_feats: jax.Array,
                 progress: jax.Array, cur_points: jax.Array,
                 gen_points: jax.Array, gen_valid: jax.Array) -> jax.Array:
        """cur_feats (B, S, D); gen_feats (B, M, D) concat of generated subsets
        (padded), gen_valid (B, M). Returns conditioned features (B, S, D)."""
        mask = gen_valid[:, None, None, :] > 0
        agg = nn.MultiHeadDotProductAttention(
            self.num_heads, dtype=self.dtype, name="biattn")(
            gen_feats, gen_feats, mask=mask & (gen_valid[:, None, :, None] > 0))
        denom = jnp.sum(gen_valid, axis=1, keepdims=True)[..., None] + 1e-8
        context = jnp.sum(agg * gen_valid[..., None], axis=1, keepdims=True) / denom

        t_emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="time_fc1")(
            progress[..., None].astype(cur_feats.dtype))
        t_emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="time_fc2")(
            nn.silu(t_emb))

        aligned = EdgeAligner(self.embed_dim, 8, dtype=self.dtype,
                              name="edge_aligner")(
            cur_points, cur_feats, gen_points, gen_feats, gen_valid)
        has_any = (jnp.sum(gen_valid, axis=1) > 0).astype(cur_feats.dtype)
        has_any = has_any[:, None, None]
        out = cur_feats + aligned * has_any + context * has_any
        return out + t_emb[:, None, :] if t_emb.ndim == 2 else out + t_emb


class ARRefiner(nn.Module):
    """Subset AR refinement head for dynamic-partition generation.

    Working-shape realization of the reference's AR generation intent
    (`transformer_pointcloud_nova.py:641-700`, whose shipped path mixes 3-dim
    points into 768-dim attention): lift subset points to the embed dim,
    condition on previously generated subsets (context attention + edge
    alignment + progress embed), run a small pre-LN stack, and emit refined
    xyz as a residual on the input points.
    """

    embed_dim: int = 256
    num_heads: int = 8
    depth: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, cur_points: jax.Array, gen_points: jax.Array,
                 gen_valid: jax.Array, progress: jax.Array) -> jax.Array:
        lift = nn.Dense(self.embed_dim, dtype=self.dtype, name="lift")
        cur_feats = lift(cur_points)
        gen_feats = lift(gen_points)
        h = ARSubsetDiffusion(self.embed_dim, self.num_heads, dtype=self.dtype,
                              name="ar")(cur_feats, gen_feats, progress,
                                         cur_points, gen_points, gen_valid)
        for i in range(self.depth):
            h = PreLNBlock(self.embed_dim, self.num_heads, dropout=0.0,
                           dtype=self.dtype, name=f"blocks_{i}")(h, True)
        delta = nn.Dense(3, dtype=self.dtype, name="head",
                         kernel_init=nn.initializers.zeros)(h)
        return cur_points + delta.astype(cur_points.dtype)
