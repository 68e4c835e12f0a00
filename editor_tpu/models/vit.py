"""TPU-native ViT backbone for object ReID.

Functional re-design of the reference backbone ``Trans``
(reference: modeling/backbones/vit_pytorch.py:461-644) with:
  * NHWC images + HWIO conv patchify (overlap-capable stride) — XLA:TPU native
    layouts (reference PatchEmbed_overlap: vit_pytorch.py:420-458).
  * cls token, learned pos-embed, SIE camera/view embedding scaled by
    ``sie_xishu`` (reference: vit_pytorch.py:484-504,630-637).
  * depth-stacked block parameters + ``lax.scan`` over layers. Instead of
    materializing 12 full per-layer attention maps like the reference
    (vit_pytorch.py:638-644), the scan *carries the cumulative attention-rollout
    product* — exactly what SFTS's Part_Attention needs
    (modeling/fusion_part/SFTS.py:145-153) — in fp32.
  * pre-LN blocks with erf-GELU, LN eps 1e-6, per-layer linearly increasing
    DropPath (vit_pytorch.py:511).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P

from editor_tpu.models.layers import (
    dropout,
    gelu,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    trunc_normal,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: Tuple[int, int] = (256, 128)
    patch_size: int = 16
    stride_size: Tuple[int, int] = (16, 16)
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    camera: int = 0
    view: int = 0
    sie_xishu: float = 3.0
    ln_eps: float = 1e-6
    num_fc_classes: int = 1000  # legacy ImageNet head kept for param parity
    remat: bool = False  # jax.checkpoint each block (activation recompute)
    # 'block' recomputes the whole block in backward (min memory — and
    # measured fastest at the flagship batch: 403 ms/step vs 421 for
    # 'names' and 464 for 'dots'; the selective saves cost more in HBM
    # pressure than the recompute they avoid);
    # 'dots' saves every matmul output; 'names' saves exactly the qkv
    # projection, attention output, and fc1 pre-GELU.
    remat_policy: str = "block"
    # keep the LAST k layers un-remat'd: each costs ~2.8 GB of saved
    # activations at the flagship batch but skips that layer's backward
    # recompute — spend whatever HBM block-remat leaves free
    remat_skip_last: int = 0

    @property
    def num_y(self) -> int:
        # reference: vit_pytorch.py:429-430
        return (self.img_size[0] - self.patch_size) // self.stride_size[0] + 1

    @property
    def num_x(self) -> int:
        return (self.img_size[1] - self.patch_size) // self.stride_size[1] + 1

    @property
    def num_patches(self) -> int:
        return self.num_x * self.num_y

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.qk_scale if self.qk_scale is not None else self.head_dim ** -0.5


def vit_base_config(**kw) -> ViTConfig:
    """vit_base_patch16_224 factory args (reference: vit_pytorch.py:693-701)."""
    return ViTConfig(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0,
                     qkv_bias=True, **kw)


def vit_small_config(**kw) -> ViTConfig:
    """vit_small_patch16_224 (reference: vit_pytorch.py:704-714)."""
    kw.setdefault("qk_scale", 768 ** -0.5)
    return ViTConfig(embed_dim=768, depth=8, num_heads=8, mlp_ratio=3.0,
                     qkv_bias=False, **kw)


def deit_small_config(**kw) -> ViTConfig:
    """deit_small_patch16_224 (reference: vit_pytorch.py:717-727)."""
    return ViTConfig(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0,
                     qkv_bias=True, **kw)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key: Array, cfg: ViTConfig) -> dict:
    C = cfg.embed_dim
    hid = int(C * cfg.mlp_ratio)
    ks = jax.random.split(key, 4)
    return {
        "norm1": layernorm_init(C),
        "attn": {
            "qkv": linear_init(ks[0], C, 3 * C, bias=cfg.qkv_bias),
            "proj": linear_init(ks[1], C, C, bias=True),
        },
        "norm2": layernorm_init(C),
        "mlp": {
            "fc1": linear_init(ks[2], C, hid, bias=True),
            "fc2": linear_init(ks[3], hid, C, bias=True),
        },
    }


def vit_init(key: Array, cfg: ViTConfig) -> dict:
    C = cfg.embed_dim
    keys = jax.random.split(key, cfg.depth + 5)
    # conv patchify: normal(0, sqrt(2/n)), n = kh*kw*out (vit_pytorch.py:438-441)
    n = cfg.patch_size * cfg.patch_size * C
    proj_w = jax.random.normal(keys[0], (cfg.patch_size, cfg.patch_size,
                                         cfg.in_chans, C)) * (2.0 / n) ** 0.5
    params = {
        "patch_embed": {"proj": {"w": proj_w, "b": jnp.zeros((C,))}},
        "cls_token": trunc_normal(keys[1], (1, 1, C), std=0.02),
        "pos_embed": trunc_normal(keys[2], (1, cfg.num_patches + 1, C), std=0.02),
        "norm": layernorm_init(C),
        "fc": linear_init(keys[3], C, cfg.num_fc_classes, bias=True),
    }
    if cfg.camera > 1 and cfg.view > 1:
        params["sie_embed"] = trunc_normal(keys[4], (cfg.camera * cfg.view, 1, C), std=0.02)
    elif cfg.camera > 1:
        params["sie_embed"] = trunc_normal(keys[4], (cfg.camera, 1, C), std=0.02)
    elif cfg.view > 1:
        params["sie_embed"] = trunc_normal(keys[4], (cfg.view, 1, C), std=0.02)
    blocks = [_block_init(k, cfg) for k in keys[5:]]
    params["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def patch_embed(p: dict, x: Array, cfg: ViTConfig) -> Array:
    """[B,H,W,3] -> [B, P, C] tokens via strided conv on the MXU."""
    y = jax.lax.conv_general_dilated(
        x, p["proj"]["w"].astype(x.dtype),
        window_strides=cfg.stride_size, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["proj"]["b"].astype(x.dtype)
    B = y.shape[0]
    return y.reshape(B, cfg.num_patches, cfg.embed_dim)


def _attention(p: dict, x: Array, cfg: ViTConfig, training: bool,
               rng: Optional[Array],
               need_probs: bool = True,
               tp_mesh=None) -> Tuple[Array, Optional[Array]]:
    """Self-attention returning (out, probs or None).

    The reference returns the full per-layer attention maps for SFTS's
    rollout (Attention.forward get_attn: vit_pytorch.py:184-198). Here the
    fused kernel spills the post-softmax probs (bf16 on TPU) only when the
    caller collects the rollout; the reverse vector chain in
    editor_tpu/ops/rollout.py then reduces the stack with L·N² flops instead
    of re-running L softmax(QKᵀ) products. When attn_drop_rate > 0 (never in
    the shipped configs) the rollout sees post-dropout probabilities, same
    as the reference (dropout is applied to the returned map there too).
    """
    qkv = linear(p["qkv"], x)  # [B, N, 3C] — fed to the kernel as-is
    return _attention_core(p, qkv, cfg, training, rng, need_probs, tp_mesh)


def _tp_attention(qkv: Array, cfg: ViTConfig, need_probs: bool, tp_mesh):
    """Attention under a model-sharded mesh: the qkv activation arrives
    Megatron-column-split over 'model' in the SHARD-major layout
    (parallel/tp.py permute_qkv_params), so each shard runs the unchanged
    fused kernel (XLA fallback off-TPU) on its own H/tp heads via shard_map
    — the kernel path survives MESH_MODEL>1 instead of degrading to a
    replicated XLA graph."""
    from jax import shard_map

    from editor_tpu.ops.fused_attention import (attention_from_qkv,
                                                attention_from_qkv_probs)

    tp = tp_mesh.shape["model"]
    Hl = cfg.num_heads // tp
    bs = "data" if "data" in tp_mesh.axis_names else None
    if need_probs:
        fn = shard_map(
            lambda t: attention_from_qkv_probs(t, Hl, cfg.scale),
            mesh=tp_mesh,
            in_specs=P(bs, None, "model"),
            out_specs=(P(bs, None, "model"),
                       (P(bs, "model", None, None), P(bs, "model", None))),
            check_vma=False)
        out, probs = fn(qkv)
        return out, probs
    fn = shard_map(
        lambda t: attention_from_qkv(t, Hl, cfg.scale),
        mesh=tp_mesh,
        in_specs=P(bs, None, "model"),
        out_specs=P(bs, None, "model"),
        check_vma=False)
    return fn(qkv), None


def _attention_core(p: dict, qkv: Array, cfg: ViTConfig, training: bool,
                    rng: Optional[Array],
                    need_probs: bool = True,
                    tp_mesh=None) -> Tuple[Array, Optional[Array]]:
    """Attention from the raw qkv projection (see _attention)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = cfg.num_heads, cfg.head_dim
    qkv = jax.ad_checkpoint.checkpoint_name(qkv, "qkv")
    use_fused = (jax.default_backend() == "tpu"
                 and not (training and cfg.attn_drop_rate > 0))
    probs = None
    if tp_mesh is not None and tp_mesh.shape.get("model", 1) > 1:
        if training and cfg.attn_drop_rate > 0:
            raise NotImplementedError(
                "attn_drop_rate > 0 under tensor parallelism")
        out, probs = _tp_attention(qkv, cfg, need_probs, tp_mesh)
    elif use_fused:
        from editor_tpu.ops.fused_attention import (attention_from_qkv,
                                                    attention_from_qkv_probs)
        if need_probs:
            out, probs = attention_from_qkv_probs(qkv, H, cfg.scale)
        else:
            out = attention_from_qkv(qkv, H, cfg.scale)  # [B,N,C]
    else:
        # einsum straight from [B,N,H,D] — no explicit head transposes;
        # accumulate in at-least-f32 (f64 under x64 for parity tests)
        qkv5 = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]  # [B,N,H,D]
        cd = jnp.promote_types(qkv.dtype, jnp.float32)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=cd) * cfg.scale
        attn = jax.nn.softmax(logits.astype(cd), axis=-1)
        if training and cfg.attn_drop_rate > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            attn = dropout(sub, attn, cfg.attn_drop_rate, training)
        attn_c = attn.astype(qkv.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn_c, v,
                         preferred_element_type=cd)
        out = out.astype(qkv.dtype).reshape(B, N, C)
        if need_probs:
            probs = attn.astype(qkv.dtype)
    out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
    out = linear(p["proj"], out)
    if training and cfg.drop_rate > 0 and rng is not None:
        _, sub = jax.random.split(rng)
        out = dropout(sub, out, cfg.drop_rate, training)
    return out, probs


def _mlp(p: dict, x: Array, training: bool, rate: float,
         rng: Optional[Array]) -> Array:
    y = gelu(jax.ad_checkpoint.checkpoint_name(linear(p["fc1"], x), "fc1"))
    if training and rate > 0 and rng is not None:
        rng, sub = jax.random.split(rng)
        y = dropout(sub, y, rate, training)
    y = linear(p["fc2"], y)
    if training and rate > 0 and rng is not None:
        _, sub = jax.random.split(rng)
        y = dropout(sub, y, rate, training)
    return y


def _drop_path_scan(rng: Optional[Array], x: Array, rate: Array,
                    training: bool) -> Array:
    """drop_path with a traced per-layer rate (works inside lax.scan)."""
    if not training or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x.astype(jnp.float32) / keep * mask).astype(x.dtype)


def vit_embed(
    params: dict,
    x: Array,
    cfg: ViTConfig,
    camera_id: Optional[Array] = None,
    view_id: Optional[Array] = None,
    training: bool = False,
    drop_rng: Optional[Array] = None,
) -> Array:
    """Patchify + cls token + pos embed + SIE (+ token dropout): everything
    before the block stack (reference: vit_pytorch.py:623-637). Exposed
    separately so the pipeline-parallel backbone can run it on every stage
    replica while only the blocks are stage-partitioned
    (parallel/pipeline_vit.py)."""
    B = x.shape[0]
    C = cfg.embed_dim
    tokens = patch_embed(params["patch_embed"], x, cfg)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (B, 1, C))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = params["pos_embed"].astype(tokens.dtype)
    # SIE embedding (reference: vit_pytorch.py:630-637)
    if "sie_embed" in params and cfg.camera > 1 and cfg.view > 1:
        sie = params["sie_embed"][camera_id * cfg.view + view_id]
        tokens = tokens + pos + cfg.sie_xishu * sie.astype(tokens.dtype)
    elif "sie_embed" in params and cfg.camera > 1:
        sie = params["sie_embed"][camera_id]
        tokens = tokens + pos + cfg.sie_xishu * sie.astype(tokens.dtype)
    elif "sie_embed" in params and cfg.view > 1:
        sie = params["sie_embed"][view_id]
        tokens = tokens + pos + cfg.sie_xishu * sie.astype(tokens.dtype)
    else:
        tokens = tokens + pos
    if training and cfg.drop_rate > 0 and drop_rng is not None:
        tokens = dropout(drop_rng, tokens, cfg.drop_rate, training)
    return tokens


def vit_apply(
    params: dict,
    x: Array,
    cfg: ViTConfig,
    camera_id: Optional[Array] = None,
    view_id: Optional[Array] = None,
    training: bool = False,
    rng: Optional[Array] = None,
    collect_rollout: bool = True,
    tp_mesh=None,
) -> Tuple[Array, Optional[Array]]:
    """Forward pass.

    Args:
      x: [B, H, W, 3] images (NHWC), any float dtype.
      camera_id / view_id: [B] int32 SIE indices.

    Returns:
      tokens: [B, 1+P, C] final-norm output tokens.
      rollout_cls: [B, heads, P] fp32 — cls-row of the product of all per-layer
        attention maps (== Part_Attention's ``last_map[:, :, 0, 1:]``,
        reference: modeling/fusion_part/SFTS.py:145-153).
    """
    emb_rng = None
    if training and cfg.drop_rate > 0 and rng is not None:
        rng, emb_rng = jax.random.split(rng)
    tokens = vit_embed(params, x, cfg, camera_id, view_id, training, emb_rng)

    N = tokens.shape[1]
    dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
    if rng is not None:
        layer_rngs = jax.random.split(rng, cfg.depth)
    else:
        layer_rngs = jnp.zeros((cfg.depth, 2), dtype=jnp.uint32)
    have_rng = rng is not None

    # NOTE: an LN->matmul(->GELU) fused kernel exists
    # (ops/fused_linear.ln_matmul) and wins in isolation (qkv 2.30->1.99 ms,
    # fc1+gelu 3.82->2.67 ms per layer), but wiring it here LOSES ~25 ms on
    # the full backbone: XLA overlaps its own fusions with the attention
    # custom call, while back-to-back Pallas calls serialize. Kept as a
    # library op; the scan body stays on the XLA LN path.
    def body(xs, inp):
        bp, rate, lrng = inp
        r1 = r2 = r3 = None
        if have_rng:
            r1, r2, r3 = jax.random.split(lrng, 3)
        mid, probs = _attention(bp["attn"],
                                layernorm(bp["norm1"], xs, cfg.ln_eps),
                                cfg, training, r3, need_probs=collect_rollout,
                                tp_mesh=tp_mesh)
        xs = xs + _drop_path_scan(r1, mid, rate, training)
        xs = xs + _drop_path_scan(
            r2, _mlp(bp["mlp"], layernorm(bp["norm2"], xs, cfg.ln_eps),
                     training, cfg.drop_rate, r3), rate, training)
        return xs, probs

    if cfg.remat:
        if cfg.remat_policy == "dots":
            scan_body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.checkpoint_dots)
        elif cfg.remat_policy == "names":
            scan_body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "qkv", "attn_out", "fc1"))
        elif cfg.remat_policy == "attn_out":
            # saving attn_out + fc1 (not qkv) means the backward never
            # re-runs the attention kernel or its probs spill: qkv is
            # recomputed with one matmul for the attention VJP residual
            scan_body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "fc1"))
        else:
            scan_body = jax.checkpoint(body)
    else:
        scan_body = body
    k = (min(cfg.remat_skip_last, cfg.depth)
         if (cfg.remat and cfg.remat_skip_last > 0) else 0)
    if k == cfg.depth:
        # REMAT_SKIP_LAST >= depth asks for NO remat'd layers: honor it with
        # one plain scan rather than silently remat'ing everything
        scan_body, k = body, 0
    if k:
        # remat'd scan over the first depth-k layers, plain scan over the
        # last k (their activations stay resident; no backward recompute)
        take = lambda tree, sl: jax.tree_util.tree_map(lambda x: x[sl], tree)
        first = (take(params["blocks"], slice(None, -k)), dpr[:-k],
                 layer_rngs[:-k])
        last = (take(params["blocks"], slice(-k, None)), dpr[-k:],
                layer_rngs[-k:])
        tokens, probs_a = jax.lax.scan(scan_body, tokens, first)
        tokens, probs_b = jax.lax.scan(body, tokens, last)
        if probs_a is None:
            probs = None
        elif isinstance(probs_a, tuple):
            probs = tuple(jnp.concatenate([a, b], axis=0)
                          for a, b in zip(probs_a, probs_b))
        else:
            probs = jnp.concatenate([probs_a, probs_b], axis=0)
    else:
        tokens, probs = jax.lax.scan(
            scan_body, tokens, (params["blocks"], dpr, layer_rngs))
    tokens = layernorm(params["norm"], tokens, cfg.ln_eps)
    if not collect_rollout:
        return tokens, None

    # Attention rollout: Part_Attention needs only the cls ROW of the full
    # chain product P = A_L @ ... @ A_1 (SFTS.py:150-153) = a reverse vector
    # chain over the per-layer prob maps the scan stacked. The fused TPU
    # path stacks them in split (patch, cls) form — see ops/fused_attention.
    # Gradient-free: the rollout only feeds a discrete top-k.
    from editor_tpu.ops.rollout import (rollout_from_probs,
                                        rollout_from_split_probs)
    if isinstance(probs, tuple):
        if tp_mesh is not None and tp_mesh.shape.get("model", 1) > 1:
            # heads are independent in the chain: run it per model-shard
            from jax import shard_map
            bs = "data" if "data" in tp_mesh.axis_names else None
            rollout_cls = shard_map(
                rollout_from_split_probs, mesh=tp_mesh,
                in_specs=(P(None, bs, "model", None, None),
                          P(None, bs, "model", None)),
                out_specs=P(bs, "model", None),
                check_vma=False)(*probs)
        else:
            rollout_cls = rollout_from_split_probs(*probs)
    else:
        rollout_cls = rollout_from_probs(probs)
    return tokens, rollout_cls
