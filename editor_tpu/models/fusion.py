"""HMA — Hierarchical Masked Aggregation fusion block.

TPU-native equivalent of reference ``BlockMask`` / ``AttentionMask`` /
``MlpMasked`` (modeling/backbones/vit_pytorch.py:148-168,227-352): per-modality
masked attention + masked MLP residual blocks, OCFR loss on cls tokens, then a
joint masked attention over the concatenated [RGB|NIR|TIR] tokens (3·(1+P)),
output LayerNorm, re-mask.

Masking semantics (exactly the reference's):
  * tokens multiplied by the mask before qkv / fc1,
  * attention logits additively masked where ``mask @ maskᵀ == 0`` with -65504,
  * post-softmax rows multiplied by the (query) mask.
All shapes static; the mask-multiply design avoids gathers entirely — this is
already the right shape for the MXU, and the fused Pallas kernel in
editor_tpu/ops/masked_attention.py implements the same contract.

Note: BlockMask LayerNorms use torch's default eps=1e-5 (the reference passes
no eps here, unlike the backbone's 1e-6 — vit_pytorch.py:265 vs :699), and all
its Linears are bias-free (qkv_bias=False, make_model.py:97-98).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from editor_tpu.models.layers import gelu, layernorm, layernorm_init, linear, linear_init
from editor_tpu.models.ocfr import ocfr_update_and_loss
from editor_tpu.ops.masked_attention import masked_attention_from_qkv

Array = jax.Array

LN_EPS = 1e-5  # torch nn.LayerNorm default (BlockMask uses the default)
MASK_FILL = -65504.0  # reference: vit_pytorch.py:252


def _masked_attn_init(key: Array, dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "qkv": linear_init(k1, dim, 3 * dim, bias=False),
        "proj": linear_init(k2, dim, dim, bias=False),
    }


def _masked_mlp_init(key: Array, dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, bias=False),
        "fc2": linear_init(k2, hidden, dim, bias=False),
    }


def blockmask_init(key: Array, dim: int = 768, mlp_ratio: float = 4.0) -> dict:
    hidden = int(dim * mlp_ratio)
    ks = jax.random.split(key, 8)
    p = {}
    for i, mod in enumerate(("R", "N", "T")):
        p[f"norm{mod}"] = layernorm_init(dim)
        p[f"attn{mod}"] = _masked_attn_init(ks[2 * i], dim)
        p[f"norm{mod}_"] = layernorm_init(dim)
        p[f"mlp{mod}"] = _masked_mlp_init(ks[2 * i + 1], dim, hidden)
    p["norm1"] = layernorm_init(dim)
    p["attn1"] = _masked_attn_init(ks[6], dim)
    p["norm2"] = layernorm_init(dim)
    p["mlp"] = _masked_mlp_init(ks[7], dim, hidden)
    p["out_norm"] = layernorm_init(dim)
    return p


def blockmask_moe_init(key: Array, dim: int = 768, mlp_ratio: float = 4.0,
                       num_experts: int = 8) -> dict:
    """BlockMask params with the JOINT MLP replaced by a GShard-style
    mixture-of-experts FFN (parallel/moe.py) — the expert-parallel variant
    of the fusion block. Per-modality blocks and both masked attentions are
    unchanged; only the final MlpMasked over the concatenated 3·(1+P)
    tokens becomes a routed expert bank (beyond-reference: SURVEY §2.2
    names EP/MoE absent from the reference)."""
    from editor_tpu.parallel.moe import moe_init

    if num_experts < 2:
        raise ValueError(
            f"MOE_EXPERTS must be >= 2 (top-k routing with k=2), got "
            f"{num_experts}; use MOE_EXPERTS 0 for the dense MLP")
    p = blockmask_init(key, dim=dim, mlp_ratio=mlp_ratio)
    del p["mlp"]
    # stored as a plain dict (not the MoEParams NamedTuple) so the param
    # tree stays homogeneous for optimizers / checkpoints / converters
    p["moe_mlp"] = moe_init(jax.random.fold_in(key, 99), dim,
                            int(dim * mlp_ratio), num_experts)._asdict()
    return p


def _tile_mask(mask: Array, n_tokens: int) -> Array:
    """Repeat [B, M, 1] mask along tokens if the sequence is a k× concat
    (reference: vit_pytorch.py:159-161, 242-244)."""
    if mask.shape[1] != n_tokens:
        reps = n_tokens // mask.shape[1]
        mask = jnp.tile(mask, (1, reps, 1))
    return mask


def masked_attention_block(p: dict, x: Array, mask: Array, num_heads: int,
                           use_pallas: bool = True, tp_mesh=None,
                           seq_mesh=None) -> Array:
    """AttentionMask.forward (reference: vit_pytorch.py:240-258)."""
    B, N, C = x.shape
    m = _tile_mask(mask, N)
    xm = x * m.astype(x.dtype)
    D = C // num_heads
    qkv = linear(p["qkv"], xm)  # [B, N, 3C] — fed to the kernel as-is
    out = masked_attention_from_qkv(qkv, m[..., 0], num_heads,
                                    scale=D ** -0.5, mask_fill=MASK_FILL,
                                    tile=mask.shape[1],
                                    use_pallas=use_pallas, tp_mesh=tp_mesh,
                                    seq_mesh=seq_mesh)
    return linear(p["proj"], out)


def masked_mlp(p: dict, x: Array, mask: Array) -> Array:
    """MlpMasked.forward (reference: vit_pytorch.py:158-168)."""
    m = _tile_mask(mask, x.shape[1]).astype(x.dtype)
    y = linear(p["fc1"], x * m)
    y = gelu(y)
    return linear(p["fc2"], y)


def moe_masked_mlp(p, x: Array, mask: Array, moe_mesh=None,
                   moe_shards: int = 1, k: int = 2,
                   capacity_factor: float = 2.0,
                   expert_axis: str = "expert") -> Tuple[Array, Array]:
    """MlpMasked with the FFN replaced by the GShard MoE layer.

    Same masking contract as :func:`masked_mlp` (tokens multiplied by the
    mask before entering the FFN); the [B, N, C] sequence is flattened to
    B·N tokens and routed to experts. With ``moe_mesh`` the experts and
    tokens shard over ``expert_axis`` (one all_to_all each way,
    parallel/moe.moe_ffn). Without a mesh, ``moe_shards`` emulates the
    S-shard semantics exactly (per-shard routing + per-shard capacity
    buffers, vmapped) — the single-device parity oracle of the meshed run.

    Returns (y [B, N, C], load-balance aux loss).
    """
    from editor_tpu.parallel.moe import MoEParams, moe_ffn, moe_ffn_dense

    if isinstance(p, dict):
        p = MoEParams(**p)
    m = _tile_mask(mask, x.shape[1]).astype(x.dtype)
    B, N, C = x.shape
    z = (x * m).reshape(B * N, C)
    if moe_mesh is not None:
        y, aux = moe_ffn(p, z, moe_mesh, expert_axis, k, capacity_factor)
    else:
        S = moe_shards
        if z.shape[0] % S:
            raise ValueError(
                f"tokens {z.shape[0]} not divisible by moe_shards={S}")
        Tl = z.shape[0] // S
        E = p.router.shape[-1]
        cap = int(capacity_factor * k * Tl / E) or 1
        ys, auxs = jax.vmap(
            lambda t: moe_ffn_dense(p, t, k, capacity=cap))(
                z.reshape(S, Tl, C))
        y, aux = ys.reshape(B * N, C), jnp.mean(auxs)
    return y.reshape(B, N, C), aux


def _stack_modal_params(params: dict, fmt: str,
                        names=("R", "N", "T")) -> dict:
    """Stack the three same-shaped per-modality param trees along axis 0."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[params[fmt.format(m)] for m in names])


def _ln_modal(p: dict, x: Array, eps: float) -> Array:
    """LayerNorm over [M, B, n, C] with per-modality affine [M, C]."""
    cd = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cd)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    w = p["w"][:, None, None, :].astype(cd)
    b = p["b"][:, None, None, :].astype(cd)
    return (y * w + b).astype(x.dtype)


def _linear_modal(p: dict, x: Array) -> Array:
    """[M, B, n, C] @ per-modality weights [M, C, D] (bias-free)."""
    return jnp.einsum("mbnc,mcd->mbnd", x, p["w"].astype(x.dtype))


def _modal_blocks_batched(params: dict, feats: List[Array], mask: Array,
                          num_heads: int, use_pallas: bool,
                          tp_mesh=None, seq_mesh=None) -> List[Array]:
    """The three per-modality masked attn+MLP residual blocks
    (reference: vit_pytorch.py:311-317) batched modality-major: one LN /
    qkv / attention / MLP dispatch over a [3, B, n, C] tensor instead of
    three small ones — same math, 3x the MXU feed per dispatch."""
    X = jnp.stack(feats, axis=0)  # [M, B, n, C]
    M, B, n, C = X.shape
    H, D = num_heads, C // num_heads
    m4 = mask[None].astype(X.dtype)            # [1, B, n, 1]
    mask_flat = jnp.tile(mask[..., 0], (M, 1))  # [M*B, n]

    att = _stack_modal_params(params, "attn{}")
    y = _ln_modal(_stack_modal_params(params, "norm{}"), X, LN_EPS)
    qkv = _linear_modal(att["qkv"], y * m4).reshape(M * B, n, 3 * C)
    out = masked_attention_from_qkv(qkv, mask_flat, H, scale=D ** -0.5,
                                    mask_fill=MASK_FILL, tile=n,
                                    use_pallas=use_pallas, tp_mesh=tp_mesh,
                                    seq_mesh=seq_mesh)
    out = out.reshape(M, B, n, C)
    X = X + _linear_modal(att["proj"], out)

    mlp = _stack_modal_params(params, "mlp{}")
    y = _ln_modal(_stack_modal_params(params, "norm{}_"), X, LN_EPS)
    y = _linear_modal(mlp["fc1"], y * m4)
    X = X + _linear_modal(mlp["fc2"], gelu(y))
    return [X[i] for i in range(M)]


def blockmask_apply(
    params: dict,
    modal_feats: List[Optional[Array]],
    mask_patches: Array,
    ocfr_centers: Dict[str, Array],
    labels: Optional[Array],
    num_heads: int = 12,
    ocfr_momentum: float = 0.8,
    training: bool = False,
    use_pallas: bool = True,
    tp_mesh=None,
    seq_mesh=None,
    moe_mesh=None,
    moe_shards: int = 1,
) -> Tuple[Array, Optional[Array], Dict[str, Array], Optional[Array]]:
    """BlockMask.forward (reference: vit_pytorch.py:309-352).

    ``seq_mesh``: run every masked attention sequence-sharded over a 'seq'
    mesh axis via the masked ring schedule (parallel/ring.py) — the SP
    demonstration SURVEY §7 scopes to this 3·(1+P)-token fusion block.

    ``moe_mesh`` / ``moe_shards``: when ``params`` were built by
    :func:`blockmask_moe_init`, the joint MLP is a GShard MoE — experts
    sharded over the mesh's 'expert' axis, or (no mesh) ``moe_shards``
    emulated shards as the parity oracle.

    Args:
      modal_feats: [RGB, NIR, TIR(optional None)] token tensors [B, 1+P, C].
      mask_patches: [B, P, 1] float union mask (no cls entry).

    Returns:
      (fused tokens [B, k*(1+P), C], ocfr_loss or None, new ocfr centers,
       moe load-balance aux loss or None for the dense MLP).
    """
    B = modal_feats[0].shape[0]
    dtype = modal_feats[0].dtype
    ones = jnp.ones((B, 1, 1), dtype=mask_patches.dtype)
    mask = jnp.concatenate([ones, mask_patches], axis=1)  # [B, 1+P, 1]

    names = ("R", "N", "T")
    if all(f is not None for f in modal_feats[:3]) and len(modal_feats) >= 3:
        refined = _modal_blocks_batched(
            params, list(modal_feats[:3]), mask, num_heads, use_pallas,
            tp_mesh, seq_mesh)
    else:
        refined = []
        for name, feat in zip(names, modal_feats):
            if feat is None:
                refined.append(None)
                continue
            f = feat + masked_attention_block(
                params[f"attn{name}"],
                layernorm(params[f"norm{name}"], feat, LN_EPS),
                mask, num_heads, use_pallas, tp_mesh, seq_mesh)
            f = f + masked_mlp(
                params[f"mlp{name}"],
                layernorm(params[f"norm{name}_"], f, LN_EPS), mask)
            refined.append(f)

    present = [f for f in refined if f is not None]
    ocfr_loss = None
    new_centers = ocfr_centers
    if training:
        cls_feats = [f[:, 0, :] if f is not None else None for f in refined]
        ocfr_loss, new_centers = ocfr_update_and_loss(
            ocfr_centers, cls_feats, labels, momentum=ocfr_momentum)

    x = jnp.concatenate(present, axis=1)
    x = x + masked_attention_block(params["attn1"],
                                   layernorm(params["norm1"], x, LN_EPS),
                                   mask, num_heads, use_pallas, tp_mesh,
                                   seq_mesh)
    moe_aux = None
    if "moe_mlp" in params:
        y_moe, moe_aux = moe_masked_mlp(
            params["moe_mlp"], layernorm(params["norm2"], x, LN_EPS), mask,
            moe_mesh=moe_mesh, moe_shards=moe_shards)
        x = x + y_moe
    else:
        x = x + masked_mlp(params["mlp"],
                           layernorm(params["norm2"], x, LN_EPS), mask)
    x = layernorm(params["out_norm"], x, LN_EPS)
    x = x * _tile_mask(mask, x.shape[1]).astype(dtype)
    return x, ocfr_loss, new_centers, moe_aux
