"""Fused masked attention for the HMA fusion block.

The hot op behind ``AttentionMask`` (reference: vit_pytorch.py:240-258): given
per-token boolean masks, attention logits are filled with -65504 where
``mask_q & mask_k`` is false, softmaxed, and rows re-multiplied by the query
mask. The reference materializes the [B,H,N,N] mask outer product and calls
``masked_fill`` (separate cuDNN kernels); here a single Pallas kernel keeps
the whole computation in VMEM.

Layout design (same discipline as ops/fused_attention.py):
  * The kernel consumes the RAW QKV projection output ``[B, N, 3C]`` and
    produces ``[B, N, C]`` — no [B,H,N,D] head transposes ever touch HBM.
    Heads are peeled off with static 64-lane slices in VMEM.
  * EDITOR's fusion sequences are 1 or 3 tiles of (1 cls + 128 patch)
    tokens (N = 129 or 387). A [*, N]-minor tensor pads its VMEM lanes to
    256/512; the kernel instead computes per-tile patch-key logits
    [*, N, 128] (lane-exact) plus one cls-key column per tile — identical
    math, no padded softmax work.
  * Dots take bf16 operands with fp32 accumulation (casting operands to
    fp32 first would force slow multi-pass fp32 MXU emulation).

An XLA fallback (identical numerics) covers CPU tests; the TPU backward is
its own Pallas kernel (``_qkv_masked_bwd_kernel``, recompute + softmax VJP
in VMEM) with the XLA recompute as the off-TPU ``jax.custom_vjp`` path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# XLA reference paths
# ---------------------------------------------------------------------------

def _xla_masked_attention(q: Array, k: Array, v: Array, mask: Array,
                          scale: float, mask_fill: float) -> Array:
    """Reference-exact masked attention. q/k/v: [B,H,N,D], mask: [B,N].

    Softmax/accumulation dtype is fp32 for bf16/fp32 inputs and fp64 for
    fp64 inputs (the golden suite runs the whole model at f64 — a hard
    fp32 here would silently cap its precision)."""
    cd = jnp.promote_types(q.dtype, jnp.float32)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=cd) * scale
    m = mask.astype(cd)
    pair = m[:, None, :, None] * m[:, None, None, :]  # [B,1,N,N]
    logits = jnp.where(pair == 0, mask_fill, logits.astype(cd))
    attn = jax.nn.softmax(logits, axis=-1)
    attn = attn * m[:, None, :, None]  # re-mask query rows
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(q.dtype), v,
                     preferred_element_type=cd)
    return out.astype(q.dtype)


def _xla_masked_from_qkv(qkv: Array, mask: Array, num_heads: int,
                         scale: float, mask_fill: float) -> Array:
    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    qkv5 = qkv.reshape(B, N, 3, H, D)
    q = qkv5[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv5[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv5[:, :, 2].transpose(0, 2, 1, 3)
    out = _xla_masked_attention(q, k, v, mask, scale, mask_fill)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C)


# ---------------------------------------------------------------------------
# Pallas kernel (tiled split softmax)
# ---------------------------------------------------------------------------

def _qkv_masked_full_kernel(qkv_ref, m_ref, o_ref, *, scale, H, D, fill):
    """Generic (tile-free) variant for compacted fusion sequences: full
    [g, N, N] logits with the mask outer-product bias. Used when the token
    count is not the lane-exact 1+128-per-tile layout (see
    ``editor_apply``'s SFTS compaction: N = 1+K or M·(1+K), K ≈ 87)."""
    blk = qkv_ref[...]                            # [g, N, 3C]
    mq = m_ref[...][:, 0, :].astype(jnp.float32)  # [g, N]
    C = H * D
    bias = jnp.where(mq[:, :, None] * mq[:, None, :] == 0.0, fill, 0.0)
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        l = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + bias
        # row-max-stabilized: filled entries exp to exactly 0 whenever the
        # row has any valid key; fully-masked rows get uniform probs that
        # the mq re-mask zeroes. denom >= 1 (max element exps to 1).
        # Lazy normalization: the row scale multiplies the [*, N, D]
        # output, not the [*, N, N] probs.
        e = jnp.exp(l - jnp.max(l, axis=-1)[:, :, None])
        rw = mq / jnp.sum(e, axis=-1)
        o_ref[:, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
            * rw[:, :, None]).astype(o_ref.dtype)


def _qkv_masked_full_bwd_kernel(qkv_ref, m_ref, g_ref, dqkv_ref, *, scale,
                                H, D, fill):
    """Tile-free VJP twin of :func:`_qkv_masked_full_kernel` (same recompute
    + softmax-VJP scheme as ``_qkv_masked_bwd_kernel``)."""
    blk = qkv_ref[...]
    mq = m_ref[...][:, 0, :].astype(jnp.float32)
    go = g_ref[...]
    C = H * D
    dt = dqkv_ref.dtype
    bias = jnp.where(mq[:, :, None] * mq[:, None, :] == 0.0, fill, 0.0)
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        gh = go[:, :, h * D:(h + 1) * D]
        l = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + bias
        e = jnp.exp(l - jnp.max(l, axis=-1)[:, :, None])  # stabilized (fwd note)
        inv = 1.0 / jnp.sum(e, axis=-1)  # denom >= 1
        attn = e * (mq * inv)[:, :, None]          # re-masked rows
        dat = jax.lax.dot_general(
            gh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [g, N, N]
        r0 = jnp.sum(dat * e, axis=-1) * inv       # Σ_j dattn_j p_j (pure rows)
        # (eager attn here: the lazy-norm variant measured SLOWER for the
        # backward — 3.25 -> 3.70 ms at N=88 — while winning in the forward)
        dl = (attn * (dat - r0[:, :, None]) * scale).astype(blk.dtype)
        ab = attn.astype(blk.dtype)
        dv = jax.lax.dot_general(
            ab, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq = jax.lax.dot_general(
            dl, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            dl, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, h * D:(h + 1) * D] = dq.astype(dt)
        dqkv_ref[:, :, C + h * D:C + (h + 1) * D] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + h * D:2 * C + (h + 1) * D] = dv.astype(dt)


def _full_group(N: int, B: int, bwd: bool = False) -> int:
    # VMEM budget: [g,N,3C] bf16 block + two [g,N,N] f32 live tensors; the
    # backward holds attn/dat/dl simultaneously — g=8 overruns the 16MB
    # scoped limit by ~0.9MB at N=88, so it runs one notch smaller
    if bwd:
        g = 4 if N <= 128 else 2  # N=264: g=2 3.01 ms vs g=1 3.17 (sweep log)
    else:
        g = 8 if N <= 128 else (2 if N <= 320 else 1)
    while B % g:
        g //= 2
    return max(g, 1)


def _pallas_masked_full(qkv: Array, mask: Array, num_heads: int,
                        scale: float, mask_fill: float) -> Array:
    import jax.experimental.pallas as pl

    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    g = _full_group(N, B)
    kernel = functools.partial(_qkv_masked_full_kernel, scale=scale, H=H,
                               D=D, fill=mask_fill)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, 1, N), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
    )(qkv, mask.astype(qkv.dtype)[:, None, :])


def _pallas_masked_full_bwd(qkv: Array, mask: Array, g_out: Array,
                            num_heads: int, scale: float,
                            mask_fill: float) -> Array:
    import jax.experimental.pallas as pl

    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    g = _full_group(N, B, bwd=True)
    kernel = functools.partial(_qkv_masked_full_bwd_kernel, scale=scale,
                               H=H, D=D, fill=mask_fill)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, 1, N), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, N, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
    )(qkv, mask.astype(qkv.dtype)[:, None, :], g_out)


def _qkv_masked_kernel(qkv_ref, m_ref, o_ref, *, scale, H, D, fill,
                       tile, n_tiles):
    blk = qkv_ref[...]                          # [g, N, 3C]
    mq = m_ref[...][:, 0, :].astype(jnp.float32)  # [g, N] query-row mask
    C = H * D
    # mask algebra hoisted OUT of the head loop (identical for all heads):
    # additive bias = fill where the pair mask is 0, else 0
    mps = [mq[:, t * tile + 1:(t + 1) * tile] for t in range(n_tiles)]
    mcs = [mq[:, t * tile:t * tile + 1] for t in range(n_tiles)]
    pair_bias = [jnp.where(mq[:, :, None] * mps[t][:, None, :] == 0.0,
                           fill, 0.0) for t in range(n_tiles)]
    cls_bias = [jnp.where(mq * mcs[t] == 0.0, fill, 0.0)
                for t in range(n_tiles)]
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        lps, lcs = [], []
        for t in range(n_tiles):
            kp = k[:, t * tile + 1:(t + 1) * tile, :]   # [g, P, D]
            lp = jax.lax.dot_general(
                q, kp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # [g, N, P]
            lps.append(lp + pair_bias[t])
            kc = k[:, t * tile:t * tile + 1, :].astype(jnp.float32)
            lc = jnp.sum(q.astype(jnp.float32) * kc, axis=-1) * scale  # [g,N]
            lcs.append(lc + cls_bias[t])
        # row-max-stabilized softmax across all tiles (see fused_attention
        # _head_split_softmax_av): filled logits still exp to exactly 0
        # whenever the row has a valid key, overflow is impossible, and the
        # denominator is >= 1 (the max element exps to 1) — fully-masked
        # query rows get uniform probs that ``rw = mq/denom`` re-masks to 0.
        m = lcs[0]
        for lc in lcs[1:]:
            m = jnp.maximum(m, lc)
        for lp in lps:
            m = jnp.maximum(m, jnp.max(lp, axis=-1))       # [g, N]
        eps = [jnp.exp(lp - m[:, :, None]) for lp in lps]
        ecs = [jnp.exp(lc - m) for lc in lcs]
        denom = ecs[0] + sum(ecs[1:])
        for ep in eps:
            denom = denom + jnp.sum(ep, axis=-1)
        # fold the post-softmax query-row re-mask into the normalization;
        # lazy normalization: the [*, N, P] probs never get scaled — the
        # accumulated [*, N, D] output does
        rw = mq / denom                                   # [g, N]
        acc = None
        for t in range(n_tiles):
            vp = v[:, t * tile + 1:(t + 1) * tile, :]
            part = jax.lax.dot_general(
                eps[t].astype(v.dtype), vp, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            part = part + ecs[t][:, :, None] * (
                v[:, t * tile:t * tile + 1, :].astype(jnp.float32))
            acc = part if acc is None else acc + part
        o_ref[:, :, h * D:(h + 1) * D] = (
            acc * rw[:, :, None]).astype(o_ref.dtype)


def _pallas_masked_from_qkv(qkv: Array, mask: Array, num_heads: int,
                            scale: float, mask_fill: float, tile: int,
                            group: int = 0) -> Array:
    import jax.experimental.pallas as pl

    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    n_tiles = N // tile
    # scoped VMEM is 16MB on v5e: the [g, N, 3C] block + fp32 logits pieces
    # cap the rows per grid step (N=129 fits g=4 — g=8 is ~5% faster
    # standalone but exceeds scoped vmem by 0.9MB inside the full eval
    # graph; N=387 needs g=1)
    g = group or (4 if N <= 192 else 1)
    while B % g:
        g //= 2
    kernel = functools.partial(
        _qkv_masked_kernel, scale=scale, H=H, D=D, fill=mask_fill,
        tile=tile, n_tiles=n_tiles)
    # mask rides as [B, 1, N] so the block's last-two dims are full-extent
    # (Mosaic's divisible-by-(8,128) rule exempts full dims, not g)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, 1, N), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
    )(qkv, mask.astype(qkv.dtype)[:, None, :])


def _qkv_masked_bwd_kernel(qkv_ref, m_ref, g_ref, dqkv_ref, *, scale, H, D,
                           fill, tile, n_tiles):
    """VJP of the masked split softmax·V in the qkv layout: recompute the
    forward probabilities in VMEM, then the standard softmax VJP. Grads at
    filled logit positions vanish automatically (their probs underflow to
    exactly 0 in fp32), matching the XLA ``where``-based backward."""
    blk = qkv_ref[...]
    mq = m_ref[...][:, 0, :].astype(jnp.float32)
    go = g_ref[...]
    C = H * D
    dt = dqkv_ref.dtype
    mps = [mq[:, t * tile + 1:(t + 1) * tile] for t in range(n_tiles)]
    mcs = [mq[:, t * tile:t * tile + 1] for t in range(n_tiles)]
    # mask bias hoisted out of the head loop (same trick as forward)
    pair_bias = [jnp.where(mq[:, :, None] * mps[t][:, None, :] == 0.0,
                           fill, 0.0) for t in range(n_tiles)]
    cls_bias = [jnp.where(mq * mcs[t] == 0.0, fill, 0.0)
                for t in range(n_tiles)]
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        gh = go[:, :, h * D:(h + 1) * D]
        # --- recompute split softmax (same math as forward) ---
        lps, lcs = [], []
        for t in range(n_tiles):
            kp = k[:, t * tile + 1:(t + 1) * tile, :]
            lp = jax.lax.dot_general(
                q, kp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            lps.append(lp + pair_bias[t])
            kc = k[:, t * tile:t * tile + 1, :].astype(jnp.float32)
            lc = jnp.sum(q.astype(jnp.float32) * kc, axis=-1) * scale
            lcs.append(lc + cls_bias[t])
        # row-max-stabilized softmax, same form as the forward kernel
        m = lcs[0]
        for lc in lcs[1:]:
            m = jnp.maximum(m, lc)
        for lp in lps:
            m = jnp.maximum(m, jnp.max(lp, axis=-1))
        eps = [jnp.exp(lp - m[:, :, None]) for lp in lps]
        ecs = [jnp.exp(lc - m) for lc in lcs]
        denom = ecs[0] + sum(ecs[1:])
        for ep in eps:
            denom = denom + jnp.sum(ep, axis=-1)
        inv = 1.0 / denom  # pure softmax normalizer; denom >= 1
        rw = mq * inv              # row re-mask folded in (= attn rows)
        # --- dattn pieces + pure-softmax row correction r0 ---
        ghf = gh.astype(jnp.float32)
        r0 = jnp.zeros_like(inv)
        datps, datcs = [], []
        for t in range(n_tiles):
            vp = v[:, t * tile + 1:(t + 1) * tile, :]
            dat = jax.lax.dot_general(
                gh, vp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [g, N, P]
            datc = jnp.sum(ghf * v[:, t * tile:t * tile + 1, :].astype(
                jnp.float32), axis=-1)                     # [g, N]
            datps.append(dat)
            datcs.append(datc)
            r0 = r0 + jnp.sum(dat * eps[t], axis=-1) + datc * ecs[t]
        r0 = r0 * inv              # Σ_j dattn_j p_j
        # --- dl = attn ∘ (dattn - r0); dq/dk/dv (eager attn: the lazy-norm
        # variant measured no faster for the tiled backward) ---
        dq = None
        for t in range(n_tiles):
            attn_p = eps[t] * rw[:, :, None]
            attn_c = ecs[t] * rw
            ab = attn_p.astype(blk.dtype)
            dvp = jax.lax.dot_general(
                ab, gh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [g, P, D]
            dvc = jnp.sum(attn_c[:, :, None] * ghf, axis=1)  # [g, D]
            dlp = (attn_p * (datps[t] - r0[:, :, None]) * scale).astype(
                blk.dtype)
            dlc = attn_c * (datcs[t] - r0) * scale         # [g, N] fp32
            kp = k[:, t * tile + 1:(t + 1) * tile, :]
            part = jax.lax.dot_general(
                dlp, kp, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            part = part + dlc[:, :, None] * k[:, t * tile:t * tile + 1,
                                              :].astype(jnp.float32)
            dq = part if dq is None else dq + part
            dkp = jax.lax.dot_general(
                dlp, q, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [g, P, D]
            dkc = jnp.sum(dlc[:, :, None] * q.astype(jnp.float32), axis=1)
            r0_, r1_ = t * tile, t * tile + 1
            r2_ = (t + 1) * tile
            dqkv_ref[:, r0_:r1_, C + h * D:C + (h + 1) * D] = (
                dkc[:, None, :].astype(dt))
            dqkv_ref[:, r1_:r2_, C + h * D:C + (h + 1) * D] = dkp.astype(dt)
            dqkv_ref[:, r0_:r1_, 2 * C + h * D:2 * C + (h + 1) * D] = (
                dvc[:, None, :].astype(dt))
            dqkv_ref[:, r1_:r2_, 2 * C + h * D:2 * C + (h + 1) * D] = (
                dvp.astype(dt))
        dqkv_ref[:, :, h * D:(h + 1) * D] = dq.astype(dt)


def _pallas_masked_qkv_bwd(qkv: Array, mask: Array, g_out: Array,
                           num_heads: int, scale: float, mask_fill: float,
                           tile: int, group: int = 0) -> Array:
    import jax.experimental.pallas as pl

    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    n_tiles = N // tile
    # g=4 measured 6.18 vs 7.36 ms at g=2 (3x128 modal batch)
    g = group or (4 if N <= 192 else 1)
    while B % g:
        g //= 2
    kernel = functools.partial(
        _qkv_masked_bwd_kernel, scale=scale, H=H, D=D, fill=mask_fill,
        tile=tile, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, 1, N), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, N, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
    )(qkv, mask.astype(qkv.dtype)[:, None, :], g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _masked_qkv_tpu(qkv, mask, num_heads, scale, mask_fill, tile):
    """``tile == 0`` selects the tile-free full-logits kernels (compacted
    sequences); otherwise the lane-exact split kernels."""
    if tile == 0:
        return _pallas_masked_full(qkv, mask, num_heads, scale, mask_fill)
    return _pallas_masked_from_qkv(qkv, mask, num_heads, scale, mask_fill,
                                   tile)


def _fwd(qkv, mask, num_heads, scale, mask_fill, tile):
    out = _masked_qkv_tpu(qkv, mask, num_heads, scale, mask_fill, tile)
    return out, (qkv, mask)


def _bwd(num_heads, scale, mask_fill, tile, res, g):
    qkv, mask = res
    if jax.default_backend() == "tpu":
        if tile == 0:
            return (_pallas_masked_full_bwd(qkv, mask, g, num_heads, scale,
                                            mask_fill), None)
        return (_pallas_masked_qkv_bwd(qkv, mask, g, num_heads, scale,
                                       mask_fill, tile), None)
    # recompute-based backward through the XLA path (identical math)
    _, vjp = jax.vjp(
        lambda t: _xla_masked_from_qkv(t, mask, num_heads, scale, mask_fill),
        qkv)
    (dqkv,) = vjp(g)
    return dqkv, None


_masked_qkv_tpu.defvjp(_fwd, _bwd)


def masked_attention_from_qkv(qkv: Array, mask: Array, num_heads: int,
                              scale: float, mask_fill: float = -65504.0,
                              tile: int = 129,
                              use_pallas: bool = True,
                              tp_mesh=None,
                              seq_mesh=None) -> Array:
    """Masked attention from the raw QKV projection.

    qkv: [B, N, 3C] (the natural ``x @ W_qkv`` output); mask: [B, N]
    (1 = keep); N must be ``n_tiles * tile`` with ``tile = 1 + P`` tokens
    per modality tile. Returns [B, N, C].

    ``tp_mesh``: under a model-sharded mesh the fusion weights are
    replicated, so the kernel runs per data-shard via shard_map (explicitly
    replicated over 'model') instead of leaving GSPMD to partition a
    pallas_call it cannot reason about.

    ``seq_mesh``: a mesh with a 'seq' axis — the token axis is then
    sequence-sharded and attention runs as the masked RING schedule
    (parallel/ring.ring_masked_attention: ppermute k/v/key-mask rotation
    with the -65504 pair bias folded into the online softmax). N must be
    divisible by the axis size; the compact-tail token counts are 8-aligned
    by construction (models/editor._tail_keep_count) so any seq axis
    dividing 8 works on the flagship model.
    """
    if seq_mesh is not None and seq_mesh.shape.get("seq", 1) > 1:
        from editor_tpu.parallel.ring import ring_masked_attention

        B, N, C3 = qkv.shape
        C = C3 // 3
        H, D = num_heads, C // num_heads
        qkv5 = qkv.reshape(B, N, 3, H, D)
        q = qkv5[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv5[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv5[:, :, 2].transpose(0, 2, 1, 3)
        out = ring_masked_attention(q, k, v, mask, seq_mesh,
                                    scale=scale, mask_fill=mask_fill)
        return out.transpose(0, 2, 1, 3).reshape(B, N, C)
    if tp_mesh is not None and tp_mesh.shape.get("model", 1) > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bs = "data" if "data" in tp_mesh.axis_names else None
        return shard_map(
            lambda t, m: masked_attention_from_qkv(
                t, m, num_heads, scale, mask_fill, tile, use_pallas),
            mesh=tp_mesh,
            in_specs=(P(bs, None, None), P(bs, None)),
            out_specs=P(bs, None, None),
            check_vma=False)(qkv, mask)
    B, N, C3 = qkv.shape
    on_tpu = jax.default_backend() == "tpu"
    tileable = tile and N % tile == 0 and (tile - 1) % 128 == 0
    if use_pallas and on_tpu:
        if tileable:
            return _masked_qkv_tpu(qkv, mask, num_heads, scale, mask_fill,
                                   tile)
        if N <= 512:  # compacted sequences: full-logits kernel
            return _masked_qkv_tpu(qkv, mask, num_heads, scale, mask_fill, 0)
    return _xla_masked_from_qkv(qkv, mask, num_heads, scale, mask_fill)


def masked_attention(q: Array, k: Array, v: Array, mask: Array,
                     scale: float, mask_fill: float = -65504.0,
                     use_pallas: bool = True) -> Array:
    """Masked attention on pre-split heads. q/k/v: [B, H, N, D]; mask:
    [B, N] (1=keep). Kept as the layout-agnostic API (XLA graph); the hot
    path uses :func:`masked_attention_from_qkv`.
    """
    del use_pallas
    return _xla_masked_attention(q, k, v, mask, scale, mask_fill)
