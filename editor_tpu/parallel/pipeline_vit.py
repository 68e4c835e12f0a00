"""Pipeline-parallel EDITOR backbone: the REAL model through the pipeline.

The reference's ``Pipe`` wraps real ``nn.Sequential`` models
(reference: distributed/pipeline/sync/pipe.py:172) — this module is the
TPU-native equivalent for EDITOR: the ViT's depth-stacked transformer blocks
are partitioned into contiguous pipeline stages over a 'stage' mesh axis and
run through :func:`editor_tpu.parallel.pipeline.pipeline_apply`'s ppermute
skew schedule, while patchify/SIE (cheap, replicated) and the SFTS/fusion/
loss tail run outside the pipeline on every stage replica.

What crosses stage boundaries is the pair
  (tokens [b, 1+P, C], rollout-product [b, H, 1+P, 1+P] fp32):
the attention-rollout chain P = A_L @ … @ A_1 that SFTS needs
(reference: modeling/fusion_part/SFTS.py:145-153) is carried FORWARD as the
running left-product — each stage folds its layers' attention maps in with
``prod = A_l @ prod`` (the reference Part_Attention recurrence,
SFTS.py:148-152) — because the reverse vector chain used by the scan path
(ops/rollout.py) would have to flow backward through the stages. Matmul
associativity makes the two reductions equal; grad/loss parity vs the
single-device step is asserted in tests/test_parallel.py.

Stochastic depth (DropPath): the flagship presets train with
MODEL.DROP_PATH = 0.1 (reference vit_pytorch.py:72,511), so the pipeline
supports it EXACTLY — the per-(layer, sample) uniform draws are precomputed
outside the schedule with the same PRNG-split sequence ``vit_apply`` uses
(split(rng, depth) → per-layer split-3 → uniform) and threaded through the
stage schedule as an extra activation leaf (microbatch-sliced with the
tokens); each stage indexes its global layer's draws by
``axis_index('stage') * per + i``. Given the same seed the pipelined
backbone reproduces the scan backbone's drop-path pattern draw-for-draw
(tests/test_parallel.py::test_pipeline_drop_path_exact_parity).
Attention/proj dropout (never enabled in shipped configs) stays
unsupported under the pipeline. BN stats, OCFR centers and batch-hard
mining see the FULL batch (the pipeline's microbatching is internal tiling
of the backbone only), so semantics match the non-pipelined step exactly.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from editor_tpu.models import vit as vit_mod
from editor_tpu.models.layers import layernorm
from editor_tpu.models.vit import ViTConfig
from editor_tpu.parallel.pipeline import pipeline_apply

Array = jax.Array


def _full_probs(probs) -> Array:
    """Per-layer attention map [B, H, N, N] from either the XLA path's full
    probs or the fused TPU kernel's split (patch-cols, cls-col) form."""
    if isinstance(probs, tuple):
        pp, pc = probs
        return jnp.concatenate([pc[..., None], pp], axis=-1)
    return probs


def make_stage_fn(cfg: ViTConfig, training: bool,
                  drop_path: bool = False, per: int = 1,
                  axis_name: str = "stage",
                  tp_axis: Optional[str] = None, tp: int = 1) -> Callable:
    """Stage fn for pipeline_apply: scans this stage's block slice, folding
    each layer's attention map into the carried rollout product.

    ``drop_path=True``: the activation carries a third leaf ``u`` of
    per-sample uniform draws [mb, depth, 2]; each scanned layer applies the
    scan backbone's exact DropPath algebra (models/vit._drop_path_scan:
    mask = floor(keep + u), residual * mask / keep) at its GLOBAL layer
    index ``axis_index(axis_name) * per + i`` with the linearly increasing
    rate schedule (reference vit_pytorch.py:511).

    ``tp_axis``/``tp``: Megatron tensor parallelism INSIDE the ppermute
    schedule (PP x TP). Each model-shard holds the column slice of
    qkv/fc1 (in the shard-major qkv layout of parallel/tp.py, so the slice
    is a self-contained [q|k|v] block for H/tp local heads) and the row
    slice of proj/fc2; the two row-parallel matmuls end in an explicit
    ``psum(tp_axis)`` (inside shard_map there is no GSPMD to derive it).
    The rollout product stays sharded over ``tp_axis`` on its heads dim —
    heads are independent in the chain, so each shard folds only its own
    heads' maps.
    """
    dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
    Hl = cfg.num_heads // tp

    def _residual(t: Array, branch: Array, keep, u_col) -> Array:
        if not drop_path:
            return t + branch
        mask = jnp.floor(keep + u_col)[:, None, None]
        return t + (branch.astype(jnp.float32) / keep
                    * mask).astype(t.dtype)

    def _block(bp: dict, t: Array) -> Tuple[Array, Array]:
        """(mid, probs) for the attention sub-block; TP runs the Megatron
        split with explicit psums, non-TP reuses the vit module path."""
        ln1 = layernorm(bp["norm1"], t, cfg.ln_eps)
        if tp_axis is None:
            mid, probs = vit_mod._attention(
                bp["attn"], ln1, cfg, training, rng=None, need_probs=True)
            return mid, probs
        from editor_tpu.models.layers import linear
        from editor_tpu.ops.fused_attention import attention_from_qkv_probs
        qkv = linear(bp["attn"]["qkv"], ln1)       # [mb, N, 3C/tp] local
        out_l, probs = attention_from_qkv_probs(qkv, Hl, cfg.scale)
        pw = bp["attn"]["proj"]["w"].astype(out_l.dtype)
        mid = lax.psum(out_l @ pw, tp_axis) \
            + bp["attn"]["proj"]["b"].astype(out_l.dtype)
        return mid, probs

    def _mlp(bp: dict, t: Array) -> Array:
        ln2 = layernorm(bp["norm2"], t, cfg.ln_eps)
        if tp_axis is None:
            return vit_mod._mlp(bp["mlp"], ln2, training, cfg.drop_rate,
                                None)
        from editor_tpu.models.layers import gelu, linear
        h = gelu(linear(bp["mlp"]["fc1"], ln2))    # [mb, N, H/tp] local
        w2 = bp["mlp"]["fc2"]["w"].astype(h.dtype)
        return lax.psum(h @ w2, tp_axis) \
            + bp["mlp"]["fc2"]["b"].astype(h.dtype)

    def stage_fn(blocks_stacked, act):
        if drop_path:
            tokens, prod, u = act
        else:
            tokens, prod = act
        stage = lax.axis_index(axis_name)

        def body(carry, inp):
            bp, i = inp
            t, p = carry
            if drop_path:
                l = stage * per + i
                keep = 1.0 - jnp.take(dpr, l)
                ul = lax.dynamic_index_in_dim(u, l, axis=1, keepdims=False)
            else:
                keep = ul = None
            mid, a = _block(bp, t)
            t = _residual(t, mid, keep, ul[:, 0] if drop_path else None)
            t = _residual(t, _mlp(bp, t), keep,
                          ul[:, 1] if drop_path else None)
            # Part_Attention recurrence: last_map = att @ last_map
            # (reference SFTS.py:148-152); fp32, gradient-free (the product
            # only feeds a discrete top-k — stop-grad at the consumer).
            p = jnp.einsum("bhnm,bhmk->bhnk",
                           lax.stop_gradient(_full_probs(a))
                           .astype(jnp.float32), p,
                           preferred_element_type=jnp.float32)
            return (t, p), None

        xs = (blocks_stacked, jnp.arange(per))
        (tokens, prod), _ = lax.scan(body, (tokens, prod), xs)
        return (tokens, prod, u) if drop_path else (tokens, prod)

    return stage_fn


def _tp_stage_param_spec(stage_params, axis_name: str, model_axis: str):
    """PartitionSpec pytree for the [S, per, ...] stacked block params with
    Megatron splits over ``model_axis``: qkv/fc1 column-parallel (output dim
    sharded, biases too), proj/fc2 row-parallel (input dim sharded) — the
    same split map as parallel/tp.editor_tp_shardings, shifted by the
    leading (stage, per) dims."""
    from jax.sharding import PartitionSpec as P

    def spec(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        joined = "/".join(keys)
        col = ("attn/qkv" in joined) or ("mlp/fc1" in joined)
        row = ("attn/proj" in joined) or ("mlp/fc2" in joined)
        if col and keys[-1] == "w":      # [S, per, in, out] — split out
            return P(axis_name, None, None, model_axis)
        if col and keys[-1] == "b":      # [S, per, out]
            return P(axis_name, None, model_axis)
        if row and keys[-1] == "w":      # [S, per, in, out] — split in
            return P(axis_name, None, model_axis, None)
        return P(axis_name)

    return jax.tree_util.tree_map_with_path(spec, stage_params)


def make_pipeline_backbone(mesh: Mesh, num_microbatches: int,
                           axis_name: str = "stage",
                           remat: bool = True,
                           model_axis: str = "model") -> Callable:
    """Build a drop-in ``backbone`` for :func:`editor_apply` that runs the
    shared ViT through the pipeline (same signature contract as
    ``models.editor._shared_backbone``).

    The stacked block params are reshaped [depth, ...] → [S, depth/S, ...]
    INSIDE the traced step, so the TrainState layout (and therefore the
    optimizer, checkpoints and converters) is unchanged — gradients flow
    back through the reshape to the canonical [depth, ...] leaves.

    PP x TP: if ``mesh`` has a ``model_axis`` of size > 1, each stage's
    qkv/proj/fc1/fc2 are Megatron-split over it inside the ppermute
    schedule (see :func:`make_stage_fn`); the qkv weights/biases MUST be in
    the shard-major TP layout (``parallel.tp.permute_qkv_params``), same
    contract as the non-pipelined TP path (models/vit._tp_attention).
    Composes with a 'data' axis into the full ('data','stage','model') 3D
    mesh (parity: tests/test_parallel.py::test_editor_pipeline_tp_*).
    """
    S = mesh.shape[axis_name]
    tp = mesh.shape.get(model_axis, 1)

    def backbone(params, cfg, mods: List[Array], cam: Optional[Array],
                 view: Optional[Array], training: bool,
                 rng: Optional[Array]):
        vcfg = cfg.vit
        if vcfg.depth % S:
            raise ValueError(
                f"depth {vcfg.depth} not divisible by {axis_name}={S}")
        if tp > 1 and vcfg.num_heads % tp:
            raise ValueError(
                f"num_heads {vcfg.num_heads} not divisible by "
                f"{model_axis}={tp}")
        if training and (vcfg.drop_rate > 0 or vcfg.attn_drop_rate > 0):
            # dropout (never enabled in shipped configs) is not threaded
            # through the stage schedule — refuse rather than silently
            # train without the configured regularization. DropPath IS
            # supported (exact parity with the scan backbone).
            raise NotImplementedError(
                "pipeline backbone does not support dropout "
                "(drop_rate/attn_drop_rate > 0): set MODEL.DROP_OUT / "
                "MODEL.ATT_DROP_RATE to 0, or train without pipeline "
                "parallelism")
        per = vcfg.depth // S
        M = len(mods)
        B = mods[0].shape[0]
        big = jnp.concatenate(mods, axis=0)
        cam_b = jnp.concatenate([cam] * M) if cam is not None else None
        view_b = jnp.concatenate([view] * M) if view is not None else None
        bb = params["BACKBONE"]
        tokens = vit_mod.vit_embed(
            bb, big, vcfg, camera_id=cam_b, view_id=view_b,
            training=training, drop_rng=None)
        stage_params = jax.tree_util.tree_map(
            lambda x: x.reshape((S, per) + x.shape[1:]), bb["blocks"])
        B3, N, _ = tokens.shape
        eye = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32),
                               (B3, vcfg.num_heads, N, N))
        use_dp = (training and vcfg.drop_path_rate > 0 and rng is not None)
        if use_dp:
            # the exact per-(layer, sample) uniform draws vit_apply would
            # make: split(rng, depth), then r1, r2, _ = split-3 per layer
            # (models/vit.vit_apply body); threaded as an activation leaf
            # so microbatch slicing stays aligned with the tokens
            layer_rngs = jax.random.split(rng, vcfg.depth)

            def draws(lr):
                r1, r2, _ = jax.random.split(lr, 3)
                shape = (B3, 1, 1)
                return jnp.stack(
                    [jax.random.uniform(r1, shape, jnp.float32)[:, 0, 0],
                     jax.random.uniform(r2, shape, jnp.float32)[:, 0, 0]],
                    axis=-1)

            u = jnp.transpose(jax.vmap(draws)(layer_rngs),
                              (1, 0, 2))  # [B3, depth, 2]
            act = (tokens, eye, u)
        else:
            act = (tokens, eye)
        bs = "data" if "data" in mesh.axis_names else None
        if tp > 1:
            from jax.sharding import PartitionSpec as P
            # tokens replicated over model; the rollout product rides the
            # model axis on its heads dim (heads are chain-independent)
            act_spec = (P(bs, None, None), P(bs, model_axis, None, None))
            if use_dp:
                act_spec = act_spec + (P(bs, None, None),)
            stage_spec = _tp_stage_param_spec(stage_params, axis_name,
                                              model_axis)
        else:
            act_spec = stage_spec = None
        out = pipeline_apply(
            make_stage_fn(vcfg, training, drop_path=use_dp, per=per,
                          axis_name=axis_name,
                          tp_axis=model_axis if tp > 1 else None, tp=tp),
            stage_params, act,
            mesh, num_microbatches, axis_name=axis_name, remat=remat,
            stage_param_spec=stage_spec, batch_axis=bs,
            activation_spec=act_spec)
        tokens, prod = out[0], out[1]
        tokens = layernorm(bb["norm"], tokens, vcfg.ln_eps)
        # rollout cls-row over patch keys, same contract as vit_apply's
        # rollout_cls (== Part_Attention's last_map[:, :, 0, 1:])
        roll = lax.stop_gradient(prod[:, :, 0, 1:])
        toks = [tokens[i * B:(i + 1) * B] for i in range(M)]
        rolls = [roll[i * B:(i + 1) * B] for i in range(M)]
        return toks, rolls

    return backbone
