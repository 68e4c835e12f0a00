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

Stochastic depth (DropPath) and dropout are not threaded through the
pipeline schedule (per-layer PRNG folding would make the stage fn
layer-index-dependent); the shipped flagship configs train with
attn/proj dropout 0 and the parity tests set drop_path_rate=0. BN stats,
OCFR centers and batch-hard mining see the FULL batch (the pipeline's
microbatching is internal tiling of the backbone only), so semantics match
the non-pipelined step exactly.
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


def _block_fwd(bp: dict, tokens: Array, cfg: ViTConfig,
               training: bool) -> Tuple[Array, Array]:
    """One pre-LN block (the scan body of vit_apply, minus stochastic
    depth — see module docstring) returning (tokens, attention map)."""
    mid, probs = vit_mod._attention(
        bp["attn"], layernorm(bp["norm1"], tokens, cfg.ln_eps), cfg,
        training, rng=None, need_probs=True)
    tokens = tokens + mid
    tokens = tokens + vit_mod._mlp(
        bp["mlp"], layernorm(bp["norm2"], tokens, cfg.ln_eps), training,
        cfg.drop_rate, None)
    return tokens, _full_probs(probs)


def make_stage_fn(cfg: ViTConfig, training: bool) -> Callable:
    """Stage fn for pipeline_apply: scans this stage's block slice, folding
    each layer's attention map into the carried rollout product."""

    def stage_fn(blocks_stacked, act):
        tokens, prod = act

        def body(carry, bp):
            t, p = carry
            t, a = _block_fwd(bp, t, cfg, training)
            # Part_Attention recurrence: last_map = att @ last_map
            # (reference SFTS.py:148-152); fp32, gradient-free (the product
            # only feeds a discrete top-k — stop-grad at the consumer).
            p = jnp.einsum("bhnm,bhmk->bhnk",
                           lax.stop_gradient(a).astype(jnp.float32), p,
                           preferred_element_type=jnp.float32)
            return (t, p), None

        (tokens, prod), _ = lax.scan(body, (tokens, prod), blocks_stacked)
        return tokens, prod

    return stage_fn


def make_pipeline_backbone(mesh: Mesh, num_microbatches: int,
                           axis_name: str = "stage",
                           remat: bool = True) -> Callable:
    """Build a drop-in ``backbone`` for :func:`editor_apply` that runs the
    shared ViT through the pipeline (same signature contract as
    ``models.editor._shared_backbone``, minus tp_mesh).

    The stacked block params are reshaped [depth, ...] → [S, depth/S, ...]
    INSIDE the traced step, so the TrainState layout (and therefore the
    optimizer, checkpoints and converters) is unchanged — gradients flow
    back through the reshape to the canonical [depth, ...] leaves.
    """
    S = mesh.shape[axis_name]

    def backbone(params, cfg, mods: List[Array], cam: Optional[Array],
                 view: Optional[Array], training: bool,
                 rng: Optional[Array]):
        vcfg = cfg.vit
        if vcfg.depth % S:
            raise ValueError(
                f"depth {vcfg.depth} not divisible by {axis_name}={S}")
        if training and (vcfg.drop_path_rate > 0 or vcfg.drop_rate > 0
                         or vcfg.attn_drop_rate > 0):
            # the stage schedule does not thread per-layer PRNGs (see
            # module docstring) — refuse rather than silently train
            # without the configured regularization
            raise NotImplementedError(
                "pipeline backbone does not support stochastic depth / "
                "dropout (drop_path_rate/drop_rate/attn_drop_rate > 0): "
                "set MODEL.DROP_PATH / MODEL.DROP_OUT / MODEL.ATT_DROP_RATE "
                "to 0, or train without pipeline parallelism")
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
        tokens, prod = pipeline_apply(
            make_stage_fn(vcfg, training), stage_params, (tokens, eye),
            mesh, num_microbatches, axis_name=axis_name, remat=remat,
            batch_axis="data" if "data" in mesh.axis_names else None)
        tokens = layernorm(bb["norm"], tokens, vcfg.ln_eps)
        # rollout cls-row over patch keys, same contract as vit_apply's
        # rollout_cls (== Part_Attention's last_map[:, :, 0, 1:])
        roll = lax.stop_gradient(prod[:, :, 0, 1:])
        toks = [tokens[i * B:(i + 1) * B] for i in range(M)]
        rolls = [roll[i * B:(i + 1) * B] for i in range(M)]
        return toks, rolls

    return backbone
