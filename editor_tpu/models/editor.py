"""EDITOR model assembly — TPU-native re-design of the reference EDITOR
(modeling/make_model.py:85-374).

Pure-functional: ``editor_init`` builds (params, state) pytrees,
``editor_apply`` is jit/pjit-friendly with explicit carried state (OCFR
class-center memory + the BN-neck running stats — the only stateful pieces,
SURVEY.md §7 "hard parts"). The shared ViT backbone is invoked once per
modality with shared weights (reference: make_model.py:158-160); the three
calls are batched into ONE backbone pass over a 3B "modality-major" batch so
the MXU sees a single large matmul stream instead of three small ones.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from editor_tpu.models import vit as vit_mod
from editor_tpu.models.frequency import frequency_token_select
from editor_tpu.models.fusion import (blockmask_apply, blockmask_init,
                                      blockmask_moe_init)
from editor_tpu.models.layers import batchnorm1d, batchnorm1d_init, linear, linear_init
from editor_tpu.models.ocfr import ocfr_init
from editor_tpu.models.sfts import sfts_select
from editor_tpu.models.vit import ViTConfig

Array = jax.Array

def _vit_tiny_test_config(**kw):
    """Tiny backbone for CPU tests / dry runs (not in the reference zoo)."""
    return ViTConfig(embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                     qkv_bias=True, **kw)


VIT_FACTORY = {
    # reference factory __factory_T_type (make_model.py:363-368)
    "vit_base_patch16_224": vit_mod.vit_base_config,
    "deit_base_patch16_224": vit_mod.vit_base_config,
    "vit_small_patch16_224": vit_mod.vit_small_config,
    "deit_small_patch16_224": vit_mod.deit_small_config,
    "vit_tiny_test": _vit_tiny_test_config,
}


@dataclasses.dataclass(frozen=True)
class EditorConfig:
    num_classes: int
    vit: ViTConfig
    head_keep: int = 2          # MODEL.HEAD_KEEP
    frequency_keep: int = 10    # MODEL.FREQUENCY_KEEP
    al: bool = False            # MODEL.AL supervision setting
    ocfr_momentum: float = 0.8  # make_model.py:97-98
    num_modalities: int = 3
    use_pallas: bool = True
    compact_tail: bool = True   # TPU.COMPACT_TAIL (exact; see _compact_selected)
    # >0: the fusion block's joint MLP becomes a GShard MoE with this many
    # experts (models/fusion.blockmask_moe_init) — the expert-parallel
    # EDITOR variant (beyond-reference; SURVEY §2.2 names EP/MoE absent)
    moe_experts: int = 0        # MODEL.MOE_EXPERTS
    moe_aux_weight: float = 0.01  # Switch-style load-balance loss weight

    @property
    def dim(self) -> int:
        return self.vit.embed_dim

    @property
    def num_patches(self) -> int:
        return self.vit.num_patches


def editor_config_from(cfg: Any, num_classes: int, camera_num: int) -> EditorConfig:
    """Build an EditorConfig from the framework Config (make_model equivalent,
    reference: modeling/make_model.py:34-98,371-374)."""
    camera = camera_num if cfg.MODEL.SIE_CAMERA else 0
    factory = VIT_FACTORY[cfg.MODEL.TRANSFORMER_TYPE]
    vit_cfg = factory(
        img_size=tuple(cfg.INPUT.SIZE_TRAIN),
        stride_size=tuple(cfg.MODEL.STRIDE_SIZE),
        camera=camera,
        view=0,
        sie_xishu=cfg.MODEL.SIE_COE,
        drop_path_rate=cfg.MODEL.DROP_PATH,
        drop_rate=cfg.MODEL.DROP_OUT,
        attn_drop_rate=cfg.MODEL.ATT_DROP_RATE,
        remat=bool(getattr(cfg.TPU, "REMAT", False)),
        remat_policy=str(getattr(cfg.TPU, "REMAT_POLICY", "block")),
        remat_skip_last=int(getattr(cfg.TPU, "REMAT_SKIP_LAST", 0)),
    )
    return EditorConfig(
        num_classes=num_classes,
        vit=vit_cfg,
        head_keep=int(cfg.MODEL.HEAD_KEEP),
        frequency_keep=int(cfg.MODEL.FREQUENCY_KEEP),
        al=bool(cfg.MODEL.AL),
        compact_tail=bool(getattr(cfg.TPU, "COMPACT_TAIL", True)),
        moe_experts=int(getattr(cfg.MODEL, "MOE_EXPERTS", 0)),
        moe_aux_weight=float(getattr(cfg.MODEL, "MOE_AUX_WEIGHT", 0.01)),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def editor_init(key: Array, cfg: EditorConfig) -> Tuple[dict, dict]:
    d = cfg.dim
    M = cfg.num_modalities  # fused-head width (3 for all reference configs —
    # 2-modal datasets dup NI as TI at collate; true-2-modal sizes M*d)
    ks = jax.random.split(key, 8)
    params: Dict[str, Any] = {
        "BACKBONE": vit_mod.vit_init(ks[0], cfg.vit),
        "FUSE_block": (
            blockmask_moe_init(ks[1], dim=d, mlp_ratio=4.0,
                               num_experts=cfg.moe_experts)
            if cfg.moe_experts > 0
            else blockmask_init(ks[1], dim=d, mlp_ratio=4.0)),
        # in-modality reduction Linear(2d->d), kaiming fan_out init
        # (reference: make_model.py:106-111)
        "RGB_REDUCE": linear_init(ks[2], 2 * d, d, bias=True, init="kaiming_out"),
        "NIR_REDUCE": linear_init(ks[3], 2 * d, d, bias=True, init="kaiming_out"),
        "TIR_REDUCE": linear_init(ks[4], 2 * d, d, bias=True, init="kaiming_out"),
        "FUSE_HEAD": linear_init(ks[5], M * d, cfg.num_classes, bias=False,
                                 init="classifier"),
        "BACKBONE_HEAD": linear_init(ks[6], d, cfg.num_classes, bias=False,
                                     init="classifier"),
    }
    bn_state: Dict[str, dict] = {}
    params["FUSE_BN"], bn_state["FUSE_BN"] = batchnorm1d_init(M * d)
    params["BACKBONE_BN"], bn_state["BACKBONE_BN"] = batchnorm1d_init(d)
    if cfg.al:
        params["AL_HEAD"] = linear_init(ks[7], M * d, cfg.num_classes,
                                        bias=False, init="classifier")
        params["AL_BN"], bn_state["AL_BN"] = batchnorm1d_init(M * d)
    state = {"ocfr": ocfr_init(cfg.num_classes, d), "bn": bn_state}
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EditorTrainOutput:
    """Training outputs following the reference's tuple protocol
    (make_model.py:208-213; consumed by engine/processor.py:83-92)."""
    score: Array          # fused classifier logits
    cls4t: Array          # fused 3d-dim embedding (triplet feature)
    pairs: List[Tuple[Array, Array]]  # [(score_i, feat_i), ...] incl. fused
    aux_loss: Array       # loss_bcc + loss_ocfr


def _shared_backbone(params, cfg: EditorConfig, mods: List[Array],
                     cam: Optional[Array], view: Optional[Array],
                     training: bool, rng: Optional[Array], tp_mesh=None):
    """One backbone pass over the modality-concatenated batch (shared weights).

    The reference runs three sequential forward passes (make_model.py:158-160);
    concatenating along batch is numerically identical (no cross-sample ops in
    the backbone) and 3x better MXU utilization per dispatch.
    """
    M = len(mods)
    B = mods[0].shape[0]
    big = jnp.concatenate(mods, axis=0)
    cam_b = jnp.concatenate([cam] * M, axis=0) if cam is not None else None
    view_b = jnp.concatenate([view] * M, axis=0) if view is not None else None
    tokens, rollout = vit_mod.vit_apply(
        params["BACKBONE"], big, cfg.vit, camera_id=cam_b, view_id=view_b,
        training=training, rng=rng, tp_mesh=tp_mesh)
    toks = [tokens[i * B:(i + 1) * B] for i in range(M)]
    rolls = [rollout[i * B:(i + 1) * B] for i in range(M)]
    return toks, rolls


def _tail_keep_count(cfg: EditorConfig, num_mods: int) -> int:
    """Static upper bound on SFTS-selected patches: each modality's rollout
    contributes ≤ heads·HEAD_KEEP tokens (per-head top-k OR, sfts_select)
    and the frequency mask ≤ FREQUENCY_KEEP (frequency_token_select) —
    e.g. 3·12·2 + 10 = 82 of 128 for the flagship presets. Padded so the
    per-modality compact token count (1 + K) is sublane-aligned."""
    P = cfg.num_patches
    bound = min(P, cfg.frequency_keep
                + num_mods * cfg.vit.num_heads * cfg.head_keep)
    return min(P, ((bound + 8) // 8) * 8 - 1)


def _compact_selected(feats: List[Array], index: Array,
                      keep: int) -> Tuple[List[Array], Array]:
    """Gather each modality down to [B, 1+keep, C]: cls + the ≤keep selected
    patches (slots beyond the true selection are filled with unselected
    patches whose mask stays 0).

    Exact, not approximate: unselected patch tokens are exactly zero after
    the SFTS mask-multiply, all fusion Linears are bias-free (so their
    qkv/fc1 values stay zero), their attention logits are filled with
    -65504 (exp → exactly 0 in f32 and f64), and the downstream pool sums
    patch rows and divides by the selected *count* — dropping zero rows
    changes nothing (reference semantics: make_model.py:186-203,
    vit_pytorch.py:240-258)."""
    P = index.shape[1]
    # mask values are 0/1 → top_k puts selected patches first (ties keep
    # ascending index order, like torch.topk); attention is permutation-
    # equivariant and the pool permutation-invariant, so order is free.
    _, sel = jax.lax.top_k(index[:, :, 0], keep)          # [B, keep]
    # one-hot batched matmul instead of a gather: XLA lowers dynamic gathers
    # of token rows to a scalar loop on TPU (measured 315 ms at B=128!);
    # the [B, keep, P] @ [B, P, C] selection is ~3 GFLOP of MXU work instead
    onehot = jax.nn.one_hot(sel, P, dtype=feats[0].dtype)  # [B, keep, P]
    cindex = jnp.einsum("bkp,bpo->bko", onehot.astype(index.dtype), index)
    out = []
    for f in feats:
        g = jnp.einsum("bkp,bpc->bkc", onehot, f[:, 1:, :])
        out.append(jnp.concatenate([f[:, :1, :], g], axis=1))
    return out, cindex


def _masked_mean_pool(fused: Array, index: Array, seg_len: int,
                      num_mods: int) -> List[Tuple[Array, Array]]:
    """Split fused tokens back per modality; masked mean over patch tokens
    dividing by the *selected token count* (reference: make_model.py:186-203 —
    ``num = (row_sum != 0).sum``; post re-mask, nonzero rows == selected rows)."""
    outs = []
    num = jnp.sum(index, axis=1)  # [B, 1] float count of selected patches
    for i in range(num_mods):
        seg = fused[:, i * seg_len:(i + 1) * seg_len]
        cls = seg[:, 0, :]
        patches = seg[:, 1:, :]
        pooled = jnp.sum(patches, axis=1) / num.astype(patches.dtype)
        outs.append((cls, pooled))
    return outs


def editor_apply(
    params: dict,
    state: dict,
    cfg: EditorConfig,
    images: Dict[str, Array],
    labels: Optional[Array] = None,
    cam_ids: Optional[Array] = None,
    view_ids: Optional[Array] = None,
    training: bool = False,
    rng: Optional[Array] = None,
    tp_mesh=None,
    backbone=None,
    seq_mesh=None,
    moe_mesh=None,
    moe_shards: int = 1,
):
    """Forward pass.

    ``tp_mesh``: a ('data','model') Mesh with model>1 — the backbone's
    fused-attention/rollout kernels then run per model-shard via shard_map
    (params must be in the TP layout, parallel/tp.py permute_qkv_params).

    ``backbone``: optional replacement for the shared-ViT pass with the
    signature (params, cfg, mods, cam, view, training, rng) -> (toks, rolls)
    — e.g. the pipeline-parallel backbone
    (parallel/pipeline_vit.make_pipeline_backbone), the TPU analogue of
    wrapping the real model in the reference Pipe
    (distributed/pipeline/sync/pipe.py:172).

    ``seq_mesh``: a mesh with a 'seq' axis — the HMA fusion block's masked
    attentions then run sequence-sharded via the masked ring schedule
    (parallel/ring.ring_masked_attention). The compact-tail token counts
    are 8-aligned (``_tail_keep_count``), so any seq axis dividing 8 works
    on the flagship presets.

    ``moe_mesh`` / ``moe_shards``: when ``cfg.moe_experts > 0`` the fusion
    block's joint MLP is a GShard MoE (models/fusion.moe_masked_mlp) —
    ``moe_mesh`` shards experts+tokens over its 'expert' axis; without a
    mesh, ``moe_shards`` emulates that sharding exactly on one device (the
    parity oracle). The load-balance aux loss is added to ``aux_loss``
    weighted by ``cfg.moe_aux_weight``.

    images: {'RGB','NI','TI'} NHWC float tensors ('TI' optional for 2-modal
    datasets — reference forward_two_modalities, make_model.py:260-360; the
    reference's eval path there calls a nonexistent PERSON_TOKEN_SELECT
    (make_model.py:330, latent bug) — we run SFTS as intended instead).

    Returns (EditorTrainOutput, new_state) in training, (cls4t, state) in eval.
    """
    mods = [images["RGB"], images["NI"]]
    has_tir = "TI" in images and images["TI"] is not None
    if has_tir:
        mods.append(images["TI"])
    M = len(mods)

    mask_fre = frequency_token_select(
        mods, keep=cfg.frequency_keep, stride=cfg.vit.stride_size[0],
        window=cfg.vit.patch_size)

    if backbone is not None:
        toks, rolls = backbone(params, cfg, mods, cam_ids, view_ids,
                               training, rng)
    else:
        toks, rolls = _shared_backbone(params, cfg, mods, cam_ids, view_ids,
                                       training, rng, tp_mesh)

    cls4tri = [t[:, 0, :] for t in toks]  # raw backbone cls tokens

    new_bn = dict(state["bn"])
    head_pairs: List[Tuple[Array, Array]] = []
    if training:
        if cfg.al:
            # AL supervision (reference: make_model.py:165-167)
            ori = jnp.concatenate(cls4tri, axis=-1)
            al_bn, new_bn["AL_BN"] = batchnorm1d(
                params["AL_BN"], state["bn"]["AL_BN"], ori, training)
            ori_score = linear(params["AL_HEAD"], al_bn)
            head_pairs.append((ori_score, ori))
        else:
            # shared BN+head applied per modality SEQUENTIALLY — running stats
            # mix modalities in this exact order (make_model.py:169-171)
            bn_state = state["bn"]["BACKBONE_BN"]
            for cls in cls4tri:
                bned, bn_state = batchnorm1d(
                    params["BACKBONE_BN"], bn_state, cls, training)
                head_pairs.append((linear(params["BACKBONE_HEAD"], bned), cls))
            new_bn["BACKBONE_BN"] = bn_state

    masked_feats, index, bcc = sfts_select(
        toks, rolls, mask_fre, cfg.head_keep, training)

    seg_len = cfg.num_patches + 1
    if cfg.compact_tail:
        keep = _tail_keep_count(cfg, M)
        if keep < cfg.num_patches:
            masked_feats, index = _compact_selected(masked_feats, index, keep)
            seg_len = keep + 1

    modal_feats: List[Optional[Array]] = list(masked_feats)
    while len(modal_feats) < 3:
        modal_feats.append(None)

    fused, ocfr_loss, new_ocfr, moe_aux = blockmask_apply(
        params["FUSE_block"], modal_feats, index, state["ocfr"], labels,
        num_heads=12, ocfr_momentum=cfg.ocfr_momentum, training=training,
        use_pallas=cfg.use_pallas, tp_mesh=tp_mesh, seq_mesh=seq_mesh,
        moe_mesh=moe_mesh, moe_shards=moe_shards)

    pooled = _masked_mean_pool(fused, index, seg_len, M)

    reduce_names = ["RGB_REDUCE", "NIR_REDUCE", "TIR_REDUCE"][:M]
    reduced = [
        linear(params[name], jnp.concatenate([cls, pool], axis=-1))
        for name, (cls, pool) in zip(reduce_names, pooled)
    ]
    cls4t = jnp.concatenate(reduced, axis=-1)  # [B, M*dim]

    if not training:
        return cls4t, state

    fuse_bn, new_bn["FUSE_BN"] = batchnorm1d(
        params["FUSE_BN"], state["bn"]["FUSE_BN"], cls4t, training)
    score = linear(params["FUSE_HEAD"], fuse_bn)

    pairs = [(score, cls4t)] + head_pairs
    aux = (bcc if bcc is not None else 0.0)
    if ocfr_loss is not None:
        aux = aux + ocfr_loss
    if moe_aux is not None:
        aux = aux + cfg.moe_aux_weight * moe_aux
    out = EditorTrainOutput(score=score, cls4t=cls4t, pairs=pairs,
                            aux_loss=jnp.asarray(aux, jnp.float32))
    new_state = {"ocfr": new_ocfr, "bn": new_bn}
    return out, new_state


def count_params(params: dict) -> int:
    """Trainable parameter count (reference params.py:65-68; OCFR centers and
    BN running stats live in `state`, not `params`, matching requires_grad)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
