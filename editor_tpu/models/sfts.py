"""SFTS — Spatial-Frequency Token Selection.

TPU-native equivalent of reference ``SFTS`` / ``Part_Attention``
(modeling/fusion_part/SFTS.py:140-230). The attention-rollout chain product is
already carried inside the backbone scan (editor_tpu/models/vit.py), so this
module receives the cls-row of the product directly ([B, heads, P]), does a
per-head top-k → OR mask, ORs masks across modalities and with the frequency
mask, and applies the union mask multiplicatively (static shapes, no gathers —
the reference design is already TPU-friendly here).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from editor_tpu.models.frequency import topk_bool_mask

Array = jax.Array


def part_attention_mask(rollout_cls: Array, keep_per_head: int) -> Array:
    """[B, H, P] rollout cls-row → [B, P] bool mask: per-head top-k OR-ed over
    heads (reference Part_Attention: SFTS.py:145-164; k = N*ratio = HEAD_KEEP,
    make_model.py:92-93)."""
    B, H, P = rollout_cls.shape
    flat = rollout_cls.reshape(B * H, P)
    per_head = topk_bool_mask(flat, keep_per_head).reshape(B, H, P)
    return jnp.any(per_head, axis=1)


def sfts_select(
    feats: List[Array],
    rollouts: List[Array],
    mask_fre: Array,
    keep_per_head: int,
    training: bool,
) -> Tuple[List[Array], Array, Optional[Array]]:
    """Select object-centric tokens across modalities.

    Args:
      feats: per-modality token tensors [B, 1+P, C] (cls first).
      rollouts: per-modality [B, heads, P] rollout cls-rows.
      mask_fre: [B, P] bool frequency mask.

    Returns:
      (masked_feats, index, bcc_loss): masked_feats keep the cls token and
      multiply patch tokens by the union mask (reference: SFTS.py:185-214);
      index is [B, P, 1] float; bcc_loss (training only) is the pairwise MSE of
      background tokens across modalities (reference: SFTS.py:215-225).
    """
    union = mask_fre
    for r in rollouts:
        union = union | part_attention_mask(r, keep_per_head)
    dtype = feats[0].dtype
    index = union[:, :, None].astype(dtype)  # [B, P, 1]

    masked = []
    for f in feats:
        parts = f[:, 1:, :] * index
        masked.append(jnp.concatenate([f[:, :1, :], parts], axis=1))

    bcc = None
    if training:
        bg_index = 1.0 - index
        bgs = [f[:, 1:, :].astype(jnp.float32) * bg_index.astype(jnp.float32)
               for f in feats]
        bcc = jnp.asarray(0.0, jnp.float32)
        for i in range(len(bgs)):
            for j in range(i + 1, len(bgs)):
                bcc = bcc + jnp.mean(jnp.square(bgs[i] - bgs[j]))
    return masked, index, bcc
