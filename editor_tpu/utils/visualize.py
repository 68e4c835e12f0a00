"""Qualitative visualization dumps: token masks, attention rollout, DWT.

reference: the commented/optional figure paths of the reference —
mask overlays (modeling/fusion_part/SFTS.py:65-137), per-head attention
maps (modeling/backbones/vit_pytorch.py:575-617), and the frequency
reconstruction (modeling/fusion_part/Frequency.py:20-39). Artifacts are
plain PNGs written with PIL (no matplotlib dependency): per-image overlay
grids usable for the paper-style qualitative figures.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

Array = "np.ndarray"


def _to_uint8(img: np.ndarray) -> np.ndarray:
    """[H,W,3] float (any range) -> uint8 via min-max normalize."""
    img = np.asarray(img, np.float32)
    lo, hi = float(img.min()), float(img.max())
    if hi - lo < 1e-12:
        return np.zeros(img.shape, np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def _heat_rgb(h: np.ndarray) -> np.ndarray:
    """[H,W] in [0,1] -> red-yellow heat RGB."""
    h = np.clip(np.asarray(h, np.float32), 0, 1)
    r = np.clip(h * 2, 0, 1)
    g = np.clip(h * 2 - 1, 0, 1)
    return np.stack([r, g, np.zeros_like(h)], -1)


def _overlay(img: np.ndarray, heat: np.ndarray, alpha: float = 0.5):
    base = _to_uint8(img).astype(np.float32) / 255.0
    return _to_uint8((1 - alpha) * base + alpha * _heat_rgb(heat))


def _upsample_grid(grid: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """[gy,gx] token grid -> [H,W] nearest-neighbor heat map."""
    gy, gx = grid.shape
    H, W = hw
    return grid[np.minimum(np.arange(H) * gy // H, gy - 1)][
        :, np.minimum(np.arange(W) * gx // W, gx - 1)]


def _save(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def dump_token_mask(out_dir: str, images: Dict[str, np.ndarray],
                    index: np.ndarray, grid_hw: Tuple[int, int],
                    prefix: str = "mask") -> None:
    """Selected-token mask overlays (reference SFTS.py:65-137): one PNG per
    modality per sample. images: {'RGB'/'NI'/'TI': [B,H,W,3]}; index:
    [B, P] bool/float union mask over the patch grid ``grid_hw``."""
    index = np.asarray(index, np.float32)
    for mod, imgs in images.items():
        imgs = np.asarray(imgs)
        for b in range(imgs.shape[0]):
            heat = _upsample_grid(index[b].reshape(grid_hw), imgs.shape[1:3])
            _save(os.path.join(out_dir, f"{prefix}_{mod}_{b}.png"),
                  _overlay(imgs[b], heat))


def dump_rollout(out_dir: str, images: Dict[str, np.ndarray],
                 rollouts: Dict[str, np.ndarray], grid_hw: Tuple[int, int],
                 prefix: str = "rollout") -> None:
    """Attention-rollout heat overlays (reference vit_pytorch.py:575-617),
    head-averaged. rollouts: {mod: [B, heads, P]}."""
    for mod, roll in rollouts.items():
        imgs = np.asarray(images[mod])
        roll = np.asarray(roll, np.float32).mean(axis=1)  # [B, P]
        roll = roll / np.maximum(roll.max(axis=1, keepdims=True), 1e-12)
        for b in range(imgs.shape[0]):
            heat = _upsample_grid(roll[b].reshape(grid_hw), imgs.shape[1:3])
            _save(os.path.join(out_dir, f"{prefix}_{mod}_{b}.png"),
                  _overlay(imgs[b], heat))


def dump_frequency(out_dir: str, recon: np.ndarray,
                   prefix: str = "frequency") -> None:
    """Band-averaged DWT reconstruction images (reference
    Frequency.py:20-39). recon: [B,H,W,C]."""
    recon = np.asarray(recon)
    for b in range(recon.shape[0]):
        _save(os.path.join(out_dir, f"{prefix}_{b}.png"), _to_uint8(recon[b]))


def dump_eval_visualizations(out_dir: str, params, state, ecfg,
                             images: Dict[str, np.ndarray],
                             cam_ids: Optional[np.ndarray] = None) -> list:
    """Run the EDITOR eval machinery on a small batch and write every
    qualitative artifact: per-modality rollout heat maps, the SFTS union
    token mask, and the frequency reconstruction. Returns written paths."""
    import jax.numpy as jnp

    from editor_tpu.models import vit as vit_mod
    from editor_tpu.models.frequency import frequency_token_select
    from editor_tpu.models.sfts import sfts_select

    mods = [m for m in ("RGB", "NI", "TI") if m in images]
    arrs = {m: jnp.asarray(images[m]) for m in mods}
    cams = jnp.asarray(cam_ids) if cam_ids is not None else None
    grid_hw = (ecfg.vit.num_y, ecfg.vit.num_x)

    toks, rolls = {}, {}
    for m in mods:
        t, r = vit_mod.vit_apply(params["BACKBONE"], arrs[m], ecfg.vit,
                                 camera_id=cams, training=False)
        toks[m], rolls[m] = t, r
    mask_fre = frequency_token_select(
        [arrs[m] for m in mods], keep=ecfg.frequency_keep,
        stride=ecfg.vit.stride_size[0], window=ecfg.vit.patch_size)
    _, index, _ = sfts_select([toks[m] for m in mods],
                              [rolls[m] for m in mods], mask_fre,
                              ecfg.head_keep, training=False)

    np_images = {m: np.asarray(arrs[m], np.float32) for m in mods}
    dump_rollout(out_dir, np_images,
                 {m: np.asarray(rolls[m]) for m in mods}, grid_hw)
    dump_token_mask(out_dir, np_images, np.asarray(index[..., 0]), grid_hw)
    avg = sum(np.asarray(arrs[m], np.float32) for m in mods) / len(mods)
    dump_frequency(out_dir, avg)
    return sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir))
