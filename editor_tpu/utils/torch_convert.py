"""Torch checkpoint import: timm/ImageNet ViT .pth and trained EDITOR .pth.

reference load paths: backbone ``load_param`` with pos-embed bilinear resize
and distilled-token handling (vit_pytorch.py:646-690), EDITOR ``load_param``
stripping 'module.' (make_model.py:144-148).

Weight orientation: torch Linear [out,in] → ours [in,out]; torch Conv OIHW →
ours HWIO; BN running stats land in the model *state* (not params).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k.replace("module.", ""): v.detach().numpy()
            for k, v in sd.items() if hasattr(v, "detach")}


def _bilinear_axis(x: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """Bilinear interpolation along one axis with torch F.interpolate
    align_corners=False (half-pixel) semantics, no antialiasing."""
    in_size = x.shape[axis]
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).reshape([-1 if i == axis else 1 for i in range(x.ndim)])
    return (np.take(x, lo, axis=axis) * (1 - frac)
            + np.take(x, hi, axis=axis) * frac)


def resize_pos_embed(posemb: np.ndarray, grid_hw: Tuple[int, int],
                     has_cls: bool = True) -> np.ndarray:
    """Bilinear-resize the grid part of a [1, 1+G, C] pos-embed to grid_hw
    (reference resize_pos_embed, vit_pytorch.py:674-690: torch F.interpolate
    bilinear, align_corners=False)."""
    tok, grid = (posemb[:, :1], posemb[0, 1:]) if has_cls else (None, posemb[0])
    gs_old = int(round(np.sqrt(grid.shape[0])))
    C = grid.shape[-1]
    grid = grid.reshape(gs_old, gs_old, C)
    h, w = grid_hw
    resized = _bilinear_axis(_bilinear_axis(grid, h, 0), w, 1)
    resized = resized.astype(posemb.dtype).reshape(1, h * w, C)
    return np.concatenate([tok, resized], axis=1) if tok is not None else resized


def _linear(sd, prefix: str, bias: bool = True) -> dict:
    p = {"w": sd[f"{prefix}.weight"].T}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix: str) -> dict:
    return {"w": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}


def convert_vit_from_torch(sd: Dict[str, np.ndarray], vit_cfg,
                           prefix: str = "") -> dict:
    """Build our ViT param tree from a torch state_dict (Trans layout,
    vit_pytorch.py:461-644). Handles pos-embed grid resize when shapes differ
    and ignores classifier 'head'/'dist' keys like the reference loader."""
    g = lambda k: sd[prefix + k]
    depth = vit_cfg.depth
    params: Dict[str, Any] = {
        "cls_token": g("cls_token"),
        "patch_embed": {"proj": {
            "w": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "b": g("patch_embed.proj.bias"),
        }},
        "norm": _ln(sd, prefix + "norm"),
    }
    pos = g("pos_embed")
    want = vit_cfg.num_patches + 1
    if pos.shape[1] != want:
        pos = resize_pos_embed(pos, (vit_cfg.num_y, vit_cfg.num_x))
    params["pos_embed"] = pos
    if prefix + "sie_embed" in sd:
        params["sie_embed"] = g("sie_embed")
    if prefix + "fc.weight" in sd:
        params["fc"] = _linear(sd, prefix + "fc")
    else:  # ImageNet checkpoints have no ReID fc head; keep zeros
        params["fc"] = {"w": np.zeros((vit_cfg.embed_dim, vit_cfg.num_fc_classes),
                                      np.float32),
                        "b": np.zeros((vit_cfg.num_fc_classes,), np.float32)}
    blocks = []
    for i in range(depth):
        bp = f"{prefix}blocks.{i}."
        blocks.append({
            "norm1": _ln(sd, bp + "norm1"),
            "attn": {"qkv": _linear(sd, bp + "attn.qkv"),
                     "proj": _linear(sd, bp + "attn.proj")},
            "norm2": _ln(sd, bp + "norm2"),
            "mlp": {"fc1": _linear(sd, bp + "mlp.fc1"),
                    "fc2": _linear(sd, bp + "mlp.fc2")},
        })
    params["blocks"] = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *blocks)
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_imagenet_vit(path: str, vit_cfg, params: dict) -> dict:
    """Initialize backbone from an ImageNet/timm ViT .pth, keeping our init
    for keys absent from the file (SIE embed, fc) — the reference's partial
    copy semantics (vit_pytorch.py:652-671)."""
    sd = load_torch_state_dict(path)
    sd = {k: v for k, v in sd.items()
          if not ("head" in k or "dist" in k)}
    if "pos_embed" in sd and "distilled" in path:
        pe = sd["pos_embed"]
        sd["pos_embed"] = np.concatenate([pe[:, :1], pe[:, 2:]], axis=1)
    new = dict(params)
    converted = convert_vit_from_torch({**_tree_to_sd(params), **sd}, vit_cfg)
    # keep our sie_embed if the checkpoint lacks one
    if "sie_embed" in params and "sie_embed" not in sd:
        converted["sie_embed"] = params["sie_embed"]
    new.update(converted)
    return new


def _tree_to_sd(vit_params: dict) -> Dict[str, np.ndarray]:
    """Render our ViT tree back to torch-layout names (fallback values for
    partial loads)."""
    sd: Dict[str, np.ndarray] = {
        "cls_token": np.asarray(vit_params["cls_token"]),
        "pos_embed": np.asarray(vit_params["pos_embed"]),
        "patch_embed.proj.weight":
            np.asarray(vit_params["patch_embed"]["proj"]["w"]).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": np.asarray(vit_params["patch_embed"]["proj"]["b"]),
        "norm.weight": np.asarray(vit_params["norm"]["w"]),
        "norm.bias": np.asarray(vit_params["norm"]["b"]),
        "fc.weight": np.asarray(vit_params["fc"]["w"]).T,
        "fc.bias": np.asarray(vit_params["fc"]["b"]),
    }
    if "sie_embed" in vit_params:
        sd["sie_embed"] = np.asarray(vit_params["sie_embed"])
    depth = vit_params["blocks"]["norm1"]["w"].shape[0]
    for i in range(depth):
        at = lambda tree: np.asarray(jax.tree_util.tree_map(lambda x: x[i], tree))
        b = vit_params["blocks"]
        sd[f"blocks.{i}.norm1.weight"] = np.asarray(b["norm1"]["w"][i])
        sd[f"blocks.{i}.norm1.bias"] = np.asarray(b["norm1"]["b"][i])
        sd[f"blocks.{i}.attn.qkv.weight"] = np.asarray(b["attn"]["qkv"]["w"][i]).T
        sd[f"blocks.{i}.attn.qkv.bias"] = np.asarray(b["attn"]["qkv"]["b"][i])
        sd[f"blocks.{i}.attn.proj.weight"] = np.asarray(b["attn"]["proj"]["w"][i]).T
        sd[f"blocks.{i}.attn.proj.bias"] = np.asarray(b["attn"]["proj"]["b"][i])
        sd[f"blocks.{i}.norm2.weight"] = np.asarray(b["norm2"]["w"][i])
        sd[f"blocks.{i}.norm2.bias"] = np.asarray(b["norm2"]["b"][i])
        sd[f"blocks.{i}.mlp.fc1.weight"] = np.asarray(b["mlp"]["fc1"]["w"][i]).T
        sd[f"blocks.{i}.mlp.fc1.bias"] = np.asarray(b["mlp"]["fc1"]["b"][i])
        sd[f"blocks.{i}.mlp.fc2.weight"] = np.asarray(b["mlp"]["fc2"]["w"][i]).T
        sd[f"blocks.{i}.mlp.fc2.bias"] = np.asarray(b["mlp"]["fc2"]["b"][i])
    return sd


def _bn(sd, prefix: str) -> Tuple[dict, dict]:
    return ({"w": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]})


def _masked_attn(sd, prefix: str) -> dict:
    return {"qkv": _linear(sd, prefix + ".qkv", bias=False),
            "proj": _linear(sd, prefix + ".proj", bias=False)}


def _masked_mlp(sd, prefix: str) -> dict:
    return {"fc1": _linear(sd, prefix + ".fc1", bias=False),
            "fc2": _linear(sd, prefix + ".fc2", bias=False)}


def convert_editor_from_torch(path: str, ecfg, params: dict,
                              state: dict) -> Tuple[dict, dict]:
    """Full trained-EDITOR import: returns (params, state) with all heads,
    fusion block, BN stats and OCFR centers loaded (EDITOR.load_param
    equivalent, make_model.py:144-148)."""
    sd = load_torch_state_dict(path)
    new_p = dict(params)
    new_p["BACKBONE"] = convert_vit_from_torch(sd, ecfg.vit, prefix="BACKBONE.base.")

    fb: Dict[str, Any] = {}
    for mod in ("R", "N", "T"):
        fb[f"norm{mod}"] = _ln(sd, f"FUSE_block.norm{mod}")
        fb[f"norm{mod}_"] = _ln(sd, f"FUSE_block.norm{mod}_")
        fb[f"attn{mod}"] = _masked_attn(sd, f"FUSE_block.attn{mod}")
        fb[f"mlp{mod}"] = _masked_mlp(sd, f"FUSE_block.mlp{mod}")
    fb["norm1"] = _ln(sd, "FUSE_block.norm1")
    fb["attn1"] = _masked_attn(sd, "FUSE_block.attn1")
    fb["norm2"] = _ln(sd, "FUSE_block.norm2")
    fb["mlp"] = _masked_mlp(sd, "FUSE_block.mlp")
    fb["out_norm"] = _ln(sd, "FUSE_block.out_norm")
    new_p["FUSE_block"] = jax.tree_util.tree_map(jnp.asarray, fb)

    for name in ("RGB_REDUCE", "NIR_REDUCE", "TIR_REDUCE"):
        new_p[name] = jax.tree_util.tree_map(jnp.asarray, _linear(sd, name))
    new_p["FUSE_HEAD"] = {"w": jnp.asarray(sd["FUSE_HEAD.weight"].T)}
    new_p["BACKBONE_HEAD"] = {"w": jnp.asarray(sd["BACKBONE_HEAD.weight"].T)}

    new_bn = dict(state["bn"])
    p_bn, s_bn = _bn(sd, "FUSE_BN")
    new_p["FUSE_BN"] = jax.tree_util.tree_map(jnp.asarray, p_bn)
    new_bn["FUSE_BN"] = jax.tree_util.tree_map(jnp.asarray, s_bn)
    p_bn, s_bn = _bn(sd, "BACKBONE_BN")
    new_p["BACKBONE_BN"] = jax.tree_util.tree_map(jnp.asarray, p_bn)
    new_bn["BACKBONE_BN"] = jax.tree_util.tree_map(jnp.asarray, s_bn)
    if ecfg.al and "AL_HEAD.weight" in sd:
        new_p["AL_HEAD"] = {"w": jnp.asarray(sd["AL_HEAD.weight"].T)}
        p_bn, s_bn = _bn(sd, "AL_BN")
        new_p["AL_BN"] = jax.tree_util.tree_map(jnp.asarray, p_bn)
        new_bn["AL_BN"] = jax.tree_util.tree_map(jnp.asarray, s_bn)

    new_state = dict(state, bn=new_bn)
    oc = dict(state["ocfr"])
    for ours, theirs in (("rgb", "RGB"), ("nir", "NIR"), ("tir", "TIR")):
        key = f"FUSE_block.memory_cls.{theirs}_centers"
        if key in sd:
            oc[ours] = jnp.asarray(sd[key])
    new_state["ocfr"] = oc
    return new_p, new_state
