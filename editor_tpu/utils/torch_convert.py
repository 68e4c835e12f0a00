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
    if "moe_mlp" in params.get("FUSE_block", {}):
        raise ValueError(
            "cannot load a reference torch checkpoint into a MoE-fusion "
            "EDITOR (MODEL.MOE_EXPERTS > 0): the reference has no MoE "
            "fusion MLP — set MOE_EXPERTS 0 to import this checkpoint")
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


def export_editor_to_torch(params: dict, state: dict, ecfg,
                           path: Optional[str] = None) -> Dict[str, Any]:
    """Inverse of :func:`convert_editor_from_torch`: render our EDITOR
    params+state as a reference-layout torch state_dict (the exact key names
    of ``EDITOR`` in reference make_model.py:85-374) so a trained editor_tpu
    checkpoint can be loaded back into the reference torch code
    (``model.load_state_dict`` / ``load_param``, make_model.py:144-148).

    Returns the state_dict (torch tensors); also ``torch.save``\\ s it when
    ``path`` is given. BN running stats and OCFR centers come from ``state``;
    ``num_batches_tracked`` is emitted as 0 for torch strict-load
    compatibility."""
    import torch

    if "moe_mlp" in params.get("FUSE_block", {}):
        raise ValueError(
            "cannot export a MoE-fusion EDITOR (MODEL.MOE_EXPERTS > 0) to "
            "the reference torch layout: the reference has no MoE — "
            "retrain with MOE_EXPERTS 0 or keep Orbax checkpoints")

    a = lambda x: np.asarray(x)
    sd: Dict[str, np.ndarray] = {}
    for k, v in _tree_to_sd(params["BACKBONE"]).items():
        sd[f"BACKBONE.base.{k}"] = v

    fb = params["FUSE_block"]

    def put_ln(name, p):
        sd[f"FUSE_block.{name}.weight"] = a(p["w"])
        sd[f"FUSE_block.{name}.bias"] = a(p["b"])

    def put_nobias(name, p):
        sd[f"FUSE_block.{name}.weight"] = a(p["w"]).T

    for mod in ("R", "N", "T"):
        put_ln(f"norm{mod}", fb[f"norm{mod}"])
        put_ln(f"norm{mod}_", fb[f"norm{mod}_"])
        put_nobias(f"attn{mod}.qkv", fb[f"attn{mod}"]["qkv"])
        put_nobias(f"attn{mod}.proj", fb[f"attn{mod}"]["proj"])
        put_nobias(f"mlp{mod}.fc1", fb[f"mlp{mod}"]["fc1"])
        put_nobias(f"mlp{mod}.fc2", fb[f"mlp{mod}"]["fc2"])
    put_ln("norm1", fb["norm1"])
    put_nobias("attn1.qkv", fb["attn1"]["qkv"])
    put_nobias("attn1.proj", fb["attn1"]["proj"])
    put_ln("norm2", fb["norm2"])
    put_nobias("mlp.fc1", fb["mlp"]["fc1"])
    put_nobias("mlp.fc2", fb["mlp"]["fc2"])
    put_ln("out_norm", fb["out_norm"])

    for name in ("RGB_REDUCE", "NIR_REDUCE", "TIR_REDUCE"):
        sd[f"{name}.weight"] = a(params[name]["w"]).T
        if "b" in params[name]:
            sd[f"{name}.bias"] = a(params[name]["b"])
    sd["FUSE_HEAD.weight"] = a(params["FUSE_HEAD"]["w"]).T
    sd["BACKBONE_HEAD.weight"] = a(params["BACKBONE_HEAD"]["w"]).T

    def put_bn(name):
        sd[f"{name}.weight"] = a(params[name]["w"])
        sd[f"{name}.bias"] = a(params[name]["b"])
        sd[f"{name}.running_mean"] = a(state["bn"][name]["mean"])
        sd[f"{name}.running_var"] = a(state["bn"][name]["var"])
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    put_bn("FUSE_BN")
    put_bn("BACKBONE_BN")
    if getattr(ecfg, "al", False) and "AL_HEAD" in params:
        sd["AL_HEAD.weight"] = a(params["AL_HEAD"]["w"]).T
        put_bn("AL_BN")

    for ours, theirs in (("rgb", "RGB"), ("nir", "NIR"), ("tir", "TIR")):
        if ours in state.get("ocfr", {}):
            sd[f"FUSE_block.memory_cls.{theirs}_centers"] = a(
                state["ocfr"][ours])

    # FREQ_INDEX haar filter buffers (constant taps, pytorch_wavelets
    # DWTForward/Inverse registration — reference dwt/transform2d.py:22-56):
    # f32(1/sqrt(2)) upcast like the torch module, so strict-load roundtrips
    dt = np.asarray(params["BACKBONE"]["cls_token"]).dtype
    s = np.float32(1.0 / np.sqrt(2.0)).astype(dt)
    lo, hi = np.array([s, s], dt), np.array([s, -s], dt)
    for mod, (g0, g1) in (("DWT", ("h0", "h1")), ("IDWT", ("g0", "g1"))):
        sd[f"FREQ_INDEX.{mod}.{g0}_col"] = lo.reshape(1, 1, 2, 1)
        sd[f"FREQ_INDEX.{mod}.{g0}_row"] = lo.reshape(1, 1, 1, 2)
        sd[f"FREQ_INDEX.{mod}.{g1}_col"] = hi.reshape(1, 1, 2, 1)
        sd[f"FREQ_INDEX.{mod}.{g1}_row"] = hi.reshape(1, 1, 1, 2)

    # copy: jax-backed numpy views are read-only, torch wants writable
    out = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
           for k, v in sd.items()}
    if path is not None:
        torch.save(out, path)
    return out
