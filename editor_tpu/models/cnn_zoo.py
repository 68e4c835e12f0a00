"""CNN backbone zoo — single-modal ReID reference backbones.

reference: modeling/backbones/basic_cnn_params/ (22 architectures, factory
``build_model`` at basic_cnn_params/__init__.py:87-96) — used by the
reference only for parameter counting (params.py:72-79, commented), i.e. a
capability statement. Here the zoo entries are *runnable* functional JAX
models (init + apply, NHWC), starting with the three most-used families:
ResNet-50 (+IBN-a), MobileNetV2, ShuffleNetV2. The factory mirrors the
reference name → builder registry; remaining architectures extend the same
pattern.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def conv_init(key, kh, kw, cin, cout, groups: int = 1):
    fan_in = kh * kw * cin // groups
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (kh, kw, cin // groups, cout)) * std


def conv(p, x, stride=1, groups: int = 1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def bn_init(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def bn(p, x, eps=1e-5):
    # inference-mode BN (zoo models are used for feature extraction/counting)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - p["mean"]) * inv * p["w"] + p["b"]
    return y.astype(x.dtype)


def instance_norm_init(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}


def instance_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["w"] + p["b"]


def linear_init(key, cin, cout):
    std = (1.0 / cin) ** 0.5
    return {"w": jax.random.uniform(key, (cin, cout), minval=-std, maxval=std),
            "b": jnp.zeros((cout,))}


# ---------------------------------------------------------------------------
# ResNet-50 (+ IBN-a)
# ---------------------------------------------------------------------------

def _bottleneck_init(key, cin, planes, stride, ibn: bool):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": conv_init(ks[0], 1, 1, cin, planes),
        "conv2": conv_init(ks[1], 3, 3, planes, planes),
        "bn2": bn_init(planes),
        "conv3": conv_init(ks[2], 1, 1, planes, planes * 4),
        "bn3": bn_init(planes * 4),
    }
    if ibn:
        # IBN-a: first half of conv1 output instance-normed (Pan et al. 2018)
        p["in1"] = instance_norm_init(planes // 2)
        p["bn1"] = bn_init(planes - planes // 2)
    else:
        p["bn1"] = bn_init(planes)
    if stride != 1 or cin != planes * 4:
        p["down_conv"] = conv_init(ks[3], 1, 1, cin, planes * 4)
        p["down_bn"] = bn_init(planes * 4)
    return p


def _bottleneck(p, x, stride, ibn: bool):
    y = conv(p["conv1"], x)
    if ibn:
        half = p["in1"]["w"].shape[0]
        y = jnp.concatenate([instance_norm(p["in1"], y[..., :half]),
                             bn(p["bn1"], y[..., half:])], axis=-1)
    else:
        y = bn(p["bn1"], y)
    y = jax.nn.relu(y)
    y = jax.nn.relu(bn(p["bn2"], conv(p["conv2"], y, stride)))
    y = bn(p["bn3"], conv(p["conv3"], y))
    if "down_conv" in p:
        x = bn(p["down_bn"], conv(p["down_conv"], x, stride))
    return jax.nn.relu(x + y)


def resnet50_init(key, num_classes: int = 1000, ibn_a: bool = False):
    layers = [3, 4, 6, 3]
    planes = [64, 128, 256, 512]
    keys = jax.random.split(key, 2 + sum(layers))
    params: Dict[str, Any] = {
        "stem_conv": conv_init(keys[0], 7, 7, 3, 64),
        "stem_bn": bn_init(64),
        "fc": linear_init(keys[1], 2048, num_classes),
        "blocks": [],
    }
    cin, ki = 64, 2
    for stage, (n, pl) in enumerate(zip(layers, planes)):
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            # IBN-a applies to stages 1-3, not the last (reference ibn nets)
            use_ibn = ibn_a and stage < 3
            params["blocks"].append({
                "p": _bottleneck_init(keys[ki], cin, pl, stride, use_ibn),
                "stride": stride, "ibn": use_ibn})
            cin = pl * 4
            ki += 1
    return params


def resnet50_apply(params, x, num_classes_head: bool = True):
    y = conv(params["stem_conv"], x, stride=2)
    y = jax.nn.relu(bn(params["stem_bn"], y))
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for blk in params["blocks"]:
        y = _bottleneck(blk["p"], y, blk["stride"], blk["ibn"])
    feat = jnp.mean(y, axis=(1, 2))
    if num_classes_head:
        return feat @ params["fc"]["w"] + params["fc"]["b"]
    return feat


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------

_MBV2_CFG = [  # t, c, n, s
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _invres_init(key, cin, cout, t):
    hidden = cin * t
    ks = jax.random.split(key, 3)
    p = {}
    if t != 1:
        p["expand"] = conv_init(ks[0], 1, 1, cin, hidden)
        p["expand_bn"] = bn_init(hidden)
    p["dw"] = conv_init(ks[1], 3, 3, hidden, hidden, groups=hidden)
    p["dw_bn"] = bn_init(hidden)
    p["project"] = conv_init(ks[2], 1, 1, hidden, cout)
    p["project_bn"] = bn_init(cout)
    return p


def _invres(p, x, stride, t):
    y = x
    if t != 1:
        y = jax.nn.relu6(bn(p["expand_bn"], conv(p["expand"], y)))
    hidden = y.shape[-1]
    y = jax.nn.relu6(bn(p["dw_bn"], conv(p["dw"], y, stride, groups=hidden)))
    y = bn(p["project_bn"], conv(p["project"], y))
    if stride == 1 and x.shape[-1] == y.shape[-1]:
        y = x + y
    return y


def mobilenetv2_init(key, num_classes: int = 1000):
    n_blocks = sum(n for _, _, n, _ in _MBV2_CFG)
    keys = jax.random.split(key, 3 + n_blocks)
    params: Dict[str, Any] = {
        "stem_conv": conv_init(keys[0], 3, 3, 3, 32),
        "stem_bn": bn_init(32),
        "blocks": [],
    }
    cin, ki = 32, 1
    for t, c, n, s in _MBV2_CFG:
        for b in range(n):
            stride = s if b == 0 else 1
            params["blocks"].append({
                "p": _invres_init(keys[ki], cin, c, t), "stride": stride, "t": t})
            cin = c
            ki += 1
    params["head_conv"] = conv_init(keys[ki], 1, 1, cin, 1280)
    params["head_bn"] = bn_init(1280)
    params["fc"] = linear_init(keys[ki + 1], 1280, num_classes)
    return params


def mobilenetv2_apply(params, x, num_classes_head: bool = True):
    y = jax.nn.relu6(bn(params["stem_bn"], conv(params["stem_conv"], x, 2)))
    for blk in params["blocks"]:
        y = _invres(blk["p"], y, blk["stride"], blk["t"])
    y = jax.nn.relu6(bn(params["head_bn"], conv(params["head_conv"], y)))
    feat = jnp.mean(y, axis=(1, 2))
    if num_classes_head:
        return feat @ params["fc"]["w"] + params["fc"]["b"]
    return feat


# ---------------------------------------------------------------------------
# ShuffleNetV2 (x1.0)
# ---------------------------------------------------------------------------

_SHUFFLE_CFG = [(116, 4), (232, 8), (464, 4)]  # (channels, repeats) per stage


def _channel_shuffle(x, groups=2):
    B, H, Wd, C = x.shape
    return x.reshape(B, H, Wd, groups, C // groups).swapaxes(3, 4) \
        .reshape(B, H, Wd, C)


def _shuffle_unit_init(key, cin, cout, downsample):
    branch = cout // 2
    ks = jax.random.split(key, 6)
    p = {"right": {
        "c1": conv_init(ks[0], 1, 1, cin if downsample else cin // 2, branch),
        "bn1": bn_init(branch),
        "dw": conv_init(ks[1], 3, 3, branch, branch, groups=branch),
        "bn_dw": bn_init(branch),
        "c2": conv_init(ks[2], 1, 1, branch, branch),
        "bn2": bn_init(branch),
    }}
    if downsample:
        p["left"] = {
            "dw": conv_init(ks[3], 3, 3, cin, cin, groups=cin),
            "bn_dw": bn_init(cin),
            "c": conv_init(ks[4], 1, 1, cin, branch),
            "bn": bn_init(branch),
        }
    return p


def _shuffle_unit(p, x, downsample):
    if downsample:
        left, right = x, x
        lp = p["left"]
        left = bn(lp["bn_dw"], conv(lp["dw"], left, 2, groups=left.shape[-1]))
        left = jax.nn.relu(bn(lp["bn"], conv(lp["c"], left)))
        stride = 2
    else:
        half = x.shape[-1] // 2
        left, right = x[..., :half], x[..., half:]
        stride = 1
    rp = p["right"]
    r = jax.nn.relu(bn(rp["bn1"], conv(rp["c1"], right)))
    r = bn(rp["bn_dw"], conv(rp["dw"], r, stride, groups=r.shape[-1]))
    r = jax.nn.relu(bn(rp["bn2"], conv(rp["c2"], r)))
    return _channel_shuffle(jnp.concatenate([left, r], axis=-1))


def shufflenetv2_init(key, num_classes: int = 1000):
    n_units = sum(n for _, n in _SHUFFLE_CFG)
    keys = jax.random.split(key, 3 + n_units)
    params: Dict[str, Any] = {
        "stem_conv": conv_init(keys[0], 3, 3, 3, 24),
        "stem_bn": bn_init(24),
        "blocks": [],
    }
    cin, ki = 24, 1
    for c, n in _SHUFFLE_CFG:
        for b in range(n):
            down = b == 0
            params["blocks"].append({
                "p": _shuffle_unit_init(keys[ki], cin, c, down), "down": down})
            cin = c
            ki += 1
    params["head_conv"] = conv_init(keys[ki], 1, 1, cin, 1024)
    params["head_bn"] = bn_init(1024)
    params["fc"] = linear_init(keys[ki + 1], 1024, num_classes)
    return params


def shufflenetv2_apply(params, x, num_classes_head: bool = True):
    y = jax.nn.relu(bn(params["stem_bn"], conv(params["stem_conv"], x, 2)))
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for blk in params["blocks"]:
        y = _shuffle_unit(blk["p"], y, blk["down"])
    y = jax.nn.relu(bn(params["head_bn"], conv(params["head_conv"], y)))
    feat = jnp.mean(y, axis=(1, 2))
    if num_classes_head:
        return feat @ params["fc"]["w"] + params["fc"]["b"]
    return feat


# ---------------------------------------------------------------------------
# factory (reference: basic_cnn_params/__init__.py:87-96 build_model)
# ---------------------------------------------------------------------------

CNN_FACTORY: Dict[str, Tuple[Callable, Callable]] = {
    "resnet50": (lambda key, nc: resnet50_init(key, nc, ibn_a=False),
                 resnet50_apply),
    "resnet50_ibn_a": (lambda key, nc: resnet50_init(key, nc, ibn_a=True),
                       resnet50_apply),
    "mobilenetv2": (mobilenetv2_init, mobilenetv2_apply),
    "shufflenetv2": (shufflenetv2_init, shufflenetv2_apply),
}


def build_cnn(name: str, num_classes: int, key: Optional[Array] = None):
    """Returns (params, apply_fn). apply_fn(params, nhwc_images) -> logits."""
    if name not in CNN_FACTORY:
        raise KeyError(f"unknown cnn '{name}'; have {sorted(CNN_FACTORY)}")
    init, apply = CNN_FACTORY[name]
    key = key if key is not None else jax.random.PRNGKey(0)
    return init(key, num_classes), apply


def cnn_param_count(name: str, num_classes: int = 1000) -> int:
    """Trainable parameter count — BN running stats (mean/var) are buffers,
    excluded to match torch's requires_grad counting (params.py:65-68)."""
    params, _ = build_cnn(name, num_classes)
    total = 0
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        if not hasattr(leaf, "size"):
            continue
        last = kp[-1]
        if getattr(last, "key", None) in ("mean", "var"):
            continue
        total += int(leaf.size)
    return total
