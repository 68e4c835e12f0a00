"""Tiny functional module DSL for the CNN backbone zoo.

A ``Module`` is an (init, apply) pair over plain pytrees — the JAX-native
shape of torch's ``nn.Module`` graph, compact enough to express the 22
reference architectures (reference: modeling/backbones/basic_cnn_params/)
with their exact parameter structure. BatchNorm runs in inference mode
(running stats are buffers, excluded from parameter counts to match torch's
``requires_grad`` counting, reference params.py:65-68); the zoo exists for
runnable single-modal feature extraction and parameter parity.

Layout conventions: NHWC activations, HWIO conv kernels, [in, out] linear
weights — identical numel to torch's OIHW / [out, in], so parameter counts
match element-for-element.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


class Module(NamedTuple):
    init: Callable[[Array], Any]          # key -> params pytree
    apply: Callable[[Any, Array], Array]  # (params, x) -> y


def _split(key, n):
    return list(jax.random.split(key, n)) if n > 1 else [key]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(cin: int, cout: int, k, stride=1, padding=0, groups: int = 1,
           bias: bool = False, dilation=1) -> Module:
    """torch nn.Conv2d equivalent (kaiming-ish init; integer torch padding)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    dh, dw = (dilation, dilation) if isinstance(dilation, int) else dilation

    def init(key):
        fan_in = kh * kw * cin // groups
        w = jax.random.normal(key, (kh, kw, cin // groups, cout)) \
            * (2.0 / max(fan_in, 1)) ** 0.5
        p = {"w": w}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    def apply(p, x):
        y = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (sh, sw),
            [(ph, ph), (pw, pw)], rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y

    return Module(init, apply)


def bn2d(c: int, affine: bool = True, bias: bool = True,
         eps: float = 1e-5) -> Module:
    """bias=False models torch BNs whose bias is requires_grad_(False)
    (initialized zero, frozen — e.g. CAL's BN2d/bottleneck): numerically
    identical, excluded from the trainable count. eps=0.001 matches the
    tensorflow-derived nets (reference inceptionv4.py:51, nasnet.py:131)."""
    def init(key):
        p = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
        if affine:
            p["w"] = jnp.ones((c,))
            if bias:
                p["b"] = jnp.zeros((c,))
        return p

    def apply(p, x, eps=eps):
        # promote: f32 stats math under bf16 inputs, exact under f64 (golden)
        ct = jnp.promote_types(x.dtype, jnp.float32)
        inv = jax.lax.rsqrt(p["var"].astype(ct) + eps)
        y = (x.astype(ct) - p["mean"].astype(ct)) * inv
        if "w" in p:
            y = y * p["w"].astype(ct) + p.get("b", jnp.zeros((), ct)).astype(ct)
        return y.astype(x.dtype)

    return Module(init, apply)


bn1d = bn2d  # same parameterization over the trailing channel axis


def in2d(c: int, affine: bool = True) -> Module:
    """InstanceNorm2d (torch default affine=False; IBN nets pass affine=True)."""
    def init(key):
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))} if affine else {}

    def apply(p, x, eps=1e-5):
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + eps)
        if "w" in p:
            y = y * p["w"] + p["b"]
        return y

    return Module(init, apply)


def linear(cin: int, cout: int, bias: bool = True) -> Module:
    def init(key):
        std = (1.0 / cin) ** 0.5
        p = {"w": jax.random.uniform(key, (cin, cout), minval=-std,
                                     maxval=std)}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    def apply(p, x):
        y = x @ p["w"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y

    return Module(init, apply)


def _stateless(fn) -> Module:
    return Module(lambda key: {}, lambda p, x: fn(x))


def relu() -> Module:
    return _stateless(jax.nn.relu)


def relu6() -> Module:
    return _stateless(jax.nn.relu6)


def sigmoid() -> Module:
    return _stateless(jax.nn.sigmoid)


def identity() -> Module:
    return _stateless(lambda x: x)


def maxpool(k, stride=None, padding=0, ceil_mode: bool = False) -> Module:
    kh, kw = (k, k) if isinstance(k, int) else k
    stride = stride if stride is not None else k
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding

    def apply(x):
        pads = [(0, 0), (ph, ph), (pw, pw), (0, 0)]
        if ceil_mode:
            # extend right/bottom pad so the last partial window is kept
            def extra(size, kk, ss, pp):
                r = (size + 2 * pp - kk) % ss
                return (ss - r) % ss if r else 0
            pads[1] = (ph, ph + extra(x.shape[1], kh, sh, ph))
            pads[2] = (pw, pw + extra(x.shape[2], kw, sw, pw))
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
            [(0, 0)] + pads[1:3] + [(0, 0)])

    return _stateless(apply)


def avgpool(k, stride=None, padding=0, count_include_pad=True) -> Module:
    kh, kw = (k, k) if isinstance(k, int) else k
    stride = stride if stride is not None else k
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding

    def apply(x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
            [(0, 0), (ph, ph), (pw, pw), (0, 0)])
        if count_include_pad or (ph == 0 and pw == 0):
            return s / (kh * kw)
        ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
        n = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
            [(0, 0), (ph, ph), (pw, pw), (0, 0)])
        return s / n

    return _stateless(apply)


def global_avgpool() -> Module:
    return _stateless(lambda x: jnp.mean(x, axis=(1, 2)))


def global_maxpool() -> Module:
    return _stateless(lambda x: jnp.max(x, axis=(1, 2)))


# ---------------------------------------------------------------------------
# combinators
# ---------------------------------------------------------------------------

def seq(*mods: Module) -> Module:
    mods = [m for m in mods if m is not None]

    def init(key):
        return [m.init(k) for m, k in zip(mods, _split(key, len(mods)))]

    def apply(p, x):
        for m, mp in zip(mods, p):
            x = m.apply(mp, x)
        return x

    return Module(init, apply)


def named(**kw: Module) -> Module:
    names = list(kw)

    def init(key):
        return {n: kw[n].init(k) for n, k in zip(names, _split(key, len(names)))}

    def apply(p, x):
        for n in names:
            x = kw[n].apply(p[n], x)
        return x

    return Module(init, apply)


def parallel_concat(*branches: Module, axis: int = -1) -> Module:
    """Run branches on the same input, concat outputs (inception style)."""
    def init(key):
        return [b.init(k) for b, k in zip(branches, _split(key, len(branches)))]

    def apply(p, x):
        return jnp.concatenate(
            [b.apply(bp, x) for b, bp in zip(branches, p)], axis=axis)

    return Module(init, apply)


def residual(body: Module, downsample: Module = None,
             post: Callable[[Array], Array] = jax.nn.relu) -> Module:
    """y = post(body(x) + (downsample or id)(x))."""
    def init(key):
        k1, k2 = jax.random.split(key)
        p = {"body": body.init(k1)}
        if downsample is not None:
            p["down"] = downsample.init(k2)
        return p

    def apply(p, x):
        y = body.apply(p["body"], x)
        sc = downsample.apply(p["down"], x) if downsample is not None else x
        return post(y + sc)

    return Module(init, apply)


def fn_module(init_fn, apply_fn) -> Module:
    return Module(init_fn, apply_fn)


def conv_bn_relu(cin, cout, k, stride=1, padding=0, groups=1,
                 bias=False) -> Module:
    return seq(conv2d(cin, cout, k, stride, padding, groups, bias),
               bn2d(cout), relu())


def se_module(channels: int, reduction: int, bias: bool = True) -> Module:
    """Squeeze-and-excitation (pretrainedmodels SEModule: 1x1 convs w/ bias)."""
    fc1 = conv2d(channels, channels // reduction, 1, bias=bias)
    fc2 = conv2d(channels // reduction, channels, 1, bias=bias)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"fc1": fc1.init(k1), "fc2": fc2.init(k2)}

    def apply(p, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.relu(fc1.apply(p["fc1"], s))
        s = jax.nn.sigmoid(fc2.apply(p["fc2"], s))
        return x * s

    return Module(init, apply)


def classifier_head(feature_dim: int, num_classes: int,
                    fc_dims: Sequence[int] = ()) -> Module:
    """torchreid _construct_fc_layer + classifier (resnet.py:292-321,364)."""
    mods = []
    d = feature_dim
    for dim in fc_dims:
        mods += [linear(d, dim), bn1d(dim), relu()]
        d = dim
    mods.append(linear(d, num_classes))
    return seq(*mods)


def count_params(params: Any) -> int:
    """Parameter count excluding BN/IN running stats (buffers in torch)."""
    total = 0
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        if not hasattr(leaf, "size"):
            continue
        last = kp[-1]
        if getattr(last, "key", None) in ("mean", "var"):
            continue
        total += int(leaf.size)
    return total
