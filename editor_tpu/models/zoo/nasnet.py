"""NASNet-A Mobile (reference: modeling/backbones/basic_cnn_params/nasnet.py).

The cell topology is transcribed exactly: stem cells, First/Normal cells
(6-way concat), Reduction cells (4-way concat), with the reference's
pad-then-crop 'specific'/'reduction' separable branches and pad/crop
pooling (MaxPoolPad/AvgPoolPad), all in NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, avgpool, bn2d, conv2d, linear, maxpool, relu, seq,
)

Array = jax.Array


def _pad_tl(x):
    """ZeroPad2d((1, 0, 1, 0)): 1 left, 1 top."""
    return jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])


def _crop_tl(x):
    return x[:, 1:, 1:, :]


def _bn(c):
    return bn2d(c, eps=1e-3)  # reference nasnet.py:131


def _sep_conv(cin, cout, k, s, p):
    return seq(conv2d(cin, cin, k, s, p, groups=cin),
               conv2d(cin, cout, 1))


def _branch_separables(cin, cout, k, s, p, mode="normal") -> Module:
    """relu -> sep(k,s) -> bn -> relu -> sep(k,1) -> bn.

    mode='stem': first separable maps cin->cout; 'specific'/'reduction':
    pad top-left before the strided separable and crop after
    (nasnet.py:113-222)."""
    mid = cout if mode == "stem" else cin
    sep1 = _sep_conv(cin, mid, k, s, p)
    bn1 = _bn(mid)
    sep2 = _sep_conv(mid, cout, k, 1, p)
    bn2 = _bn(cout)
    padded = mode in ("specific", "reduction")

    def init(key):
        ks = jax.random.split(key, 4)
        return {"sep1": sep1.init(ks[0]), "bn1": bn1.init(ks[1]),
                "sep2": sep2.init(ks[2]), "bn2": bn2.init(ks[3])}

    def apply(p_, x):
        x = jax.nn.relu(x)
        if padded:
            x = _pad_tl(x)
        x = sep1.apply(p_["sep1"], x)
        if padded:
            x = _crop_tl(x)
        x = bn1.apply(p_["bn1"], x)
        x = jax.nn.relu(x)
        x = sep2.apply(p_["sep2"], x)
        return bn2.apply(p_["bn2"], x)

    return Module(init, apply)


def _maxpool_pad() -> Module:
    mp = maxpool(3, 2, 1)
    return Module(lambda k: {},
                  lambda p, x: _crop_tl(mp.apply({}, _pad_tl(x))))


def _avgpool_pad() -> Module:
    ap = avgpool(3, 2, 1, count_include_pad=False)
    return Module(lambda k: {},
                  lambda p, x: _crop_tl(ap.apply({}, _pad_tl(x))))


def _relu_conv_bn(cin, cout):
    return seq(relu(), conv2d(cin, cout, 1), _bn(cout))


def _shrink_paths(cin, cout) -> Module:
    """The stride-2 skip-path pair: path1 avgpool+conv; path2 shifted
    (pad bottom-right, crop top-left) avgpool+conv; concat + BN
    (nasnet.py CellStem1/FirstCell path_1/path_2)."""
    conv1 = conv2d(cin, cout // 2, 1)
    conv2 = conv2d(cin, cout // 2, 1)
    bn = _bn(2 * (cout // 2))

    def init(key):
        ks = jax.random.split(key, 3)
        return {"c1": conv1.init(ks[0]), "c2": conv2.init(ks[1]),
                "bn": bn.init(ks[2])}

    def apply(p, x):
        x = jax.nn.relu(x)
        p1 = conv1.apply(p["c1"], x[:, ::2, ::2, :])  # AvgPool2d(1, stride=2)
        x2 = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])[:, 1:, 1:, :]
        p2 = conv2.apply(p["c2"], x2[:, ::2, ::2, :])
        return bn.apply(p["bn"], jnp.concatenate([p1, p2], -1))

    return Module(init, apply)


def _two_input_cell(subs: dict, apply_fn) -> Module:
    names = list(subs)

    def init(key):
        ks = jax.random.split(key, len(names))
        return {n: subs[n].init(k) for n, k in zip(names, ks)}

    def apply(p, x, x_prev):
        sub = {n: (lambda xx, n=n: subs[n].apply(p[n], xx)) for n in names}
        return apply_fn(sub, x, x_prev)

    return Module(init, apply)


_AVG31 = avgpool(3, 1, 1, count_include_pad=False)


def _cell_stem_0(stem_filters, nf) -> Module:
    subs = {
        "conv_1x1": _relu_conv_bn(stem_filters, nf),
        "c0l": _branch_separables(nf, nf, 5, 2, 2),
        "c0r": _branch_separables(stem_filters, nf, 7, 2, 3, "stem"),
        "c1r": _branch_separables(stem_filters, nf, 7, 2, 3, "stem"),
        "c2r": _branch_separables(stem_filters, nf, 5, 2, 2, "stem"),
        "c4l": _branch_separables(nf, nf, 3, 1, 1),
    }
    mp = maxpool(3, 2, 1)
    avg32 = avgpool(3, 2, 1, count_include_pad=False)

    def fwd(s, x, _):
        x1 = s["conv_1x1"](x)
        i0 = s["c0l"](x1) + s["c0r"](x)
        i1 = mp.apply({}, x1) + s["c1r"](x)
        i2 = avg32.apply({}, x1) + s["c2r"](x)
        i3 = _AVG31.apply({}, i0) + i1
        i4 = s["c4l"](i0) + mp.apply({}, x1)
        return jnp.concatenate([i1, i2, i3, i4], -1)

    return _two_input_cell(subs, fwd)


def _cell_stem_1(stem_filters, nf) -> Module:
    subs = {
        "conv_1x1": _relu_conv_bn(2 * nf, nf),
        "paths": _shrink_paths(stem_filters, nf),
        "c0l": _branch_separables(nf, nf, 5, 2, 2, "specific"),
        "c0r": _branch_separables(nf, nf, 7, 2, 3, "specific"),
        "c1l": _maxpool_pad(),
        "c1r": _branch_separables(nf, nf, 7, 2, 3, "specific"),
        "c2l": _avgpool_pad(),
        "c2r": _branch_separables(nf, nf, 5, 2, 2, "specific"),
        "c4l": _branch_separables(nf, nf, 3, 1, 1, "specific"),
        "c4r": _maxpool_pad(),
    }

    def fwd(s, x_conv0, x_stem_0):
        left = s["conv_1x1"](x_stem_0)
        right = s["paths"](x_conv0)
        i0 = s["c0l"](left) + s["c0r"](right)
        i1 = s["c1l"](left) + s["c1r"](right)
        i2 = s["c2l"](left) + s["c2r"](right)
        i3 = _AVG31.apply({}, i0) + i1
        i4 = s["c4l"](i0) + s["c4r"](left)
        return jnp.concatenate([i1, i2, i3, i4], -1)

    return _two_input_cell(subs, fwd)


def _first_cell(inl, outl, inr, outr) -> Module:
    subs = {
        "conv_1x1": _relu_conv_bn(inr, outr),
        "paths": _shrink_paths(inl, 2 * outl),
        "c0l": _branch_separables(outr, outr, 5, 1, 2),
        "c0r": _branch_separables(outr, outr, 3, 1, 1),
        "c1l": _branch_separables(outr, outr, 5, 1, 2),
        "c1r": _branch_separables(outr, outr, 3, 1, 1),
        "c4l": _branch_separables(outr, outr, 3, 1, 1),
    }

    def fwd(s, x, x_prev):
        left = s["paths"](x_prev)    # [*, 2*outl] == outr channels
        right = s["conv_1x1"](x)
        i0 = s["c0l"](right) + s["c0r"](left)
        i1 = s["c1l"](left) + s["c1r"](left)
        i2 = _AVG31.apply({}, right) + left
        i3 = _AVG31.apply({}, left) + _AVG31.apply({}, left)
        i4 = s["c4l"](right) + right
        return jnp.concatenate([left, i0, i1, i2, i3, i4], -1)

    return _two_input_cell(subs, fwd)


def _normal_cell(inl, outl, inr, outr) -> Module:
    subs = {
        "conv_prev": _relu_conv_bn(inl, outl),
        "conv_1x1": _relu_conv_bn(inr, outr),
        "c0l": _branch_separables(outr, outr, 5, 1, 2),
        "c0r": _branch_separables(outl, outl, 3, 1, 1),
        "c1l": _branch_separables(outl, outl, 5, 1, 2),
        "c1r": _branch_separables(outl, outl, 3, 1, 1),
        "c4l": _branch_separables(outr, outr, 3, 1, 1),
    }

    def fwd(s, x, x_prev):
        left = s["conv_prev"](x_prev)
        right = s["conv_1x1"](x)
        i0 = s["c0l"](right) + s["c0r"](left)
        i1 = s["c1l"](left) + s["c1r"](left)
        i2 = _AVG31.apply({}, right) + left
        i3 = _AVG31.apply({}, left) + _AVG31.apply({}, left)
        i4 = s["c4l"](right) + right
        return jnp.concatenate([left, i0, i1, i2, i3, i4], -1)

    return _two_input_cell(subs, fwd)


def _reduction_cell(inl, outl, inr, outr, mode) -> Module:
    """mode='reduction' (ReductionCell0) or 'specific' (ReductionCell1)."""
    subs = {
        "conv_prev": _relu_conv_bn(inl, outl),
        "conv_1x1": _relu_conv_bn(inr, outr),
        "c0l": _branch_separables(outr, outr, 5, 2, 2, mode),
        "c0r": _branch_separables(outr, outr, 7, 2, 3, mode),
        "c1l": _maxpool_pad(),
        "c1r": _branch_separables(outr, outr, 7, 2, 3, mode),
        "c2l": _avgpool_pad(),
        "c2r": _branch_separables(outr, outr, 5, 2, 2, mode),
        "c4l": _branch_separables(outr, outr, 3, 1, 1, mode),
        "c4r": _maxpool_pad(),
    }
    # ReductionCell0 applies its strided branches left=conv_1x1(x) as
    # "right" input and conv_prev(x_prev) as "left" (nasnet.py:735-760)
    def fwd(s, x, x_prev):
        left = s["conv_prev"](x_prev)
        right = s["conv_1x1"](x)
        i0 = s["c0l"](right) + s["c0r"](left)
        i1 = s["c1l"](right) + s["c1r"](left)
        i2 = s["c2l"](right) + s["c2r"](left)
        i3 = _AVG31.apply({}, i0) + i1
        i4 = s["c4l"](i0) + s["c4r"](right)
        return jnp.concatenate([i1, i2, i3, i4], -1)

    return _two_input_cell(subs, fwd)


def nasnetamobile(num_classes, stem_filters=32, penultimate_filters=1056,
                  mult=2) -> Module:
    f = penultimate_filters // 24
    conv0 = seq(conv2d(3, stem_filters, 3, 2, 0), _bn(stem_filters))
    stem0 = _cell_stem_0(stem_filters, f // (mult ** 2))
    stem1 = _cell_stem_1(stem_filters, f // mult)
    cells = {
        "cell_0": _first_cell(f, f // 2, 2 * f, f),
        "cell_1": _normal_cell(2 * f, f, 6 * f, f),
        "cell_2": _normal_cell(6 * f, f, 6 * f, f),
        "cell_3": _normal_cell(6 * f, f, 6 * f, f),
        "red_0": _reduction_cell(6 * f, 2 * f, 6 * f, 2 * f, "reduction"),
        "cell_6": _first_cell(6 * f, f, 8 * f, 2 * f),
        "cell_7": _normal_cell(8 * f, 2 * f, 12 * f, 2 * f),
        "cell_8": _normal_cell(12 * f, 2 * f, 12 * f, 2 * f),
        "cell_9": _normal_cell(12 * f, 2 * f, 12 * f, 2 * f),
        "red_1": _reduction_cell(12 * f, 4 * f, 12 * f, 4 * f, "specific"),
        "cell_12": _first_cell(12 * f, 2 * f, 16 * f, 4 * f),
        "cell_13": _normal_cell(16 * f, 4 * f, 24 * f, 4 * f),
        "cell_14": _normal_cell(24 * f, 4 * f, 24 * f, 4 * f),
        "cell_15": _normal_cell(24 * f, 4 * f, 24 * f, 4 * f),
    }
    head = linear(24 * f, num_classes)

    def init(key):
        ks = jax.random.split(key, len(cells) + 4)
        # torch registers last_linear AFTER the cells (nasnet.py __init__):
        # keep that key order for the ordered structural checkpoint import
        p = {"conv0": conv0.init(ks[0]), "stem0": stem0.init(ks[1]),
             "stem1": stem1.init(ks[2])}
        for (n, c), k in zip(cells.items(), ks[4:]):
            p[n] = c.init(k)
        p["head"] = head.init(ks[3])
        return p

    def apply(p, x):
        c = lambda n, a, b: cells[n].apply(p[n], a, b)
        x0 = conv0.apply(p["conv0"], x)
        s0 = stem0.apply(p["stem0"], x0, None)
        s1 = stem1.apply(p["stem1"], x0, s0)
        y0 = c("cell_0", s1, s0)
        y1 = c("cell_1", y0, s1)
        y2 = c("cell_2", y1, y0)
        y3 = c("cell_3", y2, y1)
        r0 = c("red_0", y3, y2)
        y6 = c("cell_6", r0, y3)
        y7 = c("cell_7", y6, r0)
        y8 = c("cell_8", y7, y6)
        y9 = c("cell_9", y8, y7)
        r1 = c("red_1", y9, y8)
        y12 = c("cell_12", r1, y9)
        y13 = c("cell_13", y12, r1)
        y14 = c("cell_14", y13, y12)
        y15 = c("cell_15", y14, y13)
        v = jnp.mean(jax.nn.relu(y15), axis=(1, 2))
        return head.apply(p["head"], v)

    return Module(init, apply)
