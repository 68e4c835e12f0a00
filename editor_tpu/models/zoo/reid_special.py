"""ReID-specific zoo models: MuDeep, HACNN, MLFN, CAL.

reference: modeling/backbones/basic_cnn_params/{mudeep,hacnn,mlfn,cal}.py.
Parameter-exact; runnable NHWC inference. HACNN requires 160x64 inputs and
implements the reference's STN hard-attention regions (affine_grid +
grid_sample, align_corners=False semantics); MuDeep requires 256x128.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, avgpool, bn2d, classifier_head, conv2d, global_avgpool, linear,
    maxpool, named, parallel_concat, relu, seq,
)

Array = jax.Array


def _cb(cin, cout, k, s=1, p=0):
    """ConvBlock: conv (with bias) + BN + ReLU (mudeep.py/hacnn.py)."""
    return seq(conv2d(cin, cout, k, s, p, bias=True), bn2d(cout), relu())


def _resize_bilinear_ac(x: Array, out_hw) -> Array:
    """Bilinear resize with align_corners=True (torch F.upsample)."""
    B, H, W, C = x.shape
    OH, OW = out_hw
    ys = jnp.arange(OH) * ((H - 1) / max(OH - 1, 1))
    xs = jnp.arange(OW) * ((W - 1) / max(OW - 1, 1))
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# MuDeep (mudeep.py)
# ---------------------------------------------------------------------------

def _multi_scale_a():
    return parallel_concat(
        seq(_cb(96, 96, 1), _cb(96, 24, 3, 1, 1)),
        seq(avgpool(3, 1, 1), _cb(96, 24, 1)),
        _cb(96, 24, 1),
        seq(_cb(96, 16, 1), _cb(16, 24, 3, 1, 1), _cb(24, 24, 3, 1, 1)))


def _reduction():
    return parallel_concat(
        maxpool(3, 2, 1),
        _cb(96, 96, 3, 2, 1),
        seq(_cb(96, 48, 1), _cb(48, 56, 3, 1, 1), _cb(56, 64, 3, 2, 1)))


def _multi_scale_b():
    return [
        seq(avgpool(3, 1, 1), _cb(256, 256, 1)),
        seq(_cb(256, 64, 1), _cb(64, 128, (1, 3), 1, (0, 1)),
            _cb(128, 256, (3, 1), 1, (1, 0))),
        _cb(256, 256, 1),
        seq(_cb(256, 64, 1), _cb(64, 64, (1, 3), 1, (0, 1)),
            _cb(64, 128, (3, 1), 1, (1, 0)), _cb(128, 128, (1, 3), 1, (0, 1)),
            _cb(128, 256, (3, 1), 1, (1, 0)))]


def mudeep(num_classes) -> Module:
    """Multi-scale deep net (mudeep.py); input must be 256x128."""
    block1 = seq(_cb(3, 48, 3, 1, 1), _cb(48, 96, 3, 1, 1), maxpool(3, 2, 1))
    block2 = _multi_scale_a()
    block3 = _reduction()
    streams = _multi_scale_b()
    head = seq(linear(256 * 16 * 8, 768), bn2d(768), relu(),
               linear(768, num_classes))

    def init(key):
        ks = jax.random.split(key, 9)
        # fusion saliency weights as FOUR separate leaves like the torch
        # registration (Fusion.a1..a4, mudeep.py:133-136) so the ordered
        # structural checkpoint import zips 1:1; NHWC broadcast shape
        return {"b1": block1.init(ks[0]), "b2": block2.init(ks[1]),
                "b3": block3.init(ks[2]),
                "streams": [s.init(k) for s, k in zip(streams, ks[3:7])],
                "fusion": {f"a{i + 1}": jax.random.uniform(k, (1, 1, 1, 256))
                           for i, k in enumerate(jax.random.split(ks[7], 4))},
                "head": head.init(ks[8])}

    def apply(p, x):
        y = block3.apply(p["b3"], block2.apply(p["b2"],
                                               block1.apply(p["b1"], x)))
        acc = None
        for i, (s, sp) in enumerate(zip(streams, p["streams"])):
            t = s.apply(sp, y) * p["fusion"][f"a{i + 1}"].astype(y.dtype)
            acc = t if acc is None else acc + t
        v = avgpool(4, 4).apply({}, acc)
        # torch flattens NCHW (x.view(B, -1), mudeep.py:194): match its
        # C-major element order so the imported fc weight lines up
        v = jnp.transpose(v, (0, 3, 1, 2)).reshape(v.shape[0], -1)
        return head.apply(p["head"], v)

    return Module(init, apply)


# ---------------------------------------------------------------------------
# HACNN (hacnn.py)
# ---------------------------------------------------------------------------

def _inception_a_h(cin, cout):
    mid = cout // 4
    return parallel_concat(
        seq(_cb(cin, mid, 1), _cb(mid, mid, 3, 1, 1)),
        seq(_cb(cin, mid, 1), _cb(mid, mid, 3, 1, 1)),
        seq(_cb(cin, mid, 1), _cb(mid, mid, 3, 1, 1)),
        seq(avgpool(3, 1, 1), _cb(cin, mid, 1)))


def _inception_b_h(cin, cout):
    mid = cout // 4
    return parallel_concat(
        seq(_cb(cin, mid, 1), _cb(mid, mid, 3, 2, 1)),
        seq(_cb(cin, mid, 1), _cb(mid, mid, 3, 1, 1), _cb(mid, mid, 3, 2, 1)),
        seq(maxpool(3, 2, 1), _cb(cin, 2 * mid, 1)))


def _soft_attn(c) -> Module:
    sp1 = _cb(1, 1, 3, 2, 1)
    sp2 = _cb(1, 1, 1)
    ch1 = _cb(c, c // 16, 1)
    ch2 = _cb(c // 16, c, 1)
    out = _cb(c, c, 1)

    def init(key):
        ks = jax.random.split(key, 5)
        return {"sp1": sp1.init(ks[0]), "sp2": sp2.init(ks[1]),
                "ch1": ch1.init(ks[2]), "ch2": ch2.init(ks[3]),
                "conv": out.init(ks[4])}

    def apply(p, x):
        B, H, W, C = x.shape
        s = jnp.mean(x, axis=-1, keepdims=True)
        s = sp1.apply(p["sp1"], s)
        s = _resize_bilinear_ac(s, (H, W))
        s = sp2.apply(p["sp2"], s)
        ch = jnp.mean(x, axis=(1, 2), keepdims=True)
        ch = ch2.apply(p["ch2"], ch1.apply(p["ch1"], ch))
        return jax.nn.sigmoid(out.apply(p["conv"], s * ch))

    return Module(init, apply)


def _grid_sample_stripe(x: Array, ty: Array, tx: Array, sy: float) -> Array:
    """torch F.grid_sample(affine_grid(theta)) with theta =
    [[1, 0, tx], [0, sy, ty]] — horizontal stripe crop, align_corners=False,
    zero padding. x: [B, H, W, C]; tx/ty: [B]."""
    B, H, W, C = x.shape
    xt = -1.0 + (2.0 * jnp.arange(W) + 1.0) / W    # target x coords
    yt = -1.0 + (2.0 * jnp.arange(H) + 1.0) / H
    xs = xt[None, :] + tx[:, None]                  # [B, W]
    ys = sy * yt[None, :] + ty[:, None]             # [B, H]
    ix = ((xs + 1.0) * W - 1.0) / 2.0
    iy = ((ys + 1.0) * H - 1.0) / 2.0

    def axis_gather(img, idx, axis):
        return jnp.take_along_axis(img, idx, axis=axis)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[:, None, :, None]
    wy = (iy - y0)[:, :, None, None]

    def tap(yi, xi):
        yv = jnp.clip(yi.astype(jnp.int32), 0, H - 1)  # [B, H]
        xv = jnp.clip(xi.astype(jnp.int32), 0, W - 1)  # [B, W]
        g = axis_gather(x, yv[:, :, None, None].repeat(W, 2).repeat(C, 3), 1)
        g = axis_gather(g, xv[:, None, :, None].repeat(H, 1).repeat(C, 3), 2)
        my = ((yi >= 0) & (yi <= H - 1))[:, :, None, None]
        mx = ((xi >= 0) & (xi <= W - 1))[:, None, :, None]
        return g * my * mx

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def hacnn(num_classes, nchannels=(128, 256, 384), feat_dim=768,
          learn_region=True) -> Module:
    """Harmonious Attention CNN (hacnn.py; feat_dim=768 per the class default).

    Global stream: 3x (InceptionA+InceptionB) with soft attention; local
    stream: 4 STN-cropped horizontal stripes through InceptionB columns.
    """
    n1, n2, n3 = nchannels
    conv0 = _cb(3, 32, 3, 2, 1)
    inc = [seq(_inception_a_h(32, n1), _inception_b_h(n1, n1)),
           seq(_inception_a_h(n1, n2), _inception_b_h(n2, n2)),
           seq(_inception_a_h(n2, n3), _inception_b_h(n3, n3))]
    soft = [_soft_attn(n1), _soft_attn(n2), _soft_attn(n3)]
    hard = [linear(n1, 8), linear(n2, 8), linear(n3, 8)]
    fc_global = seq(linear(n3, feat_dim), bn2d(feat_dim), relu())
    cls_global = linear(feat_dim, num_classes)
    local = [_inception_b_h(32, n1), _inception_b_h(n1, n2),
             _inception_b_h(n2, n3)]
    fc_local = seq(linear(n3 * 4, feat_dim), bn2d(feat_dim), relu())
    cls_local = linear(feat_dim, num_classes)

    def init(key):
        ks = jax.random.split(key, 12)
        # key order mirrors torch registration (hacnn.py:225-266:
        # conv, inception1, ha1(soft+hard), inception2, ha2, inception3,
        # ha3, fc_global, classifier_global, local_conv1..3, fc_local,
        # classifier_local) for the ordered structural checkpoint import
        p = {"conv": conv0.init(ks[0])}
        for b in range(3):
            p[f"inc{b}"] = inc[b].init(ks[1 + b])
            p[f"soft{b}"] = soft[b].init(ks[4 + b])
            p[f"hard{b}"] = hard[b].init(ks[7 + b])
        p["fc_global"] = fc_global.init(ks[10])
        p["cls_global"] = cls_global.init(ks[11])
        if learn_region:
            ks2 = jax.random.split(ks[11], 5)
            for b in range(3):
                p[f"local{b}"] = local[b].init(ks2[b])
            p["fc_local"] = fc_local.init(ks2[3])
            p["cls_local"] = cls_local.init(ks2[4])
        return p

    sizes = [(24, 28), (12, 14), (6, 7)]

    def apply(p, x):
        assert x.shape[1] == 160 and x.shape[2] == 64, \
            "HACNN expects 160x64 inputs (reference hacnn.py forward)"
        x = conv0.apply(p["conv"], x)
        locals_: List[Array] = [None] * 4
        prev = x
        for b in range(3):
            g = inc[b].apply(p[f"inc{b}"], prev if b == 0 else g_out)
            attn = soft[b].apply(p[f"soft{b}"], g)
            pooled = jnp.mean(g, axis=(1, 2))
            theta = jnp.tanh(hard[b].apply(p[f"hard{b}"], pooled))
            theta = theta.reshape(-1, 4, 2)
            g_new = g * attn
            if learn_region:
                src = prev if b == 0 else g_out
                for r in range(4):
                    tx, ty = theta[:, r, 0], theta[:, r, 1]
                    crop = _grid_sample_stripe(src, ty, tx, sy=0.25)
                    crop = _resize_bilinear_ac(crop, sizes[b])
                    if b > 0:
                        crop = crop + locals_[r]
                    locals_[r] = local[b].apply(p[f"local{b}"], crop)
            g_out = g_new
        v_g = fc_global.apply(p["fc_global"], jnp.mean(g_out, axis=(1, 2)))
        if not learn_region:
            return cls_global.apply(p["cls_global"], v_g)
        v_l = jnp.concatenate([jnp.mean(l, axis=(1, 2)) for l in locals_], -1)
        v_l = fc_local.apply(p["fc_local"], v_l)
        y_g = cls_global.apply(p["cls_global"], v_g)
        y_l = cls_local.apply(p["cls_local"], v_l)
        return jnp.concatenate([y_g, y_l], axis=-1)

    return Module(init, apply)


# ---------------------------------------------------------------------------
# MLFN (mlfn.py)
# ---------------------------------------------------------------------------

def _mlfn_block(cin, cout, stride, fsm_channels, groups=32) -> Module:
    mid = cout // 2
    fm1 = seq(conv2d(cin, mid, 1), bn2d(mid), relu())
    fm2 = seq(conv2d(mid, mid, 3, stride, 1, groups=groups), bn2d(mid),
              relu())
    fm3 = seq(conv2d(mid, cout, 1), bn2d(cout))
    fsm = seq(conv2d(cin, fsm_channels[0], 1, bias=True),
              bn2d(fsm_channels[0]), relu(),
              conv2d(fsm_channels[0], fsm_channels[1], 1, bias=True),
              bn2d(fsm_channels[1]), relu(),
              conv2d(fsm_channels[1], groups, 1, bias=True), bn2d(groups))
    down = (seq(conv2d(cin, cout, 1, stride), bn2d(cout))
            if (cin != cout or stride > 1) else None)

    def init(key):
        ks = jax.random.split(key, 5)
        p = {"fm1": fm1.init(ks[0]), "fm2": fm2.init(ks[1]),
             "fm3": fm3.init(ks[2]), "fsm": fsm.init(ks[3])}
        if down is not None:
            p["down"] = down.init(ks[4])
        return p

    def apply(p, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.sigmoid(fsm.apply(p["fsm"], s))          # [B,1,1,G]
        y = fm1.apply(p["fm1"], x)
        y = fm2.apply(p["fm2"], y)
        # gate each of the G groups (channels are group-major: c = g*n+i)
        B = y.shape[0]
        n = y.shape[-1] // s.shape[-1]
        ss = jnp.repeat(s, n, axis=-1)  # [B,1,1,G*n] group-major
        y = fm3.apply(p["fm3"], y * ss)
        sc = down.apply(p["down"], x) if down is not None else x
        # relu(bn3) first, then relu again on the residual sum
        # (reference mlfn.py:88-96: x = relu(fm_bn3(..)); relu(residual + x))
        return jax.nn.relu(sc + jax.nn.relu(y)), s.reshape(B, -1)

    return Module(init, apply)


def mlfn(num_classes, groups=32, channels=(64, 256, 512, 1024, 2048),
         embed_dim=768) -> Module:
    c = channels
    specs = ([(c[0], c[1], 1, (128, 64))] +
             [(c[1], c[1], 1, (128, 64))] * 2 +
             [(c[1], c[2], 2, (256, 128))] +
             [(c[2], c[2], 1, (256, 128))] * 3 +
             [(c[2], c[3], 2, (512, 128))] +
             [(c[3], c[3], 1, (512, 128))] * 5 +
             [(c[3], c[4], 2, (512, 128))] +
             [(c[4], c[4], 1, (512, 128))] * 2)
    blocks = [_mlfn_block(a, b, s, f, groups) for a, b, s, f in specs]
    stem = seq(conv2d(3, c[0], 7, 2, 3, bias=True), bn2d(c[0]), relu(),
               maxpool(3, 2, 1))
    fc_x = seq(conv2d(c[4], embed_dim, 1), bn2d(embed_dim), relu())
    fc_s = seq(conv2d(groups * len(blocks), embed_dim, 1), bn2d(embed_dim),
               relu())
    head = linear(embed_dim, num_classes)

    def init(key):
        ks = jax.random.split(key, len(blocks) + 4)
        return {"stem": stem.init(ks[0]),
                "blocks": [b.init(k) for b, k in zip(blocks, ks[1:-3])],
                "fc_x": fc_x.init(ks[-3]), "fc_s": fc_s.init(ks[-2]),
                "head": head.init(ks[-1])}

    def apply(p, x):
        y = stem.apply(p["stem"], x)
        gates = []
        for b, bp in zip(blocks, p["blocks"]):
            y, s = b.apply(bp, y)
            gates.append(s)
        s_hat = jnp.concatenate(gates, -1)[:, None, None, :]
        vx = fc_x.apply(p["fc_x"], jnp.mean(y, (1, 2), keepdims=True))
        vs = fc_s.apply(p["fc_s"], s_hat)
        v = ((vx + vs) * 0.5).reshape(x.shape[0], -1)
        return head.apply(p["head"], v)

    return Module(init, apply)


# ---------------------------------------------------------------------------
# CAL (cal.py) — counterfactual attention learning over a resnet50 trunk
# ---------------------------------------------------------------------------

def _cal_se(c, reduction) -> Module:
    fc1 = linear(c, c // reduction, bias=False)
    fc2 = linear(c // reduction, c, bias=False)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"fc1": fc1.init(k1), "fc2": fc2.init(k2)}

    def apply(p, x):
        s = jnp.mean(x, axis=(1, 2))
        s = jax.nn.sigmoid(fc2.apply(p["fc2"],
                                     jax.nn.relu(fc1.apply(p["fc1"], s))))
        return s[:, None, None, :]

    return Module(init, apply)


def _multi_head_att(cin, channels, radix=2) -> Module:
    """ResNeSt-style split attention over `radix` channel splits
    (cal.py MultiHeadAtt)."""
    inter = max(cin * radix // 4, 32)
    fc1 = conv2d(channels, inter, 1, bias=True)
    b1 = bn2d(inter)
    fc2 = conv2d(inter, channels * radix, 1, bias=True)

    def init(key):
        ks = jax.random.split(key, 3)
        return {"fc1": fc1.init(ks[0]), "bn1": b1.init(ks[1]),
                "fc2": fc2.init(ks[2])}

    def apply(p, x):
        B, H, W, C = x.shape
        split = C // radix
        parts = [x[..., i * split:(i + 1) * split] for i in range(radix)]
        gap = sum(parts)
        gap = jnp.mean(gap, axis=(1, 2), keepdims=True)
        gap = jax.nn.relu(b1.apply(p["bn1"], fc1.apply(p["fc1"], gap)))
        att = fc2.apply(p["fc2"], gap).reshape(B, radix, channels)
        att = jax.nn.softmax(att, axis=1)
        out = [att[:, i][:, None, None, :] * parts[i] for i in range(radix)]
        return jnp.concatenate(out, axis=-1)

    return Module(init, apply)


def cal(num_classes, in_planes=768, M=8) -> Module:
    """CAL (cal.py:376). NOTE: the reference's forward is UNRUNNABLE as
    shipped — BAP yields M*2048=16384-d features but classifier_bap is
    Linear(in_planes*M=6144, 768) (verified to crash torch CPU forward).
    Parameters are replicated exactly; this apply slices the trunk features
    to the first in_planes channels before BAP so inference runs.
    """
    from editor_tpu.models.zoo.resnet import _stage

    stem = seq(conv2d(3, 64, 7, 2, 3), bn2d(64), relu(), maxpool(3, 2, 1))
    stages = [
        _stage(64, 64, 3, 1), _stage(256, 128, 4, 2),
        _stage(512, 256, 6, 2), _stage(1024, 512, 3, 1),  # last_stride=1
    ]
    chans = [64, 256, 512, 1024, 2048]
    # BN2d / bottleneck biases are requires_grad_(False) in the
    # reference (zero, frozen) — modeled as bias-free BNs
    bns = [bn2d(ch, bias=False) for ch in chans]
    ses = [_cal_se(ch, r) for ch, r in zip(chans, (8, 32, 64, 128, 256))]
    matts = [_multi_head_att(ch, ch // 2) for ch in chans]
    # BasicConv2d: BN eps=0.001 (reference cal.py:140-151)
    attn_conv = seq(conv2d(2048, M, 1), bn2d(M, eps=1e-3), relu())
    cls_bap = linear(in_planes * M, in_planes, bias=False)
    bottleneck = bn2d(in_planes, bias=False)
    head = linear(in_planes, num_classes, bias=False)

    def init(key):
        ks = iter(jax.random.split(key, 24))
        # key insertion order mirrors torch registration order after the
        # base/base_i alias drop (cal.py:276-301: base_1, BN1, att1,
        # att_s1, base_2, …, attentions, bottleneck, classifier,
        # classifier_bap) so the ordered structural import zips 1:1
        p = {"stem": stem.init(next(ks))}
        for i in range(5):
            p[f"bn{i}"] = bns[i].init(next(ks))
            p[f"se{i}"] = ses[i].init(next(ks))
            p[f"matt{i}"] = matts[i].init(next(ks))
            if i < 4:
                p[f"stage{i}"] = stages[i].init(next(ks))
        p["attn"] = attn_conv.init(next(ks))
        p["bottleneck"] = bottleneck.init(next(ks))
        p["head"] = head.init(next(ks))
        p["cls_bap"] = cls_bap.init(next(ks))
        return p

    def apply(p, x):
        y = stem.apply(p["stem"], x)
        for i in range(5):
            if i > 0:
                y = stages[i - 1].apply(p[f"stage{i - 1}"], y)
            y = matts[i].apply(p[f"matt{i}"], y)
            y = bns[i].apply(p[f"bn{i}"], y)
            y = y * ses[i].apply(p[f"se{i}"], y)
        att = attn_conv.apply(p["attn"], y)                 # [B, H, W, M]
        feats = y[..., :in_planes]                          # see docstring
        HW = att.shape[1] * att.shape[2]
        mat = jnp.einsum("bhwm,bhwc->bmc", att, feats) / HW
        mat = mat.reshape(x.shape[0], -1)
        # BAP sign-sqrt + L2 normalize (reference cal.py:197-201)
        mat = jnp.sign(mat) * jnp.sqrt(jnp.abs(mat) + 1e-12)
        mat = mat / jnp.maximum(jnp.linalg.norm(mat, axis=-1, keepdims=True),
                                1e-12)
        v = cls_bap.apply(p["cls_bap"], mat)
        feat = bottleneck.apply(p["bottleneck"], v)
        return head.apply(p["head"], feat)

    return Module(init, apply)
