"""Lightweight zoo families: MobileNetV2 (torchreid variant), ShuffleNet v1,
ShuffleNetV2, SqueezeNet.

reference: modeling/backbones/basic_cnn_params/{mobilenetv2,shufflenet,
shufflenetv2,squeezenet}.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, avgpool, bn2d, classifier_head, conv2d, global_avgpool, maxpool,
    named, relu, relu6, seq,
)


# ---------------------------------------------------------------------------
# MobileNetV2 (torchreid: expand conv kept even at t=1, mobilenetv2.py:40-67)
# ---------------------------------------------------------------------------

def _conv_block(cin, cout, k, s=1, p=0, g=1):
    return seq(conv2d(cin, cout, k, s, p, groups=g), bn2d(cout), relu6())


def _mbv2_bottleneck(cin, cout, t, stride) -> Module:
    mid = cin * t
    body = seq(_conv_block(cin, mid, 1),
               _conv_block(mid, mid, 3, stride, 1, g=mid),
               conv2d(mid, cout, 1), bn2d(cout))
    use_res = stride == 1 and cin == cout

    def init(key):
        return body.init(key)

    def apply(p, x):
        y = body.apply(p, x)
        return x + y if use_res else y

    return Module(init, apply)


def mobilenetv2(num_classes, width_mult=1) -> Module:
    w = lambda c: int(c * width_mult)
    feature = int(1280 * width_mult) if width_mult > 1 else 1280
    cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    mods, cin = [_conv_block(3, w(32), 3, 2, 1)], w(32)
    for t, c, n, s in cfg:
        for i in range(n):
            mods.append(_mbv2_bottleneck(cin, w(c), t, s if i == 0 else 1))
            cin = w(c)
    mods.append(_conv_block(cin, feature, 1))
    return named(features=seq(*mods), pool=global_avgpool(),
                 head=classifier_head(feature, num_classes))


def mobilenetv2_x1_0(nc): return mobilenetv2(nc, 1)
def mobilenetv2_x1_4(nc): return mobilenetv2(nc, 1.4)


# ---------------------------------------------------------------------------
# ShuffleNet v1 (groups=3; reference shufflenet.py:36-153)
# ---------------------------------------------------------------------------

def _channel_shuffle(x, groups):
    B, H, W, C = x.shape
    return x.reshape(B, H, W, groups, C // groups).swapaxes(3, 4) \
        .reshape(B, H, W, C)


def _shuffle_v1_block(cin, cout, stride, groups, group_conv1x1=True) -> Module:
    mid = cout // 4
    if stride == 2:
        cout = cout - cin
    g1 = groups if group_conv1x1 else 1
    conv1 = seq(conv2d(cin, mid, 1, groups=g1), bn2d(mid), relu())
    conv2 = seq(conv2d(mid, mid, 3, stride, 1, groups=mid), bn2d(mid))
    conv3 = seq(conv2d(mid, cout, 1, groups=groups), bn2d(cout))
    short = avgpool(3, 2, 1) if stride == 2 else None

    def init(key):
        ks = jax.random.split(key, 3)
        return {"c1": conv1.init(ks[0]), "c2": conv2.init(ks[1]),
                "c3": conv3.init(ks[2])}

    def apply(p, x):
        y = _channel_shuffle(conv1.apply(p["c1"], x), groups)
        y = conv3.apply(p["c3"], conv2.apply(p["c2"], y))
        if stride == 2:
            return jax.nn.relu(jnp.concatenate(
                [short.apply({}, x), y], axis=-1))
        return jax.nn.relu(x + y)

    return Module(init, apply)


def shufflenet(num_classes, groups=3) -> Module:
    c1, c2, c3 = {1: (144, 288, 576), 2: (200, 400, 800),
                  3: (240, 480, 960), 4: (272, 544, 1088),
                  8: (384, 768, 1536)}[groups]
    stage2 = [_shuffle_v1_block(24, c1, 2, groups, group_conv1x1=False)] + \
             [_shuffle_v1_block(c1, c1, 1, groups) for _ in range(3)]
    stage3 = [_shuffle_v1_block(c1, c2, 2, groups)] + \
             [_shuffle_v1_block(c2, c2, 1, groups) for _ in range(7)]
    stage4 = [_shuffle_v1_block(c2, c3, 2, groups)] + \
             [_shuffle_v1_block(c3, c3, 1, groups) for _ in range(3)]
    return named(
        conv1=seq(conv2d(3, 24, 3, 2, 1), bn2d(24), relu(),
                  maxpool(3, 2, 1)),
        stage2=seq(*stage2), stage3=seq(*stage3), stage4=seq(*stage4),
        pool=global_avgpool(),
        head=classifier_head(c3, num_classes),
    )


# ---------------------------------------------------------------------------
# ShuffleNetV2 (reference shufflenetv2.py:29-200)
# ---------------------------------------------------------------------------

def _shuffle_v2_unit(cin, cout, stride) -> Module:
    branch = cout // 2
    right_in = cin if stride > 1 else cin // 2
    right = seq(conv2d(right_in, branch, 1), bn2d(branch), relu(),
                conv2d(branch, branch, 3, stride, 1, groups=branch),
                bn2d(branch),
                conv2d(branch, branch, 1), bn2d(branch), relu())
    left = (seq(conv2d(cin, cin, 3, stride, 1, groups=cin), bn2d(cin),
                conv2d(cin, branch, 1), bn2d(branch), relu())
            if stride > 1 else None)

    def init(key):
        k1, k2 = jax.random.split(key)
        # build order matches torch registration order (branch1 = left
        # before branch2 = right, shufflenetv2.py:51-86) so the ordered
        # structural checkpoint import zips correctly
        p = {}
        if left is not None:
            p["left"] = left.init(k2)
        p["right"] = right.init(k1)
        return p

    def apply(p, x):
        if stride > 1:
            l = left.apply(p["left"], x)
            r = right.apply(p["right"], x)
        else:
            half = x.shape[-1] // 2
            l, r = x[..., :half], right.apply(p["right"], x[..., half:])
        return _channel_shuffle(jnp.concatenate([l, r], axis=-1), 2)

    return Module(init, apply)


def shufflenet_v2(num_classes, repeats, out_channels) -> Module:
    stages = {}
    cin = out_channels[0]
    for si, (reps, cout) in enumerate(zip(repeats, out_channels[1:4])):
        units = [_shuffle_v2_unit(cin, cout, 2)]
        units += [_shuffle_v2_unit(cout, cout, 1) for _ in range(reps - 1)]
        stages[f"stage{si + 2}"] = seq(*units)
        cin = cout
    return named(
        conv1=seq(conv2d(3, out_channels[0], 3, 2, 1), bn2d(out_channels[0]),
                  relu(), maxpool(3, 2, 1)),
        **stages,
        conv5=seq(conv2d(cin, out_channels[4], 1), bn2d(out_channels[4]),
                  relu()),
        pool=global_avgpool(),
        head=classifier_head(out_channels[4], num_classes),
    )


def shufflenet_v2_x0_5(nc):
    return shufflenet_v2(nc, [4, 8, 4], [24, 48, 96, 192, 1024])


def shufflenet_v2_x1_0(nc):
    return shufflenet_v2(nc, [4, 8, 4], [24, 116, 232, 464, 1024])


def shufflenet_v2_x1_5(nc):
    return shufflenet_v2(nc, [4, 8, 4], [24, 176, 352, 704, 1024])


def shufflenet_v2_x2_0(nc):
    return shufflenet_v2(nc, [4, 8, 4], [24, 244, 488, 976, 2048])


# ---------------------------------------------------------------------------
# SqueezeNet (reference squeezenet.py:19-117; convs carry biases)
# ---------------------------------------------------------------------------

def _fire(cin, s, e1, e3) -> Module:
    squeeze = conv2d(cin, s, 1, bias=True)
    exp1 = conv2d(s, e1, 1, bias=True)
    exp3 = conv2d(s, e3, 3, 1, 1, bias=True)

    def init(key):
        ks = jax.random.split(key, 3)
        return {"s": squeeze.init(ks[0]), "e1": exp1.init(ks[1]),
                "e3": exp3.init(ks[2])}

    def apply(p, x):
        y = jax.nn.relu(squeeze.apply(p["s"], x))
        return jnp.concatenate([jax.nn.relu(exp1.apply(p["e1"], y)),
                                jax.nn.relu(exp3.apply(p["e3"], y))], -1)

    return Module(init, apply)


def squeezenet(num_classes, version=1.0, fc_dims=()) -> Module:
    if version == 1.0:
        feats = seq(conv2d(3, 96, 7, 2, 0, bias=True), relu(),
                    maxpool(3, 2, 0, ceil_mode=True),
                    _fire(96, 16, 64, 64), _fire(128, 16, 64, 64),
                    _fire(128, 32, 128, 128),
                    maxpool(3, 2, 0, ceil_mode=True),
                    _fire(256, 32, 128, 128), _fire(256, 48, 192, 192),
                    _fire(384, 48, 192, 192), _fire(384, 64, 256, 256),
                    maxpool(3, 2, 0, ceil_mode=True),
                    _fire(512, 64, 256, 256))
    else:
        feats = seq(conv2d(3, 64, 3, 2, 0, bias=True), relu(),
                    maxpool(3, 2, 0, ceil_mode=True),
                    _fire(64, 16, 64, 64), _fire(128, 16, 64, 64),
                    maxpool(3, 2, 0, ceil_mode=True),
                    _fire(128, 32, 128, 128), _fire(256, 32, 128, 128),
                    maxpool(3, 2, 0, ceil_mode=True),
                    _fire(256, 48, 192, 192), _fire(384, 48, 192, 192),
                    _fire(384, 64, 256, 256), _fire(512, 64, 256, 256))
    return named(features=feats, pool=global_avgpool(),
                 head=classifier_head(512, num_classes, fc_dims))


def squeezenet1_0(nc): return squeezenet(nc, 1.0)
def squeezenet1_1(nc): return squeezenet(nc, 1.1)
def squeezenet1_0_fc512(nc): return squeezenet(nc, 1.0, fc_dims=(512,))
