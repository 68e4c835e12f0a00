"""OSNet and OSNet-AIN (omni-scale ReID backbones).

reference: modeling/backbones/basic_cnn_params/{osnet,osnet_ain}.py.
OSBlock: bottleneck 1x1 -> T=4 parallel LightConv3x3 streams of depth 1..4,
each channel-gated by a SHARED ChannelGate, summed, 1x1-linear out +
residual. osnet fc head is Linear(c3, 768); osnet_ain's is Linear(c3, 512)
with mixed (OSBlock | OSBlockINin) stages and an IN stem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, avgpool, bn2d, classifier_head, conv2d, global_avgpool, in2d,
    maxpool, named, relu, seq,
)


def _conv_layer(cin, cout, k, s=1, p=0, use_in=False):
    norm = in2d(cout, affine=True) if use_in else bn2d(cout)
    return seq(conv2d(cin, cout, k, s, p), norm, relu())


def _conv1x1(cin, cout):
    return seq(conv2d(cin, cout, 1), bn2d(cout), relu())


def _conv1x1_linear(cin, cout, bn=True):
    return seq(conv2d(cin, cout, 1), bn2d(cout) if bn else None)


def _light_conv3x3(cin, cout):
    # 1x1 (linear) + depthwise 3x3, one BN+ReLU after (osnet.py:128-160)
    return seq(conv2d(cin, cout, 1), conv2d(cout, cout, 3, 1, 1, groups=cout),
               bn2d(cout), relu())


def _light_stream(cin, cout, depth):
    return seq(*([_light_conv3x3(cin, cout)] +
                 [_light_conv3x3(cout, cout) for _ in range(depth - 1)]))


def _channel_gate(c, reduction=16) -> Module:
    fc1 = conv2d(c, c // reduction, 1, bias=True)
    fc2 = conv2d(c // reduction, c, 1, bias=True)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"fc1": fc1.init(k1), "fc2": fc2.init(k2)}

    def apply(p, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.relu(fc1.apply(p["fc1"], s))
        return x * jax.nn.sigmoid(fc2.apply(p["fc2"], s))

    return Module(init, apply)


def _os_block(cin, cout, T=4, reduction=4, post_in=False,
              in_inside=False) -> Module:
    """post_in: osnet's OSBlock(IN=True) — IN after the residual add;
    in_inside: osnet_ain's OSBlockINin — conv3 has no BN, IN inside the
    residual (osnet_ain.py:271-302)."""
    mid = cout // reduction
    conv1 = _conv1x1(cin, mid)
    streams = [_light_stream(mid, mid, t) for t in range(1, T + 1)]
    gate = _channel_gate(mid)
    conv3 = _conv1x1_linear(mid, cout, bn=not in_inside)
    down = _conv1x1_linear(cin, cout) if cin != cout else None
    inm = in2d(cout, affine=True) if (post_in or in_inside) else None

    def init(key):
        ks = jax.random.split(key, 4 + len(streams))
        p = {"conv1": conv1.init(ks[0]),
             "streams": [s.init(k) for s, k in zip(streams, ks[1:1 + T])],
             "gate": gate.init(ks[1 + T]), "conv3": conv3.init(ks[2 + T])}
        if down is not None:
            p["down"] = down.init(ks[3 + T])
        if inm is not None:
            p["IN"] = inm.init(ks[0])
        return p

    def apply(p, x):
        x1 = conv1.apply(p["conv1"], x)
        x2 = None
        for s, sp in zip(streams, p["streams"]):
            g = gate.apply(p["gate"], s.apply(sp, x1))
            x2 = g if x2 is None else x2 + g
        x3 = conv3.apply(p["conv3"], x2)
        if in_inside:
            x3 = inm.apply(p["IN"], x3)
        idn = down.apply(p["down"], x) if down is not None else x
        out = x3 + idn
        if post_in:
            out = inm.apply(p["IN"], out)
        return jax.nn.relu(out)

    return Module(init, apply)


def _reduce(c):
    return seq(_conv1x1(c, c), avgpool(2, 2))


def osnet(num_classes, channels, use_in=False) -> Module:
    """osnet.py OSNet: 3 stages of 2 OSBlocks; IN variant norms the stem and
    the first stage's blocks (osnet.py:310-321)."""
    c0, c1, c2, c3 = channels
    blk = lambda cin, cout, stage_in: _os_block(cin, cout, post_in=stage_in)
    return named(
        conv1=_conv_layer(3, c0, 7, 2, 3, use_in=use_in),
        pool1=maxpool(3, 2, 1),
        conv2=seq(blk(c0, c1, use_in), blk(c1, c1, use_in), _reduce(c1)),
        conv3=seq(blk(c1, c2, False), blk(c2, c2, False), _reduce(c2)),
        conv4=seq(blk(c2, c3, False), blk(c3, c3, False)),
        conv5=_conv1x1(c3, c3),
        pool=global_avgpool(),
        head=classifier_head(c3, num_classes, fc_dims=(768,)),
    )


def osnet_ain(num_classes, channels) -> Module:
    """osnet_ain.py OSNet: block pattern [[INin, INin], [OS, INin],
    [INin, OS]], IN stem, fc 512 (osnet_ain.py:532-550)."""
    c0, c1, c2, c3 = channels
    A = lambda cin, cout: _os_block(cin, cout, in_inside=True)
    O = lambda cin, cout: _os_block(cin, cout)
    return named(
        conv1=_conv_layer(3, c0, 7, 2, 3, use_in=True),
        pool1=maxpool(3, 2, 1),
        conv2=seq(A(c0, c1), A(c1, c1)),
        pool2=_reduce(c1),
        conv3=seq(O(c1, c2), A(c2, c2)),
        pool3=_reduce(c2),
        conv4=seq(A(c2, c3), O(c3, c3)),
        conv5=_conv1x1(c3, c3),
        pool=global_avgpool(),
        head=classifier_head(c3, num_classes, fc_dims=(512,)),
    )


def osnet_x1_0(nc): return osnet(nc, [64, 256, 384, 512])
def osnet_x0_75(nc): return osnet(nc, [48, 192, 288, 384])
def osnet_x0_5(nc): return osnet(nc, [32, 128, 192, 256])
def osnet_x0_25(nc): return osnet(nc, [16, 64, 96, 128])
def osnet_ibn_x1_0(nc): return osnet(nc, [64, 256, 384, 512], use_in=True)
def osnet_ain_x1_0(nc): return osnet_ain(nc, [64, 256, 384, 512])
def osnet_ain_x0_75(nc): return osnet_ain(nc, [48, 192, 288, 384])
def osnet_ain_x0_5(nc): return osnet_ain(nc, [32, 128, 192, 256])
def osnet_ain_x0_25(nc): return osnet_ain(nc, [16, 64, 96, 128])
