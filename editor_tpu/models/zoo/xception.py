"""Xception (reference: modeling/backbones/basic_cnn_params/xception.py:
entry/middle/exit flow of depthwise-separable conv blocks)."""

from __future__ import annotations

import jax

from editor_tpu.models.zoo.common import (
    Module, bn2d, classifier_head, conv2d, global_avgpool, maxpool, named,
    relu, seq,
)


def _sep_conv(cin, cout, k=3, s=1, p=0):
    return seq(conv2d(cin, cin, k, s, p, groups=cin),
               conv2d(cin, cout, 1))


def _xception_block(cin, cout, reps, stride=1, start_with_relu=True,
                    grow_first=True) -> Module:
    rep = []
    filters = cin
    if grow_first:
        rep += [relu(), _sep_conv(cin, cout, 3, 1, 1), bn2d(cout)]
        filters = cout
    for _ in range(reps - 1):
        rep += [relu(), _sep_conv(filters, filters, 3, 1, 1), bn2d(filters)]
    if not grow_first:
        rep += [relu(), _sep_conv(cin, cout, 3, 1, 1), bn2d(cout)]
    if not start_with_relu:
        rep = rep[1:]
    if stride != 1:
        rep.append(maxpool(3, stride, 1))
    body = seq(*rep)
    skip = (seq(conv2d(cin, cout, 1, stride), bn2d(cout))
            if (cout != cin or stride != 1) else None)

    def init(key):
        k1, k2 = jax.random.split(key)
        # torch registers skip/skipbn BEFORE rep (xception.py:74-130);
        # match that order for the ordered structural checkpoint import
        p = {}
        if skip is not None:
            p["skip"] = skip.init(k2)
        p["rep"] = body.init(k1)
        return p

    def apply(p, x):
        y = body.apply(p["rep"], x)
        sc = skip.apply(p["skip"], x) if skip is not None else x
        return y + sc

    return Module(init, apply)


def xception(num_classes) -> Module:
    return named(
        stem=seq(conv2d(3, 32, 3, 2), bn2d(32), relu(),
                 conv2d(32, 64, 3), bn2d(64), relu()),
        blocks=seq(
            _xception_block(64, 128, 2, 2, start_with_relu=False),
            _xception_block(128, 256, 2, 2),
            _xception_block(256, 728, 2, 2),
            *[_xception_block(728, 728, 3, 1) for _ in range(8)],
            _xception_block(728, 1024, 2, 2, grow_first=False)),
        tail=seq(_sep_conv(1024, 1536, 3, 1, 1), bn2d(1536), relu(),
                 _sep_conv(1536, 2048, 3, 1, 1), bn2d(2048), relu()),
        pool=global_avgpool(),
        head=classifier_head(2048, num_classes),
    )
