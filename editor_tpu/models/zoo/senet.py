"""SENet family: se_resnet50/101 (+fc512), se_resnext50/101_32x4d.

reference: modeling/backbones/basic_cnn_params/senet.py (pretrainedmodels
SENet; all reid presets use inplanes=64, input_3x3=False,
downsample_kernel_size=1/padding=0, reduction=16). SEResNetBottleneck puts
the stride on conv1 (Caffe style, senet.py:175-205); SEResNeXt uses
base_width=4 with the stride on conv2 (senet.py:208-243). The SE module's
1x1 convs carry biases (senet.py:91-113).
"""

from __future__ import annotations

import math

import jax

from editor_tpu.models.zoo.common import (
    Module, bn2d, classifier_head, conv2d, global_avgpool, maxpool, named,
    relu, se_module, seq,
)


def _se_block(cin, planes, groups, stride, variant: str,
              down_needed: bool) -> Module:
    if variant == "resnet":
        body = seq(conv2d(cin, planes, 1, stride), bn2d(planes), relu(),
                   conv2d(planes, planes, 3, 1, 1, groups=groups),
                   bn2d(planes), relu(),
                   conv2d(planes, planes * 4, 1), bn2d(planes * 4))
    else:  # resnext, base_width=4
        width = int(math.floor(planes * (4 / 64.0)) * groups)
        body = seq(conv2d(cin, width, 1), bn2d(width), relu(),
                   conv2d(width, width, 3, stride, 1, groups=groups),
                   bn2d(width), relu(),
                   conv2d(width, planes * 4, 1), bn2d(planes * 4))
    se = se_module(planes * 4, reduction=16)
    down = (seq(conv2d(cin, planes * 4, 1, stride), bn2d(planes * 4))
            if down_needed else None)

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"body": body.init(k1), "se": se.init(k2)}
        if down is not None:
            p["down"] = down.init(k3)
        return p

    def apply(p, x):
        y = se.apply(p["se"], body.apply(p["body"], x))
        sc = down.apply(p["down"], x) if down is not None else x
        return jax.nn.relu(y + sc)

    return Module(init, apply)


def _se_stage(cin, planes, blocks, stride, groups, variant) -> Module:
    mods, c = [], cin
    for i in range(blocks):
        s = stride if i == 0 else 1
        need = s != 1 or c != planes * 4
        mods.append(_se_block(c, planes, groups, s, variant, need))
        c = planes * 4
    return seq(*mods)


def _senet(num_classes, layers, groups, variant, fc_dims=(),
           last_stride=2) -> Module:
    return named(
        # ceil_mode maxpool preserves Caffe weight compatibility
        # (senet.py:364-367)
        layer0=seq(conv2d(3, 64, 7, 2, 3), bn2d(64), relu(),
                   maxpool(3, 2, 0, ceil_mode=True)),
        layer1=_se_stage(64, 64, layers[0], 1, groups, variant),
        layer2=_se_stage(256, 128, layers[1], 2, groups, variant),
        layer3=_se_stage(512, 256, layers[2], 2, groups, variant),
        layer4=_se_stage(1024, 512, layers[3], last_stride, groups, variant),
        pool=global_avgpool(),
        head=classifier_head(2048, num_classes, fc_dims),
    )


def se_resnet50(nc): return _senet(nc, [3, 4, 6, 3], 1, "resnet")
def se_resnet101(nc): return _senet(nc, [3, 4, 23, 3], 1, "resnet")
def se_resnet50_fc512(nc): return _senet(nc, [3, 4, 6, 3], 1, "resnet",
                                         fc_dims=(512,), last_stride=1)
def se_resnext50_32x4d(nc): return _senet(nc, [3, 4, 6, 3], 32, "resnext")
def se_resnext101_32x4d(nc): return _senet(nc, [3, 4, 23, 3], 32, "resnext")
