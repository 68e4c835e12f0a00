"""ResNet family: resnet18/34/50/101/152, ResNeXt, fc512, IBN-a/b, PCB,
resnet50mid.

reference: modeling/backbones/basic_cnn_params/{resnet,resnet_ibn_a,
resnet_ibn_b,pcb,resnetmid}.py. Exact parameter structure (verified against
torch counts in tests/test_cnn_zoo.py); runnable NHWC inference.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, bn2d, classifier_head, conv2d, fn_module, global_avgpool, in2d,
    linear, maxpool, named, relu, residual, seq,
)

Array = jax.Array


def _basic_block(cin, planes, stride=1):
    body = seq(conv2d(cin, planes, 3, stride, 1), bn2d(planes), relu(),
               conv2d(planes, planes, 3, 1, 1), bn2d(planes))
    down = None
    if stride != 1 or cin != planes:
        down = seq(conv2d(cin, planes, 1, stride), bn2d(planes))
    return residual(body, down)


def _ibn_norm(planes: int) -> Module:
    """IBN-a split norm: IN on the first half, BN on the rest
    (reference resnet_ibn_a.py:63-78)."""
    half = planes // 2
    inm, bnm = in2d(half, affine=True), bn2d(planes - half)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"IN": inm.init(k1), "BN": bnm.init(k2)}

    def apply(p, x):
        return jnp.concatenate([inm.apply(p["IN"], x[..., :half]),
                                bnm.apply(p["BN"], x[..., half:])], axis=-1)

    return Module(init, apply)


def _bottleneck(cin, planes, stride=1, groups=1, base_width=64,
                ibn: str = "", post_in: bool = False):
    """torchvision Bottleneck (stride on conv2); ibn='a' swaps bn1 for the
    IBN split; post_in appends IN(out) after the residual add (IBN-b)."""
    width = int(planes * (base_width / 64.0)) * groups
    n1 = _ibn_norm(width) if ibn == "a" else bn2d(width)
    body = seq(conv2d(cin, width, 1), n1, relu(),
               conv2d(width, width, 3, stride, 1, groups=groups), bn2d(width),
               relu(), conv2d(width, planes * 4, 1), bn2d(planes * 4))
    down = None
    if stride != 1 or cin != planes * 4:
        down = seq(conv2d(cin, planes * 4, 1, stride), bn2d(planes * 4))
    if not post_in:
        return residual(body, down)
    # IBN-b: IN on the PRE-relu residual sum, then one relu
    # (resnet_ibn_b.py:104-110: out += residual; out = IN(out); relu(out))
    block = residual(body, down, post=lambda y: y)
    post = in2d(planes * 4, affine=True)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"blk": block.init(k1), "IN": post.init(k2)}

    def apply(p, x):
        y = block.apply(p["blk"], x)  # pre-relu sum
        return jax.nn.relu(post.apply(p["IN"], y))

    return Module(init, apply)


def _stage(cin, planes, blocks, stride, groups=1, base_width=64,
           block="bottleneck", ibn="", last_in=False) -> Module:
    mods, c = [], cin
    for i in range(blocks):
        s = stride if i == 0 else 1
        if block == "basic":
            mods.append(_basic_block(c, planes, s))
            c = planes
        else:
            mods.append(_bottleneck(
                c, planes, s, groups, base_width, ibn=ibn,
                post_in=last_in and i == blocks - 1))
            c = planes * 4
    return seq(*mods)


def _resnet(num_classes, layers: Sequence[int], block="bottleneck",
            groups=1, base_width=64, fc_dims=(), last_stride=2,
            ibn: str = "", stem_in: bool = False) -> Module:
    exp = 1 if block == "basic" else 4
    feature = 512 * exp
    stem_norm = in2d(64, affine=True) if stem_in else bn2d(64)
    # IBN-a applies to stages with planes != 512 (resnet_ibn_a.py:198-200);
    # IBN-b puts a trailing IN on layer1 and layer2 (resnet_ibn_b.py:142-153)
    return named(
        stem=seq(conv2d(3, 64, 7, 2, 3), stem_norm, relu(),
                 maxpool(3, 2, 1)),
        layer1=_stage(64, 64, layers[0], 1, groups, base_width, block,
                      ibn=ibn, last_in=stem_in),
        layer2=_stage(64 * exp, 128, layers[1], 2, groups, base_width, block,
                      ibn=ibn, last_in=stem_in),
        layer3=_stage(128 * exp, 256, layers[2], 2, groups, base_width,
                      block, ibn=ibn),
        layer4=_stage(256 * exp, 512, layers[3], last_stride, groups,
                      base_width, block),
        pool=global_avgpool(),
        head=classifier_head(feature, num_classes, fc_dims),
    )


def resnet18(nc): return _resnet(nc, [2, 2, 2, 2], "basic")
def resnet34(nc): return _resnet(nc, [3, 4, 6, 3], "basic")
def resnet50(nc): return _resnet(nc, [3, 4, 6, 3])
def resnet101(nc): return _resnet(nc, [3, 4, 23, 3])
def resnet152(nc): return _resnet(nc, [3, 8, 36, 3])
def resnext50_32x4d(nc): return _resnet(nc, [3, 4, 6, 3], groups=32,
                                        base_width=4)
def resnext101_32x8d(nc): return _resnet(nc, [3, 4, 23, 3], groups=32,
                                         base_width=8)
def resnet50_fc512(nc): return _resnet(nc, [3, 4, 6, 3], fc_dims=(512,),
                                       last_stride=1)
def resnet50_ibn_a(nc): return _resnet(nc, [3, 4, 6, 3], ibn="a")
def resnet50_ibn_b(nc): return _resnet(nc, [3, 4, 6, 3], stem_in=True)


def pcb(num_classes, parts: int, reduced_dim: int = 256) -> Module:
    """Part-based Convolutional Baseline (reference pcb.py:16-56):
    resnet50 last_stride=1, part-wise pooling, shared 1x1 dim-reduce,
    per-part classifiers."""
    trunk = named(
        stem=seq(conv2d(3, 64, 7, 2, 3), bn2d(64), relu(), maxpool(3, 2, 1)),
        layer1=_stage(64, 64, 3, 1), layer2=_stage(256, 128, 4, 2),
        layer3=_stage(512, 256, 6, 2), layer4=_stage(1024, 512, 3, 1),
    )
    reduce = seq(conv2d(2048, reduced_dim, 1), bn2d(reduced_dim), relu())
    heads = [linear(reduced_dim, num_classes) for _ in range(parts)]

    def init(key):
        ks = jax.random.split(key, 2 + parts)
        return {"trunk": trunk.init(ks[0]), "reduce": reduce.init(ks[1]),
                "heads": [h.init(k) for h, k in zip(heads, ks[2:])]}

    def apply(p, x):
        y = trunk.apply(p["trunk"], x)          # [B, H, W, 2048]
        B, H, W, C = y.shape
        # AdaptiveAvgPool2d((parts, 1)) over [H, W]
        ph = H // parts
        y = y[:, :ph * parts].reshape(B, parts, ph, W, C).mean(axis=(2, 3))
        y = y[:, :, None, :]                    # [B, parts, 1, C]
        g = reduce.apply(p["reduce"], y)        # [B, parts, 1, reduced]
        outs = [h.apply(hp, g[:, i, 0]) for i, (h, hp)
                in enumerate(zip(heads, p["heads"]))]
        return jnp.stack(outs, axis=1)          # [B, parts, nc]

    return Module(init, apply)


def pcb_p6(nc): return pcb(nc, parts=6)
def pcb_p4(nc): return pcb(nc, parts=4)


def resnet50mid(num_classes) -> Module:
    """resnet50 + mid-level feature fusion (reference resnetmid.py:108-290):
    layer4's three block outputs pooled; first two concat -> fc_fusion[1024];
    final feature = [fused, v4c] (3072-d)."""
    trunk = named(
        stem=seq(conv2d(3, 64, 7, 2, 3), bn2d(64), relu(), maxpool(3, 2, 1)),
        layer1=_stage(64, 64, 3, 1), layer2=_stage(256, 128, 4, 2),
        layer3=_stage(512, 256, 6, 2),
    )
    l4a = _bottleneck(1024, 512, 2)
    l4b = _bottleneck(2048, 512, 1)
    l4c = _bottleneck(2048, 512, 1)
    fusion = seq(linear(4096, 1024), bn2d(1024), relu())
    head = linear(3072, num_classes)

    def init(key):
        ks = jax.random.split(key, 6)
        return {"trunk": trunk.init(ks[0]), "l4a": l4a.init(ks[1]),
                "l4b": l4b.init(ks[2]), "l4c": l4c.init(ks[3]),
                "fusion": fusion.init(ks[4]), "head": head.init(ks[5])}

    def apply(p, x):
        y = trunk.apply(p["trunk"], x)
        a = l4a.apply(p["l4a"], y)
        b = l4b.apply(p["l4b"], a)
        c = l4c.apply(p["l4c"], b)
        va, vb, vc = (jnp.mean(t, axis=(1, 2)) for t in (a, b, c))
        fused = fusion.apply(p["fusion"], jnp.concatenate([va, vb], -1))
        v = jnp.concatenate([fused, vc], -1)
        return head.apply(p["head"], v)

    return Module(init, apply)
