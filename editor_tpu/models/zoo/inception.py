"""InceptionV4 and Inception-ResNet-V2.

reference: modeling/backbones/basic_cnn_params/{inceptionv4,
inceptionresnetv2}.py (pretrainedmodels ports; BasicConv2d = conv(bias=F) +
BN(eps=1e-3) + ReLU; torch uses uneven "VALID" strides — padding=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, avgpool, bn2d, classifier_head, conv2d, global_avgpool, maxpool,
    named, parallel_concat, relu, seq,
)


def _bc(cin, cout, k, s=1, p=0):
    """BasicConv2d (BN eps=0.001, reference inceptionv4.py:51)."""
    return seq(conv2d(cin, cout, k, s, p), bn2d(cout, eps=1e-3), relu())


def _residual_scaled(branches: Module, proj: Module, scale: float,
                     final_relu: bool = True) -> Module:
    """Inception-ResNet block: concat branches -> 1x1 conv (with bias) ->
    out*scale + x (inceptionresnetv2.py Block35/17/8)."""
    def init(key):
        k1, k2 = jax.random.split(key)
        return {"branches": branches.init(k1), "proj": proj.init(k2)}

    def apply(p, x):
        y = proj.apply(p["proj"], branches.apply(p["branches"], x))
        out = y * scale + x
        return jax.nn.relu(out) if final_relu else out

    return Module(init, apply)


# ---------------------------------------------------------------------------
# InceptionV4 (inceptionv4.py:37-260)
# ---------------------------------------------------------------------------

def _mixed_3a():
    return parallel_concat(maxpool(3, 2), _bc(64, 96, 3, 2))


def _mixed_4a():
    return parallel_concat(
        seq(_bc(160, 64, 1), _bc(64, 96, 3)),
        seq(_bc(160, 64, 1), _bc(64, 64, (1, 7), 1, (0, 3)),
            _bc(64, 64, (7, 1), 1, (3, 0)), _bc(64, 96, 3)))


def _mixed_5a():
    return parallel_concat(_bc(192, 192, 3, 2), maxpool(3, 2))


def _inception_a():
    return parallel_concat(
        _bc(384, 96, 1),
        seq(_bc(384, 64, 1), _bc(64, 96, 3, 1, 1)),
        seq(_bc(384, 64, 1), _bc(64, 96, 3, 1, 1), _bc(96, 96, 3, 1, 1)),
        seq(avgpool(3, 1, 1, count_include_pad=False), _bc(384, 96, 1)))


def _reduction_a():
    return parallel_concat(
        _bc(384, 384, 3, 2),
        seq(_bc(384, 192, 1), _bc(192, 224, 3, 1, 1), _bc(224, 256, 3, 2)),
        maxpool(3, 2))


def _inception_b():
    return parallel_concat(
        _bc(1024, 384, 1),
        seq(_bc(1024, 192, 1), _bc(192, 224, (1, 7), 1, (0, 3)),
            _bc(224, 256, (7, 1), 1, (3, 0))),
        seq(_bc(1024, 192, 1), _bc(192, 192, (7, 1), 1, (3, 0)),
            _bc(192, 224, (1, 7), 1, (0, 3)), _bc(224, 224, (7, 1), 1, (3, 0)),
            _bc(224, 256, (1, 7), 1, (0, 3))),
        seq(avgpool(3, 1, 1, count_include_pad=False), _bc(1024, 128, 1)))


def _reduction_b():
    return parallel_concat(
        seq(_bc(1024, 192, 1), _bc(192, 192, 3, 2)),
        seq(_bc(1024, 256, 1), _bc(256, 256, (1, 7), 1, (0, 3)),
            _bc(256, 320, (7, 1), 1, (3, 0)), _bc(320, 320, 3, 2)),
        maxpool(3, 2))


def _inception_c() -> Module:
    b0 = _bc(1536, 256, 1)
    b1_0 = _bc(1536, 384, 1)
    b1_1a = _bc(384, 256, (1, 3), 1, (0, 1))
    b1_1b = _bc(384, 256, (3, 1), 1, (1, 0))
    b2_0 = _bc(1536, 384, 1)
    b2_1 = _bc(384, 448, (3, 1), 1, (1, 0))
    b2_2 = _bc(448, 512, (1, 3), 1, (0, 1))
    b2_3a = _bc(512, 256, (1, 3), 1, (0, 1))
    b2_3b = _bc(512, 256, (3, 1), 1, (1, 0))
    b3 = seq(avgpool(3, 1, 1, count_include_pad=False), _bc(1536, 256, 1))
    subs = dict(b0=b0, b1_0=b1_0, b1_1a=b1_1a, b1_1b=b1_1b, b2_0=b2_0,
                b2_1=b2_1, b2_2=b2_2, b2_3a=b2_3a, b2_3b=b2_3b, b3=b3)

    def init(key):
        ks = jax.random.split(key, len(subs))
        return {n: m.init(k) for (n, m), k in zip(subs.items(), ks)}

    def apply(p, x):
        x0 = b0.apply(p["b0"], x)
        x1_0 = b1_0.apply(p["b1_0"], x)
        x1 = jnp.concatenate([b1_1a.apply(p["b1_1a"], x1_0),
                              b1_1b.apply(p["b1_1b"], x1_0)], -1)
        x2 = b2_2.apply(p["b2_2"], b2_1.apply(p["b2_1"],
                                              b2_0.apply(p["b2_0"], x)))
        x2 = jnp.concatenate([b2_3a.apply(p["b2_3a"], x2),
                              b2_3b.apply(p["b2_3b"], x2)], -1)
        x3 = b3.apply(p["b3"], x)
        return jnp.concatenate([x0, x1, x2, x3], -1)

    return Module(init, apply)


def inceptionv4(num_classes) -> Module:
    return named(
        features=seq(
            _bc(3, 32, 3, 2), _bc(32, 32, 3), _bc(32, 64, 3, 1, 1),
            _mixed_3a(), _mixed_4a(), _mixed_5a(),
            *[_inception_a() for _ in range(4)],
            _reduction_a(),
            *[_inception_b() for _ in range(7)],
            _reduction_b(),
            *[_inception_c() for _ in range(3)]),
        pool=global_avgpool(),
        head=classifier_head(1536, num_classes),
    )


# ---------------------------------------------------------------------------
# Inception-ResNet-V2 (inceptionresnetv2.py:37-270)
# ---------------------------------------------------------------------------

def _mixed_5b():
    return parallel_concat(
        _bc(192, 96, 1),
        seq(_bc(192, 48, 1), _bc(48, 64, 5, 1, 2)),
        seq(_bc(192, 64, 1), _bc(64, 96, 3, 1, 1), _bc(96, 96, 3, 1, 1)),
        seq(avgpool(3, 1, 1, count_include_pad=False), _bc(192, 64, 1)))


def _block35(scale):
    branches = parallel_concat(
        _bc(320, 32, 1),
        seq(_bc(320, 32, 1), _bc(32, 32, 3, 1, 1)),
        seq(_bc(320, 32, 1), _bc(32, 48, 3, 1, 1), _bc(48, 64, 3, 1, 1)))
    return _residual_scaled(branches, conv2d(128, 320, 1, bias=True), scale)


def _mixed_6a():
    return parallel_concat(
        _bc(320, 384, 3, 2),
        seq(_bc(320, 256, 1), _bc(256, 256, 3, 1, 1), _bc(256, 384, 3, 2)),
        maxpool(3, 2))


def _block17(scale):
    branches = parallel_concat(
        _bc(1088, 192, 1),
        seq(_bc(1088, 128, 1), _bc(128, 160, (1, 7), 1, (0, 3)),
            _bc(160, 192, (7, 1), 1, (3, 0))))
    return _residual_scaled(branches, conv2d(384, 1088, 1, bias=True), scale)


def _mixed_7a():
    return parallel_concat(
        seq(_bc(1088, 256, 1), _bc(256, 384, 3, 2)),
        seq(_bc(1088, 256, 1), _bc(256, 288, 3, 2)),
        seq(_bc(1088, 256, 1), _bc(256, 288, 3, 1, 1), _bc(288, 320, 3, 2)),
        maxpool(3, 2))


def _block8(scale=1.0, final_relu=True):
    branches = parallel_concat(
        _bc(2080, 192, 1),
        seq(_bc(2080, 192, 1), _bc(192, 224, (1, 3), 1, (0, 1)),
            _bc(224, 256, (3, 1), 1, (1, 0))))
    return _residual_scaled(branches, conv2d(448, 2080, 1, bias=True), scale,
                            final_relu)


def inceptionresnetv2(num_classes) -> Module:
    return named(
        features=seq(
            _bc(3, 32, 3, 2), _bc(32, 32, 3), _bc(32, 64, 3, 1, 1),
            maxpool(3, 2), _bc(64, 80, 1), _bc(80, 192, 3), maxpool(3, 2),
            _mixed_5b(),
            *[_block35(0.17) for _ in range(10)],
            _mixed_6a(),
            *[_block17(0.10) for _ in range(20)],
            _mixed_7a(),
            *[_block8(0.20) for _ in range(9)],
            _block8(1.0, final_relu=False),
            _bc(2080, 1536, 1)),
        pool=global_avgpool(),
        head=classifier_head(1536, num_classes),
    )
