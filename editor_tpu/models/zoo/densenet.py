"""DenseNet 121/169/201/161 (+121_fc512).

reference: modeling/backbones/basic_cnn_params/densenet.py (torchvision
DenseNet: BN-ReLU-Conv1x1 -> BN-ReLU-Conv3x3 dense layers, half-channel
transitions, final BN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editor_tpu.models.zoo.common import (
    Module, avgpool, bn2d, classifier_head, conv2d, global_avgpool, maxpool,
    named, relu, seq,
)


def _dense_layer(cin, growth, bn_size=4) -> Module:
    return seq(bn2d(cin), relu(), conv2d(cin, bn_size * growth, 1),
               bn2d(bn_size * growth), relu(),
               conv2d(bn_size * growth, growth, 3, 1, 1))


def _dense_block(cin, layers, growth) -> Module:
    mods = [_dense_layer(cin + i * growth, growth) for i in range(layers)]

    def init(key):
        return [m.init(k) for m, k in zip(mods, jax.random.split(key,
                                                                 len(mods)))]

    def apply(p, x):
        for m, mp in zip(mods, p):
            x = jnp.concatenate([x, m.apply(mp, x)], axis=-1)
        return x

    return Module(init, apply)


def _transition(cin, cout) -> Module:
    return seq(bn2d(cin), relu(), conv2d(cin, cout, 1), avgpool(2, 2))


def densenet(num_classes, init_features, growth, block_config,
             fc_dims=()) -> Module:
    mods = [seq(conv2d(3, init_features, 7, 2, 3), bn2d(init_features),
                relu(), maxpool(3, 2, 1))]
    c = init_features
    for i, n in enumerate(block_config):
        mods.append(_dense_block(c, n, growth))
        c += n * growth
        if i != len(block_config) - 1:
            mods.append(_transition(c, c // 2))
            c //= 2
    mods.append(seq(bn2d(c), relu()))
    return named(features=seq(*mods), pool=global_avgpool(),
                 head=classifier_head(c, num_classes, fc_dims))


def densenet121(nc): return densenet(nc, 64, 32, (6, 12, 24, 16))
def densenet169(nc): return densenet(nc, 64, 32, (6, 12, 32, 32))
def densenet201(nc): return densenet(nc, 64, 32, (6, 12, 48, 32))
def densenet161(nc): return densenet(nc, 96, 48, (6, 12, 36, 24))
def densenet121_fc512(nc): return densenet(nc, 64, 32, (6, 12, 24, 16),
                                           fc_dims=(512,))
