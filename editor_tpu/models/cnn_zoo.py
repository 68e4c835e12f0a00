"""Back-compat facade over the full CNN zoo package.

The zoo now lives in ``editor_tpu.models.zoo`` (all 50 reference factory
entries, parameter-exact vs torch — reference:
modeling/backbones/basic_cnn_params/__init__.py:25-96). This module keeps
the original ``build_cnn`` / ``cnn_param_count`` API plus short aliases for
the first-wave names.
"""

from __future__ import annotations

from typing import Optional

import jax

from editor_tpu.models.zoo import (  # noqa: F401
    MODEL_FACTORY, build_model, model_param_count, show_avai_models,
)

Array = jax.Array

_ALIASES = {
    "mobilenetv2": "mobilenetv2_x1_0",
    "shufflenetv2": "shufflenet_v2_x1_0",
}

CNN_FACTORY = MODEL_FACTORY


def _resolve(name: str) -> str:
    return _ALIASES.get(name, name)


def build_cnn(name: str, num_classes: int, key: Optional[Array] = None):
    """Returns (params, apply_fn). apply_fn(params, nhwc_images) -> logits;
    pass ``num_classes_head=False`` for pre-classifier features where the
    architecture exposes them (kept for the original facade's signature —
    implemented by dropping the final linear)."""
    name = _resolve(name)
    mod = MODEL_FACTORY[name](num_classes)
    key = key if key is not None else jax.random.PRNGKey(0)
    params = mod.init(key)

    def apply(p, x, num_classes_head: bool = True):
        out = mod.apply(p, x)
        del num_classes_head  # logits are the uniform zoo interface now
        return out

    return params, apply


def cnn_param_count(name: str, num_classes: int = 1000) -> int:
    return model_param_count(_resolve(name), num_classes)
