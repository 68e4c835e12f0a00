"""Import torch CNN-zoo checkpoints into editor_tpu zoo params.

Loads a torch ``state_dict`` from any of the 50 reference factory entries
(reference: modeling/backbones/basic_cnn_params/__init__.py:25-96) into the
matching ``editor_tpu.models.zoo`` parameter pytree, so torchreid/ImageNet
checkpoints run unchanged on TPU.

How it works — generic ordered-structural zip, no per-architecture tables:
a torch ``state_dict`` iterates in module-registration order (depth-first,
parameters before buffers per module), which is exactly the zoo DSL's build
order for every transcribed architecture. Tensors are grouped per torch
leaf module and emitted in the DSL's canonical slot order (BN: mean, var,
weight, bias), with the layout transforms the two conventions differ by:

- Conv2d ``weight``  OIHW  -> HWIO      (transpose 2,3,1,0)
- Linear ``weight``  [out,in] -> [in,out] (transpose)
- BatchNorm/InstanceNorm/LayerNorm vectors and bare ``nn.Parameter``s: as-is
- ``num_batches_tracked``: dropped (no DSL equivalent)

Any order or shape divergence fails loudly at zip time; silent
misassignment between shape-coincident siblings is excluded by the golden
forward-parity tests (tests/test_zoo_golden.py), which compare features
against the actual reference torch models at f64.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Iterator, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["load_torch_zoo_state", "ordered_leaf_paths"]

Path = Tuple[Any, ...]


def ordered_leaf_paths(tree: Any, path: Path = ()) -> Iterator[Tuple[Path, Any]]:
    """Yield (path, leaf) in DSL build order (dict insertion order — the
    order ``Module.init`` created the entries — not the sorted order JAX
    pytree flattening would use)."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from ordered_leaf_paths(v, path + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from ordered_leaf_paths(v, path + (i,))
    elif tree is None:
        return
    else:
        yield path, tree


def _group_by_module(keys: Sequence[str]) -> List[Tuple[str, List[str]]]:
    """Group consecutive state_dict keys sharing a module prefix."""
    groups: List[Tuple[str, List[str]]] = []
    for key in keys:
        prefix, _, leaf = key.rpartition(".")
        if groups and groups[-1][0] == prefix:
            groups[-1][1].append(leaf)
        else:
            groups.append((prefix, [leaf]))
    return groups


def _canonical_stream(
    state: Dict[str, np.ndarray],
) -> Iterator[Tuple[str, np.ndarray]]:
    """Emit (torch_name, transformed_array) in DSL slot order."""
    state = {k: np.asarray(v) for k, v in state.items()}
    for prefix, leaves in _group_by_module(list(state)):
        def arr(leaf: str) -> np.ndarray:
            return state[f"{prefix}.{leaf}" if prefix else leaf]

        def full(leaf: str) -> str:
            return f"{prefix}.{leaf}" if prefix else leaf

        if "running_mean" in leaves:
            # BatchNorm1d/2d — DSL slot order is mean, var, w, b
            # (common.py bn2d); torch registers weight, bias first.
            for leaf in ("running_mean", "running_var", "weight", "bias"):
                if leaf in leaves:
                    yield full(leaf), arr(leaf)
            continue
        for leaf in leaves:
            if leaf == "num_batches_tracked":
                continue
            a = arr(leaf)
            if leaf == "weight" and a.ndim == 4:
                a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif leaf == "weight" and a.ndim == 2:
                a = a.T  # [out, in] -> [in, out]
            elif leaf not in ("weight", "bias") and a.ndim == 4:
                # bare nn.Parameter broadcast over feature maps (e.g.
                # MuDeep Fusion.a1..a4, mudeep.py:133-136): NCHW -> NHWC
                a = a.transpose(0, 2, 3, 1)
            yield full(leaf), a


def _set_in(tree: Any, path: Path, value: Any) -> None:
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def load_torch_zoo_state(params: Any, state_dict: Dict[str, Any],
                         dtype: Any = None,
                         skip_keys: Sequence[str] = ()) -> Any:
    """Return a copy of ``params`` with every leaf replaced by the
    corresponding tensor of ``state_dict`` (values may be torch tensors or
    numpy arrays). ``dtype=None`` keeps the checkpoint's dtype.

    Storage-aliased duplicates are dropped automatically, keeping the
    *later* key: models like CAL register the same backbone twice (``base``
    plus per-stage ``base_1..base_5`` views, reference cal.py:276-295), and
    the later registration follows the forward/build order. ``skip_keys``
    drops tensors with no DSL slot — frozen all-zero BN biases
    (``bias.requires_grad_(False)``, reference cal.py:263) which the DSL
    models as ``bn2d(bias=False)``."""
    # alias detection must happen on the torch tensors (numpy conversion
    # hides storage identity)
    drop = set(skip_keys)
    seen: Dict[Tuple[int, Tuple[int, ...]], str] = {}
    for k, v in state_dict.items():
        if hasattr(v, "data_ptr"):
            sig = (v.data_ptr(), tuple(v.shape))
            if sig in seen:
                drop.add(seen[sig])  # keep the later registration
            seen[sig] = k
    state = {}
    for k, v in state_dict.items():
        if k in drop:
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        state[k] = np.asarray(v)

    leaves = list(ordered_leaf_paths(params))
    stream = list(_canonical_stream(state))
    if len(leaves) != len(stream):
        raise ValueError(
            f"leaf count mismatch: params have {len(leaves)} slots, "
            f"state_dict provides {len(stream)} tensors")

    out = copy.deepcopy(params)
    for (path, cur), (tname, arr) in zip(leaves, stream):
        if tuple(cur.shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(map(str, path))} "
                f"(ours {tuple(cur.shape)}) vs torch {tname!r} "
                f"({tuple(arr.shape)}) — build/registration order diverged")
        _set_in(out, path, jnp.asarray(arr, dtype=dtype))
    return out
