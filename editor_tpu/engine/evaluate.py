"""Inference / evaluation engine.

reference: engine/processor.py:217-270 (``do_inference``): batched feature
extraction (eval forward returns the M*dim ``cls4t`` embedding,
make_model.py:214-258) feeding the R1_mAP evaluator.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from editor_tpu.evals.metrics import R1mAPEvaluator
from editor_tpu.models.editor import EditorConfig, editor_apply

Array = jax.Array


def build_eval_step(ecfg: EditorConfig, compute_dtype=jnp.bfloat16,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Returns extract(params, model_state, batch) -> [B, M*dim] features."""

    tp_mesh = (mesh if mesh is not None
               and mesh.shape.get("model", 1) > 1 else None)

    def eval_fn(params, model_state, batch):
        images = {k: batch[k].astype(compute_dtype)
                  for k in ("RGB", "NI", "TI") if k in batch}
        feat, _ = editor_apply(params, model_state, ecfg, images,
                               cam_ids=batch.get("camid"), training=False,
                               tp_mesh=tp_mesh)
        return feat.astype(jnp.float32)

    if mesh is not None:
        data = NamedSharding(mesh, P("data"))
        # params keep their committed shardings (replicated or Megatron-TP)
        return jax.jit(eval_fn, in_shardings=(None, None, data),
                       out_shardings=data)
    return jax.jit(eval_fn)


def do_inference(
    params: dict,
    model_state: dict,
    ecfg: EditorConfig,
    val_loader: Iterable,
    num_query: int,
    feat_norm: bool = True,
    reranking: bool = False,
    msvr_protocol: bool = False,
    compute_dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
):
    """Extract features for the query+gallery set and compute CMC/mAP.

    val_loader yields dict batches with 'RGB','NI','TI','pid','camid'
    (+ 'sceneid' for MSVR310).
    """
    evaluator = R1mAPEvaluator(num_query, feat_norm=feat_norm,
                               reranking=reranking,
                               msvr_protocol=msvr_protocol)
    step = build_eval_step(ecfg, compute_dtype, mesh)
    for batch in val_loader:
        feat = step(params, model_state, batch)
        evaluator.update(np.asarray(feat), batch["pid"], batch["camid"],
                         batch.get("sceneid"))
    return evaluator.compute()
