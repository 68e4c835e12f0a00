from editor_tpu.evals.metrics import (  # noqa: F401
    R1mAPEvaluator,
    cmc_map,
    cmc_map_msvr,
    euclidean_distmat,
)
from editor_tpu.evals.reranking import k_reciprocal_rerank  # noqa: F401
