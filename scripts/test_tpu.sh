#!/usr/bin/env bash
# TPU certification pass (round-4 verdict tasks 2 & 8).
#
# Runs every TPU-gated test on the REAL chip:
#   * tests/test_pallas_tpu.py       — per-kernel Pallas suites (fused
#     attention fwd/bwd, masked attention, rollout, extreme-logit guards)
#   * tests/test_tpu_full_model.py   — FULL-MODEL on-hardware certification:
#     the complete flagship EDITOR (Pallas bf16 + COMPACT_TAIL + rollout
#     spill composed into one graph) vs the CPU fp32 oracle — eval
#     features, train-step loss trajectory + finite grads, and the
#     separable-identities learning proof, at the bf16 tolerances
#     documented in PARITY.md.
#
# Takes ~30 min on a tunneled v5e (first compile of the full graph is the
# bulk). MUST own the host: no concurrent CPU suite / bench run (see
# docs/DEPLOYMENT.md §6 "Test hygiene").
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== TPU certification pass: $(python -c 'import jax; print(jax.devices())')"
EDITOR_TPU_TEST_TPU=1 python -m pytest \
    tests/test_pallas_tpu.py tests/test_tpu_full_model.py \
    -x -q "$@"
echo "== TPU certification pass: OK"
