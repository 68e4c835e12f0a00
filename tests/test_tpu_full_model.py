"""On-hardware certification of the COMPOSED flagship EDITOR
(round-4 verdict missing #1 / next-round task 2).

Every golden-parity proof in this suite runs the CPU/XLA fallback; the
SHIPPED TPU path — Pallas bf16 kernels + COMPACT_TAIL + rollout spill
fused into ONE graph — was previously TPU-tested only kernel-by-kernel
(tests/test_pallas_tpu.py) and then merely *timed* by bench.py, and the
repo's own history shows full-graph-only failure modes (a masked kernel
valid standalone but exceeding scoped VMEM inside the full graph,
BASELINE.md). These tests run the FULL flagship model on the real chip:

  (a) eval features vs the CPU fp32 oracle (bf16 tolerance, PARITY.md);
  (b) train steps (remat on): loss trajectory vs CPU, finite params;
  (c) the separable-identities learning proof (mAP >= 0.9, mirroring
      tests/test_cli.py::test_cli_train_learns_synthetic_identities) with
      the shipped bf16 hardware path.

Gated exactly like tests/test_pallas_tpu.py — run on the chip via
``scripts/test_tpu.sh`` (EDITOR_TPU_TEST_TPU=1). The CPU oracle runs in a
subprocess (tests/tpu_oracle_worker.py) because the TPU process's
platform is pinned to the chip. Reference role: the golden suite
(tests/test_golden_parity.py) extended to the shipped hardware path;
reference engine/processor.py:23-214 (the training run on real
accelerators is the reference's raison d'être).
"""

from __future__ import annotations

import os
import os.path as osp
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(not on_tpu, reason="needs a TPU backend")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """CPU fp32 oracle computed in a subprocess (platform-pinned process
    cannot host both backends)."""
    out = str(tmp_path_factory.mktemp("oracle") / "oracle.npz")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("EDITOR_TPU_TEST_TPU", None)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, osp.join("tests", "tpu_oracle_worker.py"), out],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True,
        timeout=3600)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return np.load(out)


def test_full_eval_features_on_chip_match_cpu_oracle(oracle):
    """(a) The shipped eval path — full flagship EDITOR, Pallas kernels,
    bf16 inputs, COMPACT_TAIL, rollout spill, one jitted graph — must
    reproduce the CPU fp32 XLA oracle's features within the documented
    bf16 tolerance (PARITY.md 'On-hardware certification'). Retrieval
    consumes feature DIRECTIONS, so the contract is per-row cosine."""
    from __graft_entry__ import _flagship_cfg
    from editor_tpu.models import editor_apply, editor_init
    from tests.tpu_oracle_worker import eval_inputs

    ecfg = _flagship_cfg(use_pallas=True)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)
    images, cams = eval_inputs(jnp.bfloat16)  # the shipped serving dtype
    feat, _ = jax.jit(
        lambda p, s, im, c: editor_apply(p, s, ecfg, im, cam_ids=c,
                                         training=False))(
        params, state, images, cams)
    got = np.asarray(feat, np.float32)
    ref = oracle["feat"]
    assert got.shape == ref.shape
    assert np.isfinite(got).all()

    def rownorm(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    cos = np.sum(rownorm(got) * rownorm(ref), axis=1)
    rel_l2 = (np.linalg.norm(got - ref, axis=1)
              / np.linalg.norm(ref, axis=1))
    assert cos.min() >= 0.99, (cos, rel_l2)
    assert rel_l2.max() <= 0.08, (cos, rel_l2)


def test_full_train_steps_on_chip_match_cpu_oracle(oracle):
    """(b) Two full train steps (fwd+loss+bwd+SGD, block remat — the
    shipped bf16 training graph) on the chip: the loss trajectory must
    track the CPU fp32 oracle within the documented tolerance and the
    updated parameters must stay finite."""
    from editor_tpu.engine import build_train_step
    from editor_tpu.engine.train import TrainState
    from tests.tpu_oracle_worker import (TRAIN_STEPS, flagship_train_setup,
                                         train_batch)

    ecfg, cfg, opt, loss_func, lr_fn, state, params = (
        flagship_train_setup(use_pallas=True))
    state = TrainState(params=params, opt_state=opt.init(params),
                       model_state=state.model_state, rng=state.rng,
                       step=state.step)
    step = build_train_step(ecfg, opt, loss_func, lr_fn,
                            cfg.SOLVER.BASE_LR,
                            compute_dtype=jnp.bfloat16, donate=True)
    batch = train_batch(jnp.bfloat16)
    epoch = jnp.asarray(1)
    losses, accs = [], []
    for _ in range(TRAIN_STEPS):
        state, metrics = step(state, batch, epoch)
        losses.append(float(metrics["loss"]))
        accs.append(float(metrics["acc"]))

    ref_losses = oracle["losses"]
    assert all(np.isfinite(losses)), losses
    for i, (got, ref) in enumerate(zip(losses, ref_losses)):
        tol = 0.03 * max(1.0, abs(ref))
        assert abs(got - ref) <= tol, (
            f"step {i}: TPU loss {got} vs CPU oracle {ref} (tol {tol}); "
            f"full trajectories {losses} vs {list(ref_losses)}")

    gnorm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(state.params))))
    assert np.isfinite(gnorm)
    # the post-step parameter magnitude tracks the oracle's (a diverging
    # or NaN-poisoned update would move it): bf16 grads vs fp32
    assert abs(gnorm - float(oracle["param_gnorm"])) <= (
        0.02 * float(oracle["param_gnorm"])), (
        gnorm, float(oracle["param_gnorm"]))


# ---------------------------------------------------------------------------
# (c) learning proof on the chip
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def separable_root(tmp_path_factory):
    """Same strongly-separable synthetic identities as
    tests/test_cli.py::separable_root (kept in sync by construction: same
    seeds, same layout)."""
    from PIL import Image
    root = str(tmp_path_factory.mktemp("learndata_tpu"))
    base = osp.join(root, "RGBNT201")
    n_pid = 8
    protos = {}
    for pid in range(n_pid):
        rng = np.random.RandomState(1000 + pid)
        img = np.zeros((64, 32, 3), np.float32)
        img[..., :] = rng.randint(0, 255, (3,))
        r0, c0 = rng.randint(0, 48), rng.randint(0, 24)
        img[r0:r0 + 16, c0:c0 + 8] = rng.randint(0, 255, (3,))
        protos[pid] = img
    idx = 0
    for split, per_cam in (("train_171", 2), ("test", 2)):
        for pid in range(n_pid):
            for cam in (1, 2):
                for k in range(per_cam):
                    noisy = np.clip(protos[pid] + np.random.RandomState(
                        idx).randn(64, 32, 3) * 8, 0, 255).astype(np.uint8)
                    name = f"{pid:06d}_cam{cam}_{idx}.jpg"
                    for mod in ("RGB", "NI", "TI"):
                        p = osp.join(base, split, mod, name)
                        os.makedirs(osp.dirname(p), exist_ok=True)
                        Image.fromarray(noisy).save(p)
                    idx += 1
    return root


def test_learning_proof_on_chip(separable_root, tmp_path):
    """(c) The end-to-end LEARNING proof on the real chip with the SHIPPED
    hardware path (bf16 compute, Pallas kernels engaged wherever the model
    uses them): mAP on separable synthetic identities must reach >= 0.9
    and clearly beat the untrained model — the strongest trainability
    claim available in a dataset-free environment, now certified on
    hardware (mirrors tests/test_cli.py::
    test_cli_train_learns_synthetic_identities, which runs fp32/CPU)."""
    common = [
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "INPUT.RE_PROB", "0.0",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", separable_root,
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "bfloat16",  # the shipped hardware dtype
        "TPU.MESH_DATA", "1",
    ]
    from editor_tpu.cli.test import main as test_main
    _, mAP_untrained = test_main(common + [
        "TEST.IMS_PER_BATCH", "8",
        "SOLVER.SEED", "3",
        "OUTPUT_DIR", str(tmp_path / "untrained"),
    ])

    from editor_tpu.cli.train import main as train_main
    result = train_main(common + [
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "30",
        "SOLVER.WARMUP_ITERS", "2",
        "SOLVER.EVAL_PERIOD", "10",
        "SOLVER.CHECKPOINT_PERIOD", "30",
        "SOLVER.LOG_PERIOD", "4",
        "SOLVER.SEED", "3",
        "OUTPUT_DIR", str(tmp_path / "trained"),
    ])
    mAP = result["best"]["mAP"]
    assert mAP >= 0.9, (mAP, mAP_untrained)
    assert mAP > mAP_untrained + 0.2, (mAP, mAP_untrained)
