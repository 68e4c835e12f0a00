"""Smoke coverage for the driver-judged artifacts.

The round driver compile-checks ``__graft_entry__.entry()`` single-chip,
executes ``dryrun_multichip`` on a virtual mesh, and runs ``bench.py`` on the
real chip — but only AFTER the round closes. These tests keep all three
surfaces green inside the suite so a regression is caught before commit, not
by the driver post-mortem. (Reference analogue: the smoke configs the torch
repo trains one iter with, SURVEY.md §4.)
"""

import os
import sys

import numpy as np
import pytest

# bench.py / __graft_entry__.py live at the repo root, which is on sys.path
# only when pytest is launched from there — derive it from this file so the
# imports below survive bare `pytest` from any cwd (advisor round-2 finding).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    import jax

    out = jax.jit(fn)(*args)
    feat = np.asarray(out)
    assert feat.shape[0] == 8 and feat.ndim == 2
    assert np.isfinite(feat).all()


@pytest.mark.slow
def test_bench_main_emits_json(capsys):
    # bench.py self-scales to B=2 / 2 iters off-TPU; the assertion is the
    # contract the driver parses: ONE line of JSON with the required keys.
    import json

    import bench
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0 and rec["train_img_per_sec"] > 0
    assert 0 < rec["vs_baseline"] < 10
    # self-certification keys (round-2 verdict task 4a)
    assert rec["model_tflop_per_image"] > 0
    assert 0 < rec["mfu"] < 1 and 0 < rec["train_mfu"] < 1
    assert rec["serving_p50_ms"] > 0 and rec["serving_p99_ms"] >= rec["serving_p50_ms"]


@pytest.mark.slow
def test_dryrun_multichip_all_flavors():
    """The third driver surface: every parallelism flavor's one-step loss
    must match the single-device reference (asserted inside dryrun itself).
    conftest already pins the 8-device virtual CPU mesh, so this runs
    inline (no re-exec)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
