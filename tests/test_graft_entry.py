"""Smoke coverage for the driver-judged artifacts.

The round driver compile-checks ``__graft_entry__.entry()`` single-chip,
executes ``dryrun_multichip`` on a virtual mesh, and runs ``bench.py`` on the
real chip — but only AFTER the round closes. These tests keep the same
surfaces green inside the suite so a regression is caught before commit, not
by the driver post-mortem. (Reference analogue: the smoke configs the torch
repo trains one iter with, SURVEY.md §4.)
"""

import sys

import numpy as np
import pytest


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

    sys.path.insert(0, ".")
    try:
        import bench
    finally:
        sys.path.pop(0)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0 and rec["train_img_per_sec"] > 0
    assert 0 < rec["vs_baseline"] < 10
