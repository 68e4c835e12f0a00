"""LR-schedule golden parity vs the reference timm CosineLRScheduler.

Compares editor_tpu.solver.schedule against the actual reference classes
(reference solver/cosine_lr.py:67-94, solver/scheduler.py:87-107) across the
full option surface — t_mul restarts, decay_rate, cycle_limit (incl. 0 =
unlimited), warmup_prefix, and the epoch-scalar LR noise — not just the
factory's hardwired configuration.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")


def _ref_sched(torch, **kw):
    from solver.cosine_lr import CosineLRScheduler

    opt = torch.optim.SGD(
        [torch.nn.Parameter(torch.zeros(1))], lr=kw.pop("base_lr"))
    return CosineLRScheduler(opt, **kw), opt


CONFIGS = [
    # the shipped factory configuration (scheduler_factory.py:15-29)
    dict(base_lr=0.008, t_initial=60, lr_min=8e-6, decay_rate=0.1,
         warmup_t=10, warmup_lr_init=8e-5, cycle_limit=1),
    # restarts: unlimited cycles, geometric growth
    dict(base_lr=0.1, t_initial=10, lr_min=1e-4, decay_rate=0.5,
         warmup_t=3, warmup_lr_init=1e-3, cycle_limit=0, t_mul=2.0),
    # shrinking cycles, finite limit, warmup_prefix
    dict(base_lr=0.02, t_initial=12, lr_min=1e-5, decay_rate=0.8,
         warmup_t=5, warmup_lr_init=2e-4, cycle_limit=3, t_mul=1.5,
         warmup_prefix=True),
    # no warmup, pure cosine with hard restarts
    dict(base_lr=0.05, t_initial=7, lr_min=0.0, decay_rate=1.0,
         warmup_t=0, warmup_lr_init=0.0, cycle_limit=0),
]


@pytest.mark.parametrize("kw", CONFIGS, ids=range(len(CONFIGS)))
def test_cosine_schedule_matches_reference(kw):
    import torch

    from editor_tpu.solver.schedule import cosine_lr_schedule

    ref, _ = _ref_sched(torch, **{k: v for k, v in kw.items()})
    horizon = 4 * kw["t_initial"] + kw["warmup_t"] + 2
    for t in range(horizon):
        want = ref._get_lr(t)[0]
        got = float(cosine_lr_schedule(
            t,
            base_lr=kw["base_lr"],
            t_initial=kw["t_initial"],
            lr_min=kw["lr_min"],
            warmup_t=kw["warmup_t"],
            warmup_lr_init=kw["warmup_lr_init"],
            decay_rate=kw.get("decay_rate", 0.1),
            cycle_limit=kw.get("cycle_limit", 1),
            t_mul=kw.get("t_mul", 1.0),
            warmup_prefix=kw.get("warmup_prefix", False),
        ))
        assert got == pytest.approx(want, rel=2e-4, abs=1e-9), (t, kw)


def test_lr_noise_matches_reference():
    """Scheduler._add_noise parity: step a real torch scheduler with noise on
    and compare the post-noise group lr (reference solver/scheduler.py:69-73,
    87-107) — both the in-window and out-of-window epochs."""
    import torch

    from editor_tpu.solver.schedule import add_lr_noise, cosine_lr_schedule

    kw = dict(base_lr=0.01, t_initial=20, lr_min=1e-5, decay_rate=0.1,
              warmup_t=2, warmup_lr_init=1e-4, cycle_limit=1)
    noise = dict(noise_range_t=(5, 15), noise_pct=0.67, noise_std=1.0,
                 noise_seed=7)
    ref, opt = _ref_sched(torch, **kw, **noise)
    for t in range(20):
        ref.step(t)
        want = opt.param_groups[0]["lr"]
        base = float(cosine_lr_schedule(
            t, base_lr=kw["base_lr"], t_initial=kw["t_initial"],
            lr_min=kw["lr_min"], warmup_t=kw["warmup_t"],
            warmup_lr_init=kw["warmup_lr_init"],
            decay_rate=kw["decay_rate"], cycle_limit=kw["cycle_limit"]))
        got = add_lr_noise(base, t, **noise)
        assert got == pytest.approx(want, rel=2e-4), t
        if 5 <= t < 15:
            assert got != pytest.approx(base, rel=1e-6) or want == 0.0


def test_noise_uniform_type():
    from editor_tpu.solver.schedule import add_lr_noise

    vals = {add_lr_noise(1.0, t, noise_range_t=0, noise_pct=0.4,
                         noise_seed=3, noise_type="uniform")
            for t in range(8)}
    assert all(abs(v - 1.0) <= 0.4 + 1e-9 for v in vals)
    assert len(vals) > 1


def test_get_cycle_length_semantics():
    """cosine_lr.py:108-115: total epochs covered by N cycles — our schedule
    must hit lr_min exactly at that epoch for decay_rate=1 unlimited cycles."""
    from editor_tpu.solver.schedule import cosine_lr_schedule

    t_initial, t_mul, cycles = 8, 2.0, 3
    length = int(np.floor(-t_initial * (t_mul ** cycles - 1) / (1 - t_mul)))
    lr = float(cosine_lr_schedule(
        length, base_lr=0.1, t_initial=t_initial, lr_min=1e-3, warmup_t=0,
        warmup_lr_init=0.0, decay_rate=1.0, cycle_limit=0, t_mul=t_mul))
    # epoch `length` is the start of cycle `cycles`: cosine at phase 0
    assert lr == pytest.approx(0.1, rel=1e-4)
