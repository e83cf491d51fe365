"""LR schedule parity vs torch's schedulers (optim.py semantics contract)."""

import numpy as np
import pytest
import torch

from gabril_carla_tpu.train.optim import _schedule

SPE = 10  # steps per epoch
LR = 1e-3


def run_sched(kind, epochs=20, **kw):
    cfg_s = {"type": kind, "step_size": 5, "gamma": 0.5, "eta_min": 1e-6,
             "warmup_steps": 30, "T_0": 4, "T_mult": 1, "pct_start": 0.3,
             "div_factor": 25.0, "final_div_factor": 1e4}
    cfg_s.update(kw)
    fn = _schedule(cfg_s, {"epochs": epochs}, LR, SPE)
    if callable(fn):
        return np.asarray([float(fn(i)) for i in range(epochs * SPE)])
    return np.full(epochs * SPE, fn)


def torch_lrs(make, epochs=20, per_batch=False):
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=LR)
    sched = make(opt)
    out = []
    for e in range(epochs):
        for b in range(SPE):
            out.append(opt.param_groups[0]["lr"])
            opt.step()
            if per_batch:
                sched.step()
        if not per_batch:
            sched.step()
    return np.asarray(out)


def test_step_schedule_matches_steplr():
    ours = run_sched("step")
    theirs = torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=5, gamma=0.5))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_cosine_schedule_matches_cosineannealing():
    ours = run_sched("cosine")
    theirs = torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=20, eta_min=1e-6))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_cosine_warmup_shape():
    lrs = run_sched("cosine_warmup")
    assert lrs[0] == 0.0
    assert abs(lrs[30] - LR) < 1e-9  # warmup peak at warmup_steps
    assert lrs[-1] < 2e-5  # decayed near eta_min
    assert np.all(np.diff(lrs[:30]) > 0)


def test_warm_restarts_resets():
    lrs = run_sched("cosine_warm_restarts")
    # period T_0=4 epochs = 40 steps: lr back near peak right after restart
    assert abs(lrs[40] - LR) / LR < 0.05
    assert lrs[39] < 0.1 * LR


def test_none_schedule_constant():
    lrs = run_sched("none")
    np.testing.assert_allclose(lrs, LR)
