"""Scheduler parity vs torch StepLR / CosineAnnealingWarmRestarts."""

import numpy as np
import pytest

from retinex_tpu.train.schedules import cosine_warm_restarts, step_decay


def test_step_decay_matches_torch():
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-4)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=30, gamma=0.5)
    ours = step_decay(1e-4, 30, 0.5)
    for epoch in range(100):
        want = opt.param_groups[0]["lr"]
        got = float(ours(epoch))
        assert got == pytest.approx(want, rel=1e-6), epoch
        opt.step()
        sched.step()


def test_cosine_warm_restarts_matches_torch():
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2, eta_min=1e-6
    )
    ours = cosine_warm_restarts(1e-4, t_0=10, t_mult=2, eta_min=1e-6)
    for epoch in range(100):
        want = opt.param_groups[0]["lr"]
        got = float(ours(epoch))
        assert got == pytest.approx(want, rel=1e-4, abs=1e-9), epoch
        opt.step()
        sched.step()
