"""Trainer window boundaries: host events (densify, eval, save, accum
clears) must land exactly where the step-at-a-time reference semantics put
them, even when steps are batched into scan windows."""

import numpy as np
import pytest

from gsplat_tpu.config import TrainConfig
from gsplat_tpu.train import Trainer

from fixtures import make_scene
from test_train_e2e import _splat


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

def test_boundaries_and_logs(tmp_path):
    make_scene(str(tmp_path / "s"), n_points=60, n_cameras=9, w=48, h=32)
    sp = _splat(str(tmp_path / "s"))
    tcfg = TrainConfig(n_iters=30, n_iters_warmup=5, n_iters_test=10,
                       n_save_train_img=0, seed=2, lr=0.01,
                       n_adaptive_control=10 ** 9,
                       exp=str(tmp_path / "exp"))
    tr = Trainer(sp, tcfg)
    logs = []
    tr.train(metrics_every=8, log=logs.append)
    # eval fired exactly at iters 10 and 20 (windows must break there)
    tests = [l for l in logs if l.startswith("TEST")]
    assert len(tests) == 2 and "@10" in tests[0] and "@20" in tests[1]
    iters = [int(l.split("iter ")[1].split(":")[0]) for l in logs
             if l.startswith("iter")]
    assert iters[-1] == 29
    assert 10 in iters and 20 in iters  # boundary windows end on event iters


def test_densify_boundary_in_windowed_loop(tmp_path):
    make_scene(str(tmp_path / "s"), n_points=60, n_cameras=5, w=48, h=32)
    sp = _splat(str(tmp_path / "s"))
    # n_adaptive_control=5 with iters>600 triggers densify inside train()
    tcfg = TrainConfig(n_iters=0, n_iters_warmup=5, n_iters_test=0,
                       n_save_train_img=0, seed=2, lr=0.01,
                       n_adaptive_control=5, grad_thresh=1e-8,
                       split_thresh=0.01, use_split=True)
    tr = Trainer(sp, tcfg)
    n0 = int(sp.table.n_live)
    # windowed run crossing a densify boundary (iters 601..612)
    tr.train_window(601, 604)
    tr._post_step(605)  # emulate loop boundary for 605
    tr.train_window(606, 610)
    n1 = int(tr.splat.table.n_live)
    assert n1 != n0
    assert np.isfinite(np.asarray(tr.state.params["pos"])).all()
