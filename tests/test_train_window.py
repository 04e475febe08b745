"""Windowed (scan-based) training must match step-at-a-time training."""

import numpy as np
import pytest
import jax

from gsplat_tpu.config import TrainConfig
from gsplat_tpu.train import Trainer

from fixtures import make_scene
from test_train_e2e import _splat


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

def test_window_matches_single_steps(tmp_path):
    make_scene(str(tmp_path), n_points=70, n_cameras=5, w=48, h=32)

    def run(windowed):
        sp = _splat(str(tmp_path))
        tcfg = TrainConfig(n_iters=12, n_iters_warmup=3, n_iters_test=0,
                           n_save_train_img=0, seed=7, lr=0.01,
                           n_adaptive_control=10 ** 9)
        tr = Trainer(sp, tcfg)
        if windowed:
            tr.train_window(0, 5)
            tr.train_window(6, 11)
        else:
            for i in range(12):
                tr.train_step(i)
        return jax.device_get(tr.state.params)

    p1 = run(False)
    p2 = run(True)
    for k in p1:
        # scan and straight-line code fuse differently; Adam's m/(sqrt(v)+eps)
        # amplifies last-bit differences when grads are near zero (quats),
        # so allow small drift after 12 steps
        np.testing.assert_allclose(p1[k], p2[k], rtol=1e-2, atol=1e-4,
                                   err_msg=k)


def test_train_loop_uses_windows(tmp_path):
    make_scene(str(tmp_path), n_points=50, n_cameras=4, w=48, h=32)
    sp = _splat(str(tmp_path))
    tcfg = TrainConfig(n_iters=15, n_iters_warmup=3, n_iters_test=0,
                       n_save_train_img=0, seed=7, lr=0.01,
                       n_adaptive_control=10 ** 9)
    tr = Trainer(sp, tcfg)
    logs = []
    tr.train(metrics_every=6, log=logs.append)
    assert len(logs) == 3            # 15 steps in windows of 6
    assert "iter 14" in logs[-1]
    l1s = [float(s.split("l1=")[1].split(" ")[0]) for s in logs]
    assert l1s[-1] < l1s[0]
