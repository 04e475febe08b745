"""LR schedule + trainer cadence parity with reference train.py."""

import numpy as np
import pytest

from gsplat_tpu.config import TrainConfig


def _ref_lambdas(decay, n_iters, warmup):
    """Literal re-derivation of reference train.py:27-55 for cross-check."""
    gamma = 0.01 ** (1 / (n_iters - warmup))
    if decay == "official":
        return {
            "opa": lambda i: i / warmup if i <= warmup else gamma ** (i - warmup),
            "rgb": lambda i: i / warmup if i <= warmup else 1,
            "pos": lambda i: i / warmup if i <= warmup else gamma ** (i - warmup),
            "scale": lambda i: i / warmup if i <= warmup else 1,
            "quat": lambda i: i / warmup if i <= warmup else 1,
        }
    if decay == "none":
        f = lambda i: i / warmup if i <= warmup else 0.2 ** ((i - warmup) // 2000)
        return {g: f for g in ("opa", "rgb", "pos", "scale", "quat")}
    f = lambda i: i / warmup if i <= warmup else gamma ** (i - warmup)
    return {g: f for g in ("opa", "rgb", "pos", "scale", "quat")}


@pytest.mark.parametrize("decay", ["exp", "official", "none"])
def test_lr_lambda_parity(decay):
    t = TrainConfig(n_iters=7001, n_iters_warmup=300, lr_decay=decay)
    ref = _ref_lambdas(decay, 7001, 300)
    for i in [0, 1, 150, 300, 301, 1000, 2299, 2301, 5000, 7000]:
        for g in ("opa", "rgb", "pos", "scale", "quat"):
            np.testing.assert_allclose(
                t.lr_lambda(g, i), ref[g](i), rtol=1e-12,
                err_msg=f"decay={decay} group={g} iter={i}")


def test_group_lrs_factors():
    t = TrainConfig(lr=0.003)
    lrs = t.group_lrs()
    assert lrs["pos"] == 0.003
    assert lrs["opa"] == 0.003 * 10
    assert lrs["rgb"] == 0.003 * 10
    assert lrs["scale"] == 0.003
    assert lrs["quat"] == 0.003


def test_cadence_flags():
    """The iteration-gating predicates of train.py:87-91."""
    t = TrainConfig(n_opa_reset=1000, reset_interval=500,
                    n_adaptive_control=100, grad_accum_iters=50)

    def flags(i):
        reset = i % t.n_opa_reset == 0 and i > 0
        in_reset = i >= t.n_opa_reset and i % t.n_opa_reset < t.reset_interval
        ac = i > 600 and i % t.n_adaptive_control == 0
        accum_start = i > 600 and (i + t.grad_accum_iters - 1) \
            % t.n_adaptive_control == 0
        return reset, in_reset, ac, accum_start

    assert flags(1000)[0] and not flags(999)[0] and not flags(0)[0]
    assert flags(1200)[1] and not flags(1600)[1]
    assert flags(700)[2] and not flags(650)[2] and not flags(600)[2]
    # accumulation restarts 50 iters before each adaptive-control step
    assert flags(651)[3] and not flags(652)[3]
