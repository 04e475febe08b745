"""SSIM / PSNR cross-checked against torchmetrics (the reference's metrics,
train.py:72-73)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gsplat_tpu.ops.losses import l1_loss, psnr, ssim


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    return a, b


def test_ssim_matches_torchmetrics(pair):
    torch = pytest.importorskip("torch")
    tm = pytest.importorskip("torchmetrics")
    a, b = pair
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    crit = tm.StructuralSimilarityIndexMeasure(data_range=1.0)
    theirs = float(crit(
        torch.from_numpy(a).permute(2, 0, 1)[None],
        torch.from_numpy(b).permute(2, 0, 1)[None]))
    assert abs(ours - theirs) < 2e-3, (ours, theirs)


def test_psnr_matches_torchmetrics(pair):
    torch = pytest.importorskip("torch")
    tm = pytest.importorskip("torchmetrics")
    a, b = pair
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    crit = tm.PeakSignalNoiseRatio()
    theirs = float(crit(torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - theirs) < 1e-3, (ours, theirs)


def test_l1_and_identity(pair):
    a, b = pair
    assert float(l1_loss(jnp.asarray(a), jnp.asarray(a))) == 0.0
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0)
    assert float(l1_loss(jnp.asarray(a), jnp.asarray(b))) > 0
