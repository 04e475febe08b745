"""SSIM / PSNR cross-checked against a float64 numpy oracle (and against
torchmetrics — the reference's metric library, train.py:72-73 — when it is
installed; it is not part of this TPU image)."""

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


def _ssim_numpy(a, b, data_range=1.0, ks=11, sigma=1.5):
    """Classic Wang et al. SSIM, gaussian window, valid region, float64."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    half = (ks - 1) / 2
    x = np.arange(ks) - half
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    w = np.outer(g, g)

    def blur(img):
        h, wd, c = img.shape
        out = np.empty((h - ks + 1, wd - ks + 1, c))
        for ch in range(c):
            for i in range(out.shape[0]):
                for j in range(out.shape[1]):
                    out[i, j, ch] = (img[i:i + ks, j:j + ks, ch] * w).sum()
        return out

    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mu_a, mu_b = blur(a), blur(b)
    va = blur(a * a) - mu_a ** 2
    vb = blur(b * b) - mu_b ** 2
    vab = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * vab + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    return s.mean()


@pytest.mark.parametrize("impl", ["matmul", "conv"])
def test_ssim_matches_numpy_oracle(pair, impl):
    a, b = pair
    a, b = a[:32, :40], b[:32, :40]  # keep the O(n^2*k^2) oracle cheap
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0,
                      impl=impl))
    ref = _ssim_numpy(a, b)
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_ssim_matmul_equals_conv_with_grads(pair):
    """The MXU band-matmul blur is numerically the depthwise conv blur."""
    import jax

    a, b = pair
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    v1 = float(ssim(aj, bj, impl="matmul"))
    v2 = float(ssim(aj, bj, impl="conv"))
    assert abs(v1 - v2) < 2e-6
    g1 = jax.grad(lambda x: ssim(x, bj, impl="matmul"))(aj)
    g2 = jax.grad(lambda x: ssim(x, bj, impl="conv"))(aj)
    assert float(jnp.max(jnp.abs(g1 - g2))) < 1e-6


def test_ssim_pinned_golden_values():
    """Pinned float64-oracle golden values on a deterministic pair.

    torchmetrics is not installed in this image, so the parity contract is
    pinned instead: torchmetrics' default SSIM (reflect-pad + conv + crop
    the pad, torchmetrics/functional/image/ssim.py) reduces to the
    valid-window gaussian mean these constants were generated from (float64,
    kernel 11, sigma 1.5, k1=0.01, k2=0.03, data_range=1.0).  Any numeric
    drift in our SSIM shows up against these even without torchmetrics."""
    rng = np.random.default_rng(12345)
    base = np.clip(
        rng.uniform(0, 1, (40, 56, 3)) * 0.5
        + np.linspace(0, 0.5, 56)[None, :, None], 0, 1).astype(np.float32)
    noisy = np.clip(base + rng.normal(0, 0.08, base.shape),
                    0, 1).astype(np.float32)
    shifted = np.roll(base, 2, axis=1)
    golden = {
        "noisy": 0.8668903812485382,
        "shifted": -0.0030345370466461617,
        "identical": 1.0,
    }
    assert abs(float(ssim(jnp.asarray(base), jnp.asarray(noisy),
                          data_range=1.0)) - golden["noisy"]) < 1e-5
    assert abs(float(ssim(jnp.asarray(base), jnp.asarray(shifted),
                          data_range=1.0)) - golden["shifted"]) < 1e-5
    assert abs(float(ssim(jnp.asarray(base), jnp.asarray(base),
                          data_range=1.0)) - golden["identical"]) < 1e-6


def test_ssim_matches_torchmetrics(pair):
    tm = pytest.importorskip("torchmetrics")
    torch = pytest.importorskip("torch")
    a, b = pair
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    crit = tm.StructuralSimilarityIndexMeasure(data_range=1.0)
    theirs = float(crit(
        torch.from_numpy(a).permute(2, 0, 1)[None],
        torch.from_numpy(b).permute(2, 0, 1)[None]))
    assert abs(ours - theirs) < 2e-3, (ours, theirs)


def test_psnr_matches_numpy(pair):
    a, b = pair
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    dr = max(a.max(), b.max()) - min(a.min(), b.min())
    ref = 10 * np.log10(dr ** 2 / np.mean(
        (a.astype(np.float64) - b.astype(np.float64)) ** 2))
    assert abs(ours - ref) < 1e-3, (ours, ref)


def test_l1_and_identity(pair):
    a, b = pair
    assert float(l1_loss(jnp.asarray(a), jnp.asarray(a))) == 0.0
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0)
    assert float(l1_loss(jnp.asarray(a), jnp.asarray(b))) > 0