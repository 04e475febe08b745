"""Losses & image metrics: L1, SSIM, PSNR — pure jnp.

The reference trains on ``(1-w)·L1 + w·(1-SSIM)`` with torchmetrics'
``StructuralSimilarityIndexMeasure(data_range=1.0)`` (``train.py:72,99-107``)
and reports torchmetrics PSNR (``train.py:73,114``).  The jnp SSIM here uses
the same defaults (11x11 gaussian window, sigma 1.5, k1=0.01, k2=0.03) with a
separable depthwise convolution; a unit test cross-checks it against
torchmetrics on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range=None) -> jnp.ndarray:
    """PSNR; with data_range=None it is inferred from the tensors, matching
    torchmetrics' default behaviour (reference train.py:73)."""
    if data_range is None:
        data_range = jnp.maximum(pred.max(), target.max()) - jnp.minimum(
            pred.min(), target.min())
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _gauss_kernel(kernel_size: int, sigma: float) -> jnp.ndarray:
    half = (kernel_size - 1) / 2
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / g.sum()


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, kernel_size: int, sigma: float):
    """(n, n-k+1) banded VALID-convolution matrix for the gaussian window.

    Expressing the separable blur as two dense matmuls puts it on the MXU;
    the depthwise ``conv_general_dilated`` route runs on the VPU and costs
    ~28 ms fwd+bwd per train step at 1297x840 (round-1 PERF.md), while these
    band matmuls are ~84 GFLOP fwd+bwd — a few ms at f32 MXU rate.

    Returns numpy (converted to a device constant per trace — caching a jnp
    array here would leak one trace's constant into the next).
    """
    import numpy as np

    coords = np.arange(kernel_size, dtype=np.float32) - (kernel_size - 1) / 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    m = n - kernel_size + 1
    band = np.zeros((n, m), np.float32)
    for i in range(kernel_size):
        band[i:i + m][np.arange(m), np.arange(m)] = g[i]
    return band


@functools.partial(jax.jit, static_argnames=("kernel_size", "impl", "layout"))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         impl: str = "matmul", layout: str = "hwc") -> jnp.ndarray:
    """Mean SSIM over an image pair (gaussian window, valid region).

    Implements the algorithm of torchmetrics
    ``StructuralSimilarityIndexMeasure(data_range=1.0)`` (the reference's
    metric, train.py:72): 11x11 gaussian, sigma 1.5, k1/k2 0.01/0.03,
    valid-window mean (torchmetrics' reflect-pad + conv + crop-the-pad is
    exactly the valid-window mean).  Verified in tests/test_losses.py
    against a float64 numpy oracle and pinned golden values; the direct
    torchmetrics cross-check runs wherever that package is installed.

    layout="hwc" takes (H, W, C); layout="chw" takes the pipeline's
    channel-major (C, H, W) images (no layout shuffles anywhere — a
    minor-dim-3 transpose costs ~30 ms at 1297x840 on TPU).

    impl="matmul" (default) evaluates the separable blur as two banded
    matmuls over a stacked 5C-channel moment image — MXU work, with the
    SSIM arithmetic done directly in the post-contraction layout so no
    transposes are introduced.  impl="conv" is the depthwise-convolution
    reference (cross-checked in tests; hwc only).
    """
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)

    if impl == "matmul" and layout == "chw":
        c, h, w = p.shape
        bw = jnp.asarray(_band_matrix(w, kernel_size, sigma))  # (W, W')
        bh = jnp.asarray(_band_matrix(h, kernel_size, sigma))  # (H, H')
        x = jnp.concatenate([p, t, p * p, t * t, p * t], axis=0)  # (5C,H,W)
        hi = jax.lax.Precision.HIGHEST
        # (5C, H, W) ·_H (H, H') → (5C, W, H')
        y = jax.lax.dot_general(x, bh, (((1,), (0,)), ((), ())),
                                precision=hi)
        # (5C, W, H') ·_W (W, W') → (5C, H', W')
        z = jax.lax.dot_general(y, bw, (((1,), (0,)), ((), ())),
                                precision=hi)
        mu_p, mu_t = z[:c], z[c:2 * c]
        mu_pp = z[2 * c:3 * c] - mu_p * mu_p
        mu_tt = z[3 * c:4 * c] - mu_t * mu_t
        mu_pt = z[4 * c:5 * c] - mu_p * mu_t
    elif impl == "matmul":
        h, w, c = p.shape
        bw = jnp.asarray(_band_matrix(w, kernel_size, sigma))  # (W, W')
        bh = jnp.asarray(_band_matrix(h, kernel_size, sigma))  # (H, H')
        x = jnp.concatenate([p, t, p * p, t * t, p * t], axis=2)  # (H,W,5C)
        hi = jax.lax.Precision.HIGHEST
        # (H, W, 5C) ·_W (W, W') → (H, 5C, W')
        y = jax.lax.dot_general(x, bw, (((1,), (0,)), ((), ())),
                                precision=hi)
        # (H, 5C, W') ·_H (H, H') → (5C, W', H')
        z = jax.lax.dot_general(y, bh, (((0,), (0,)), ((), ())),
                                precision=hi)
        mu_p, mu_t = z[:c], z[c:2 * c]
        mu_pp = z[2 * c:3 * c] - mu_p * mu_p
        mu_tt = z[3 * c:4 * c] - mu_t * mu_t
        mu_pt = z[4 * c:5 * c] - mu_p * mu_t
    else:
        if layout == "chw":
            p = jnp.transpose(p, (1, 2, 0))
            t = jnp.transpose(t, (1, 2, 0))
        g = _gauss_kernel(kernel_size, sigma)

        def blur(x):  # x: (H, W, C) → separable depthwise gaussian, VALID
            # NHWC end to end: a layout shuffle to NCHW costs ~30 ms at
            # 1297x840 on TPU (strided minor-dim-3 transpose)
            c = x.shape[-1]
            kh = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
            kw = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
            hi = jax.lax.Precision.HIGHEST
            dn = jax.lax.conv_dimension_numbers(
                (1,) + x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
            x = jax.lax.conv_general_dilated(
                x[None], kh, (1, 1), "VALID", dimension_numbers=dn,
                feature_group_count=c, precision=hi)
            x = jax.lax.conv_general_dilated(
                x, kw, (1, 1), "VALID", dimension_numbers=dn,
                feature_group_count=c, precision=hi)
            return x[0]

        mu_p, mu_t = blur(p), blur(t)
        mu_pp = blur(p * p) - mu_p * mu_p
        mu_tt = blur(t * t) - mu_t * mu_t
        mu_pt = blur(p * t) - mu_p * mu_t

    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (mu_pp + mu_tt + c2)
    return jnp.mean(num / den)


def ssim_loss(pred, target, data_range: float = 1.0):
    return 1.0 - ssim(pred, target, data_range)
