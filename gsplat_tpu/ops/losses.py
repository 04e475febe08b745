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


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair (gaussian window, valid region).

    Matches torchmetrics ``StructuralSimilarityIndexMeasure(data_range=1.0)``
    numerics (verified in tests/test_losses.py).
    """
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    half = (kernel_size - 1) / 2
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()

    def blur(x):  # x: (H, W, C) → separable depthwise gaussian, VALID
        # NHWC end to end: a layout shuffle to NCHW costs ~30 ms at
        # 1297x840 on TPU (strided minor-dim-3 transpose)
        c = x.shape[-1]
        kh = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
        hi = jax.lax.Precision.HIGHEST
        dn = jax.lax.conv_dimension_numbers(
            (1,) + x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x[None], kh, (1, 1), "VALID",
                                         dimension_numbers=dn,
                                         feature_group_count=c, precision=hi)
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                         dimension_numbers=dn,
                                         feature_group_count=c, precision=hi)
        return x[0]

    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mu_p, mu_t = blur(p), blur(t)
    mu_pp = blur(p * p) - mu_p * mu_p
    mu_tt = blur(t * t) - mu_t * mu_t
    mu_pt = blur(p * t) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (mu_pp + mu_tt + c2)
    return jnp.mean(num / den)


def ssim_loss(pred, target, data_range: float = 1.0):
    return 1.0 - ssim(pred, target, data_range)
