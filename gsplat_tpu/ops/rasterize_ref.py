"""Naive differentiable reference rasterizer (the test oracle).

Evaluates every gaussian against every pixel with a ``lax.scan`` — no tiling,
no capacity caps.  This plays the role the reference's deprecated pure-torch
path played for its CUDA kernels (``splatter.py:231-253`` + the
double-precision legacy kernels, see SURVEY §4): an independent numerical
oracle for the production pipeline.

Compositing semantics match ``draw_kernel`` (``src/gaussian.cu:902-961``):

- pixel centre (id + 0.5 - size/2) / focal                    (:839-840)
- prob = exp(-(d x² - (b+c) x y + a y²) / (2 det + 1e-14))     (:920-923)
- alpha = prob · opa; weight = alpha · T;  T *= (1 - alpha)    (:926-960)
- early stop: a pixel stops accepting gaussians once its transmittance
  falls below 1e-4                                             (:906)
- optional weight normalization (skipped when accum < 0.01)    (:964-966)
- SH mode: per-pixel view directions from the RayInfo vectors, sigmoid of
  the SH dot product                                           (:845-861, 936-948)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.sh import sh_basis

STOP_THRESH = 1e-4  # gaussian.cu:906


def pixel_grid(h: int, w: int, focal_x: float, focal_y: float):
    """Focal-normalized pixel-centre coordinates for a padded h x w image."""
    ix = jnp.arange(w, dtype=jnp.float32)
    iy = jnp.arange(h, dtype=jnp.float32)
    px = (ix + 0.5 - w / 2) / focal_x
    py = (iy + 0.5 - h / 2) / focal_y
    return jnp.meshgrid(px, py, indexing="xy")  # each (h, w)


def rasterize_oracle(
    mean2d: jnp.ndarray,   # (M, 2) depth-sorted, culled
    cov2d: jnp.ndarray,    # (M, 4)
    opa: jnp.ndarray,      # (M,)  post-sigmoid
    color: jnp.ndarray,    # (M, 3) post-sigmoid rgb, or (M, 27) SH coeffs
    h: int,
    w: int,
    focal_x: float,
    focal_y: float,
    sh_vecs: dict | None = None,   # rays_o/lefttop/dx/dy (3,) each for SH
    weight_normalize: bool = False,
) -> jnp.ndarray:
    """Returns the (h, w, 3) composited image."""
    px, py = pixel_grid(h, w, focal_x, focal_y)
    use_sh = color.shape[-1] != 3

    if use_sh:
        ix = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        iy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        d = (sh_vecs["lefttop"][None, None] + ix * sh_vecs["dx"][None, None]
             + iy * sh_vecs["dy"][None, None] - sh_vecs["rays_o"][None, None])
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-7)  # cu:858
        shb = sh_basis(d)                                  # (h, w, 9)
    else:
        shb = None

    def body(carry, g):
        accum, col, accw = carry
        m, cv, op, rgb = g
        a, b, c, dd = cv[0], cv[1], cv[2], cv[3]
        dx = px - m[0]
        dy = py - m[1]
        det = a * dd - b * c
        prob = jnp.exp(-(dd * dx * dx - (b + c) * dx * dy + a * dy * dy)
                       / (2 * det + 1e-14))
        alpha = prob * op
        live = accum >= STOP_THRESH
        wgt = jnp.where(live, alpha * accum, 0.0)          # (h, w)
        if use_sh:
            logits = jnp.einsum("hwk,ck->hwc", shb, rgb.reshape(3, 9))
            gcol = jax.nn.sigmoid(logits)                  # (h, w, 3)
            col = col + wgt[..., None] * gcol
        else:
            col = col + wgt[..., None] * rgb[None, None, :]
        accw = accw + wgt
        accum = jnp.where(live, accum * (1 - alpha), accum)
        return (accum, col, accw), None

    init = (jnp.ones((h, w)), jnp.zeros((h, w, 3)), jnp.zeros((h, w)))
    (accum, col, accw), _ = jax.lax.scan(body, init, (mean2d, cov2d, opa, color))
    if weight_normalize:
        denom = jnp.where(accw < 0.01, 1.0, accw)          # cu:964-966
        col = col / denom[..., None]
    # channel-major, matching the production pipeline layout (assemble_image)
    return jnp.transpose(col, (2, 0, 1))
