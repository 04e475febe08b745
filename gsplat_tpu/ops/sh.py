"""Real spherical-harmonics basis, degree 2 (9 coefficients).

Constants and layout match the reference's svox2-derived device function
``calc_sh`` (``src/gaussian.cu:385-426``): coefficient order is
[l0, l1(-y, z, -x), l2(xy, yz, 2z²-x²-y², xz, x²-y²)], and per-gaussian color
coefficients are stored flattened channel-major as (3, 9) → 27
(``utils.py:345-348`` initialize_sh).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_DIM = 9
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)


def sh_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    """Unit directions (..., 3) → SH basis values (..., 9)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    return jnp.stack(
        [
            jnp.full_like(x, C0),
            -C1 * y,
            C1 * z,
            -C1 * x,
            C2[0] * x * y,
            C2[1] * y * z,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * x * z,
            C2[4] * (xx - yy),
        ],
        axis=-1,
    )


def initialize_sh(rgb_logits: jnp.ndarray) -> jnp.ndarray:
    """DC-only SH init from per-point rgb logits (reference utils.py:345-348)."""
    n = rgb_logits.shape[0]
    coeff = jnp.zeros((n, 3, SH_DIM), rgb_logits.dtype)
    coeff = coeff.at[:, :, 0].set(rgb_logits / C0)
    return coeff.reshape(n, 3 * SH_DIM)
