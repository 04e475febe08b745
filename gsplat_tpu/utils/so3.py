"""Minimal rotation / pose math.

The reference vendors a full 1,350-line Lie-group package (``transforms/``)
but only ever uses quaternion→rotation and SE3 composition to build
world-to-camera poses (``/root/reference/splatter.py:446-451``).  We provide
exactly that surface: a numpy path for host-side scene parsing and a jnp path
for on-device batched use (reference ``utils.py:297-333`` qvec2rotmat / q2r).

Quaternion convention: wxyz (COLMAP's), matching ``utils.py:297-316``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat_np(q: np.ndarray) -> np.ndarray:
    """Single wxyz quaternion → 3x3 rotation matrix (host, numpy)."""
    w, x, y, z = float(q[0]), float(q[1]), float(q[2]), float(q[3])
    n = math.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float64,
    )


def normalize_quat(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize a batch of wxyz quaternions, (..., 4)."""
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Batched wxyz quaternions (..., 4) → rotation matrices (..., 3, 3).

    Matches the reference batched form ``utils.py:318-333`` (q2r) and the
    in-kernel expansion ``src/gaussian.cu:1236-1245`` — note the quaternion
    is NOT normalized here; callers normalize explicitly, mirroring
    ``splatter.py:519``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def inverse_sigmoid(y: float) -> float:
    """Scalar logit, reference ``utils.py:350-351``."""
    return -math.log(1.0 / y - 1.0)


def inverse_sigmoid_arr(y):
    """Array logit (numpy or jnp), reference ``utils.py:353-354``."""
    xp = jnp if isinstance(y, jnp.ndarray) else np
    return -xp.log(1.0 / y - 1.0)
