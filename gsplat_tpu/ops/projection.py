"""EWA projection + frustum culling, TPU-native.

This replaces the reference's fused CUDA ``global_culling`` kernel
(``src/gaussian.cu:1182-1369``) and its ~240-line hand-derived backward
(``:1371-1609``).  On TPU the whole thing is a few fused VPU element-wise ops
under ``jit``; JAX autodiff supplies the exact backward, including the
quaternion→rotation chain the CUDA version differentiates by hand via
coefficient matrices (``gaussian.cu:1535-1566``).

Numerics mirror the reference exactly:
- camera-space: p_c = R p_w + t                        (gaussian.cu:1150-1153)
- image-space:  (x/z, y/z, ||p_c||)                    (gaussian.cu:1214-1217;
  note depth is the Euclidean norm, not z)
- near cull:    z <= near                              (gaussian.cu:1208)
- frustum cull: |x_i| >= half_w or |y_i| >= half_h     (gaussian.cu:1220)
- Σ3d = R S Sᵀ Rᵀ                                      (gaussian.cu:1259-1283)
- J rows [1/z,0,-x/z²],[0,1/z,-y/z²],[x,y,z]/||p||      (gaussian.cu:1160-1174)
- Σ2d = (J W) Σ3d (J W)ᵀ upper-left 2x2                (gaussian.cu:1287-1335)

Instead of compacting survivors (dynamic shapes), everything stays padded at
table capacity with a ``visible`` mask; downstream binning masks on it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-4  # reference splatter.py:19


@jax.custom_jvp
def trunc_exp(x):
    """exp with gradient exp(clamp(x, -1, 1)) — reference renderer.py:91-102."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return jnp.exp(x), dx * jnp.exp(jnp.clip(x, -1.0, 1.0))


def activate_scale(scale: jnp.ndarray, scale_activation: str) -> jnp.ndarray:
    """abs+eps or truncated exp (reference splatter.py:520-524)."""
    if scale_activation == "abs":
        return jnp.abs(scale) + EPS
    if scale_activation == "exp":
        return trunc_exp(scale)
    raise ValueError(f"unknown scale activation {scale_activation!r}")


def world_to_camera(pos: jnp.ndarray, rot: jnp.ndarray,
                    tran: jnp.ndarray) -> jnp.ndarray:
    """p_c = R p_w + t for a batch of points (reference gaussian.cu:49-76
    world2camera kernel; backward Rᵀg comes from autodiff)."""
    return jnp.matmul(pos, rot.T, precision=jax.lax.Precision.HIGHEST) + tran


def camera_to_image(p_c: jnp.ndarray) -> jnp.ndarray:
    """(x/z, y/z, ||p||) image-space coords (reference splatter.py:29-35)."""
    return jnp.stack(
        [p_c[:, 0] / p_c[:, 2], p_c[:, 1] / p_c[:, 2],
         jnp.linalg.norm(p_c, axis=-1)], axis=-1)


def jacobian(p_c: jnp.ndarray) -> jnp.ndarray:
    """Per-point projective Jacobian, rows [1/z,0,-x/z²],[0,1/z,-y/z²],
    [x,y,z]/||p|| (reference gaussian.cu:10-47 / utils.py:335-342)."""
    x, y, z = p_c[:, 0], p_c[:, 1], p_c[:, 2]
    inv_z = 1.0 / z
    zero = jnp.zeros_like(z)
    inv_n = 1.0 / jnp.maximum(jnp.linalg.norm(p_c, axis=-1), 1e-12)
    return jnp.stack(
        [inv_z, zero, -x * inv_z * inv_z,
         zero, inv_z, -y * inv_z * inv_z,
         x * inv_n, y * inv_n, z * inv_n], axis=-1).reshape(-1, 3, 3)


class ProjectedGaussians(NamedTuple):
    """Image-space gaussians, padded to table capacity."""

    mean2d: jnp.ndarray   # (N, 2) image-plane position (x/z, y/z)
    depth: jnp.ndarray    # (N,)   Euclidean camera-space distance ||p_c||
    cov2d: jnp.ndarray    # (N, 4) flattened 2x2 EWA covariance (a, b, c, d)
    visible: jnp.ndarray  # (N,)   bool frustum/near mask


def project_gaussians(
    pos: jnp.ndarray,
    quat: jnp.ndarray,
    scale: jnp.ndarray,
    w2c_rot: jnp.ndarray,
    w2c_tran: jnp.ndarray,
    near: float,
    half_width: float,
    half_height: float,
    scale_activation: str = "abs",
) -> ProjectedGaussians:
    """Project world-space gaussians into the image plane (EWA splatting).

    Args mirror the reference autograd op (``renderer.py:121-132``); callers
    pass raw parameters — quaternion normalization and the scale activation
    happen here (reference does both at ``splatter.py:519-524`` before the
    kernel call).  half_width/half_height carry the 1.2x frustum margin
    (``splatter.py:532-533``).
    """
    # All matmuls here are tiny (3x3) but numerically load-bearing — force
    # true f32 so TPU defaults don't round operands to bf16.
    hi = jax.lax.Precision.HIGHEST
    quat = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True))
    s = activate_scale(scale, scale_activation)

    # world → camera
    p_c = jnp.matmul(pos, w2c_rot.T, precision=hi) + w2c_tran  # (N, 3)
    x, y, z = p_c[:, 0], p_c[:, 1], p_c[:, 2]
    # guard z for masked-out points so 1/z stays finite
    near_ok = z > near
    zs = jnp.where(near_ok, z, 1.0)

    xi = x / zs
    yi = y / zs
    norm = jnp.sqrt(x * x + y * y + z * z)
    visible = near_ok & (jnp.abs(xi) < half_width) & (jnp.abs(yi) < half_height)

    # Σ2d upper-left 2x2 of (J W) Σ3d (J W)ᵀ in closed form — with
    # Σ3d = (R S)(R S)ᵀ this is aᵢⱼ = mᵢ·mⱼ for m = S Rᵀ (JW rowᵢ).
    # The projective Jacobian's depth row never touches the 2x2 block, and
    # everything stays elementwise (a batched-3x3-matmul formulation costs
    # ~11 ms/step in launch + relayout overhead at 500k gaussians).
    inv_z = 1.0 / zs
    inv_z2x = x * inv_z * inv_z
    inv_z2y = y * inv_z * inv_z
    # u = (JW) row 0 = W_row0/z − x/z² · W_row2 ; v analogous with W_row1
    u = [inv_z * w2c_rot[0, k] - inv_z2x * w2c_rot[2, k] for k in range(3)]
    v = [inv_z * w2c_rot[1, k] - inv_z2y * w2c_rot[2, k] for k in range(3)]
    # rotation matrix entries as elementwise expressions (utils/so3.py)
    qw, qx, qy, qz = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    r = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ]
    # m_j = s_j · (Rᵀu)_j ; n_j = s_j · (Rᵀv)_j
    m = [s[:, j] * (r[0][j] * u[0] + r[1][j] * u[1] + r[2][j] * u[2])
         for j in range(3)]
    n = [s[:, j] * (r[0][j] * v[0] + r[1][j] * v[1] + r[2][j] * v[2])
         for j in range(3)]
    a = m[0] * m[0] + m[1] * m[1] + m[2] * m[2]
    b = m[0] * n[0] + m[1] * n[1] + m[2] * n[2]
    d = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
    cov2d = jnp.stack([a, b, b, d], axis=-1)

    mean2d = jnp.stack([xi, yi], axis=-1)
    return ProjectedGaussians(mean2d=mean2d, depth=norm, cov2d=cov2d, visible=visible)
