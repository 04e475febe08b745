"""Projection / EWA math: hand-checked geometry + autodiff sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gsplat_tpu.ops.projection import project_gaussians, trunc_exp
from gsplat_tpu.utils.so3 import quat_to_rotmat, quat_to_rotmat_np


def test_quat_rotmat_identity_and_axis():
    np.testing.assert_allclose(
        np.asarray(quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]]))[0]),
        np.eye(3), atol=1e-6)
    # 90° about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    r = np.asarray(quat_to_rotmat(jnp.asarray([[s, 0, 0, s]]))[0])
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]),
                               [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(r, quat_to_rotmat_np(np.array([s, 0, 0, s])),
                               atol=1e-6)


def test_projection_geometry():
    pos = jnp.asarray([[0.5, -0.25, 2.0], [0.0, 0.0, 0.1], [10.0, 0.0, 2.0]])
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (3, 1))
    scale = jnp.full((3, 3), 0.1)
    rot = jnp.eye(3)
    tran = jnp.zeros(3)
    p = project_gaussians(pos, quat, scale, rot, tran, near=0.3,
                          half_width=1.0, half_height=1.0)
    # visible point: x/z, y/z, ||p||
    np.testing.assert_allclose(np.asarray(p.mean2d[0]), [0.25, -0.125],
                               rtol=1e-6)
    np.testing.assert_allclose(float(p.depth[0]),
                               np.linalg.norm([0.5, -0.25, 2.0]), rtol=1e-6)
    assert bool(p.visible[0])
    assert not bool(p.visible[1])    # behind near plane
    assert not bool(p.visible[2])    # outside frustum

    # isotropic gaussian at the optical axis: cov2d ≈ diag((s/z)^2)
    pos2 = jnp.asarray([[0.0, 0.0, 2.0]])
    p2 = project_gaussians(pos2, quat[:1], scale[:1], rot, tran,
                           near=0.3, half_width=1.0, half_height=1.0)
    s_eff = (0.1 + 1e-4)
    np.testing.assert_allclose(
        np.asarray(p2.cov2d[0]),
        [s_eff ** 2 / 4, 0, 0, s_eff ** 2 / 4], atol=1e-8)


def test_projection_vs_numpy_ewa_oracle():
    """cov2d must equal a float64 numpy EWA computation (J W Σ Wᵀ Jᵀ)."""
    rng = np.random.default_rng(0)
    n = 16
    pos = rng.uniform(-1, 1, (n, 3)) + [0, 0, 3.0]
    quat = rng.normal(size=(n, 4))
    scale = rng.uniform(0.02, 0.3, (n, 3))
    axis = rng.normal(size=4)
    axis /= np.linalg.norm(axis)
    W = quat_to_rotmat_np(axis)
    tran = np.array([0.05, -0.1, 0.2])

    p = project_gaussians(
        jnp.asarray(pos, jnp.float32), jnp.asarray(quat, jnp.float32),
        jnp.asarray(scale, jnp.float32), jnp.asarray(W, jnp.float32),
        jnp.asarray(tran, jnp.float32), near=0.3,
        half_width=10.0, half_height=10.0)

    for i in range(n):
        q = quat[i] / np.linalg.norm(quat[i])
        R = quat_to_rotmat_np(q)
        S = np.diag(np.abs(scale[i]) + 1e-4)
        cov3d = R @ S @ S @ R.T
        pc = W @ pos[i] + tran
        x, y, z = pc
        norm = np.linalg.norm(pc)
        J = np.array([[1 / z, 0, -x / z ** 2],
                      [0, 1 / z, -y / z ** 2],
                      [x / norm, y / norm, z / norm]])
        JW = J @ W
        cov2d = (JW @ cov3d @ JW.T)[:2, :2]
        np.testing.assert_allclose(np.asarray(p.cov2d[i]).reshape(2, 2),
                                   cov2d, rtol=5e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(p.mean2d[i]), [x / z, y / z],
                                   rtol=1e-5)
        np.testing.assert_allclose(float(p.depth[i]), norm, rtol=1e-5)


@pytest.mark.slow
def test_projection_gradients_finite_diff():
    jax.config.update("jax_enable_x64", True)
    try:
        pos = jnp.asarray([[0.2, -0.1, 2.5]], jnp.float64)
        quat = jnp.asarray([[0.9, 0.1, -0.2, 0.3]], jnp.float64)
        scale = jnp.asarray([[0.15, 0.08, 0.2]], jnp.float64)
        rot = jnp.eye(3, dtype=jnp.float64)
        tran = jnp.zeros(3, jnp.float64)

        def f(pos, quat, scale):
            p = project_gaussians(pos, quat, scale, rot, tran, 0.3, 1.0, 1.0)
            return (jnp.sum(p.mean2d * jnp.asarray([[1.3, -0.7]]))
                    + jnp.sum(p.cov2d * jnp.asarray([[0.5, 1.1, -0.3, 0.8]]))
                    + 0.2 * jnp.sum(p.depth))

        grads = jax.grad(f, argnums=(0, 1, 2))(pos, quat, scale)
        eps = 1e-6
        for ai, arg in enumerate((pos, quat, scale)):
            g_fd = np.zeros_like(np.asarray(arg))
            for j in range(arg.shape[1]):
                ap = np.asarray(arg).copy(); ap[0, j] += eps
                am = np.asarray(arg).copy(); am[0, j] -= eps
                args_p = [pos, quat, scale]; args_p[ai] = jnp.asarray(ap)
                args_m = [pos, quat, scale]; args_m[ai] = jnp.asarray(am)
                g_fd[0, j] = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(grads[ai]), g_fd,
                                       rtol=1e-5, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_trunc_exp():
    x = jnp.asarray([-3.0, 0.5, 3.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(x), rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.exp(np.clip(np.asarray(x), -1, 1)), rtol=1e-6)
