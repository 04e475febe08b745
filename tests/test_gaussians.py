"""GaussianTable init / adaptive density control / checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.models.gaussians import (
    GaussianTable,
    adaptive_control,
    grow_capacity,
    init_from_points,
    reset_opacity,
)
from gsplat_tpu.utils.so3 import inverse_sigmoid
from gsplat_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _table(n=20, cap_round=32, opa=0.5, scale=0.05, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3))
    rgb = (rng.uniform(0, 1, (n, 3)) * 255).astype(np.uint8)
    t = init_from_points(pts, rgb, opa_init_value=opa, scale_init_value=1.0,
                         capacity_round=cap_round)
    return t._replace(scale=jnp.where(t.live[:, None], scale, t.scale))


def test_init_from_points():
    t = _table()
    assert t.capacity % 32 == 0 and t.capacity >= 20
    assert int(t.n_live) == 20
    assert bool(t.live[:20].all()) and not bool(t.live[20:].any())
    np.testing.assert_allclose(np.asarray(t.opa[:20]),
                               inverse_sigmoid(0.5), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t.quat[:, 0]), 1.0)


def _run_ac(t, grad, use_clone=False, use_split=False, taus=0.1,
            delete_thresh=1.5, grad_thresh=0.0002):
    return adaptive_control(
        t, grad, jax.random.PRNGKey(0), taus=taus,
        delete_thresh=delete_thresh, grad_thresh=grad_thresh, clone_dt=0.01,
        use_clone=jnp.asarray(use_clone), use_split=jnp.asarray(use_split),
        scale_activation="abs", grad_aggregation="max")


def test_delete_low_opacity():
    t = _table()
    # gaussian 3 gets opacity below 0.02
    t = t._replace(opa=t.opa.at[3].set(inverse_sigmoid(0.01)))
    grad = jnp.zeros((t.capacity, 3))
    t2, stats = _run_ac(t, grad)
    assert int(stats.n_deleted) == 1
    assert int(t2.n_live) == 19
    assert int(stats.n_cloned) == 0 and int(stats.n_split) == 0


def test_delete_oversized():
    t = _table()
    t = t._replace(scale=t.scale.at[5].set(2.0))  # norm > delete_thresh=1.5
    grad = jnp.zeros((t.capacity, 3))
    t2, stats = _run_ac(t, grad)
    assert int(stats.n_deleted) == 1 and int(t2.n_live) == 19


def test_split_shrinks_scale_and_adds():
    t = _table(scale=0.2)  # norm ≈ 0.346 > taus=0.1 → split candidates
    grad = jnp.zeros((t.capacity, 3)).at[2].set(0.01).at[7].set(0.01)
    t2, stats = _run_ac(t, grad, use_split=True)
    assert int(stats.n_split) == 2
    assert int(t2.n_live) == 22
    # split originals + new copies carry scale/1.6
    live_scales = np.asarray(t2.scale)[np.asarray(t2.live)]
    n_shrunk = np.isclose(live_scales, 0.2 / 1.6).all(axis=1).sum()
    assert n_shrunk == 4  # 2 originals + 2 new


def test_clone_moves_against_grad():
    t = _table(scale=0.01)  # norm < taus → clone candidates
    g = np.zeros((t.capacity, 3), np.float32)
    g[4] = [0.01, -0.02, 0.005]
    src_pos = np.asarray(t.pos[4])  # before donation invalidates t
    t2, stats = _run_ac(t, jnp.asarray(g), use_clone=True)
    assert int(stats.n_cloned) == 1
    assert int(t2.n_live) == 21
    # the clone is appended after kept entries at index n_keep
    clone_pos = np.asarray(t2.pos)[20]
    np.testing.assert_allclose(clone_pos, src_pos - g[4] * 0.01, rtol=1e-5)


def test_capacity_overflow_flag():
    t = _table(n=40, cap_round=32)   # capacity 64; 2x growth overflows
    cap = t.capacity
    grad = jnp.full((cap, 3), 0.01)
    t2, stats = _run_ac(t, grad, use_clone=True, taus=10.0)
    assert bool(stats.overflowed)
    assert int(t2.n_live) == cap


def test_grow_capacity():
    t = _table(n=30, cap_round=32)
    t2 = grow_capacity(t, capacity_round=32)
    assert t2.capacity >= 30 * 1.5 - 32
    assert int(t2.n_live) == 30
    np.testing.assert_allclose(np.asarray(t2.pos[:30]), np.asarray(t.pos[:30]))
    assert not bool(t2.live[30:].any())


def test_reset_opacity():
    t = _table()
    t2 = reset_opacity(t)
    np.testing.assert_allclose(np.asarray(t2.opa)[np.asarray(t2.live)],
                               inverse_sigmoid(0.01), rtol=1e-5)


def test_checkpoint_roundtrip_npz(tmp_path):
    t = _table()
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(t, p)
    t2 = load_checkpoint(p, capacity_round=32)
    assert int(t2.n_live) == int(t.n_live)
    n = int(t.n_live)
    for k in ("pos", "rgb", "opa", "quat", "scale"):
        np.testing.assert_allclose(np.asarray(getattr(t2, k))[:n],
                                   np.asarray(getattr(t, k))[:n], rtol=1e-6)


def test_checkpoint_roundtrip_pth(tmp_path):
    import pytest
    pytest.importorskip("torch")
    t = _table()
    p = str(tmp_path / "ckpt.pth")
    save_checkpoint(t, p)
    t2 = load_checkpoint(p, capacity_round=32)
    n = int(t.n_live)
    np.testing.assert_allclose(np.asarray(t2.pos)[:n], np.asarray(t.pos)[:n],
                               rtol=1e-6)


def test_grow_capacity_ceiling():
    """max_capacity caps bucketed growth; at the ceiling the table stops
    growing (densify clamps instead — SplatConfig.max_capacity docs)."""
    from gsplat_tpu.models.gaussians import grow_capacity
    import numpy as np
    import jax.numpy as jnp

    n = 100
    t = GaussianTable(
        pos=jnp.zeros((128, 3)), rgb=jnp.zeros((128, 3)),
        opa=jnp.zeros((128,)), quat=jnp.zeros((128, 4)),
        scale=jnp.zeros((128, 3)),
        live=jnp.asarray(np.arange(128) < n),
        n_live=jnp.asarray(n, jnp.int32))
    g1 = grow_capacity(t, 64, headroom=4.0)
    assert g1.capacity == 448                      # 400 rounded to 64
    g2 = grow_capacity(t, 64, headroom=4.0, max_capacity=256)
    assert g2.capacity == 256
    g3 = grow_capacity(g2, 64, headroom=4.0, max_capacity=256)
    assert g3.capacity == 256                      # saturated, no-op
