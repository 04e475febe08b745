"""Data-parallel gradient correctness: a DP step where every device renders
the SAME camera must produce exactly the single-device update (pmean of
identical grads is the identity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsplat_tpu.config import TrainConfig
from gsplat_tpu.parallel.mesh import make_mesh
from gsplat_tpu.parallel.data_parallel import (
    DPCameras,
    make_dp_train_step,
    replicate_state,
    shard_cameras,
)
from gsplat_tpu.train import TrainState, init_adam, make_train_step

from fixtures import make_scene
from test_train_e2e import _splat


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

def test_dp_same_camera_matches_single(tmp_path):
    make_scene(str(tmp_path), n_points=80, n_cameras=8, w=64, h=48)
    sp = _splat(str(tmp_path))
    tcfg = TrainConfig(ssim_weight=0.1)
    mesh = make_mesh({"data": 8})
    bspec, rspec = sp.specs()

    def fresh_state():
        # deep-copy: the donated train step invalidates its input buffers
        params = jax.tree.map(jnp.copy, sp.table.params())
        return TrainState(
            params=params, live=jnp.copy(sp.table.live),
            opt=init_adam(params),
            accum_grad=jnp.zeros_like(params["pos"]),
            grad_counter=jnp.zeros(sp.table.capacity, jnp.float32))

    # single-device: camera 0
    step1 = make_train_step(sp, tcfg)
    lrs = jnp.full((5,), 0.01, jnp.float32)
    s1, m1 = step1(fresh_state(), 0, lrs)

    # DP: every device holds one camera shard; all devices render their
    # LOCAL camera 0.  Make every shard's camera 0 be the global camera 0.
    rep = lambda x: jnp.tile(x[0:1], (8,) + (1,) * (x.ndim - 1))
    cams = shard_cameras(DPCameras(
        w2c_rot=rep(sp.cameras.w2c_rot), w2c_tran=rep(sp.cameras.w2c_tran),
        sh_vecs=rep(sp.cameras.sh_vecs), images=rep(sp.cameras.images)),
        mesh)
    dp_step = make_dp_train_step(sp.cameras.grid, sp.cfg, tcfg, bspec,
                                 rspec, mesh)
    cam_local = jax.device_put(
        jnp.zeros((8,), jnp.int32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    s2, m2 = dp_step(replicate_state(fresh_state(), mesh), cams, cam_local,
                     lrs)

    np.testing.assert_allclose(float(m1["l1"]), float(m2["l1"]), rtol=1e-6)
    for k in ("pos", "opa", "rgb", "quat", "scale"):
        np.testing.assert_allclose(
            np.asarray(s1.params[k]), np.asarray(s2.params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(s1.accum_grad),
                               np.asarray(s2.accum_grad),
                               rtol=1e-5, atol=1e-8)
