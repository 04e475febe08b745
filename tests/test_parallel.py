"""Multi-chip paths on the 8-device virtual CPU mesh: data-parallel training
step and tile-sharded rendering must agree with the single-device pipeline."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsplat_tpu.config import TrainConfig
from gsplat_tpu.models.splatter import Splatter, render_cropped
from gsplat_tpu.parallel.mesh import make_mesh
from gsplat_tpu.parallel.data_parallel import (
    DPCameras,
    make_dp_train_step,
    replicate_state,
    shard_cameras,
)
from gsplat_tpu.parallel.tile_parallel import make_tile_sharded_render
from gsplat_tpu.train import TrainState, Trainer, init_adam

from fixtures import make_scene
from test_train_e2e import _splat


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

@pytest.fixture(scope="module")
def scene8(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene8")
    make_scene(str(d), n_points=80, n_cameras=8, w=64, h=64)
    return str(d)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step(scene8):
    sp = _splat(scene8)
    tcfg = TrainConfig(n_iters=4, n_iters_warmup=2, ssim_weight=0.1, lr=0.01)
    mesh = make_mesh({"data": 8})
    bspec, rspec = sp.specs()
    step = make_dp_train_step(sp.cameras.grid, sp.cfg, tcfg, bspec, rspec,
                              mesh)
    cams = shard_cameras(DPCameras(
        w2c_rot=sp.cameras.w2c_rot, w2c_tran=sp.cameras.w2c_tran,
        sh_vecs=sp.cameras.sh_vecs, images=sp.cameras.images), mesh)
    state = replicate_state(TrainState(
        params=sp.table.params(), live=sp.table.live,
        opt=init_adam(sp.table.params()),
        accum_grad=jnp.zeros_like(sp.table.pos),
        grad_counter=jnp.zeros(sp.table.capacity, jnp.float32)), mesh)
    cam_local = jax.device_put(
        jnp.zeros((8,), jnp.int32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    lrs = jnp.full((5,), 0.01, jnp.float32)

    l_prev = None
    for _ in range(3):
        state, metrics = step(state, cams, cam_local, lrs)
        l = float(metrics["loss"])
        assert np.isfinite(l)
        if l_prev is not None:
            assert l < l_prev * 1.5
        l_prev = l
    p = np.asarray(state.params["pos"])
    assert np.isfinite(p).all()


def test_tile_sharded_render_matches_single(scene8):
    # tiny culling threshold: band-boundary bbox rounding then has no
    # visible effect, so sharded == single to float tolerance
    sp = _splat(scene8, tile_culling_prob_thresh=1e-6,
                max_tiles_per_gaussian=64)
    mesh = make_mesh({"sp": 4})          # 64px height → 4 tile rows / 4 devices
    render = make_tile_sharded_render(sp.cameras.grid, sp.cfg,
                                      sp.table.capacity, mesh)
    img_sharded = render(sp.table.params(), sp.table.live,
                         sp.cameras.w2c_rot[0], sp.cameras.w2c_tran[0],
                         sp.cameras.sh_vecs[0])
    bspec, rspec = sp.specs()
    from gsplat_tpu.models.splatter import render_padded
    img_single, _ = render_padded(
        sp.table.params(), sp.table.live, sp.cameras.w2c_rot[0],
        sp.cameras.w2c_tran[0], sp.cameras.sh_vecs[0], sp.cameras.grid,
        sp.cfg, bspec, rspec)
    np.testing.assert_allclose(np.asarray(img_sharded),
                               np.asarray(img_single), atol=2e-4, rtol=1e-3)
