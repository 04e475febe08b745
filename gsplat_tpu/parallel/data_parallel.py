"""Camera-level data-parallel training over a device mesh.

Each device of the ``data`` axis holds its shard of the ground-truth images
(pixels never cross ICI), renders its own sampled camera against the
replicated gaussian table, and the per-parameter gradients are ``pmean``-ed
across the axis before a replicated Adam update — the idiomatic TPU
replacement for the communication layer the single-GPU reference never had
(SURVEY.md §2 "Parallelism & distributed inventory").

Effective batch size = mesh axis size (cameras per step).  Gradient
accumulation for densification uses the pmean-ed gradients and a pmean-ed
visibility counter, so densification thresholds keep the single-chip scale.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gsplat_tpu.config import SplatConfig, TrainConfig
from gsplat_tpu.train import AdamState, GROUP_ORDER, TrainState, \
    adam_update, make_loss_fn, window_scan


class DPCameras(NamedTuple):
    """Per-mesh-shard camera data: leading axis M is sharded over 'data'."""

    w2c_rot: jnp.ndarray   # (M, 3, 3)
    w2c_tran: jnp.ndarray  # (M, 3)
    sh_vecs: jnp.ndarray   # (M, 4, 3)
    images: jnp.ndarray    # (M, 3, H, W) uint8 (channel-major)


def make_dp_train_step(grid, cfg: SplatConfig, tcfg: TrainConfig, bspec,
                       rspec, mesh: Mesh, axis: str = "data",
                       interpret=False):
    """Returns step(state, cameras, cam_local, lrs) → (state, metrics).

    - state: TrainState with replicated leaves
    - cameras: DPCameras, leading axis sharded over ``axis``
    - cam_local: (D,) int32, one *local* camera index per device, sharded
    - lrs: (5,) replicated
    """
    loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec, interpret)
    b1, b2, eps = tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps

    def shard_fn(state: TrainState, cams: DPCameras, cam_local, lrs):
        idx = cam_local[0]
        rot = cams.w2c_rot[idx]
        tran = cams.w2c_tran[idx]
        shv = cams.sh_vecs[idx]
        gt = cams.images[idx].astype(jnp.float32) / 255.0
        grads, (metrics, aux, _img) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.live, rot, tran, shv, gt)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        new_params, new_opt = adam_update(state.params, grads, state.opt,
                                          lrs, b1, b2, eps)
        pg = jnp.abs(grads["pos"])
        if tcfg.grad_accum_method == "mean":
            accum = state.accum_grad + pg
            counter = state.grad_counter + jax.lax.pmean(
                aux["visible"].astype(jnp.float32), axis)
        else:
            accum = jnp.maximum(state.accum_grad, pg)
            counter = jnp.ones_like(state.grad_counter)
        new_state = TrainState(new_params, state.live, new_opt, accum, counter)
        return new_state, metrics

    rep = P()
    state_specs = jax.tree.map(lambda _: rep, TrainState(
        params={k: 0 for k in GROUP_ORDER}, live=0,
        opt=AdamState(mu={k: 0 for k in GROUP_ORDER},
                      nu={k: 0 for k in GROUP_ORDER}, t=0),
        accum_grad=0, grad_counter=0))
    cam_specs = DPCameras(*(P(axis),) * 4)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(state_specs, cam_specs, P(axis), rep),
        out_specs=(state_specs, rep),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_train_window(splat, tcfg: TrainConfig, mesh: Mesh,
                         axis: str = "data", interpret=False,
                         group: int = 0):
    """Data-parallel K-step training window (the Trainer's ``--dp`` path).

    Per dispatch: each device of the ``data`` axis runs the same K-step
    lax.scan on its own camera column of the (K, D) index array, gradients
    pmean over ICI inside every step, Adam stays replicated — effective
    batch = D cameras per optimizer step.  Camera arrays are passed
    replicated (pixels never cross the interconnect; the gaussian table is
    the replicated model state, exactly the layout the scaling-book DP
    recipe prescribes for a model this small).

    Returns window(state, cam_idxs (K, D), lrs (K, 5), clear (K,)) →
    (state, metrics) with replicated outputs.
    """
    cfg = splat.cfg
    cams = splat.camera_groups[group]
    grid = cams.grid
    bspec, rspec = splat.specs(grid)
    loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec, interpret)
    cam_arrays = DPCameras(w2c_rot=cams.w2c_rot, w2c_tran=cams.w2c_tran,
                           sh_vecs=cams.sh_vecs, images=cams.images)

    def shard_fn(state: TrainState, cam_arr: DPCameras, cam_idxs,
                 lrs_arr, clear_flags):
        # cam_idxs arrives as the local (K, 1) column of the (K, D) plane
        return window_scan(loss_fn, tcfg, cam_arr, state,
                           cam_idxs[:, 0], lrs_arr, clear_flags,
                           pmean_axis=axis)

    rep = P()
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, rep, P(None, axis), rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )

    def window(state, cam_idxs, lrs_arr, clear_flags):
        return sharded(state, cam_arrays, cam_idxs, lrs_arr, clear_flags)

    return jax.jit(window, donate_argnums=(0,))


def shard_cameras(cameras: DPCameras, mesh: Mesh, axis: str = "data"
                  ) -> DPCameras:
    """Place camera arrays with the leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return DPCameras(*(jax.device_put(x, sh) for x in cameras))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)
