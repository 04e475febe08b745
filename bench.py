#!/usr/bin/env python
"""Benchmark: training it/s + render FPS at the reference's headline config.

Workload mirrors the reference's Garden fast config (README.md:36): ~506k
gaussians, 1297x840 images.  No dataset ships with the repo, so the scene is
synthetic with gaussian statistics tuned to Garden-like tile occupancy; the
timed pipeline (project → bin → sort → rasterize fwd+bwd → adam) is the real
one.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Baselines (BASELINE.md): 13 train it/s, 60 render FPS on 1x GPU.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import SplatConfig, TrainConfig
    from gsplat_tpu.models.splatter import make_specs, render_padded
    from gsplat_tpu.synthetic import synthetic_cameras, synthetic_table
    from gsplat_tpu.train import (
        TrainState, adam_update, init_adam, make_loss_fn)

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    if on_tpu:
        n_gauss, w, h, focal = 506_627, 1297, 840, 1000.0
        m_cams, frames, steps = 48, 40, 30
    else:  # CI / CPU smoke: tiny proxy
        n_gauss, w, h, focal = 20_000, 320, 240, 260.0
        m_cams, frames, steps = 8, 4, 3

    cfg = SplatConfig(use_pallas=True)
    tcfg = TrainConfig(ssim_weight=0.1)
    table = synthetic_table(n_gauss, focal=focal, scale_px=2.5)
    cams = synthetic_cameras(m_cams, w, h, focal)
    grid = cams["grid"]
    bspec, rspec = make_specs(grid, table.capacity, cfg, 3)

    # ---------------- render FPS ----------------
    import functools

    @jax.jit
    def render_fn(params, live, rot, tran, shv):
        img, _ = render_padded(params, live, rot, tran, shv, grid, cfg,
                               bspec, rspec, interpret=interpret)
        return img

    params, live = table.params(), table.live

    def run_frames(k, offset):
        for i in range(k):
            c = (offset + i) % m_cams
            img = render_fn(params, live, cams["w2c_rot"][c],
                            cams["w2c_tran"][c], cams["sh_vecs"][c])
        return float(img[0, 0, 0])  # host fetch drains the queue

    run_frames(2, 0)  # compile+warm
    t0 = time.perf_counter(); run_frames(2, 2); t_small = time.perf_counter() - t0
    t0 = time.perf_counter(); run_frames(frames, 4); t_big = time.perf_counter() - t0
    fps = (frames - 2) / max(t_big - t_small, 1e-9)

    # ---------------- train it/s ----------------
    loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec, interpret)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(st, cam_idx, lrs):
        rot = cams["w2c_rot"][cam_idx]
        tran = cams["w2c_tran"][cam_idx]
        shv = cams["sh_vecs"][cam_idx]
        gt = cams["images"][cam_idx].astype(jnp.float32) / 255.0
        grads, (metrics, aux, _img) = jax.grad(loss_fn, has_aux=True)(
            st.params, st.live, rot, tran, shv, gt)
        new_params, new_opt = adam_update(st.params, grads, st.opt, lrs,
                                          tcfg.adam_b1, tcfg.adam_b2,
                                          tcfg.adam_eps)
        accum = jnp.maximum(st.accum_grad, jnp.abs(grads["pos"]))
        return TrainState(new_params, st.live, new_opt, accum,
                          st.grad_counter), metrics["loss"]

    state = TrainState(params=table.params(), live=table.live,
                       opt=init_adam(table.params()),
                       accum_grad=jnp.zeros_like(table.pos),
                       grad_counter=jnp.zeros(table.capacity, jnp.float32))
    lrs = jnp.full((5,), 1e-3, jnp.float32)

    def run_steps(state, k):
        loss = None
        for i in range(k):
            state, loss = train_step(state, i % m_cams, lrs)
        return state, float(loss)

    state, _ = run_steps(state, 2)  # compile+warm
    t0 = time.perf_counter(); state, _ = run_steps(state, 2)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter(); state, _ = run_steps(state, steps)
    t_big = time.perf_counter() - t0
    it_s = (steps - 2) / max(t_big - t_small, 1e-9)

    print(json.dumps({
        "metric": "train_it_per_s@506k_gaussians_1297x840",
        "value": round(it_s, 3),
        "unit": "it/s",
        "vs_baseline": round(it_s / 13.0, 3),
        "render_fps": round(fps, 2),
        "render_fps_vs_baseline": round(fps / 60.0, 3),
        "backend": jax.default_backend(),
        "n_gaussians": n_gauss,
        "resolution": f"{w}x{h}",
    }))


if __name__ == "__main__":
    main()
