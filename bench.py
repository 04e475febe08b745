#!/usr/bin/env python
"""Benchmark: training it/s + render FPS at the reference's headline config.

Workload mirrors the reference's Garden fast config (README.md:36): ~506k
gaussians, 1297x840 images.  No dataset ships with the repo, so the scene is
synthetic with gaussian statistics tuned to Garden-like tile occupancy; the
timed pipeline (project → bin → sort → rasterize fwd+bwd → adam) is the real
one.

Both phases batch iterations inside one dispatch (lax.scan) because each
executable launch costs a host round-trip on remote-attached TPUs; timing is
slope-based (Δwall between two batch sizes) with host scalar fetches, since
identical dispatches can be served from a result cache on such tunnels.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Baselines (BASELINE.md): 13 train it/s, 60 render FPS on 1x GPU.
"""

import functools
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
        m_cams, k_small, k_big = 48, 8, 40
    else:  # CI / CPU smoke: tiny proxy
        n_gauss, w, h, focal = 20_000, 320, 240, 260.0
        m_cams, k_small, k_big = 8, 1, 3

    cfg = SplatConfig(use_pallas=True)
    tcfg = TrainConfig(ssim_weight=0.1)
    table = synthetic_table(n_gauss, focal=focal, scale_px=2.5)
    cams = synthetic_cameras(m_cams, w, h, focal)
    grid = cams["grid"]
    bspec, rspec = make_specs(grid, table.capacity, cfg, 3)

    # ---------------- render FPS (scan over frames, one dispatch) -------
    def frames_fn(k):
        @jax.jit
        def run(params, live, salt):
            def body(acc, c):
                img, _ = render_padded(
                    params, live, cams["w2c_rot"][c] + salt * 0.0,
                    cams["w2c_tran"][c], cams["sh_vecs"][c],
                    grid, cfg, bspec, rspec, interpret=interpret)
                return acc + img[0, 0, 0], None
            cs = (jnp.arange(k, dtype=jnp.int32) % m_cams)
            acc, _ = jax.lax.scan(body, salt, cs)
            return acc
        return run

    params, live = table.params(), table.live
    f_small, f_big = frames_fn(k_small), frames_fn(k_big)
    float(f_small(params, live, jnp.float32(0)))
    float(f_big(params, live, jnp.float32(0)))

    def tmin(f, reps=2):
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(f(params, live, jnp.float32(r + 1)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    fps = (k_big - k_small) / max(tmin(f_big) - tmin(f_small), 1e-9)

    # ---------------- train it/s (scan over steps, one dispatch) --------
    loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec, interpret)

    def steps_fn(k):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st):
            def body(st, c):
                gt = cams["images"][c].astype(jnp.float32) / 255.0
                grads, (m, aux, _img) = jax.grad(loss_fn, has_aux=True)(
                    st.params, st.live, cams["w2c_rot"][c],
                    cams["w2c_tran"][c], cams["sh_vecs"][c], gt)
                p, o = adam_update(st.params, grads, st.opt,
                                   jnp.full((5,), 1e-3, jnp.float32),
                                   tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps)
                accum = jnp.maximum(st.accum_grad, jnp.abs(grads["pos"]))
                return TrainState(p, st.live, o, accum,
                                  st.grad_counter), m["loss"]
            cs = (jnp.arange(k, dtype=jnp.int32) % m_cams)
            st, losses = jax.lax.scan(body, st, cs)
            return st, losses[-1]
        return run

    def fresh_state():
        p = jax.tree.map(jnp.copy, table.params())
        return TrainState(params=p, live=jnp.copy(table.live),
                          opt=init_adam(p),
                          accum_grad=jnp.zeros_like(p["pos"]),
                          grad_counter=jnp.zeros(table.capacity, jnp.float32))

    s_small, s_big = steps_fn(k_small), steps_fn(k_big)

    def time_steps(f):
        st = fresh_state()
        st, l = f(st)
        float(l)  # warm
        st2 = fresh_state()
        t0 = time.perf_counter()
        st2, l = f(st2)
        float(l)
        return time.perf_counter() - t0

    it_s = (k_big - k_small) / max(time_steps(s_big) - time_steps(s_small),
                                   1e-9)

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
