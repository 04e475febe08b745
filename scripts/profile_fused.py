#!/usr/bin/env python
"""Stage-slope profile of the FUSED train/render pipeline at bench scale.

Replaces the stale legacy-route profile_stages.py: runs the same tuned-spec
regime as bench.py (tune_budgets prologue), times cumulative stages of the
fused pack_sorted path, each as ONE lax.scan dispatch (slope between two
scan lengths, one host scalar fetch each — host-loop timing measures the
~30 ms tunnel dispatch, not device time).  Per-stage cost = delta between
consecutive cumulative rows.

Flags mirror bench.py's route switches so the gather/cull variants can be
traced: --gather_colors/--gather_geom/--cull_sublsb/--use_sh_coeff.
"""

import argparse
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    if os.environ.get("FORCE_CPU"):   # CPU smoke (sitecustomize overrides
        jax.config.update("jax_platforms", "cpu")   # JAX_PLATFORMS itself)

    from gsplat_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from gsplat_tpu.config import SplatConfig, TrainConfig
    from gsplat_tpu.models.splatter import make_specs, render_padded
    from gsplat_tpu.ops.binning import pack_sorted
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.synthetic import (
        synthetic_cameras, synthetic_table, tune_budgets)
    from gsplat_tpu.train import make_loss_fn

    ap = argparse.ArgumentParser()
    ap.add_argument("--use_sh_coeff", type=int, default=0)
    ap.add_argument("--gather_colors", type=int, default=-1)
    ap.add_argument("--gather_geom", type=int, default=-1)
    ap.add_argument("--cull_sublsb", type=int, default=-1)
    ap.add_argument("--k_small", type=int, default=4)
    ap.add_argument("--k_big", type=int, default=16)
    args = ap.parse_args()
    use_sh = bool(args.use_sh_coeff)

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    if on_tpu:
        n_gauss, w, h, focal = 506_627, 1297, 840, 1000.0
        m_cams = 48
    else:
        n_gauss, w, h, focal = 20_000, 320, 240, 260.0
        m_cams = 8

    cfg = SplatConfig(use_pallas=True, use_sh_coeff=use_sh, fused_pack=True,
                      gather_colors=int(args.gather_colors),
                      gather_geom=int(args.gather_geom),
                      cull_sublsb=int(args.cull_sublsb))
    tcfg = TrainConfig(ssim_weight=0.1)
    table = synthetic_table(n_gauss, focal=focal, scale_px=2.5,
                            use_sh=use_sh, frustum=(0.85, 0.55))
    cams = synthetic_cameras(m_cams, w, h, focal)
    grid = cams["grid"]
    bspec, rspec = make_specs(grid, table.capacity, cfg, 27 if use_sh else 3)
    n_vis, n_pairs, _ = tune_budgets(cfg, table, cams, grid, bspec)
    bspec, rspec = make_specs(grid, table.capacity, cfg, 27 if use_sh else 3)
    print(f"# tuned: n_visible={n_vis} n_pairs={n_pairs} "
          f"visible_rows={cfg.visible_rows} slot_cap={bspec.slot_capacity} "
          f"NC={bspec.num_chunks} gather_colors={bspec.gather_colors} "
          f"gather_geom={bspec.gather_geom} cull={bspec.cull_sublsb}",
          flush=True)

    params0, live = table.params(), table.live
    fx2 = grid.width * 1.2 / 2 / focal
    fy2 = grid.height * 1.2 / 2 / focal

    # params flow in as jit ARGUMENTS (a closed-over table is a compile-time
    # constant: XLA folds whole pipeline stages out of the timed graph)
    def proj_at(params, c):
        p = project_gaussians(params["pos"], params["quat"],
                              params["scale"], cams["w2c_rot"][c],
                              cams["w2c_tran"][c], cfg.near, fx2, fy2,
                              cfg.scale_activation)
        return p._replace(visible=p.visible & live)

    def colors_of(params):
        return (params["rgb"] if use_sh
                else jax.nn.sigmoid(params["rgb"]))

    def geom_n_of(params, p):
        opa = jax.nn.sigmoid(params["opa"])
        n = opa.shape[0]
        return jnp.concatenate(
            [p.mean2d, p.cov2d.reshape(n, -1), opa[:, None],
             jnp.zeros((n, 1), opa.dtype)], axis=1)

    # ---- cumulative stage bodies (each consumes everything it computes) --
    def body_project(params, c):
        p = proj_at(params, c)
        return (p.mean2d[0, 0] + p.depth[0] + p.cov2d[0, 0]
                + jnp.sum(p.visible).astype(jnp.float32))

    def body_pack(params, c):
        p = proj_at(params, c)
        packed, meta = pack_sorted(
            bspec, geom_n_of(params, p), colors_of(params), p.depth,
            p.visible)
        g, col = packed
        # consume EVERY output: XLA prunes unused variadic-sort operands
        # (PERF.md "Corrected primitive costs"), which would untime them
        return (jnp.sum(g) * 1e-6 + jnp.sum(col) * 1e-6
                + jnp.sum(meta.chunk_len).astype(jnp.float32) * 1e-3
                + meta.n_pairs.astype(jnp.float32))

    def body_fwd(params, c):
        img, aux = render_padded(params, live, cams["w2c_rot"][c],
                                 cams["w2c_tran"][c], cams["sh_vecs"][c],
                                 grid, cfg, bspec, rspec,
                                 interpret=interpret)
        return img[0, 0, 0] + jnp.sum(img[:, 0, :]) * 1e-6

    loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec, interpret)

    def body_loss(params, c):
        gt = cams["images"][c].astype(jnp.float32) / 255.0
        l, _ = loss_fn(params, live, cams["w2c_rot"][c],
                       cams["w2c_tran"][c], cams["sh_vecs"][c], gt)
        return l

    def body_grad(params, c):
        gt = cams["images"][c].astype(jnp.float32) / 255.0
        g, _ = jax.grad(loss_fn, has_aux=True)(
            params, live, cams["w2c_rot"][c], cams["w2c_tran"][c],
            cams["sh_vecs"][c], gt)
        return g["pos"][0, 0] + g["opa"][0] + jnp.sum(g["rgb"][0]) * 1e-6

    def scan_fn(body, k):
        @jax.jit
        def run(params, salt):
            def step(acc, c):
                return acc + body(params, c) * 1e-9 + salt * 0.0, None
            cs = jnp.arange(k, dtype=jnp.int32) % m_cams
            acc, _ = jax.lax.scan(step, salt, cs)
            return acc
        return run

    def slope_ms(body, name):
        ks, kb = args.k_small, args.k_big
        fs, fb = scan_fn(body, ks), scan_fn(body, kb)
        float(fs(params0, jnp.float32(0)))   # compile
        float(fb(params0, jnp.float32(0)))
        def t(f):
            best = 1e9
            for r in range(2):
                t0 = time.perf_counter()
                float(f(params0, jnp.float32(r + 1)))
                best = min(best, time.perf_counter() - t0)
            return best
        ms = (t(fb) - t(fs)) / (kb - ks) * 1000
        print(f"{name:10s} {ms:9.2f} ms", flush=True)
        return ms

    rows = [("project", body_project), ("pack", body_pack),
            ("fwd", body_fwd), ("loss", body_loss), ("grad", body_grad)]
    prev = 0.0
    for name, body in rows:
        cum = slope_ms(body, name)
        print(f"  -> delta {name}: {cum - prev:+.2f} ms", flush=True)
        prev = cum


if __name__ == "__main__":
    main()
