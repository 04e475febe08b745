#!/usr/bin/env python
"""Sub-stage scan-slope profile of the colcap pack_sorted forward.

VERDICT r3 #1: the pack stage is 81% of a render frame but the fused-route
profile (profile_fused.py) stops at "pack" granularity.  This decomposes
pack into cumulative prefixes via the ``_stop`` debug checkpoints in
``_pack_sorted_colcap_impl``:

  order    depth argsort x2 (order + inv_order)
  cov      tile bbox on the full table + coverage + column fills
  perm     composite coverage/depth argsort x2
  gather   (Vr, 8)+(Vr, c) row gathers to composed order
  bbox     channel-major transpose + bbox rows + rank gather
  plane    per-column candidate loop -> pair_key/flat/channel concats
  keysort  key-only sort at P rows
  meta     searchsorted + chunk metadata (NC scale)
  paysort  9-operand stable payload sort at P + pads rows
  full     fit/stack to channel-major (8, S) buffers

Each stage runs as one lax.scan dispatch; cost = slope between two scan
lengths; per-stage delta = difference of consecutive cumulative rows.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from gsplat_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from gsplat_tpu.config import SplatConfig
    from gsplat_tpu.models.splatter import make_specs
    from gsplat_tpu.ops.binning import _pack_sorted_colcap_impl
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.synthetic import (
        synthetic_cameras, synthetic_table, tune_budgets)

    ap = argparse.ArgumentParser()
    ap.add_argument("--use_sh_coeff", type=int, default=0)
    ap.add_argument("--k_small", type=int, default=8)
    ap.add_argument("--k_big", type=int, default=40)
    ap.add_argument("--n_gauss", type=int, default=0)
    ap.add_argument("--pad_rows", type=int, default=-1,
                    help="-1 full pad reservation, 0 auto-tune, >0 explicit")
    args = ap.parse_args()
    use_sh = bool(args.use_sh_coeff)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n_gauss, w, h, focal = 506_627, 1297, 840, 1000.0
        m_cams = 48
    else:
        n_gauss, w, h, focal = 20_000, 320, 240, 260.0
        m_cams = 8
    if args.n_gauss:
        n_gauss = int(args.n_gauss)

    cfg = SplatConfig(use_pallas=True, use_sh_coeff=use_sh, fused_pack=True,
                      gather_colors=-1, pad_rows=int(args.pad_rows))
    table = synthetic_table(n_gauss, focal=focal, scale_px=2.5,
                            use_sh=use_sh, frustum=(0.85, 0.55))
    cams = synthetic_cameras(m_cams, w, h, focal)
    grid = cams["grid"]
    c_dim = 27 if use_sh else 3
    bspec, _ = make_specs(grid, table.capacity, cfg, c_dim)
    n_vis, n_pairs, _ = tune_budgets(cfg, table, cams, grid, bspec)
    bspec, _ = make_specs(grid, table.capacity, cfg, c_dim)
    print(f"# tuned: n_visible={n_vis} n_pairs={n_pairs} "
          f"visible_rows={cfg.visible_rows} slot_cap={bspec.slot_capacity} "
          f"NC={bspec.num_chunks} col_caps={list(bspec.col_caps)}",
          flush=True)

    params0, live = table.params(), table.live
    rot_all, tran_all = cams["w2c_rot"], cams["w2c_tran"]
    fx2 = grid.width * 1.2 / 2 / focal
    fy2 = grid.height * 1.2 / 2 / focal

    def inputs_at(params, rot, tran):
        p = project_gaussians(params["pos"], params["quat"],
                              params["scale"], rot, tran, cfg.near, fx2,
                              fy2, cfg.scale_activation)
        opa = jax.nn.sigmoid(params["opa"])
        n = opa.shape[0]
        geom_n = jnp.concatenate(
            [p.mean2d, p.cov2d.reshape(n, -1), opa[:, None],
             jnp.zeros((n, 1), opa.dtype)], axis=1)
        colors = (params["rgb"] if use_sh
                  else jax.nn.sigmoid(params["rgb"]))
        return geom_n, colors, p.depth, p.visible & live

    def consume(tree):
        leaves = [x for x in jax.tree.leaves(tree) if x is not None]
        return sum(jnp.sum(x.astype(jnp.float32)) * 1e-9 for x in leaves)

    def body_for(stop):
        def body(params, rot, tran):
            geom_n, colors, depth, vis = inputs_at(params, rot, tran)
            out = _pack_sorted_colcap_impl(bspec, geom_n, colors, depth,
                                           vis, _stop=stop)
            return consume(out)
        return body

    def scan_fn(body, k):
        @jax.jit
        def run(params, salt, rots, trans):
            def step(acc, c):
                return acc + body(params, rots[c] + salt * 0.0,
                                  trans[c]) * 1e-9, None
            cs = jnp.arange(k, dtype=jnp.int32) % m_cams
            acc, _ = jax.lax.scan(step, salt, cs)
            return acc
        return run

    def slope_ms(body, name):
        ks, kb = args.k_small, args.k_big
        fs, fb = scan_fn(body, ks), scan_fn(body, kb)
        float(fs(params0, jnp.float32(0), rot_all, tran_all))
        float(fb(params0, jnp.float32(0), rot_all, tran_all))

        def t(f):
            best = 1e9
            for r in range(2):
                t0 = time.perf_counter()
                float(f(params0, jnp.float32(r + 1), rot_all, tran_all))
                best = min(best, time.perf_counter() - t0)
            return best
        ms = (t(fb) - t(fs)) / (kb - ks) * 1000
        return ms

    stages = ["order", "cov", "perm", "gather", "bbox", "plane",
              "keysort", "meta", "paysort", None]
    prev = 0.0
    # baseline row: projection alone (inputs_at), subtracted implicitly by
    # the first delta being vs the project-only row
    proj_ms = slope_ms(
        lambda p, r, t_: consume(inputs_at(p, r, t_)), "project")
    print(f"{'project':10s} {proj_ms:9.2f} ms", flush=True)
    prev = proj_ms
    for stop in stages:
        name = stop or "full"
        cum = slope_ms(body_for(stop), name)
        print(f"{name:10s} {cum:9.2f} ms   (delta {cum - prev:+.2f})",
              flush=True)
        prev = cum


if __name__ == "__main__":
    main()
