"""Synthetic scenes for benchmarking and compile checks (no dataset needed).

Gaussian statistics are tuned so tile binning produces realistic pair counts
(a few tiles per gaussian), making the synthetic benchmark representative of
the Garden-scene workload the reference reports numbers on (README.md:34-48,
~506k gaussians at 1297x840).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gsplat_tpu.models.camera import TileGrid, ray_info
from gsplat_tpu.models.gaussians import GaussianTable
from gsplat_tpu.ops.sh import initialize_sh
from gsplat_tpu.utils.so3 import inverse_sigmoid, quat_to_rotmat_np


def synthetic_table(n: int, capacity_round: int = 65536, use_sh=False,
                    seed: int = 0, depth_range=(2.0, 8.0),
                    frustum=(0.65, 0.45), scale_px=2.5, focal=1000.0,
                    opa=0.5, headroom: float = 1.15,
                    ball=None, sh_ampl: float = 0.0) -> GaussianTable:
    """Random gaussian table.

    Default layout fills the frustum of a camera at the origin looking +z.
    ``ball=(cx, cy, cz, r, view_dist)`` instead fills a sphere — the
    layout for orbit-camera scenes where cameras circle the cloud
    (well-conditioned multi-view geometry, like a real capture);
    ``view_dist`` sets the on-screen splat size.
    """
    rng = np.random.default_rng(seed)
    if ball is not None:
        cx, cy, cz, r, view_dist = ball
        u = rng.normal(size=(n, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
        rad = r * rng.uniform(0.0, 1.0, n) ** (1 / 3)
        pos = (np.array([cx, cy, cz]) + u * rad[:, None]).astype(np.float32)
        dist = np.full((n,), view_dist, np.float32)
    else:
        z = rng.uniform(*depth_range, n)
        x = rng.uniform(-frustum[0], frustum[0], n) * z
        y = rng.uniform(-frustum[1], frustum[1], n) * z
        pos = np.stack([x, y, z], 1).astype(np.float32)
        dist = z
    # world-space scale giving ~scale_px pixels on screen at given focal
    scale = (rng.uniform(0.5, 1.5, (n, 3)) * scale_px * dist[:, None]
             / focal).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    rgb01 = rng.uniform(0.05, 0.95, (n, 3))
    rgb = (-np.log(1.0 / rgb01 - 1.0)).astype(np.float32)

    cap = max(int(np.ceil(n * headroom / capacity_round)) * capacity_round,
              capacity_round)

    def pad(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    if use_sh:
        rgb_j = np.asarray(initialize_sh(jnp.asarray(rgb)))
        if sh_ampl:
            # view-dependent content: random degree-1/2 coefficients (the
            # DC term keeps the base color).  Ground truth built with this
            # cannot be represented by any view-independent RGB model —
            # part of the non-realizable quality-proof scene (VERDICT r3).
            hi = rng.normal(0.0, sh_ampl, (n, 3, 9)).astype(np.float32)
            hi[:, :, 0] = 0.0
            rgb_j = rgb_j + hi.reshape(n, 27)
        rgb_p = np.zeros((cap, 27), np.float32)
        rgb_p[:n] = rgb_j
        rgb_out = jnp.asarray(rgb_p)
    else:
        rgb_out = pad(rgb)
    quat_p = np.zeros((cap, 4), np.float32)
    quat_p[:, 0] = 1
    quat_p[:n] = quat
    live = np.zeros((cap,), bool)
    live[:n] = True
    return GaussianTable(
        pos=pad(pos), rgb=rgb_out,
        opa=pad(np.full((n,), inverse_sigmoid(opa), np.float32),
                fill=inverse_sigmoid(1e-4)),
        quat=jnp.asarray(quat_p), scale=pad(scale),
        live=jnp.asarray(live), n_live=jnp.asarray(n, jnp.int32),
    )


def synthetic_cameras(m: int, width: int, height: int, focal: float,
                      tile_h=16, tile_w=16, seed: int = 0,
                      with_images=True):
    """Ring of slightly perturbed cameras near the origin looking +z."""
    rng = np.random.default_rng(seed)
    grid = TileGrid(width=width, height=height, focal_x=focal, focal_y=focal,
                    tile_h=tile_h, tile_w=tile_w)
    rots, trans, shvs = [], [], []
    for i in range(m):
        angle = 0.05 * np.sin(2 * np.pi * i / max(m, 1))
        q = np.array([np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0])
        rot = quat_to_rotmat_np(q)
        tran = np.array([0.05 * (i % 5 - 2), 0.03 * (i % 3 - 1), 0.0])
        rots.append(rot)
        trans.append(tran)
        shvs.append(np.stack(list(ray_info(
            rot, tran, grid.padded_height, grid.padded_width,
            focal, focal).values())))
    images = None
    if with_images:
        # channel-major, matching the render pipeline layout
        images = jnp.asarray(
            rng.integers(0, 255, (m, 3, height, width), dtype=np.uint8))
    return {
        "w2c_rot": jnp.asarray(np.stack(rots), jnp.float32),
        "w2c_tran": jnp.asarray(np.stack(trans), jnp.float32),
        "sh_vecs": jnp.asarray(np.stack(shvs), jnp.float32),
        "images": images,
        "grid": grid,
    }


def tune_budgets(cfg, table, cams, grid, bspec):
    """Mirror the trainer's budget retunes for a synthetic scene: set
    cfg.visible_rows / pair_capacity / col_caps from one observed view so
    benches and traces run the TRAINED spec regime, not the generous
    initial one.  Returns (n_visible, n_pairs, fills)."""
    import jax

    from gsplat_tpu.ops.binning import _tile_bbox
    from gsplat_tpu.ops.projection import project_gaussians

    kmax = bspec.max_tiles_per_gaussian

    # cameras enter as jit ARGUMENTS, never closure constants: a closed-over
    # device array must be fetched to host during lowering (MLIR constant),
    # which makes *tracing* the first device touch of the process — that
    # fetch is exactly what died with FAILED_PRECONDITION in BENCH_r03
    rot0, tran0 = cams["w2c_rot"][0], cams["w2c_tran"][0]

    @jax.jit
    def observe(params, live, rot, tran):
        proj = project_gaussians(
            params["pos"], params["quat"], params["scale"],
            rot, tran, cfg.near,
            grid.width * 1.2 / 2 / grid.focal_x,
            grid.height * 1.2 / 2 / grid.focal_y,
            cfg.scale_activation)
        vis = proj.visible & live
        _, _, rw, rh = _tile_bbox(bspec, proj.mean2d, proj.cov2d, vis)
        cov = jnp.minimum(rw * rh, kmax)
        fills = jnp.stack([jnp.sum(cov > k) for k in range(kmax)])
        return jnp.sum(vis), jnp.sum(cov), fills

    n_vis, n_pairs, fills = jax.device_get(
        observe(table.params(), table.live, rot0, tran0))
    cfg.visible_rows = min(
        max((int(n_vis) * 135 // 100 // 4096 + 1) * 4096, 8192),
        table.capacity)
    # slots = pairs + ~(G/2) alignment pad per tile + margin (the trainer's
    # nc_used-based retune equivalent, estimated from one view)
    g = cfg.chunk_size
    cfg.pair_capacity = max(
        int((int(n_pairs) + bspec.n_tiles * (g // 2)) * 1.25), 4096)
    if cfg.plane_mode == "colcap":
        # 15% margin over the single observed view's fills (cross-view
        # variance at Garden-like 60% visibility is ~5%; overflow degrades
        # into column clipping of the deepest rows, reported + retuned)
        cfg.col_caps = tuple(
            min(max((int(f) * 23 // 20 // 4096 + 1) * 4096, 4096),
                cfg.visible_rows) for f in fills)

    # pad_rows auto marker (0): observe the pad need at the FULL reservation
    # first, then cap the pool; -1 and explicit values pass through
    tune_pad = int(getattr(cfg, "pad_rows", -1)) == 0
    if tune_pad:
        cfg.pad_rows = -1

    if getattr(cfg, "fused_pack", True) and cfg.plane_mode == "colcap":
        # phase 2: ONE real pack at the estimated spec.  Observed nc_used
        # prices in everything the bbox estimate can't see — the sub-LSB
        # cull, the dist-method radius test, column clipping — exactly like
        # the trainer's nc_used retune; the bbox estimate alone leaves the
        # chunk grid (and kernel time) sized for the uncalled workload.
        from gsplat_tpu.models.splatter import make_specs
        from gsplat_tpu.ops.binning import pack_sorted

        c_dim = 27 if cfg.use_sh_coeff else 3
        bspec2, _ = make_specs(grid, table.capacity, cfg, c_dim)

        @jax.jit
        def observe_pack(params, live, rot, tran):
            proj = project_gaussians(
                params["pos"], params["quat"], params["scale"],
                rot, tran, cfg.near,
                grid.width * 1.2 / 2 / grid.focal_x,
                grid.height * 1.2 / 2 / grid.focal_y,
                cfg.scale_activation)
            opa = jax.nn.sigmoid(params["opa"])
            n = opa.shape[0]
            geom_n = jnp.concatenate(
                [proj.mean2d, proj.cov2d.reshape(n, -1), opa[:, None],
                 jnp.zeros((n, 1), opa.dtype)], axis=1)
            colors = (params["rgb"] if cfg.use_sh_coeff
                      else jax.nn.sigmoid(params["rgb"]))
            _, meta = pack_sorted(bspec2, geom_n, colors, proj.depth,
                                  proj.visible & live)
            return meta.n_chunks_used, meta.n_pairs, meta.n_pad_used

        ncu, n_pairs, n_pad = jax.device_get(
            observe_pack(table.params(), table.live, rot0, tran0))
        cfg.pair_capacity = max(int(ncu) * g * 115 // 100, 4096)
        if tune_pad:
            # 1.35 margin over one view's observed alignment pads, 4096
            # rounding — overflow degrades fail-safe (tiles past the break
            # render zero + reported) exactly like the other budgets
            cfg.pad_rows = max(
                (int(n_pad) * 135 // 100 // 4096 + 1) * 4096, 4096)
    return int(n_vis), int(n_pairs), [int(f) for f in fills]
