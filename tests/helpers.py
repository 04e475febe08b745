"""Shared synthetic-scene builders for tests."""

import numpy as np
import jax.numpy as jnp

from gsplat_tpu.ops.projection import ProjectedGaussians
from gsplat_tpu.ops.binning import BinningSpec
from gsplat_tpu.ops.rasterize import RasterSpec


def image_space_scene(rng, n=60, n_tile_x=3, n_tile_y=2, focal=40.0,
                      color_dim=3, opa_max=0.9, sigma_px=(2.0, 10.0)):
    """Random image-space gaussians + matching Binning/Raster specs.

    Returns (proj, opa, color, bspec, rspec) with thresh tiny and K covering
    every tile, so the tiled pipeline ≈ the untiled oracle.
    """
    th = tw = 16
    w, h = n_tile_x * tw, n_tile_y * th
    half_w, half_h = w / 2 / focal, h / 2 / focal
    mean2d = np.stack([
        rng.uniform(-half_w, half_w, n),
        rng.uniform(-half_h, half_h, n),
    ], axis=1)
    # random SPD 2x2 covariance in focal-normalized units
    sig = rng.uniform(*sigma_px, (n, 2)) / focal
    theta = rng.uniform(0, np.pi, n)
    ct, st = np.cos(theta), np.sin(theta)
    R = np.stack([np.stack([ct, -st], -1), np.stack([st, ct], -1)], -2)
    cov = np.einsum("nij,nj,nkj->nik", R, sig ** 2, R)
    cov2d = cov.reshape(n, 4)
    depth = rng.uniform(1.0, 10.0, n)
    visible = rng.uniform(size=n) > 0.1
    opa = rng.uniform(0.1, opa_max, n)
    color = rng.uniform(0, 1, (n, color_dim))
    if color_dim != 3:
        color = rng.normal(0, 0.5, (n, color_dim))

    proj = ProjectedGaussians(
        mean2d=jnp.asarray(mean2d, jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
        cov2d=jnp.asarray(cov2d, jnp.float32),
        visible=jnp.asarray(visible),
    )
    n_tiles = n_tile_x * n_tile_y
    bspec = BinningSpec(
        n_tile_x=n_tile_x, n_tile_y=n_tile_y,
        tile_len_x=tw / focal, tile_len_y=th / focal,
        leftmost=-w / 2 / focal, topmost=-h / 2 / focal,
        max_tiles_per_gaussian=n_tiles,
        slot_capacity=((n * n_tiles + n_tiles * 128) // 128 + 1) * 128,
        chunk_size=128,
        method="prob2",
        thresh=1e-6,
    )
    rspec = RasterSpec(
        n_tile_x=n_tile_x, n_tile_y=n_tile_y, tile_h=th, tile_w=tw,
        focal_x=focal, focal_y=focal, chunk_size=128, color_dim=color_dim,
    )
    return proj, jnp.asarray(opa, jnp.float32), jnp.asarray(color, jnp.float32), bspec, rspec


def oracle_inputs(proj, opa, color):
    """Depth-sorted visible gaussians for rasterize_oracle."""
    depth = np.asarray(proj.depth)
    vis = np.asarray(proj.visible)
    idx = np.argsort(np.where(vis, depth, np.inf))
    idx = idx[vis[idx]]
    return (jnp.asarray(np.asarray(proj.mean2d)[idx]),
            jnp.asarray(np.asarray(proj.cov2d)[idx]),
            jnp.asarray(np.asarray(opa)[idx]),
            jnp.asarray(np.asarray(color)[idx]))
