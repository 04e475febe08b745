"""Tile-sharded (spatial-parallel) rendering of a single camera.

The pixel plane is split into horizontal bands of tile rows, one band per
device on the ``sp`` mesh axis.  Projection is recomputed on every device
(cheap vmapped math on the replicated table); binning and rasterization run
on each device's band only — the analogue of sequence parallelism for this
workload, since per-frame cost scales with pixels x overlapping gaussians.

The trick that keeps all static shapes identical across shards: the image
plane is *translated* per shard instead of parameterizing the tile grid.
Compositing only consumes pixel–gaussian coordinate differences, so shifting
``mean2d.y`` by the band's centre offset and using a band-local grid is
exact; the SH lefttop vector is shifted by the same rows
(reference RayInfo geometry, splatter.py:305-321).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gsplat_tpu.models.camera import TileGrid
from gsplat_tpu.models.splatter import make_specs
from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs, pack_sorted
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.rasterize import rasterize


def make_tile_sharded_render(grid: TileGrid, cfg, capacity: int,
                             mesh: Mesh, axis: str = "sp", interpret=False):
    """Returns render(params, live, rot, tran, shv) → (3, padded_h, padded_w)
    channel-major, with the row axis sharded over ``axis``."""
    n_dev = mesh.shape[axis]
    if grid.n_tile_y % n_dev:
        raise ValueError(
            f"n_tile_y={grid.n_tile_y} not divisible by mesh axis {n_dev}")
    rows_per = grid.n_tile_y // n_dev
    band = TileGrid(width=grid.padded_width, height=rows_per * grid.tile_h,
                    focal_x=grid.focal_x, focal_y=grid.focal_y,
                    tile_h=grid.tile_h, tile_w=grid.tile_w)
    color_dim = 27 if cfg.use_sh_coeff else 3
    bspec, rspec = make_specs(band, capacity, cfg, color_dim)

    def shard_fn(params, live, rot, tran, shv):
        s = jax.lax.axis_index(axis)
        row0 = s * rows_per * grid.tile_h            # first pixel row of band
        # translate: band centre y (full-image units) → band-local origin
        # full-image pixel-y p maps to focal-normalized (p + .5 - H/2)/fy;
        # band-local uses (p_local + .5 - Hb/2)/fy with p = row0 + p_local
        shift_y = (row0 + band.padded_height / 2
                   - grid.padded_height / 2) / grid.focal_y
        proj = project_gaussians(
            params["pos"], params["quat"], params["scale"], rot, tran,
            near=cfg.near,
            half_width=grid.width * 1.2 / 2 / grid.focal_x,
            half_height=grid.height * 1.2 / 2 / grid.focal_y,
            scale_activation=cfg.scale_activation,
        )
        proj = proj._replace(
            visible=proj.visible & live,
            mean2d=proj.mean2d - jnp.stack(
                [jnp.float32(0.0), shift_y])[None, :])
        opa = jax.nn.sigmoid(params["opa"])
        color = params["rgb"] if cfg.use_sh_coeff else jax.nn.sigmoid(
            params["rgb"])
        if getattr(cfg, "fused_pack", True):
            geom_n = jnp.concatenate(
                [proj.mean2d, proj.cov2d, opa[:, None],
                 jnp.zeros((opa.shape[0], 1), opa.dtype)], axis=1)
            packed, binned = pack_sorted(bspec, geom_n, color, proj.depth,
                                         proj.visible)
        else:
            binned = bin_gaussians(proj, bspec)
            packed = pack_pairs(binned, proj, opa, color,
                                k_width=bspec.max_tiles_per_gaussian)
        shv_band = shv.at[1].add(row0.astype(jnp.float32) * shv[3])
        img = rasterize(packed, binned, rspec,
                        sh_vecs=shv_band if cfg.use_sh_coeff else None,
                        use_pallas=cfg.use_pallas, interpret=interpret)
        return img                                   # (3, band_h, W)

    rep = P()
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=({k: rep for k in ("pos", "rgb", "opa", "quat", "scale")},
                  rep, rep, rep, rep),
        out_specs=P(None, axis),       # bands stack on the row axis (chw)
        check_vma=False,
    )
    return jax.jit(sharded)
