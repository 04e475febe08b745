#!/usr/bin/env python
"""Isolated pallas rasterizer timing: fwd and bwd, varying inputs per call."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.config import SplatConfig
from gsplat_tpu.models.splatter import make_specs
from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.rasterize import composite_chunks_pallas
from gsplat_tpu.synthetic import synthetic_cameras, synthetic_table

N = int(sys.argv[1]) if len(sys.argv) > 1 else 506_627
G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
W, H, F = 1297, 840, 1000.0

cfg = SplatConfig(chunk_size=G)
table = synthetic_table(N, focal=F, scale_px=2.5)
cams = synthetic_cameras(1, W, H, F, with_images=False)
grid = cams["grid"]
bspec, rspec = make_specs(grid, table.capacity, cfg, 3)
params, live = table.params(), table.live

proj = project_gaussians(
    params["pos"], params["quat"], params["scale"], cams["w2c_rot"][0],
    cams["w2c_tran"][0], cfg.near, grid.width * 1.2 / 2 / F,
    grid.height * 1.2 / 2 / F, cfg.scale_activation)
proj = proj._replace(visible=proj.visible & live)
binned = bin_gaussians(proj, bspec)
packed0 = pack_pairs(binned, proj, jax.nn.sigmoid(params["opa"]),
                     jax.nn.sigmoid(params["rgb"]))
print(f"G={G} slots={bspec.num_slots} chunks={bspec.num_chunks} "
      f"n_pairs={int(binned.n_pairs)} dropped={int(binned.n_dropped)}",
      flush=True)

gkey = jnp.asarray(np.random.default_rng(0).normal(
    size=(rspec.n_tiles + 1, 3, rspec.px)).astype(np.float32))


@jax.jit
def fwd(p):
    tiles, _ = composite_chunks_pallas(p, binned.chunk_tile,
                                       binned.chunk_first, binned.chunk_last,
                                       binned.chunk_len, rspec)
    return tiles[0, 0, 0] + tiles[100, 1, 5]


@jax.jit
def fwdbwd(p):
    def loss(p):
        tiles, _ = composite_chunks_pallas(
            p, binned.chunk_tile, binned.chunk_first, binned.chunk_last,
            binned.chunk_len, rspec)
        return jnp.sum(tiles * gkey)
    g = jax.grad(loss)(p)
    return g[0][0, 0] + g[0][-1, 6]


def slope(f, name, k1=2, k2=8):
    packs = [jax.tree.map(lambda x: x * (1.0 + 1e-6 * i), packed0)
             for i in range(k2 + k1 + 2)]
    float(f(packs[0]))
    def run(k, o):
        r = None
        for i in range(k):
            r = f(packs[o + i])
        return float(r)
    t0 = time.perf_counter(); run(k1, 1); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2, 1 + k1); tb = time.perf_counter() - t0
    ms = (tb - ta) / (k2 - k1) * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)


slope(fwd, f"pallas fwd (G={G})")
slope(fwdbwd, f"pallas fwd+bwd (G={G})", k1=1, k2=5)
