#!/usr/bin/env python
"""Stage-by-stage slope timing of the train pipeline on the TPU.

Each stage is its own jitted function; inputs vary per call (camera cycle)
to defeat the tunnel's result cache; timing is (t(big run) - t(small run))
around host scalar fetches.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.config import SplatConfig, TrainConfig
from gsplat_tpu.models.splatter import make_specs, render_padded
from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.rasterize import composite_chunks_pallas, assemble_image
from gsplat_tpu.synthetic import synthetic_cameras, synthetic_table
from gsplat_tpu.train import make_loss_fn

N = int(sys.argv[1]) if len(sys.argv) > 1 else 506_627
W, H, F = 1297, 840, 1000.0
M = 48

cfg = SplatConfig()
tcfg = TrainConfig(ssim_weight=0.1)
table = synthetic_table(N, focal=F, scale_px=2.5)
cams = synthetic_cameras(M, W, H, F)
grid = cams["grid"]
bspec, rspec = make_specs(grid, table.capacity, cfg, 3)
print(f"capacity={table.capacity} slot_cap={bspec.slot_capacity} "
      f"num_chunks={bspec.num_chunks} n_tiles={bspec.n_tiles}", flush=True)

params, live = table.params(), table.live


def mkproj(c):
    return project_gaussians(
        params["pos"], params["quat"], params["scale"],
        cams["w2c_rot"][c], cams["w2c_tran"][c],
        cfg.near, grid.width * 1.2 / 2 / F, grid.height * 1.2 / 2 / F,
        cfg.scale_activation)._replace


@jax.jit
def s_project(c):
    p = project_gaussians(params["pos"], params["quat"], params["scale"],
                          cams["w2c_rot"][c], cams["w2c_tran"][c],
                          cfg.near, grid.width * 1.2 / 2 / F,
                          grid.height * 1.2 / 2 / F, cfg.scale_activation)
    return p.mean2d[0, 0] + p.depth[0]


@jax.jit
def s_bin(c):
    p = project_gaussians(params["pos"], params["quat"], params["scale"],
                          cams["w2c_rot"][c], cams["w2c_tran"][c],
                          cfg.near, grid.width * 1.2 / 2 / F,
                          grid.height * 1.2 / 2 / F, cfg.scale_activation)
    p = p._replace(visible=p.visible & live)
    b = bin_gaussians(p, bspec)
    return b.n_pairs + b.aligned_idx[0]


@jax.jit
def s_pack(c):
    p = project_gaussians(params["pos"], params["quat"], params["scale"],
                          cams["w2c_rot"][c], cams["w2c_tran"][c],
                          cfg.near, grid.width * 1.2 / 2 / F,
                          grid.height * 1.2 / 2 / F, cfg.scale_activation)
    p = p._replace(visible=p.visible & live)
    b = bin_gaussians(p, bspec)
    packed = pack_pairs(b, p, jax.nn.sigmoid(params["opa"]),
                        jax.nn.sigmoid(params["rgb"]))
    return packed[0][0, 0] + packed[0][-1, 6] + b.n_pairs.astype(jnp.float32)


@jax.jit
def s_fwd(c):
    img, aux = render_padded(params, live, cams["w2c_rot"][c],
                             cams["w2c_tran"][c], cams["sh_vecs"][c],
                             grid, cfg, bspec, rspec)
    return img[0, 0, 0] + aux["n_pairs"].astype(jnp.float32)


loss_fn = make_loss_fn(grid, cfg, tcfg, bspec, rspec)


@jax.jit
def s_loss(c):
    gt = cams["images"][c].astype(jnp.float32) / 255.0
    l, _ = loss_fn(params, live, cams["w2c_rot"][c], cams["w2c_tran"][c],
                   cams["sh_vecs"][c], gt)
    return l


@jax.jit
def s_grad(c):
    gt = cams["images"][c].astype(jnp.float32) / 255.0
    g, _ = jax.grad(loss_fn, has_aux=True)(
        params, live, cams["w2c_rot"][c], cams["w2c_tran"][c],
        cams["sh_vecs"][c], gt)
    return g["pos"][0, 0] + g["opa"][0]


def slope(f, name, k1=2, k2=10):
    float(f(0))  # compile
    def run(k, o):
        r = None
        for i in range(k):
            r = f((o + i) % M)
        return float(r)
    run(1, 1)
    t0 = time.perf_counter(); run(k1, 2); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2, 2 + k1); tb = time.perf_counter() - t0
    ms = (tb - ta) / (k2 - k1) * 1000
    print(f"{name:12s} {ms:9.2f} ms", flush=True)
    return ms


if __name__ == "__main__":
    np_ = int(jax.jit(lambda c: bin_gaussians(
        project_gaussians(params["pos"], params["quat"], params["scale"],
                          cams["w2c_rot"][c], cams["w2c_tran"][c], cfg.near,
                          grid.width * 1.2 / 2 / F, grid.height * 1.2 / 2 / F,
                          cfg.scale_activation)._replace(visible=live),
        bspec).n_pairs)(0))
    print(f"actual n_pairs={np_} of slot_capacity={bspec.slot_capacity}",
          flush=True)
    slope(s_project, "project")
    slope(s_bin, "bin")
    slope(s_pack, "pack")
    slope(s_fwd, "fwd")
    slope(s_loss, "loss")
    slope(s_grad, "grad", k1=2, k2=6)
