#!/usr/bin/env python
"""Isolate backward-pass costs: pack VJP, l1-only grad, ssim grad."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.config import SplatConfig, TrainConfig
from gsplat_tpu.models.splatter import make_specs, render_cropped
from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.losses import l1_loss, ssim
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.synthetic import synthetic_cameras, synthetic_table

N = 506_627
W, H, F = 1297, 840, 1000.0
M = 12

cfg = SplatConfig()
table = synthetic_table(N, focal=F, scale_px=2.5)
cams = synthetic_cameras(M, W, H, F)
grid = cams["grid"]
bspec, rspec = make_specs(grid, table.capacity, cfg, 3)
params, live = table.params(), table.live


def proj_of(c):
    p = project_gaussians(params["pos"], params["quat"], params["scale"],
                          cams["w2c_rot"][c], cams["w2c_tran"][c], cfg.near,
                          grid.width * 1.2 / 2 / F, grid.height * 1.2 / 2 / F,
                          cfg.scale_activation)
    return p._replace(visible=p.visible & live)


def slope(f, name, k1=1, k2=5):
    float(f(0))
    def run(k, o):
        r = None
        for i in range(k):
            r = f((o + i) % M)
        return float(r)
    t0 = time.perf_counter(); run(k1, 1); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2, 1 + k1); tb = time.perf_counter() - t0
    print(f"{name:24s} {(tb-ta)/(k2-k1)*1000:9.2f} ms", flush=True)


# (a) pack fwd+bwd only (binning recomputed, int-only → no vjp)
@jax.jit
def g_pack(c):
    p = proj_of(c)
    b = bin_gaussians(p, bspec)

    def f(pp, opa, rgb):
        pr = p._replace(mean2d=pp)
        packed = pack_pairs(b, pr, opa, rgb)
        return jnp.sum(packed * (1.0 + 1e-6 * packed))

    g = jax.grad(f, argnums=(0, 1, 2))(
        p.mean2d, jax.nn.sigmoid(params["opa"]), jax.nn.sigmoid(params["rgb"]))
    return g[0][0, 0] + g[1][0]


# (b) full render grad with L1 only
def mkloss(use_ssim):
    def loss(prm, c):
        img, _ = render_cropped(prm, live, cams["w2c_rot"][c],
                                cams["w2c_tran"][c], cams["sh_vecs"][c],
                                grid, cfg, bspec, rspec)
        gt = cams["images"][c].astype(jnp.float32) / 255.0
        l = l1_loss(img, gt)
        if use_ssim:
            l = l + (1.0 - ssim(img, gt))
        return l
    return loss


@jax.jit
def g_l1(c):
    g = jax.grad(mkloss(False))(params, c)
    return g["pos"][0, 0] + g["opa"][0]


@jax.jit
def g_ssim(c):
    g = jax.grad(mkloss(True))(params, c)
    return g["pos"][0, 0] + g["opa"][0]


# (c) ssim alone on images
@jax.jit
def g_ssim_only(c):
    a = cams["images"][c].astype(jnp.float32) / 255.0
    b = cams["images"][(c + 1) % M].astype(jnp.float32) / 255.0

    def f(x):
        return 1.0 - ssim(x, b)
    return jax.grad(f)(a)[0, 0, 0]


slope(g_pack, "pack fwd+bwd")
slope(g_ssim_only, "ssim fwd+bwd alone")
slope(g_l1, "render grad (L1 only)")
slope(g_ssim, "render grad (L1+SSIM)")
