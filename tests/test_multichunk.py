"""Multi-chunk tiles: cross-chunk transmittance/color carries.

Regression for a real bug: a conditional 'freeze' of the early-stopped
transmittance carry let pixels resurrect at chunk boundaries, silently
corrupting pos/cov/opa gradients on any tile with more gaussians than one
chunk (G).  Small test scenes never exceeded one chunk per tile, so these
scenes force 10+ chunks per tile.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.rasterize import (
    composite_chunks_jnp,
    composite_chunks_pallas,
    rasterize,
)
from gsplat_tpu.ops.rasterize_ref import rasterize_oracle

from helpers import image_space_scene, oracle_inputs


def _dense_scene(rng, n=1500, opa_scale=0.5):
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=n, sigma_px=(4.0, 18.0))
    return proj, opa * opa_scale, color, bspec, rspec


def test_multichunk_fwd_matches_oracle(rng):
    proj, opa, color, bspec, rspec = _dense_scene(rng)
    binned = bin_gaussians(proj, bspec)
    n_chunks_used = int((np.asarray(binned.chunk_tile) < rspec.n_tiles).sum())
    assert n_chunks_used > 5 * rspec.n_tiles, "scene must be multi-chunk"
    packed = pack_pairs(binned, proj, opa, color)
    img = rasterize(packed, binned, rspec, use_pallas=False)
    m, c, o, col = oracle_inputs(proj, opa, color)
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=5e-4, rtol=1e-2)


def test_multichunk_early_stop_vs_oracle(rng):
    # near-opaque: transmittance dies mid-tile, often mid-chunk
    proj, opa, color, bspec, rspec = _dense_scene(rng, opa_scale=1.0)
    opa = jnp.minimum(opa * 5, 0.99)
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    img = rasterize(packed, binned, rspec, use_pallas=False)
    m, c, o, col = oracle_inputs(proj, opa, color)
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=5e-4, rtol=1e-2)


@pytest.mark.slow
def test_multichunk_sh_pallas_grads(rng):
    proj, opa, color, bspec, rspec = image_space_scene(
        rng, n=900, sigma_px=(4.0, 18.0), color_dim=27)
    opa = opa * 0.6
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    shv = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3)),
                      jnp.float32)
    gkey = jnp.asarray(np.random.default_rng(1).normal(
        size=(rspec.n_tiles + 1, 3, rspec.px)), jnp.float32)

    def lj(p):
        t, _ = composite_chunks_jnp(p, binned.chunk_tile, binned.chunk_first,
                                    binned.chunk_len, rspec, shv)
        return jnp.sum(t[:, :3] * gkey)

    def lp(p):
        t, _ = composite_chunks_pallas(p, binned.chunk_tile,
                                       binned.chunk_first, binned.chunk_last,
                                       binned.chunk_len, rspec, shv,
                                       interpret=True)
        return jnp.sum(t * gkey)

    gj = jax.grad(lj)(packed)
    gp = jax.grad(lp)(packed)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_multichunk_pallas_grads(rng):
    proj, opa, color, bspec, rspec = _dense_scene(rng, opa_scale=0.6)
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    gkey = jnp.asarray(np.random.default_rng(1).normal(
        size=(rspec.n_tiles + 1, 3, rspec.px)), jnp.float32)

    def lj(p):
        t, _ = composite_chunks_jnp(p, binned.chunk_tile, binned.chunk_first,
                                    binned.chunk_len, rspec)
        return jnp.sum(t[:, :3] * gkey)

    def lp(p):
        t, _ = composite_chunks_pallas(p, binned.chunk_tile,
                                       binned.chunk_first, binned.chunk_last,
                                       binned.chunk_len, rspec,
                                       interpret=True)
        return jnp.sum(t * gkey)

    vj, gj = jax.value_and_grad(lj)(packed)
    vp, gp = jax.value_and_grad(lp)(packed)
    np.testing.assert_allclose(float(vp), float(vj), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
