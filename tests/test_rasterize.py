"""Rasterizer correctness: tiled pipeline vs naive oracle, pallas vs jnp.

The reference repo had no tests (SURVEY.md §4); its implicit oracle was the
deprecated torch path.  Here the chain is:
  naive per-pixel oracle  ==  chunked jnp compositor  ==  pallas kernels
with gradients checked across the custom_vjp boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.rasterize import (
    RasterSpec,
    assemble_image,
    composite_chunks_jnp,
    composite_chunks_pallas,
    rasterize,
)
from gsplat_tpu.ops.rasterize_ref import rasterize_oracle

from helpers import image_space_scene, oracle_inputs


def _render_jnp(proj, opa, color, bspec, rspec, sh_vecs=None):
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    return rasterize(packed, binned, rspec, sh_vecs, use_pallas=False), binned


def test_jnp_tiled_matches_oracle(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng)
    img, binned = _render_jnp(proj, opa, color, bspec, rspec)
    m, c, o, col = oracle_inputs(proj, opa, color)
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y)
    assert int(binned.n_clipped) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_early_stop_matches_oracle(rng):
    # near-opaque gaussians drive transmittance below 1e-4 fast
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=120)
    opa = jnp.minimum(opa * 10.0, 0.999)
    img, _ = _render_jnp(proj, opa, color, bspec, rspec)
    m, c, o, col = oracle_inputs(proj, opa, color)
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_pallas_forward_matches_jnp(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng)
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    tiles_j, accw_j = composite_chunks_jnp(
        packed, binned.chunk_tile, binned.chunk_first, binned.chunk_len,
        rspec)
    tiles_p, accw_p = composite_chunks_pallas(
        packed, binned.chunk_tile, binned.chunk_first, binned.chunk_last,
        binned.chunk_len, rspec, interpret=True)
    np.testing.assert_allclose(np.asarray(tiles_p), np.asarray(tiles_j[:, :3]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(accw_p), np.asarray(accw_j),
                               atol=1e-5, rtol=1e-5)


def test_pallas_grads_match_autodiff(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    gkey = jnp.asarray(
        np.random.default_rng(1).normal(size=(rspec.n_tiles + 1, 3, rspec.px)),
        jnp.float32)

    def loss_jnp(p):
        tiles, _ = composite_chunks_jnp(p, binned.chunk_tile,
                                        binned.chunk_first,
                                        binned.chunk_len, rspec)
        return jnp.sum(tiles[:, :3] * gkey)

    def loss_pallas(p):
        tiles, _ = composite_chunks_pallas(
            p, binned.chunk_tile, binned.chunk_first, binned.chunk_last,
            binned.chunk_len, rspec, interpret=True)
        return jnp.sum(tiles * gkey)

    gj = jax.grad(loss_jnp)(packed)
    gp = jax.grad(loss_pallas)(packed)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-3)


def test_sh_mode_matches_oracle(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=30, color_dim=27)
    sh_vecs = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 3)), jnp.float32)
    img, _ = _render_jnp(proj, opa, color, bspec, rspec, sh_vecs=sh_vecs)
    m, c, o, col = oracle_inputs(proj, opa, color)
    sv = {k: sh_vecs[i] for i, k in
          enumerate(["rays_o", "lefttop", "dx", "dy"])}
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y, sh_vecs=sv)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_sh_pallas_matches_jnp(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=30, color_dim=27)
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)
    sh_vecs = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 3)), jnp.float32)
    gkey = jnp.asarray(
        np.random.default_rng(1).normal(size=(rspec.n_tiles + 1, 3, rspec.px)),
        jnp.float32)

    def loss_jnp(p):
        tiles, _ = composite_chunks_jnp(p, binned.chunk_tile,
                                        binned.chunk_first,
                                        binned.chunk_len, rspec, sh_vecs)
        return jnp.sum(tiles[:, :3] * gkey)

    def loss_pallas(p):
        tiles, _ = composite_chunks_pallas(
            p, binned.chunk_tile, binned.chunk_first, binned.chunk_last,
            binned.chunk_len, rspec, sh_vecs, interpret=True)
        return jnp.sum(tiles * gkey)

    vj, gj = jax.value_and_grad(loss_jnp)(packed)
    vp, gp = jax.value_and_grad(loss_pallas)(packed)
    np.testing.assert_allclose(float(vp), float(vj), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-3)


def test_weight_normalize_forward(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng)
    rspec = rspec._replace(weight_normalize=True)
    img, _ = _render_jnp(proj, opa, color, bspec, rspec)
    m, c, o, col = oracle_inputs(proj, opa, color)
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y,
                           weight_normalize=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_grads_flow_to_gaussian_params(rng):
    """End-to-end: d(loss)/d(opa, color, mean2d, cov2d) through binning pack."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=25)
    binned = bin_gaussians(proj, bspec)

    def loss(mean2d, cov2d, opa_, color_):
        p = proj._replace(mean2d=mean2d, cov2d=cov2d)
        packed = pack_pairs(binned, p, opa_, color_)
        tiles, _ = composite_chunks_jnp(packed, binned.chunk_tile,
                                        binned.chunk_first, binned.chunk_len,
                                        rspec)
        return jnp.sum(tiles ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        proj.mean2d, proj.cov2d, opa, color)
    vis = np.asarray(proj.visible)
    for g in grads:
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g[vis]).sum() > 0
        # culled gaussians receive no gradient
        assert np.abs(g[~vis]).sum() == 0


@pytest.mark.slow
def test_weight_normalize_pallas_matches_jnp_fwd_and_grads(rng):
    """weight_normalize now trains on the pallas path: normalization is
    applied outside the kernel (assemble_image) and the backward kernel
    carries the accw (Σw) cotangent as a 4th composited channel.

    Also a regression: the old kernel normalized INSIDE at chunk_last while
    assemble_image normalized again — a double division on the pallas path.
    """
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=90)
    rspec = rspec._replace(weight_normalize=True)
    binned = bin_gaussians(proj, bspec)
    packed = pack_pairs(binned, proj, opa, color)

    def loss_jnp(pk):
        return jnp.sum(rasterize(pk, binned, rspec, use_pallas=False) ** 2)

    def loss_pallas(pk):
        return jnp.sum(rasterize(pk, binned, rspec, use_pallas=True,
                                 interpret=True) ** 2)

    vj, gj = jax.value_and_grad(loss_jnp)(packed)
    vp, gp = jax.value_and_grad(loss_pallas)(packed)
    np.testing.assert_allclose(float(vp), float(vj), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-3)

    # and against the naive oracle
    img = rasterize(packed, binned, rspec, use_pallas=True, interpret=True)
    m, c, o, col = oracle_inputs(proj, opa, color)
    ref = rasterize_oracle(m, c, o, col, rspec.padded_h, rspec.padded_w,
                           rspec.focal_x, rspec.focal_y,
                           weight_normalize=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
