"""Degenerate inputs: empty scenes, all-culled views, single gaussian.

The reference handles the zero-gaussian case with explicit early returns
(splatter.py:563-564, 588-589); the padded-static design must handle them
through the same code path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.projection import ProjectedGaussians
from gsplat_tpu.ops.rasterize import rasterize

from helpers import image_space_scene


def test_all_invisible(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    proj = proj._replace(visible=jnp.zeros_like(proj.visible))
    binned = bin_gaussians(proj, bspec)
    assert int(binned.n_pairs) == 0
    img = rasterize(pack_pairs(binned, proj, opa, color,
                               k_width=bspec.max_tiles_per_gaussian),
                    binned, rspec, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(img), 0.0)


def test_all_invisible_grads_zero(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    proj = proj._replace(visible=jnp.zeros_like(proj.visible))
    binned = bin_gaussians(proj, bspec)

    def loss(opa_, color_):
        packed = pack_pairs(binned, proj, opa_, color_,
                            k_width=bspec.max_tiles_per_gaussian)
        return jnp.sum(rasterize(packed, binned, rspec, use_pallas=False))

    g = jax.grad(loss, argnums=(0, 1))(opa, color)
    for gi in g:
        np.testing.assert_array_equal(np.asarray(gi), 0.0)


def test_single_gaussian(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=1)
    proj = proj._replace(visible=jnp.ones_like(proj.visible),
                         mean2d=jnp.zeros_like(proj.mean2d))
    binned = bin_gaussians(proj, bspec)
    assert int(binned.n_pairs) >= 1
    img = np.asarray(rasterize(
        pack_pairs(binned, proj, opa, color,
                   k_width=bspec.max_tiles_per_gaussian),
        binned, rspec, use_pallas=False))
    assert np.isfinite(img).all() and img.max() > 0


def test_zero_opacity_renders_black(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=30)
    binned = bin_gaussians(proj, bspec)
    img = rasterize(pack_pairs(binned, proj, jnp.zeros_like(opa), color,
                               k_width=bspec.max_tiles_per_gaussian),
                    binned, rspec, use_pallas=False)
    np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)


def test_degenerate_covariance(rng):
    """Zero/negative-det covariances must neither bin nor NaN."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=20)
    bad_cov = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 0.0]], jnp.float32),
                       (20, 1))
    proj = proj._replace(cov2d=bad_cov)
    binned = bin_gaussians(proj, bspec)
    assert int(binned.n_pairs) == 0  # det <= 0 rejected (gaussian.cu:226)
    img = rasterize(pack_pairs(binned, proj, opa, color,
                               k_width=bspec.max_tiles_per_gaussian),
                    binned, rspec, use_pallas=False)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_chunk_budget_overflow_fail_safe(rng):
    """Tiles truncated by the chunk budget must render black, never garbage.

    Regression: with nc_used > NC a truncated tile's chunk_last never fires,
    so the pallas forward leaves its output rows unwritten (uninitialized
    HBM).  rasterize() must zero exactly those tiles via binned.tile_ok and
    report the overflow in n_dropped.
    """
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    # big enough budget first: ground truth
    big = bin_gaussians(proj, bspec)
    assert int(big.n_dropped) == 0
    ref = rasterize(pack_pairs(big, proj, opa, color,
                               k_width=bspec.max_tiles_per_gaussian),
                    big, rspec, use_pallas=True, interpret=True)
    refarr = np.asarray(ref)

    # shrink the budget below what the scene needs
    g = bspec.chunk_size
    small = bspec._replace(slot_capacity=3 * g)
    binned = bin_gaussians(proj, small)
    assert int(binned.n_dropped) > 0
    img = rasterize(pack_pairs(binned, proj, opa, color,
                               k_width=small.max_tiles_per_gaussian),
                    binned, rspec, use_pallas=True, interpret=True)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    tile_ok = np.asarray(binned.tile_ok)
    assert not tile_ok.all()
    th, tw = rspec.tile_h, rspec.tile_w
    for t in range(rspec.n_tiles):
        ty, tx = divmod(t, rspec.n_tile_x)
        blk = arr[:, ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
        if tile_ok[t]:
            np.testing.assert_allclose(
                blk,
                refarr[:, ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw],
                atol=1e-5)
        else:
            np.testing.assert_array_equal(blk, 0.0)

    # gradients through the truncated render stay finite (the backward
    # zeroes never-written forward rows via tile_ok)
    def loss(opa_, color_):
        img2 = rasterize(pack_pairs(binned, proj, opa_, color_,
                                    k_width=small.max_tiles_per_gaussian),
                         binned, rspec, use_pallas=True, interpret=True)
        return jnp.sum(img2)

    grads = jax.grad(loss, argnums=(0, 1))(opa, color)
    assert np.isfinite(np.asarray(grads[0])).all()
    assert np.isfinite(np.asarray(grads[1])).all()
