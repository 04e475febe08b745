"""Visible-row candidate-plane budget: identical images when the budget
covers all visible gaussians; diagnostics when it doesn't."""

import numpy as np
import pytest
import jax.numpy as jnp

from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.rasterize import rasterize

from helpers import image_space_scene


def test_visible_budget_exact_when_covering(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    n_vis = int(np.asarray(proj.visible).sum())
    assert n_vis < 80

    b_full = bin_gaussians(proj, bspec)
    img_full = rasterize(pack_pairs(b_full, proj, opa, color,
                                    k_width=bspec.max_tiles_per_gaussian),
                         b_full, rspec, use_pallas=False)

    bspec_v = bspec._replace(visible_rows=n_vis)
    b_v = bin_gaussians(proj, bspec_v)
    assert int(b_v.n_visible) == n_vis
    assert int(b_v.n_vis_dropped) == 0
    assert int(b_v.n_pairs) == int(b_full.n_pairs)
    img_v = rasterize(pack_pairs(b_v, proj, opa, color,
                                 k_width=bspec_v.max_tiles_per_gaussian),
                      b_v, rspec, use_pallas=False)
    np.testing.assert_allclose(np.asarray(img_v), np.asarray(img_full),
                               atol=1e-6)


@pytest.mark.slow
def test_visible_budget_grads_match(rng):
    import jax

    proj, opa, color, bspec, rspec = image_space_scene(rng, n=60)
    n_vis = int(np.asarray(proj.visible).sum())
    bspec_v = bspec._replace(visible_rows=n_vis)

    def loss(bs, opa_, color_):
        b = bin_gaussians(proj, bs)
        packed = pack_pairs(b, proj, opa_, color_,
                            k_width=bs.max_tiles_per_gaussian)
        img = rasterize(packed, b, rspec, use_pallas=False)
        return jnp.sum(img ** 2)

    g1 = jax.grad(lambda o, c: loss(bspec, o, c), argnums=(0, 1))(opa, color)
    g2 = jax.grad(lambda o, c: loss(bspec_v, o, c), argnums=(0, 1))(opa, color)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_visible_budget_overflow_drops_farthest(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=80)
    n_vis = int(np.asarray(proj.visible).sum())
    budget = max(n_vis - 5, 1)
    b = bin_gaussians(proj, bspec._replace(visible_rows=budget))
    assert int(b.n_vis_dropped) == n_vis - budget
    img = rasterize(pack_pairs(b, proj, opa, color,
                               k_width=bspec.max_tiles_per_gaussian),
                    b, rspec, use_pallas=False)
    assert np.isfinite(np.asarray(img)).all()
