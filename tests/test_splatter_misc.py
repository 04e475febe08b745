"""Splatter behaviours: resolution switching, binning method variants."""

import os
import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from gsplat_tpu.config import SplatConfig
from gsplat_tpu.ops.binning import bin_gaussians, pack_pairs
from gsplat_tpu.ops.rasterize import rasterize

from fixtures import make_scene
from helpers import image_space_scene
from test_train_e2e import _splat


@pytest.mark.slow
def test_switch_resolution(tmp_path):
    make_scene(str(tmp_path), n_points=60, n_cameras=3, w=64, h=48,
               downsample=4)
    # fabricate an images_2 level at double resolution
    import cv2
    src = tmp_path / "images_4"
    dst = tmp_path / "images_2"
    dst.mkdir()
    for fn in os.listdir(src):
        im = cv2.imread(str(src / fn))
        cv2.imwrite(str(dst / fn), cv2.resize(im, None, fx=2, fy=2))

    sp = _splat(str(tmp_path))
    assert sp.cameras.grid.width == 64
    f4 = sp.cameras.grid.focal_x
    sp.switch_resolution(2)
    assert sp.cfg.render_downsample == 2
    assert sp.cameras.grid.width == 128 and sp.cameras.grid.height == 96
    np.testing.assert_allclose(sp.cameras.grid.focal_x, f4 * 2, rtol=1e-6)
    img = sp.render(0)
    assert img.shape == (3, 96, 128)  # channel-major
    # no-op switch keeps everything
    sp.switch_resolution(2)
    assert sp.cameras.grid.width == 128


def test_dist_binning_method(rng):
    """'dist' tile culling: centre-distance test (gaussian.cu:101-136)."""
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    thresh = (bspec.tile_len_x / 0.5) ** 2
    bspec_d = bspec._replace(method="dist", thresh=thresh)
    binned = bin_gaussians(proj, bspec_d)
    assert int(binned.n_pairs) > 0
    # brute-force the expected pair set
    vis = np.asarray(proj.visible)
    m = np.asarray(proj.mean2d)
    r = np.sqrt(thresh)
    expected = 0
    for t in range(bspec.n_tiles):
        ty, tx = divmod(t, bspec.n_tile_x)
        cx = bspec.leftmost + (tx + 0.5) * bspec.tile_len_x
        cy = bspec.topmost + (ty + 0.5) * bspec.tile_len_y
        d2 = (m[:, 0] - cx) ** 2 + (m[:, 1] - cy) ** 2
        expected += int(((d2 < thresh) & vis).sum())
    # our enumeration only visits tiles inside the bbox rect of radius r;
    # every centre-distance hit within that rect is found
    assert int(binned.n_pairs) <= expected
    assert int(binned.n_pairs) >= int(0.9 * expected)
    img = rasterize(pack_pairs(binned, proj, opa, color), binned, rspec,
                    use_pallas=False)
    assert np.isfinite(np.asarray(img)).all()


def test_prob_binning_equals_prob2(rng):
    proj, opa, color, bspec, rspec = image_space_scene(rng, n=40)
    b2 = bin_gaussians(proj, bspec._replace(method="prob2", thresh=0.05))
    b1 = bin_gaussians(proj, bspec._replace(method="prob", thresh=0.05))
    assert int(b1.n_pairs) == int(b2.n_pairs)
    np.testing.assert_array_equal(np.asarray(b1.chunk_tile),
                                  np.asarray(b2.chunk_tile))
