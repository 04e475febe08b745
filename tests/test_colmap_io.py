"""COLMAP reader round-trips against the synthetic binary fixture."""

import numpy as np

from gsplat_tpu.utils.colmap import (
    read_cameras_binary,
    read_images_binary,
    read_points3d_arrays,
    read_points3d_binary,
)

from fixtures import make_scene


def test_colmap_roundtrip(tmp_path):
    make_scene(str(tmp_path), n_points=50, n_cameras=3)
    sparse = tmp_path / "sparse" / "0"

    cams = read_cameras_binary(sparse / "cameras.bin")
    assert len(cams) == 1
    cam = cams[1]
    assert cam.model == "PINHOLE"
    assert cam.width == 64 * 4 and cam.height == 48 * 4
    np.testing.assert_allclose(cam.params[:2], [240.0, 240.0])

    imgs = read_images_binary(sparse / "images.bin")
    assert len(imgs) == 3
    assert imgs[1].name == "img_000.png"
    assert imgs[1].camera_id == 1
    np.testing.assert_allclose(imgs[1].qvec, [1, 0, 0, 0])

    pts = read_points3d_binary(sparse / "points3D.bin")
    assert len(pts) == 50
    p = pts[1]
    assert p.rgb.shape == (3,)
    assert p.image_ids.tolist() == [1, 2]

    pos, rgb = read_points3d_arrays(sparse / "points3D.bin")
    assert pos.shape == (50, 3) and rgb.shape == (50, 3)
    np.testing.assert_allclose(pos[0], pts[1].xyz, rtol=1e-6)
    assert (rgb[0] == pts[1].rgb).all()
