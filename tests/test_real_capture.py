"""Real-capture ingestion: JPG images + mixed COLMAP camera MODELS.

The reference trains directly on captured photos — cv2 JPEG decode plus
whatever camera model COLMAP assigned (splatter.py:429-454, :499-500).  All
other fixtures here render clean PNGs from PINHOLE cameras, so this covers
the two real-capture behaviours those miss:

 * SIMPLE_RADIAL (and the other single-focal models), where params are
   (f, cx, cy, k) — the reference reads params[1] (= cx) as fy, silently
   stretching every such capture; ``camera_focals`` extracts per-model.
 * lossy JPEG decode through the cv2 path.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from fixtures import make_real_capture_scene  # noqa: E402

from gsplat_tpu.config import SplatConfig, TrainConfig  # noqa: E402
from gsplat_tpu.models.splatter import Splatter  # noqa: E402
from gsplat_tpu.train import Trainer  # noqa: E402
from gsplat_tpu.utils.colmap import Camera, camera_focals  # noqa: E402


def test_camera_focals_per_model():
    # single-focal: fx = fy = params[0] (cx would be wrong as fy)
    simple = Camera(id=1, model="SIMPLE_RADIAL", width=96, height=64,
                    params=np.array([70.0, 48.0, 32.0, 0.01]))
    assert camera_focals(simple) == (70.0, 70.0)
    pin = Camera(id=2, model="PINHOLE", width=64, height=48,
                 params=np.array([60.0, 61.0, 32.0, 24.0]))
    assert camera_focals(pin) == (60.0, 61.0)
    opencv = Camera(id=3, model="OPENCV", width=64, height=48,
                    params=np.array([55.0, 56.0, 32.0, 24.0, 0.0, 0, 0, 0]))
    assert camera_focals(opencv) == (55.0, 56.0)


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    root = tmp_path_factory.mktemp("capture")
    make_real_capture_scene(str(root))
    cfg = SplatConfig(use_pallas=False, capacity_round=256,
                      render_downsample=1)
    return Splatter(str(root / "sparse" / "0"), str(root / "images_1"), cfg)


def test_jpg_mixed_model_groups(capture):
    # SIMPLE_RADIAL 96x64 (4 views) + PINHOLE 64x48 (3 views)
    assert len(capture.camera_groups) == 2
    sizes = sorted((g.grid.width, g.grid.height, g.n_cameras)
                   for g in capture.camera_groups)
    assert sizes == [(64, 48, 3), (96, 64, 4)]
    # the SIMPLE_RADIAL group's focal came from params[0], not params[1]
    big = next(g for g in capture.camera_groups if g.grid.width == 96)
    assert big.grid.focal_x == pytest.approx(70.0)
    assert big.grid.focal_y == pytest.approx(70.0)
    # JPEG decode produced plausible photos (not blank / not saturated)
    im = np.asarray(big.images[0])
    assert im.shape == (3, 64, 96) and im.dtype == np.uint8
    assert 5 < im.mean() < 250 and im.std() > 2


@pytest.mark.slow
def test_jpg_scene_short_train(capture):
    tcfg = TrainConfig(ssim_weight=0.1, n_iters_warmup=3, n_iters_test=0,
                       n_save_train_img=0, seed=1)
    tr = Trainer(capture, tcfg)
    l_first = None
    for i in range(12):
        m = tr.train_step(i)
        if i == 0:
            l_first = float(m["l1"])
    assert float(m["l1"]) < l_first
    ev = tr.evaluate()
    assert np.isfinite(ev["psnr"]) and ev["psnr"] > 10
