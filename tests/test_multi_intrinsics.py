"""Multi-intrinsics scenes: camera grouping, per-group training, eval.

The reference rebuilds per-frame camera state on the host for arbitrary
per-image cameras (set_camera, splatter.py:467-511); the XLA design groups
cameras by (resolution, focal) signature and compiles one pipeline per
group (models/splatter.load_scene_camera_groups).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from fixtures import make_mixed_scene  # noqa: E402

from gsplat_tpu.config import SplatConfig, TrainConfig  # noqa: E402
from gsplat_tpu.models.splatter import Splatter  # noqa: E402
from gsplat_tpu.train import Trainer  # noqa: E402


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

@pytest.fixture(scope="module")
def mixed(tmp_path_factory):
    root = tmp_path_factory.mktemp("mixed")
    make_mixed_scene(str(root))
    cfg = SplatConfig(use_pallas=False, capacity_round=256,
                      render_downsample=1)
    return Splatter(str(root / "sparse" / "0"), str(root / "images_1"), cfg)


def test_groups_loaded(mixed):
    assert len(mixed.camera_groups) == 2
    sizes = sorted((g.grid.width, g.grid.height, g.n_cameras)
                   for g in mixed.camera_groups)
    assert sizes == [(64, 48, 4), (96, 64, 3)]
    # primary group is the largest
    assert mixed.cameras.n_cameras == 4


def test_mixed_scene_trains_and_evals(mixed):
    tcfg = TrainConfig(ssim_weight=0.1, n_iters_warmup=5, n_iters_test=0,
                       n_save_train_img=0, seed=1)
    tr = Trainer(mixed, tcfg)
    # splits cover both groups
    groups_in_train = {tr.flat_cams[i][0] for i in tr.train_split}
    assert groups_in_train == {0, 1}

    l_first = None
    for i in range(30):
        m = tr.train_step(i)
        if i == 0:
            l_first = float(m["l1"])
    # both group pipelines were actually compiled and used
    assert set(tr._step_cache.keys()) == {0, 1}
    l_last = float(m["l1"])
    assert l_last < l_first

    ev = tr.evaluate()
    assert np.isfinite(ev["psnr"]) and ev["psnr"] > 10

    # windows work per group too
    tr.train_window(30, 34)
    assert len(tr._window_cache) >= 1
