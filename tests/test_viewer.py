"""Viewer: headless render_offscreen (near/far/SH-order wiring) and the
run_viewer control surface / live-training loop against a fake viser server.

The reference exposes near/far/SH-order sliders but never forwards them
into rendering (visergui.py:137-149); here they must actually change the
image, so these tests assert visible effects.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
from fixtures import make_scene  # noqa: E402

from gsplat_tpu.config import SplatConfig, TrainConfig  # noqa: E402
from gsplat_tpu.models.splatter import Splatter  # noqa: E402
from gsplat_tpu.viewer import camera_to_w2c, render_offscreen, run_viewer  # noqa: E402


pytestmark = pytest.mark.slow  # e2e tier: run with -m slow

@pytest.fixture(scope="module")
def splat(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    make_scene(str(root), n_points=120, n_cameras=6, w=96, h=64,
               downsample=1)
    cfg = SplatConfig(use_pallas=False, capacity_round=256,
                      render_downsample=1)
    return Splatter(str(root / "sparse" / "0"), str(root / "images_1"), cfg)


def _identity_w2c(splat):
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = np.asarray(splat.cameras.w2c_rot[0])
    w2c[:3, 3] = np.asarray(splat.cameras.w2c_tran[0])
    return w2c


def test_render_offscreen_near_far_wiring(splat):
    g = splat.cameras.grid
    w2c = _identity_w2c(splat)
    base = render_offscreen(splat, w2c, g.width, g.height,
                            g.focal_x, g.focal_y)
    assert base.shape == (g.height, g.width, 3)
    assert float(np.abs(base).sum()) > 0

    # a tiny far plane culls everything → black
    culled = render_offscreen(splat, w2c, g.width, g.height,
                              g.focal_x, g.focal_y, far=1e-3)
    np.testing.assert_array_equal(culled, 0.0)

    # a huge near plane culls everything → black
    culled2 = render_offscreen(splat, w2c, g.width, g.height,
                               g.focal_x, g.focal_y, near=1e6)
    np.testing.assert_array_equal(culled2, 0.0)

    # permissive planes reproduce the base image
    same = render_offscreen(splat, w2c, g.width, g.height,
                            g.focal_x, g.focal_y, near=splat.cfg.near,
                            far=1e9)
    np.testing.assert_allclose(same, base, atol=1e-6)


def test_render_offscreen_sh_order(tmp_path):
    make_scene(str(tmp_path), n_points=80, n_cameras=4, w=64, h=48,
               downsample=1)
    cfg = SplatConfig(use_pallas=False, capacity_round=256,
                      render_downsample=1, use_sh_coeff=True)
    sp = Splatter(str(tmp_path / "sparse" / "0"), str(tmp_path / "images_1"),
                  cfg)
    # give the higher bands real energy so truncation is visible
    rgb = np.asarray(sp.table.rgb)
    rng = np.random.default_rng(0)
    rgb = rgb + rng.normal(0, 0.5, rgb.shape).astype(np.float32)
    sp.table = sp.table._replace(rgb=jnp.asarray(rgb))
    g = sp.cameras.grid
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = np.asarray(sp.cameras.w2c_rot[0])
    w2c[:3, 3] = np.asarray(sp.cameras.w2c_tran[0])
    full = render_offscreen(sp, w2c, g.width, g.height, g.focal_x, g.focal_y,
                            sh_order=3)
    dc = render_offscreen(sp, w2c, g.width, g.height, g.focal_x, g.focal_y,
                          sh_order=1)
    assert float(np.abs(full - dc).max()) > 1e-3
    again = render_offscreen(sp, w2c, g.width, g.height, g.focal_x,
                             g.focal_y)
    np.testing.assert_allclose(again, full, atol=1e-6)


# ---------------------------------------------------------------------------
# fake viser server: exercises the full run_viewer loop headlessly
# ---------------------------------------------------------------------------

class _Ctl:
    def __init__(self, value=None):
        self.value = value
        self.disabled = False
        self.name = ""
        self._cbs = []

    def on_update(self, fn):
        self._cbs.append(fn)
        return fn

    on_click = on_update

    def fire(self):
        for fn in self._cbs:
            fn(None)


class _Camera:
    def __init__(self):
        self.wxyz = np.array([1.0, 0.0, 0.0, 0.0])
        self.position = np.array([0.0, 0.0, 0.0])
        self.aspect = 1.5
        self.fov = 1.0
        self.up_direction = None
        self._cbs = []

    def on_update(self, fn):
        self._cbs.append(fn)
        return fn


class _Client:
    def __init__(self):
        self.camera = _Camera()
        self.images = []

    def set_background_image(self, img, format="jpeg"):
        self.images.append(np.asarray(img))


class _FakeServer:
    def __init__(self):
        self.controls = {}
        self.client = _Client()
        self._connect_cbs = []

    def add_gui_slider(self, name, min, max, step, initial_value,
                       disabled=False):
        c = _Ctl(initial_value)
        c.disabled = disabled
        self.controls[name] = c
        return c

    def add_gui_button(self, name):
        c = _Ctl()
        self.controls[name] = c
        return c

    def add_gui_checkbox(self, name, initial_value=False):
        c = _Ctl(initial_value)
        self.controls[name] = c
        return c

    def add_gui_text(self, name, initial_value="", disabled=False):
        c = _Ctl(initial_value)
        self.controls[name] = c
        return c

    def on_client_connect(self, fn):
        self._connect_cbs.append(fn)
        return fn

    def get_clients(self):
        return {0: self.client}


def test_run_viewer_loop_and_controls(splat):
    srv = _FakeServer()
    srv.controls_after = None
    run_viewer(splat, server=srv, max_iters=2)
    # control-surface parity with reference visergui.py:36-68
    for name in ("Reset View", "Train Viewer Update Period",
                 "Pause Training", "SH Order", "Resolution", "Near", "Far",
                 "Show Train Camera", "FPS"):
        assert name in srv.controls, name
    # a frame was pushed and the FPS readout updated
    assert len(srv.client.images) >= 1
    assert srv.controls["FPS"].value != "-1"
    # frames render at the LADDER-quantized signature (at most one compile
    # per rung per session — arbitrary slider/viewport values must not each
    # produce a fresh executable)
    from gsplat_tpu.viewer import snap_resolution
    img = srv.client.images[-1]
    w, h, _ = snap_resolution(int(srv.controls["Resolution"].value),
                              srv.client.camera.aspect,
                              srv.client.camera.fov)
    assert img.shape[1] == w
    assert img.shape[0] == h
    assert h % 16 == 0
    # reset view sets the camera up direction from the current orientation
    srv.controls["Reset View"].fire()
    np.testing.assert_allclose(srv.client.camera.up_direction,
                               [0.0, -1.0, 0.0], atol=1e-6)


def test_resolution_ladder_bounds_signatures(splat):
    """Sweeping the resolution slider across many values must produce at
    most one render signature per ladder rung (VERDICT: a GUI slider notch
    used to cost a fresh multi-minute compile each)."""
    from gsplat_tpu.viewer import RES_LADDER, snap_resolution
    g = splat.cameras.grid
    w2c = _identity_w2c(splat)
    splat._offscreen_cache = {}
    seen = set()
    for res in range(384, 2049, 97):      # 18 distinct slider values
        w, h, fov = snap_resolution(res, aspect=4 / 3, fov=np.deg2rad(75))
        assert w in RES_LADDER and h % 16 == 0
        seen.add((w, h))
        fx = w / 2 / np.tan(fov / 2)
        render_offscreen(splat, w2c, w, h, fx, fx)
    assert len(splat._offscreen_cache) == len(seen) <= 6


def test_run_viewer_live_training_and_pause(splat):
    from gsplat_tpu.train import Trainer

    tcfg = TrainConfig(ssim_weight=0.0, n_iters_warmup=5, n_iters_test=0,
                       n_save_train_img=0)
    trainer = Trainer(splat, tcfg)
    srv = _FakeServer()
    srv.controls["__period__"] = None
    run_viewer(splat, server=srv, trainer=trainer, max_iters=2)
    period = int(srv.controls["Train Viewer Update Period"].value)
    assert getattr(trainer, "_gui_iter", 0) == 2 * period
    # pause gates the training loop
    srv2 = _FakeServer()
    trainer2 = Trainer(splat, tcfg)
    # wire pause before the loop runs: click during construction is not
    # possible, so run once paused via a pre-toggled server
    run_viewer(splat, server=srv2, trainer=trainer2, max_iters=0)
    srv2.controls["Pause Training"].fire()
    assert srv2.controls["Pause Training"].name == "Resume Training"
    assert srv2.controls["Train Viewer Update Period"].disabled is False
