"""Interactive web viewer (viser) — parity with reference ``visergui.py``.

Renders the current gaussian table for the connected client's camera and
streams JPEG backgrounds; resolution/near sliders and an FPS readout mirror
``visergui.py:29-168``.  The device-side render is the same jitted pipeline
used for evaluation; only numpy images cross to the host.

viser is an optional dependency (it is not bundled in the TPU image); the
module degrades to a clear error message when missing.  For headless
environments :func:`render_offscreen` provides the same camera-math path
without a server, and is unit-tested.
"""

from __future__ import annotations

import time
from collections import deque

import numpy as np

from gsplat_tpu.models.camera import TileGrid, ray_info
from gsplat_tpu.models.splatter import make_specs, render_cropped
from gsplat_tpu.utils.so3 import quat_to_rotmat_np


def camera_to_w2c(wxyz: np.ndarray, position: np.ndarray) -> np.ndarray:
    """viser camera (c2w quaternion + position) → 4x4 w2c (visergui.py:14-23)."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = quat_to_rotmat_np(wxyz)
    c2w[:3, 3] = position
    return np.linalg.inv(c2w)


def render_offscreen(splat, w2c: np.ndarray, width: int, height: int,
                     focal_x: float, focal_y: float, interpret=False):
    """Render an arbitrary camera (the GUI path, splatter.py:467-487)."""
    import jax.numpy as jnp

    cfg = splat.cfg
    grid = TileGrid(width=int(width), height=int(height),
                    focal_x=focal_x, focal_y=focal_y,
                    tile_h=cfg.tile_h, tile_w=cfg.tile_w)
    bspec, rspec = make_specs(grid, splat.table.capacity, cfg,
                              27 if cfg.use_sh_coeff else 3)
    rot, tran = w2c[:3, :3], w2c[:3, 3]
    shv = np.stack(list(ray_info(rot, tran, grid.padded_height,
                                 grid.padded_width, focal_x, focal_y
                                 ).values()))
    img, _ = render_cropped(
        splat.table.params(), splat.table.live,
        jnp.asarray(rot, jnp.float32), jnp.asarray(tran, jnp.float32),
        jnp.asarray(shv, jnp.float32), grid, cfg, bspec, rspec,
        interpret=interpret)
    return np.asarray(img)


def run_viewer(splat, port: int = 6789):
    try:
        import viser
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "viser is not installed in this environment; install it to use "
            "--gui, or use render_offscreen() for headless rendering"
        ) from e

    server = viser.ViserServer(port=port)
    resolution = server.add_gui_slider("Resolution", min=384, max=4096,
                                       step=2, initial_value=1024)
    near = server.add_gui_slider("Near", min=0.1, max=30, step=0.5,
                                 initial_value=0.1)
    fps_text = server.add_gui_text("FPS", initial_value="-1", disabled=True)
    need_update = {"v": True}
    render_times = deque(maxlen=3)

    @resolution.on_update
    def _(_):
        need_update["v"] = True

    @near.on_update
    def _(_):
        need_update["v"] = True

    @server.on_client_connect
    def _(client):
        @client.camera.on_update
        def _(_):
            need_update["v"] = True

    print(f"viewer on port {port}")
    while True:
        if not need_update["v"]:
            time.sleep(0.01)
            continue
        need_update["v"] = False
        for client in server.get_clients().values():
            cam = client.camera
            w2c = camera_to_w2c(cam.wxyz, cam.position)
            W = int(resolution.value)
            H = int(W / cam.aspect)
            focal = W / 2 / np.tan(cam.fov / 2)
            t0 = time.perf_counter()
            try:
                img = render_offscreen(splat, w2c, W, H, focal, focal)
            except Exception as e:  # parity: visergui.py:155-158
                print(e)
                continue
            render_times.append(time.perf_counter() - t0)
            client.set_background_image(img.astype(np.float32), format="jpeg")
            fps_text.value = f"{1.0 / np.mean(render_times):.3g}"
