"""Camera, tile-grid and per-camera ray geometry.

TPU re-design of the reference's ``Tiles`` (``splatter.py:255-303``) and
``RayInfo`` (``splatter.py:305-321``):

- the image is padded to tile multiples and rendered padded, then cropped
  back centre-aligned (``Tiles.crop``, ``splatter.py:267-272``);
- tile bounds live in focal-normalized camera-plane units
  (``splatter.py:274-300``) — here only the derived scalars (leftmost,
  topmost, tile lengths) are kept since binning computes tile rectangles
  directly from them (the reference's per-tile bound arrays are only needed
  by its O(N·T) culling kernels, which we don't reproduce);
- ``RayInfo`` precomputes world-space lefttop/dx/dy/ray-origin vectors used
  for per-pixel SH view directions (``splatter.py:314-321``).

All of this is static host-side geometry; per-camera tensors are tiny.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    """Intrinsics (+ identity) of one camera; reference utils.py:21-26."""

    id: int
    width: int
    height: int
    focal_x: float
    focal_y: float
    model: str = "PINHOLE"


@dataclasses.dataclass(frozen=True)
class TileGrid:
    width: int
    height: int
    focal_x: float
    focal_y: float
    tile_h: int = 16
    tile_w: int = 16

    @property
    def padded_width(self) -> int:
        return int(math.ceil(self.width / self.tile_w)) * self.tile_w

    @property
    def padded_height(self) -> int:
        return int(math.ceil(self.height / self.tile_h)) * self.tile_h

    @property
    def n_tile_x(self) -> int:
        return self.padded_width // self.tile_w

    @property
    def n_tile_y(self) -> int:
        return self.padded_height // self.tile_h

    @property
    def n_tiles(self) -> int:
        return self.n_tile_x * self.n_tile_y

    # --- focal-normalized tile geometry (reference splatter.py:279-287) ---
    @property
    def tile_geo_length_x(self) -> float:
        return self.tile_w / self.focal_x

    @property
    def tile_geo_length_y(self) -> float:
        return self.tile_h / self.focal_y

    @property
    def leftmost(self) -> float:
        return -self.padded_width / 2.0 / self.focal_x

    @property
    def topmost(self) -> float:
        return -self.padded_height / 2.0 / self.focal_y

    @property
    def crop_top(self) -> int:
        return (self.padded_height - self.height) // 2

    @property
    def crop_left(self) -> int:
        return (self.padded_width - self.width) // 2

    def crop(self, image):
        """padded (Hp, Wp, C) → (H, W, C), centre-aligned (splatter.py:267-272)."""
        t, l = self.crop_top, self.crop_left
        return image[t:t + self.height, l:l + self.width, :]

    def pad_gt(self, image):
        """Inverse of crop for ground-truth images: centre-pad with zeros."""
        t, l = self.crop_top, self.crop_left
        out = np.zeros((self.padded_height, self.padded_width, image.shape[-1]),
                       dtype=image.dtype)
        out[t:t + self.height, l:l + self.width] = image
        return out


def ray_info(w2c_rot: np.ndarray, w2c_tran: np.ndarray, padded_h: int,
             padded_w: int, focal_x: float, focal_y: float):
    """World-space per-pixel ray vectors for SH evaluation.

    Matches reference ``RayInfo.__init__`` (splatter.py:305-321): for padded
    pixel (ix, iy), the un-normalized view direction is
    ``lefttop + ix*dx + iy*dy - rays_o``.
    Returns dict of four float32 (3,) vectors.
    """
    c2w = np.linalg.inv(np.asarray(w2c_rot, np.float64))
    tran = np.asarray(w2c_tran, np.float64)
    rays_o = -c2w @ tran
    lefttop_cam = np.array(
        [(-padded_w / 2 + 0.5) / focal_x, (-padded_h / 2 + 0.5) / focal_y, 1.0]
    )
    lefttop = c2w @ (lefttop_cam - tran)
    dx = c2w @ np.array([1.0 / focal_x, 0.0, 0.0])
    dy = c2w @ np.array([0.0, 1.0 / focal_y, 0.0])
    return {
        "rays_o": rays_o.astype(np.float32),
        "lefttop": lefttop.astype(np.float32),
        "dx": dx.astype(np.float32),
        "dy": dy.astype(np.float32),
    }


RayInfo = ray_info  # alias matching reference naming
