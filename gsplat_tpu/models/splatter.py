"""Scene container + render pipeline orchestration (TPU-native Splatter).

Parity target: reference ``Splatter`` (``splatter.py:323-655``) — COLMAP scene
loading, gaussian init, per-camera state, and the
project → cull → bin → sort → rasterize pipeline — re-shaped for XLA:

- all cameras are stacked into device arrays once (poses, ray vectors,
  padded ground-truth images) so a camera is selected *inside* jit by index,
  instead of the reference's per-step host-side ``set_camera``
  (``splatter.py:467-511``);
- the whole forward is one jit-compatible function
  :meth:`Splatter.render_padded`; there are no host syncs in the hot path;
- static geometry (tile grid, binning/raster specs) is derived once per
  (intrinsics, capacity) signature; densification growth re-derives specs on
  a bucket boundary only.

The reference's ``--cudaculling 0`` torch fallback (``splatter.py:543-560``)
maps to ``use_pallas=False`` (chunked-jnp compositor).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import SplatConfig
from gsplat_tpu.models.camera import TileGrid, ray_info
from gsplat_tpu.models.gaussians import grow_capacity, init_from_points
from gsplat_tpu.ops.binning import (BinningSpec, bin_gaussians, pack_pairs,
                                    pack_sorted)
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.rasterize import RasterSpec, rasterize
from gsplat_tpu.utils.colmap import camera_focals, read_cameras_binary, \
    read_images_binary, read_points3d_arrays
from gsplat_tpu.utils.so3 import quat_to_rotmat_np


@dataclass
class SceneCameras:
    """Stacked per-camera device arrays (single shared intrinsics)."""

    w2c_rot: jnp.ndarray     # (M, 3, 3)
    w2c_tran: jnp.ndarray    # (M, 3)
    sh_vecs: jnp.ndarray     # (M, 4, 3) [rays_o, lefttop, dx, dy]
    images: Optional[jnp.ndarray]  # (M, 3, H, W) uint8 GT (channel-major —
                                   # matches the render layout; see
                                   # ops/rasterize.assemble_image)
    grid: TileGrid
    names: list

    @property
    def n_cameras(self) -> int:
        return self.w2c_rot.shape[0]


def load_scene_camera_groups(colmap_path, image_path, render_downsample,
                             tile_h=16, tile_w=16, load_images=True):
    """COLMAP sparse dir + image dir → list of SceneCameras groups.

    Mirrors ``Splatter.parse_imgs`` (splatter.py:429-454): images sorted by
    COLMAP image id, skipped when the file is missing, poses built directly
    from the COLMAP world→camera quaternion/translation.

    The reference handles arbitrary per-image cameras by rebuilding tile
    state per frame on the host (``set_camera``, splatter.py:467-511); the
    XLA equivalent groups cameras by their (resolution, focal) signature —
    cameras within a group stack into device arrays and share one compiled
    pipeline, and the trainer jits one step per group.  Groups are ordered
    largest-first so single-intrinsics scenes see group 0 only.
    """
    import cv2

    cameras = read_cameras_binary(os.path.join(colmap_path, "cameras.bin"))
    images_info = read_images_binary(os.path.join(colmap_path, "images.bin"))

    buckets = {}   # grid signature → dict of per-camera lists
    for img_id in sorted(images_info.keys()):
        info = images_info[img_id]
        fn = os.path.join(image_path, info.name)
        if load_images and not os.path.exists(fn):
            continue
        cam = cameras[info.camera_id]
        w = int(cam.width / render_downsample)
        h = int(cam.height / render_downsample)
        # per-model focal extraction (the reference assumes params[0:2] are
        # fx,fy for every model, splatter.py:499-500 — wrong for SIMPLE_*)
        fx, fy = camera_focals(cam)
        fx /= render_downsample
        fy /= render_downsample
        im = None
        if load_images:
            im = cv2.cvtColor(cv2.imread(fn), cv2.COLOR_BGR2RGB)
            h, w = im.shape[:2]
        key = (w, h, round(fx, 6), round(fy, 6))
        b = buckets.setdefault(key, {"rots": [], "trans": [], "imgs": [],
                                     "names": [], "fx": fx, "fy": fy})
        if im is not None:
            b["imgs"].append(im)
        b["rots"].append(quat_to_rotmat_np(info.qvec))
        b["trans"].append(info.tvec)
        b["names"].append(info.name)

    groups = []
    for (w, h, _, _), b in buckets.items():
        grid = TileGrid(width=w, height=h, focal_x=b["fx"], focal_y=b["fy"],
                        tile_h=tile_h, tile_w=tile_w)
        shv = [np.stack(list(ray_info(
            r, t, grid.padded_height, grid.padded_width,
            grid.focal_x, grid.focal_y).values()))
            for r, t in zip(b["rots"], b["trans"])]
        groups.append(SceneCameras(
            w2c_rot=jnp.asarray(np.stack(b["rots"]), jnp.float32),
            w2c_tran=jnp.asarray(np.stack(b["trans"]), jnp.float32),
            sh_vecs=jnp.asarray(np.stack(shv), jnp.float32),
            # channel-major on device (transpose once on host at load)
            images=jnp.asarray(np.stack(b["imgs"]).transpose(0, 3, 1, 2))
            if b["imgs"] else None,
            grid=grid,
            names=b["names"],
        ))
    groups.sort(key=lambda g: -g.n_cameras)
    return groups


def load_scene_cameras(colmap_path, image_path, render_downsample,
                       tile_h=16, tile_w=16, load_images=True):
    """Single-group convenience wrapper (errors on mixed intrinsics)."""
    groups = load_scene_camera_groups(colmap_path, image_path,
                                      render_downsample, tile_h, tile_w,
                                      load_images)
    if len(groups) != 1:
        raise ValueError(
            f"scene has {len(groups)} intrinsics groups; use "
            "load_scene_camera_groups")
    return groups[0]


def _norm_col_caps(caps, k: int) -> tuple:
    """Pad/trim colcap column caps to the current plane width K (K can grow
    via the clipped-fraction guard; new columns inherit the last cap)."""
    if not caps:
        return ()
    caps = list(caps)[:k]
    caps += [caps[-1]] * (k - len(caps))
    return tuple(caps)


def make_specs(grid: TileGrid, capacity: int, cfg: SplatConfig,
               color_dim: int):
    """Static binning + raster specs for a (grid, capacity) signature."""
    method = cfg.tile_culling_method
    if method == "dist":
        thresh = (grid.tile_geo_length_x / cfg.tile_culling_dist_thresh) ** 2
    else:
        thresh = cfg.tile_culling_prob_thresh
    # Chunk-aligned slot budget (retuned from the observed nc_used).  The
    # fused path gives empty tiles NO chunk (their output rows are zeroed
    # via tile_ok), so it needs no per-tile floor — at Garden scale a
    # one-chunk-per-tile floor alone was 4.3k dead rasterizer grid steps
    # (~26% of the grid).  The legacy bin_gaussians path writes empty
    # tiles' rows through all-dead chunks and keeps the floor.
    g = cfg.chunk_size
    fused = bool(getattr(cfg, "fused_pack", True))
    floor = 0 if fused else grid.n_tile_x * grid.n_tile_y * g
    if cfg.pair_capacity is not None:
        slot_cap = floor + ((int(cfg.pair_capacity) + g - 1) // g) * g
    else:
        # initial guess stays generous (alignment pads can approach a full
        # chunk per non-empty tile on sparse scenes); the nc_used-based
        # retune then shrinks it to the observed requirement
        pad_guess = grid.n_tile_x * grid.n_tile_y * g if fused else 0
        slot_cap = floor + pad_guess \
            + ((int(capacity * cfg.pair_factor) // g) + 1) * g
    gc_flag = int(getattr(cfg, "gather_colors", -1))
    gather_colors = (color_dim > 8) if gc_flag == -1 else bool(gc_flag)
    gg_flag = int(getattr(cfg, "gather_geom", -1))
    gather_geom = False if gg_flag == -1 else bool(gg_flag)
    gather_colors = gather_colors or gather_geom   # gather_geom implies it
    ok = (fused and getattr(cfg, "plane_mode", "dense") == "colcap"
          and not bool(getattr(cfg, "packed_bf16", False)))
    gather_colors = gather_colors and ok
    gather_geom = gather_geom and ok
    cs_flag = int(getattr(cfg, "cull_sublsb", -1))
    cull_sublsb = (False if cs_flag == -1 else bool(cs_flag)) and fused \
        and getattr(cfg, "plane_mode", "dense") == "colcap"
    bp_flag = int(getattr(cfg, "bf16_pack", 0))
    bf16_pack = (True if bp_flag == -1 else bool(bp_flag)) and ok \
        and not gather_geom
    qd_flag = int(getattr(cfg, "quant_depth", 0))
    quant_depth = (True if qd_flag == -1 else bool(qd_flag)) and fused \
        and getattr(cfg, "plane_mode", "dense") == "colcap"
    pa_flag = int(getattr(cfg, "post_align", -1))
    post_align = (True if pa_flag == -1 else bool(pa_flag)) \
        and bool(getattr(cfg, "packed_bf16", False)) \
        and int(cfg.chunk_size) == 128
    bspec = BinningSpec(
        n_tile_x=grid.n_tile_x, n_tile_y=grid.n_tile_y,
        tile_len_x=grid.tile_geo_length_x, tile_len_y=grid.tile_geo_length_y,
        leftmost=grid.leftmost, topmost=grid.topmost,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        slot_capacity=slot_cap,
        chunk_size=cfg.chunk_size,
        method=method,
        thresh=thresh,
        visible_rows=int(cfg.visible_rows or 0),
        plane_mode=getattr(cfg, "plane_mode", "dense"),
        col_caps=_norm_col_caps(getattr(cfg, "col_caps", None),
                                cfg.max_tiles_per_gaussian),
        pad_rows=int(getattr(cfg, "pad_rows", -1)),
        packed_bf16=bool(getattr(cfg, "packed_bf16", False)),
        quant_depth=quant_depth,
        bf16_pack=bf16_pack,
        gather_colors=gather_colors,
        gather_geom=gather_geom,
        cull_sublsb=cull_sublsb,
        post_align=post_align,
    )
    if bspec.packed_bf16 and (bspec.plane_mode != "colcap"
                              or not getattr(cfg, "fused_pack", True)):
        raise ValueError("packed_bf16 requires fused_pack + plane_mode="
                         "'colcap' (the packed payloads are built by "
                         "pack_sorted's column-compacted plane)")
    px_split = int(getattr(cfg, "px_split", 1))
    if px_split > 1 and (grid.tile_h * grid.tile_w) % px_split != 0:
        raise ValueError(
            f"px_split={px_split} must divide the tile pixel count "
            f"{grid.tile_h * grid.tile_w}: remainder pixel lanes would "
            f"silently never be composited")
    rspec = RasterSpec(
        n_tile_x=grid.n_tile_x, n_tile_y=grid.n_tile_y,
        tile_h=grid.tile_h, tile_w=grid.tile_w,
        focal_x=grid.focal_x, focal_y=grid.focal_y,
        chunk_size=cfg.chunk_size, color_dim=color_dim,
        weight_normalize=cfg.render_weight_normalize,
        channel_major=bool(getattr(cfg, "fused_pack", True)),
        packed_bf16=bspec.packed_bf16,
        post_align=bspec.post_align,
        color_row_major=bspec.gather_colors,
        geom_row_major=bspec.gather_geom,
        sh_fast_matmul=bspec.bf16_pack and color_dim > 8,
        px_split=int(getattr(cfg, "px_split", 1)),
    )
    return bspec, rspec


def render_padded(params: dict, live, w2c_rot, w2c_tran, sh_vecs,
                  grid: TileGrid, cfg: SplatConfig, bspec: BinningSpec,
                  rspec: RasterSpec, interpret=False):
    """Full differentiable forward: table params → padded image.

    Composition of the reference stack ``project_and_culling`` → ``render``
    (splatter.py:513-641) as one pure function.  Returns (image, aux) where
    aux carries the visibility mask (the reference's ``culling_mask`` used
    for gradient counting, train.py:150) and binning diagnostics.
    """
    proj = project_gaussians(
        params["pos"], params["quat"], params["scale"],
        w2c_rot, w2c_tran,
        near=cfg.near,
        half_width=grid.width * 1.2 / 2 / grid.focal_x,
        half_height=grid.height * 1.2 / 2 / grid.focal_y,
        scale_activation=cfg.scale_activation,
    )
    proj = proj._replace(visible=proj.visible & live)
    opa = jax.nn.sigmoid(params["opa"])
    color = params["rgb"] if cfg.use_sh_coeff else jax.nn.sigmoid(params["rgb"])
    if getattr(cfg, "fused_pack", True):
        # gather-free fast path: the tile sort carries the channels and
        # emits the chunk-aligned kernel buffers directly
        n = opa.shape[0]
        geom_n = jnp.concatenate(
            [proj.mean2d, proj.cov2d, opa[:, None],
             jnp.zeros((n, 1), opa.dtype)], axis=1)
        packed, binned = pack_sorted(bspec, geom_n, color, proj.depth,
                                     proj.visible)
    else:
        binned = bin_gaussians(proj, bspec)
        packed = pack_pairs(binned, proj, opa, color,
                            k_width=bspec.max_tiles_per_gaussian)
    img = rasterize(packed, binned, rspec,
                    sh_vecs=sh_vecs if cfg.use_sh_coeff else None,
                    use_pallas=cfg.use_pallas, interpret=interpret)
    k = bspec.max_tiles_per_gaussian
    aux = {
        "visible": proj.visible,
        "n_pairs": binned.n_pairs,
        "n_clipped": binned.n_clipped,
        "n_max_tiles": binned.n_max_tiles,
        "n_visible": binned.n_visible,
        "n_vis_dropped": binned.n_vis_dropped,
        "n_dropped": binned.n_dropped,
        "col_fill": binned.col_fill if binned.col_fill is not None
        else jnp.zeros((k,), jnp.int32),
        "n_plane_clipped": binned.n_plane_clipped
        if binned.n_plane_clipped is not None else jnp.zeros((), jnp.int32),
        # slots the scene actually needed (pairs + alignment pads) — the
        # retune signal for slot_capacity
        "n_slots_used": (binned.n_chunks_used * bspec.chunk_size
                         if binned.n_chunks_used is not None
                         else binned.n_pairs),
        "n_pad_used": (binned.n_pad_used
                       if getattr(binned, "n_pad_used", None) is not None
                       else jnp.zeros((), jnp.int32)),
        "n_pad_dropped": (binned.n_pad_dropped
                          if getattr(binned, "n_pad_dropped", None)
                          is not None else jnp.zeros((), jnp.int32)),
    }
    return img, aux


def render_cropped(params, live, w2c_rot, w2c_tran, sh_vecs, grid, cfg,
                   bspec, rspec, interpret=False):
    """Padded render, clamped and centre-cropped (splatter.py:650-655).

    Returns a CHANNEL-MAJOR (3, H, W) image (see assemble_image)."""
    img, aux = render_padded(params, live, w2c_rot, w2c_tran, sh_vecs, grid,
                             cfg, bspec, rspec, interpret)
    img = jnp.clip(img, 0.0, 1.0)
    t, l = grid.crop_top, grid.crop_left
    return jax.lax.dynamic_slice(
        img, (0, t, l), (3, grid.height, grid.width)), aux


class Splatter:
    """Scene + model container (host-side orchestration).

    Keyword parity with reference ``Splatter.__init__`` (splatter.py:324-345)
    via :class:`SplatConfig`.
    """

    def __init__(self, colmap_path, image_path, cfg: SplatConfig,
                 load_ckpt=None, test=False, capacity_round=None):
        self.cfg = cfg
        self.colmap_path = colmap_path
        self.image_path = image_path
        self.test_only = test

        points, rgbs = read_points3d_arrays(
            os.path.join(colmap_path, "points3D.bin"))
        if load_ckpt is not None:
            from gsplat_tpu.utils.checkpoint import load_checkpoint
            self.table = load_checkpoint(load_ckpt,
                                         capacity_round=cfg.capacity_round)
        else:
            self.table = init_from_points(
                points, rgbs,
                use_sh_coeff=cfg.use_sh_coeff,
                opa_init_value=cfg.opa_init_value,
                scale_init_value=cfg.scale_init_value,
                scale_activation=cfg.scale_activation,
                capacity_round=cfg.capacity_round,
            )
        self.camera_groups = load_scene_camera_groups(
            colmap_path, image_path, cfg.render_downsample,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w, load_images=not test)
        self.cameras = self.camera_groups[0]   # primary (largest) group
        self._specs_cache = {}

    @property
    def color_dim(self) -> int:
        return 27 if self.cfg.use_sh_coeff else 3

    def specs(self, grid: TileGrid | None = None):
        grid = grid or self.cameras.grid
        key = (grid, self.table.capacity, self.cfg.pair_capacity,
               self.cfg.visible_rows, self.cfg.col_caps)
        if key not in self._specs_cache:
            self._specs_cache[key] = make_specs(
                grid, self.table.capacity, self.cfg, self.color_dim)
        return self._specs_cache[key]

    @staticmethod
    def _ladder(need: float, base: int = 4096, r: float = 1.7) -> int:
        """Round a budget UP to a geometric ladder rung (multiple of 4096).

        Budgets only ever take ladder values, so monotone growth crosses a
        recompile boundary every ~+70% instead of at every densify — on
        remote-attached TPUs a recompile costs minutes, while the padded
        compute a coarse budget carries costs ~10-20% of a step.
        """
        import math

        if need <= base:
            return base
        k = math.ceil(math.log(need / base, r) - 1e-9)
        return ((int(base * r ** k) + 4095) // 4096) * 4096

    def retune_pair_capacity(self, n_slots: int, growth: float = 1.0
                             ) -> bool:
        """Resize the aligned-slot budget toward the observed requirement.

        ``n_slots`` is the slots actually needed last step — nc_used * G
        (real pairs + per-tile alignment pads; aux key ``n_slots_used``).
        ``growth`` is the live-count growth factor of the current densify
        step; budgets provision for ~two more densifies of the same rate
        (growth²) so steady growth does not retrigger a recompile every
        boundary.  Returns True when specs changed (recompile boundary).
        """
        bspec, _ = self.specs()
        g = self.cfg.chunk_size
        fused = bool(getattr(self.cfg, "fused_pack", True))
        floor = 0 if fused else bspec.n_tiles * g
        extra = bspec.slot_capacity - floor
        # the legacy route's n_slots_used signal (nc_used*G) counts the
        # mandatory one-chunk-per-tile floor (nchunk_t = max(ceil, 1), and
        # slot_capacity reserves exactly one chunk per tile for it);
        # subtract it so the comparison against the pairs-only budget is
        # like-for-like
        n_slots = max(n_slots - floor, 0)
        gsq = max(growth, 1.0) ** 2
        target = self._ladder(n_slots * 1.35 * gsq)
        if ((extra < n_slots * 1.1 or extra > target * 2.9)
                and target != self.cfg.pair_capacity):
            self.cfg.pair_capacity = target
            return True
        return False

    def retune_col_caps(self, col_fill, growth: float = 1.0) -> bool:
        """Resize the colcap per-column row caps toward observed fills.

        ``col_fill`` is the (K,) vector of real column fills m_k from the
        last step's aux.  Caps get a 1.25x margin (rounded to 4096) so
        densification growth and camera variation rarely overflow; overflow
        is fail-safe (pairs of the deepest rows drop, ``n_plane_clipped``)
        and triggers an immediate retune in the trainer.
        """
        if self.cfg.plane_mode != "colcap":
            return False
        k = self.cfg.max_tiles_per_gaussian
        fills = [int(x) for x in col_fill][:k]
        fills += [0] * (k - len(fills))
        v = int(self.cfg.visible_rows or self.table.capacity)
        cur = list(self.cfg.col_caps or (v,) * k)
        cur += [cur[-1] if cur else v] * (k - len(cur))
        gsq = max(growth, 1.0) ** 2
        new = []
        changed = False
        for f, c_ in zip(fills, cur[:k]):
            target = min(self._ladder(f * 1.2 * gsq), v)
            # a cap still at the dense ceiling (v) is untuned: adopt the
            # observed target outright — the shrink hysteresis below has a
            # dead zone (target*2.9 > v for mid-size fills) that otherwise
            # leaves the plane dense forever on its first tune
            untuned = c_ >= v
            if ((untuned and target < c_)
                    or ((c_ < f * 11 // 10 or c_ > target * 2.9)
                        and target != c_)):
                new.append(target)
                changed = True
            else:
                new.append(c_)
        if changed:
            self.cfg.col_caps = tuple(new)
        return changed

    def retune_pad_rows(self, n_pad_used: int, growth: float = 1.0) -> bool:
        """Resize the shared alignment-pad pool toward the observed need.

        No-op while the pool is off (cfg.pad_rows < 0, the always-correct
        worst-case reservation); once a caller opts in, overflow/shrink
        follow the same ladder hysteresis as the other static budgets."""
        if int(getattr(self.cfg, "pad_rows", -1)) < 0:
            return False
        cur = int(self.cfg.pad_rows)
        gsq = max(growth, 1.0) ** 2
        target = self._ladder(max(n_pad_used, 1) * 1.35 * gsq)
        if (cur < n_pad_used * 1.1 or cur > target * 2.9) and target != cur:
            self.cfg.pad_rows = target
            return True
        return False

    def retune_visible_rows(self, n_visible: int, growth: float = 1.0
                            ) -> bool:
        """Shrink the candidate plane toward observed per-view visibility
        (plus margin for camera variation and densification growth)."""
        cap = self.table.capacity
        cur = int(self.cfg.visible_rows or cap)
        gsq = max(growth, 1.0) ** 2
        target = min(self._ladder(n_visible * 1.25 * gsq, base=8192), cap)
        if (cur < n_visible * 1.08 or cur > target * 2.9) and target != cur:
            self.cfg.visible_rows = target
            return True
        return False

    def switch_resolution(self, downsample_factor: int):
        """Swap to a different image pyramid level (splatter.py:456-463):
        replaces ``images_<old>`` with ``images_<new>`` in the image path and
        reloads cameras/images.  No-op when already at the target factor."""
        if downsample_factor == self.cfg.render_downsample:
            return
        old = self.cfg.render_downsample
        self.image_path = self.image_path.replace(
            f"images_{old}", f"images_{downsample_factor}")
        self.cfg.render_downsample = downsample_factor
        self.camera_groups = load_scene_camera_groups(
            self.colmap_path, self.image_path, downsample_factor,
            tile_h=self.cfg.tile_h, tile_w=self.cfg.tile_w,
            load_images=not self.test_only)
        self.cameras = self.camera_groups[0]
        self._specs_cache.clear()

    def maybe_grow(self) -> bool:
        """Grow table capacity if occupancy is high; True if grown."""
        n = int(self.table.n_live)
        if n > 0.88 * self.table.capacity:
            mc = int(getattr(self.cfg, "max_capacity", 0) or 0)
            if mc and self.table.capacity >= mc:
                return False                      # saturated at the ceiling
            self.table = grow_capacity(self.table, self.cfg.capacity_round,
                                       max_capacity=mc)
            return True
        return False

    def render(self, camera_id: int, interpret=None):
        """Single-camera render → (3, H, W) channel-major (host convenience;
        jits per call-signature)."""
        if interpret is None:
            interpret = self.cfg.use_pallas and jax.default_backend() != "tpu"
        grid = self.cameras.grid
        bspec, rspec = self.specs(grid)
        img, _ = render_cropped(
            self.table.params(), self.table.live,
            self.cameras.w2c_rot[camera_id], self.cameras.w2c_tran[camera_id],
            self.cameras.sh_vecs[camera_id], grid, self.cfg, bspec, rspec,
            interpret=interpret)
        return img

    def ground_truth(self, camera_id: int):
        """GT image as stored: channel-major (3, H, W) float in [0, 1]."""
        return self.cameras.images[camera_id].astype(jnp.float32) / 255.0


if __name__ == "__main__":
    # Standalone forward+backward smoke test, parity with the reference's
    # ``python splatter.py`` entry (splatter.py:657-675).
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="colmap_garden/")
    ap.add_argument("--images", default="images_4")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--use_pallas", type=int, default=1)
    args = ap.parse_args()
    cfg = SplatConfig(opa_init_value=0.8, scale_init_value=0.2,
                      scale_activation="exp",
                      use_pallas=bool(args.use_pallas))
    sp = Splatter(os.path.join(args.data, "sparse", "0"),
                  os.path.join(args.data, args.images), cfg,
                  load_ckpt=args.ckpt)
    interp = cfg.use_pallas and jax.default_backend() != "tpu"
    img = sp.render(0, interpret=interp)
    gt = sp.ground_truth(0)

    def loss_fn(params):
        bspec, rspec = sp.specs()
        out, _ = render_cropped(params, sp.table.live,
                                sp.cameras.w2c_rot[0], sp.cameras.w2c_tran[0],
                                sp.cameras.sh_vecs[0], sp.cameras.grid,
                                cfg, bspec, rspec, interpret=interp)
        return jnp.mean(jnp.abs(gt - out))

    loss, grads = jax.value_and_grad(loss_fn)(sp.table.params())
    print(f"smoke: loss={float(loss):.4f} "
          f"|dpos|={float(jnp.abs(grads['pos']).mean()):.3e}")
