#!/usr/bin/env python
"""Build a synthetic COLMAP scene with GT images rendered by this
framework's own pipeline (for end-to-end training validation without a
dataset): GT gaussians → rendered views → COLMAP files + a degraded point
cloud as the training init.

Presets:
  --preset mid     50k GT gaussians, 640x416, 24 cams  (CPU-feasible)
  --preset garden  400k GT gaussians, 1297x840, 56 cams (Garden-scale; run
                   on the TPU — interpret-mode rendering at this size is
                   impractical).  Mirrors the reference's headline workload
                   (reference README.md:36 — 506,627 gaussians at images_4
                   resolution, PSNR 24.91 @7k iters).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import cv2

from fixtures import write_cameras_bin, write_images_bin, write_points3d_bin
from gsplat_tpu.config import SplatConfig
from gsplat_tpu.models.splatter import make_specs, render_cropped
from gsplat_tpu.models.camera import TileGrid, ray_info
from gsplat_tpu.synthetic import synthetic_table
from gsplat_tpu.utils.so3 import quat_to_rotmat_np

PRESETS = {
    "mid": dict(n_gt=50_000, n_points=15_000, n_cams=24, w=640, h=416,
                focal=500.0, capacity_round=4096, pair_capacity=None,
                scale_px=3.0, opa=0.7),
    "garden": dict(n_gt=400_000, n_points=140_000, n_cams=56, w=1297, h=840,
                   focal=1000.0, capacity_round=65536, pair_capacity=4_194_304,
                   scale_px=2.5, opa=0.6, orbit=True),
    # Non-realizable quality-proof scene (VERDICT r3 #6): ground truth is
    # rendered from ~2.4x the trainable capacity (1.2M GT vs the runner's
    # ~500k cap), carries degree-1/2 SH view-dependence no RGB model can
    # represent, and each saved view gets independent sensor noise.  The
    # final-PSNR number therefore measures real fitting power against an
    # unreachable target; the oracle ceiling (noiseless GT render vs the
    # noisy targets) is written to gt_ceiling.json for calibration.
    "garden_hard": dict(n_gt=1_200_000, n_points=140_000, n_cams=56,
                        w=1297, h=840, focal=1000.0, capacity_round=65536,
                        pair_capacity=8_388_608, scale_px=1.6, opa=0.6,
                        orbit=True, use_sh=True, sh_ampl=0.35,
                        noise_std=2.0),
}


def _rotmat_to_quat(r):
    from gsplat_tpu.viewer import _rotmat_to_quat as f
    return f(r)


def _orbit_poses(n_cams, center, radius, rng):
    """Cameras circling ``center`` looking inward (COLMAP x-right y-down
    z-forward) — real-capture-like multi-view geometry.  A camera ring
    with near-zero baseline (the old layout) is geometrically ill-posed:
    position errors along the view axis are unobservable and training
    oscillates instead of converging."""
    poses = []
    c = np.asarray(center, np.float64)
    for i in range(n_cams):
        az = 2 * np.pi * i / n_cams
        elev = 0.25 * np.sin(3 * az) + 0.1
        rad = radius * (1.0 + 0.08 * np.sin(5 * az))
        p = c + rad * np.array([np.sin(az) * np.cos(elev),
                                -np.sin(elev),
                                -np.cos(az) * np.cos(elev)])
        fwd = c - p
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])       # COLMAP y is down
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        rot = np.stack([right, down, fwd])    # w2c rows
        tvec = -rot @ p
        q = _rotmat_to_quat(rot)
        poses.append((q, tvec, f"img_{i:03d}.png"))
    return poses


def main(out_dir, n_gt, n_points, n_cams, w, h, focal, capacity_round,
         pair_capacity, scale_px, opa, downsample=4, seed=0, orbit=False,
         use_sh=False, sh_ampl=0.0, noise_std=0.0):
    rng = np.random.default_rng(seed)
    interpret = jax.default_backend() != "tpu"
    if orbit:
        center, radius, ball_r = (0.0, 0.0, 0.0), 5.0, 2.2
        table = synthetic_table(
            n_gt, capacity_round=capacity_round, focal=focal,
            scale_px=scale_px, opa=opa, seed=seed, use_sh=use_sh,
            sh_ampl=sh_ampl, ball=center + (ball_r, radius))
        poses = _orbit_poses(n_cams, center, radius, rng)
    else:
        table = synthetic_table(n_gt, capacity_round=capacity_round,
                                focal=focal, scale_px=scale_px, opa=opa,
                                seed=seed, frustum=(0.85, 0.55))
        poses = []
        for i in range(n_cams):
            ang = 0.12 * np.sin(2 * np.pi * i / n_cams)
            tilt = 0.06 * np.cos(2 * np.pi * i / n_cams)
            q = np.array([np.cos(ang / 2) * np.cos(tilt / 2),
                          np.sin(tilt / 2), np.sin(ang / 2), 0.0])
            q /= np.linalg.norm(q)
            t = np.array([0.15 * np.sin(2 * np.pi * i / n_cams),
                          0.08 * np.cos(2 * np.pi * i / n_cams), 0.0])
            poses.append((q, t, f"img_{i:03d}.png"))
    cfg = SplatConfig(capacity_round=capacity_round,
                      pair_capacity=pair_capacity, use_sh_coeff=use_sh)
    grid = TileGrid(width=w, height=h, focal_x=focal, focal_y=focal)
    bspec, rspec = make_specs(grid, table.capacity, cfg,
                              27 if use_sh else 3)

    sparse = os.path.join(out_dir, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(out_dir, f"images_{downsample}")
    os.makedirs(img_dir, exist_ok=True)

    params, live = table.params(), table.live
    render = jax.jit(lambda rot, tran, shv: render_cropped(
        params, live, rot, tran, shv, grid, cfg, bspec, rspec,
        interpret=interpret))
    mse_sum, n_px = 0.0, 0
    for q, t, name in poses:
        rot = quat_to_rotmat_np(q)
        shv = np.stack(list(ray_info(rot, t, grid.padded_height,
                                     grid.padded_width, focal, focal
                                     ).values()))
        img, aux = render(jnp.asarray(rot, jnp.float32),
                          jnp.asarray(t, jnp.float32),
                          jnp.asarray(shv, jnp.float32))
        nd = int(aux["n_dropped"]) + int(aux["n_vis_dropped"])
        if nd:
            raise SystemExit(
                f"GT render of {name} overflowed budgets (n_dropped="
                f"{int(aux['n_dropped'])}, n_vis_dropped="
                f"{int(aux['n_vis_dropped'])}); raise --pair_capacity")
        clean = np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1) * 255
        noisy = clean
        if noise_std:
            # independent per-view sensor noise: the training target is NOT
            # exactly producible even by the GT table — the ceiling below
            # quantifies the floor this puts under any model's error
            noisy = clean + rng.normal(0.0, noise_std, clean.shape)
        img8 = np.clip(np.round(noisy), 0, 255).astype(np.uint8)
        err = (clean - img8.astype(np.float64)) / 255.0
        mse_sum += float((err ** 2).sum())
        n_px += img8.size
        cv2.imwrite(os.path.join(img_dir, name),
                    cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
        print("rendered", name, "pairs=", int(aux["n_pairs"]), flush=True)
    if n_px:
        import json
        ceiling = 10 * np.log10(1.0 / max(mse_sum / n_px, 1e-12))
        with open(os.path.join(out_dir, "gt_ceiling.json"), "w") as f:
            json.dump({
                "oracle_ceiling_psnr": round(float(ceiling), 2),
                "what": "PSNR of the noiseless GT-table render vs the "
                        "saved (noisy, quantized) target images — the "
                        "best ANY model could score on this scene",
                "n_gt": n_gt, "use_sh": bool(use_sh),
                "sh_ampl": sh_ampl, "noise_std": noise_std,
            }, f, indent=1)
        print(f"oracle ceiling: {ceiling:.2f} dB -> gt_ceiling.json",
              flush=True)

    # degraded init point cloud: subsample GT + jitter
    n_live = int(table.n_live)
    sel = rng.choice(n_live, size=n_points, replace=False)
    pos = np.asarray(table.pos)[sel] + rng.normal(0, 0.01, (n_points, 3))
    rgb_all = np.asarray(table.rgb)
    if use_sh:
        # DC term back to rgb logits (initialize_sh: logit = dc * C0⁻¹;
        # coefficients are (3, 9) flattened channel-major)
        from gsplat_tpu.ops.sh import C0
        rgb_logit = rgb_all[sel][:, [0, 9, 18]] * C0
    else:
        rgb_logit = rgb_all[sel]
    rgb = (1 / (1 + np.exp(-rgb_logit)) * 255).astype(np.uint8)
    write_cameras_bin(os.path.join(sparse, "cameras.bin"), 1,
                      w * downsample, h * downsample,
                      focal * downsample, focal * downsample)
    write_images_bin(os.path.join(sparse, "images.bin"), poses, 1)
    write_points3d_bin(os.path.join(sparse, "points3D.bin"), pos, rgb)
    print("scene written to", out_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/synth_scene")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="mid")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    main(args.out_dir, seed=args.seed, **PRESETS[args.preset])
