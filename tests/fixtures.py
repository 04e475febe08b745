"""Synthetic COLMAP scene fixture: binary model files + rendered GT images.

Ground-truth images are rendered with the naive oracle from a known gaussian
set derived from the point cloud, so a training run on the fixture has a
realizable target.
"""

import os
import struct

import numpy as np


def write_cameras_bin(path, cam_id, w, h, fx, fy):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        # model_id 1 = PINHOLE (fx, fy, cx, cy)
        f.write(struct.pack("<iiQQ", cam_id, 1, w, h))
        f.write(struct.pack("<dddd", fx, fy, w / 2, h / 2))


def write_images_bin(path, poses, cam_id):
    """poses: list of (qvec wxyz, tvec, name)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(poses)))
        for i, (q, t, name) in enumerate(poses):
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))


def write_points3d_bin(path, xyz, rgb):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i, (p, c) in enumerate(zip(xyz, rgb)):
            f.write(struct.pack("<QdddBBBd", i + 1, *p, *c, 0.5))
            f.write(struct.pack("<Q", 2))  # track of length 2
            f.write(struct.pack("<iiii", 1, i, 2, i))


def make_scene(tmpdir, n_points=120, n_cameras=4, w=64, h=48, focal=60.0,
               seed=0, downsample=4):
    """Create sparse/0/{cameras,images,points3D}.bin + images_<d>/ GT renders.

    Cameras sit near the origin looking +z with small offsets; points float
    in the shared frustum.  Returns (data_dir, gt_images dict).
    """
    rng = np.random.default_rng(seed)
    sparse = os.path.join(tmpdir, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(tmpdir, f"images_{downsample}")
    os.makedirs(img_dir, exist_ok=True)

    z = rng.uniform(2.0, 4.0, n_points)
    x = rng.uniform(-0.35, 0.35, n_points) * z
    y = rng.uniform(-0.28, 0.28, n_points) * z
    xyz = np.stack([x, y, z], axis=1)
    rgb = (rng.uniform(0.2, 0.9, (n_points, 3)) * 255).astype(np.uint8)

    poses = []
    for i in range(n_cameras):
        off = np.array([0.08 * (i - n_cameras / 2), 0.04 * ((i % 2) - 0.5), 0.0])
        q = np.array([1.0, 0.0, 0.0, 0.0])
        poses.append((q, -off, f"img_{i:03d}.png"))

    # COLMAP stores full-res intrinsics; the loader divides by downsample
    write_cameras_bin(os.path.join(sparse, "cameras.bin"), 1,
                      w * downsample, h * downsample,
                      focal * downsample, focal * downsample)
    write_images_bin(os.path.join(sparse, "images.bin"), poses, 1)
    write_points3d_bin(os.path.join(sparse, "points3D.bin"), xyz, rgb)

    # GT via the oracle from a plausible gaussian interpretation of the points
    import jax.numpy as jnp
    import cv2
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.ops.rasterize_ref import rasterize_oracle
    from gsplat_tpu.utils.so3 import quat_to_rotmat_np

    quat = np.tile([1.0, 0, 0, 0], (n_points, 1)).astype(np.float32)
    scale = np.full((n_points, 3), 0.06, np.float32)
    opa = np.full((n_points,), 0.8, np.float32)
    gts = {}
    for i, (q, t, name) in enumerate(poses):
        rot = quat_to_rotmat_np(q)
        proj = project_gaussians(
            jnp.asarray(xyz, jnp.float32), jnp.asarray(quat),
            jnp.asarray(scale), jnp.asarray(rot, jnp.float32),
            jnp.asarray(t, jnp.float32),
            near=0.3, half_width=w * 1.2 / 2 / focal,
            half_height=h * 1.2 / 2 / focal, scale_activation="abs")
        order = np.argsort(np.where(np.asarray(proj.visible),
                                    np.asarray(proj.depth), np.inf))
        order = order[np.asarray(proj.visible)[order]]
        img = rasterize_oracle(
            proj.mean2d[order], proj.cov2d[order],
            jnp.asarray(opa)[order], jnp.asarray(rgb[order] / 255.0,
                                                 jnp.float32),
            h, w, focal, focal)
        img8 = (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
                * 255).astype(np.uint8)
        gts[name] = img8
        cv2.imwrite(os.path.join(img_dir, name),
                    cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
    return tmpdir, gts


def write_cameras_bin_multi(path, cams):
    """cams: list of (cam_id, w, h, fx, fy) PINHOLE models."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam_id, w, h, fx, fy in cams:
            f.write(struct.pack("<iiQQ", cam_id, 1, w, h))
            f.write(struct.pack("<dddd", fx, fy, w / 2, h / 2))


def write_cameras_bin_models(path, cams):
    """cams: list of (cam_id, model_id, w, h, params tuple) — any model."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam_id, model_id, w, h, params in cams:
            f.write(struct.pack("<iiQQ", cam_id, model_id, w, h))
            f.write(struct.pack(f"<{len(params)}d", *params))


def write_images_bin_multi(path, poses):
    """poses: list of (qvec wxyz, tvec, name, cam_id)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(poses)))
        for i, (q, t, name, cam_id) in enumerate(poses):
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))


def make_real_capture_scene(tmpdir, n_points=120, seed=0):
    """Real-capture-shaped scene: JPG images + mixed camera MODELS.

    Camera 1 is SIMPLE_RADIAL (params f,cx,cy,k — the model COLMAP assigns
    to most phone/DSLR captures), camera 2 is PINHOLE; images are written
    as lossy JPEGs so the cv2 JPEG-decode path the reference exercises on
    real datasets (splatter.py:429-454) is covered, not just clean PNGs.
    """
    import cv2
    import jax.numpy as jnp
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.ops.rasterize_ref import rasterize_oracle
    from gsplat_tpu.utils.so3 import quat_to_rotmat_np

    rng = np.random.default_rng(seed)
    sparse = os.path.join(tmpdir, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(tmpdir, "images_1")
    os.makedirs(img_dir, exist_ok=True)

    z = rng.uniform(2.0, 4.0, n_points)
    x = rng.uniform(-0.3, 0.3, n_points) * z
    y = rng.uniform(-0.25, 0.25, n_points) * z
    xyz = np.stack([x, y, z], axis=1)
    rgb = (rng.uniform(0.2, 0.9, (n_points, 3)) * 255).astype(np.uint8)

    # (cam_id, model_id, w, h, params)
    cams = [
        (1, 2, 96, 64, (70.0, 48.0, 32.0, 0.0)),       # SIMPLE_RADIAL, k=0
        (2, 1, 64, 48, (60.0, 60.0, 32.0, 24.0)),      # PINHOLE
    ]
    focals = {1: (70.0, 70.0), 2: (60.0, 60.0)}
    poses = []
    for idx in range(7):
        cam_id = 1 if idx < 4 else 2
        off = np.array([0.06 * (idx - 3), 0.03 * (idx % 2), 0.0])
        poses.append((np.array([1.0, 0, 0, 0]), -off,
                      f"photo_{idx:03d}.jpg", cam_id))
    write_cameras_bin_models(os.path.join(sparse, "cameras.bin"), cams)
    write_images_bin_multi(os.path.join(sparse, "images.bin"), poses)
    write_points3d_bin(os.path.join(sparse, "points3D.bin"), xyz, rgb)

    quat = np.tile([1.0, 0, 0, 0], (n_points, 1)).astype(np.float32)
    scale = np.full((n_points, 3), 0.06, np.float32)
    opa = np.full((n_points,), 0.8, np.float32)
    by_id = {c[0]: c for c in cams}
    for q, t, name, cam_id in poses:
        _, _, w, h, _ = by_id[cam_id]
        fx, fy = focals[cam_id]
        rot = quat_to_rotmat_np(q)
        proj = project_gaussians(
            jnp.asarray(xyz, jnp.float32), jnp.asarray(quat),
            jnp.asarray(scale), jnp.asarray(rot, jnp.float32),
            jnp.asarray(t, jnp.float32),
            near=0.3, half_width=w * 1.2 / 2 / fx,
            half_height=h * 1.2 / 2 / fy, scale_activation="abs")
        order = np.argsort(np.where(np.asarray(proj.visible),
                                    np.asarray(proj.depth), np.inf))
        order = order[np.asarray(proj.visible)[order]]
        img = rasterize_oracle(
            proj.mean2d[order], proj.cov2d[order],
            jnp.asarray(opa)[order],
            jnp.asarray(rgb[order] / 255.0, jnp.float32), h, w, fx, fy)
        img8 = (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
                * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, name),
                    cv2.cvtColor(img8, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
    return tmpdir


def make_mixed_scene(tmpdir, n_points=120, sizes=((64, 48, 60.0, 4),
                                                  (96, 64, 90.0, 3)),
                     seed=0, downsample=1):
    """Scene with MULTIPLE camera models (different resolutions/focals).

    sizes: per camera model (w, h, focal, n_cameras).  Exercises the
    intrinsics-group path (reference handles per-image cameras via
    set_camera, splatter.py:467-511).
    """
    import cv2
    import jax.numpy as jnp
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.ops.rasterize_ref import rasterize_oracle
    from gsplat_tpu.utils.so3 import quat_to_rotmat_np

    rng = np.random.default_rng(seed)
    sparse = os.path.join(tmpdir, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(tmpdir, f"images_{downsample}")
    os.makedirs(img_dir, exist_ok=True)

    z = rng.uniform(2.0, 4.0, n_points)
    x = rng.uniform(-0.3, 0.3, n_points) * z
    y = rng.uniform(-0.25, 0.25, n_points) * z
    xyz = np.stack([x, y, z], axis=1)
    rgb = (rng.uniform(0.2, 0.9, (n_points, 3)) * 255).astype(np.uint8)

    cams, poses = [], []
    idx = 0
    for cam_id, (w, h, focal, n) in enumerate(sizes, start=1):
        cams.append((cam_id, w * downsample, h * downsample,
                     focal * downsample, focal * downsample))
        for k in range(n):
            off = np.array([0.06 * (idx - 3), 0.03 * (idx % 2), 0.0])
            poses.append((np.array([1.0, 0, 0, 0]), -off,
                          f"img_{idx:03d}.png", cam_id))
            idx += 1
    write_cameras_bin_multi(os.path.join(sparse, "cameras.bin"), cams)
    write_images_bin_multi(os.path.join(sparse, "images.bin"), poses)
    write_points3d_bin(os.path.join(sparse, "points3D.bin"), xyz, rgb)

    quat = np.tile([1.0, 0, 0, 0], (n_points, 1)).astype(np.float32)
    scale = np.full((n_points, 3), 0.06, np.float32)
    opa = np.full((n_points,), 0.8, np.float32)
    for q, t, name, cam_id in poses:
        _, w, h, fx, fy = cams[cam_id - 1]
        w, h = w // downsample, h // downsample
        fx, fy = fx / downsample, fy / downsample
        rot = quat_to_rotmat_np(q)
        proj = project_gaussians(
            jnp.asarray(xyz, jnp.float32), jnp.asarray(quat),
            jnp.asarray(scale), jnp.asarray(rot, jnp.float32),
            jnp.asarray(t, jnp.float32),
            near=0.3, half_width=w * 1.2 / 2 / fx,
            half_height=h * 1.2 / 2 / fy, scale_activation="abs")
        order = np.argsort(np.where(np.asarray(proj.visible),
                                    np.asarray(proj.depth), np.inf))
        order = order[np.asarray(proj.visible)[order]]
        img = rasterize_oracle(
            proj.mean2d[order], proj.cov2d[order],
            jnp.asarray(opa)[order],
            jnp.asarray(rgb[order] / 255.0, jnp.float32), h, w, fx, fy)
        img8 = (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
                * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, name),
                    cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
    return tmpdir
