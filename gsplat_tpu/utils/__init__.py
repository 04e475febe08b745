from gsplat_tpu.utils.so3 import (  # noqa: F401
    quat_to_rotmat_np,
    quat_to_rotmat,
    normalize_quat,
    inverse_sigmoid,
)
from gsplat_tpu.utils.colmap import (  # noqa: F401
    Camera,
    ColmapImage,
    Point3D,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    read_cameras_text,
    read_images_text,
    read_points3d_text,
)
from gsplat_tpu.utils.timer import StageTimer  # noqa: F401
