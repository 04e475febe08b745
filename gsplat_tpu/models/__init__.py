from gsplat_tpu.models.camera import CameraSpec, TileGrid, RayInfo  # noqa: F401
from gsplat_tpu.models.gaussians import GaussianTable  # noqa: F401
