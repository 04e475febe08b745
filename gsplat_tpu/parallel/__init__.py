from gsplat_tpu.parallel.mesh import make_mesh  # noqa: F401
from gsplat_tpu.parallel.data_parallel import make_dp_train_step  # noqa: F401
from gsplat_tpu.parallel.tile_parallel import make_tile_sharded_render  # noqa: F401
