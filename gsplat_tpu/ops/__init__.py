from gsplat_tpu.ops.projection import project_gaussians, trunc_exp  # noqa: F401
from gsplat_tpu.ops.sh import sh_basis, SH_DIM  # noqa: F401
from gsplat_tpu.ops.losses import l1_loss, ssim, psnr  # noqa: F401
