"""gsplat_tpu — a TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of WangFeng18/3d-gaussian-splatting
(PyTorch + CUDA) for TPU hardware:

- projection / EWA splatting / frustum culling as pure-jnp vmapped math under
  ``jit`` (reference: ``src/gaussian.cu:1182-1369`` global_culling kernel and
  its hand-written backward ``:1371-1609`` — here JAX autodiff provides the
  backward for free),
- deterministic, atomics-free tile binning built on sorts
  (reference: ``src/gaussian.cu:101-381`` atomicAdd-based tile lists),
- a Pallas TPU rasterizer with front-to-back alpha compositing expressed as
  exclusive cumulative products over gaussian chunks
  (reference: ``src/gaussian.cu:807-970`` draw_kernel and ``:441-803``
  draw_backward_kernel with warp-shuffle reductions),
- fixed-capacity gaussian tables with masked adaptive density control
  (reference: ``splatter.py:122-228`` Gaussian3ds.adaptive_control),
- an optax-based trainer mirroring the reference CLI (``train.py:296-361``).
"""

__version__ = "0.1.0"

from gsplat_tpu.config import SplatConfig, TrainConfig  # noqa: F401
