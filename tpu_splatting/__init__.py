"""tpu_splatting — a TPU-native differentiable Gaussian-splatting framework.

Brand-new JAX/XLA/Pallas implementation with the capability surface of
uc-vision/taichi-splatting (see SURVEY.md), re-designed TPU-first:
static shapes, masks instead of host-synced compaction, Pallas kernels for
the tile-based rasterizer, custom_vjp instead of Taichi autodiff.
"""

from .data_types import Gaussians2D, Gaussians3D, RasterConfig
from .perspective import CameraParams
from .spherical_harmonics import evaluate_sh_at

__all__ = [
    "Gaussians2D", "Gaussians3D", "RasterConfig", "CameraParams",
    "evaluate_sh_at",
]
