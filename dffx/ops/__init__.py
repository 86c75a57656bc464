"""dffx.ops — TPU-native numerics kit with PyTorch-exact semantics.

Every op the reference delegates to ATen/cuDNN
(`SURVEY.md` §2.6) has a JAX/XLA implementation here with matching numerics:

* ``conv3d`` / ``deconv3d``     — Conv3d / ConvTranspose3d (incl. output_padding)
* ``batch_norm`` and helpers    — BatchNorm3d train/eval incl. running stats
* ``max_pool3d`` / ``avg_pool3d`` / ``adaptive_avg_pool`` — (1,k,k) pooling
* ``upsample_bilinear``         — torch-1.6 F.upsample(mode='bilinear'),
                                  align_corners=False, as interpolation matmuls
* ``grid_sample_2d``/``_3d``    — F.grid_sample align_corners=True, zeros pad
* ``affine_warp``               — the separable scale+translate warp used by the
                                  alignment net / simulator, as per-slice matmuls
* ``softplus_argmax``           — fused softplus → normalize → soft-argmax over N
"""

from dffx.ops.conv import conv3d, deconv3d
from dffx.ops.norm import batch_norm, batch_norm_train
from dffx.ops.pool import avg_pool3d, max_pool3d, adaptive_avg_pool_focus
from dffx.ops.resize import bilinear_matrix, upsample_bilinear
from dffx.ops.warp import (
    affine_warp_matrices,
    affine_warp_stack,
    grid_sample_2d,
)
from dffx.ops.softargmax import softplus_argmax

__all__ = [
    "conv3d",
    "deconv3d",
    "batch_norm",
    "batch_norm_train",
    "avg_pool3d",
    "max_pool3d",
    "adaptive_avg_pool_focus",
    "bilinear_matrix",
    "upsample_bilinear",
    "affine_warp_matrices",
    "affine_warp_stack",
    "grid_sample_2d",
    "softplus_argmax",
]
