"""dffx — a TPU-native JAX/XLA/Pallas framework for depth-from-focus in the wild.

A from-scratch rebuild of the capabilities of the reference system
(wcy199705/DfFintheWild, "Learning Depth from Focus in the Wild", ECCV 2022):

* focal-stack alignment (per-slice global scale+translation motion model),
* focus-measure feature extraction with 3D convolutions,
* stacked-hourglass 3D cost aggregation over the focus axis,
* softplus-normalized soft-argmax depth regression,
* a thin-lens defocus simulator, per-dataset train recipes and eval CLIs.

Design stance (TPU-first, not a port):

* Layout is ``(B, N, H, W, C)`` (focus axis = conv "depth" axis, channels last)
  so XLA tiles convolutions straight onto the MXU.
* All ops are pure functions; parameters live in a flat dict keyed exactly like
  the reference PyTorch ``state_dict`` so checkpoint conversion is a mechanical
  layout transpose (see ``dffx.checkpoint``).
* Bilinear resampling (upsample + the alignment warp) is expressed as small
  dense matmuls with precomputed/computed interpolation matrices — MXU work
  instead of scatter/gather.
* Scaling is mesh-based: ``jax.sharding.Mesh`` + ``shard_map`` with
  ``psum``/halo ``ppermute`` collectives (see ``dffx.parallel``).
"""

__version__ = "0.1.0"

from dffx import ops  # noqa: F401
