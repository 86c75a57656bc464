"""dffx.parallel — mesh construction and SPMD sharding (SURVEY.md §2.5).

The reference's only "distributed" machinery is single-process
``nn.DataParallel`` (`test.py:32`, `train_code_DDFF.py:62`).  The TPU-native
replacement is mesh-based SPMD:

* ``data`` axis — batch-sharded training/eval; XLA inserts the gradient
  ``psum`` (all-reduce over ICI) automatically from the sharding annotations.
* ``spatial`` axis — H-dimension sharding for full-resolution inference; XLA's
  GSPMD partitioner inserts the halo exchanges each convolution's receptive
  field needs (the context-parallel analogue for conv workloads).

No NCCL/MPI-style code: collectives are compiled from shardings.
"""

from dffx.parallel import distributed
from dffx.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "spatial_sharding",
    "shard_batch",
    "replicate",
    "distributed",
]
