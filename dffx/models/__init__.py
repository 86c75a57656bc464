"""dffx.models — the single model library (SURVEY.md §1: the reference keeps
three copy-pasted network definitions; here there is exactly one).

* ``dffnet``   — the depth-from-focus network (focus-measure pyramid → multi-
  scale aggregation → stacked refinement hourglasses → soft-argmax heads).
* ``alignnet`` — the coarse-to-fine alignment network (per-slice global
  scale+translation motion regression + differentiable warp).

Parameters are flat dicts keyed exactly like the reference PyTorch state_dict
(e.g. ``"DFF_net.FM_measure.Focus_extraction.0.0.weight"``) so a pretrained
``check_point.pth`` converts by pure layout transposition (``dffx.checkpoint``).
"""

from dffx.models.layers import Ctx, init_params, trainable_mask
from dffx.models.dffnet import dffnet_apply, dffnet_specs, network_specs
from dffx.models.alignnet import (
    e2e_apply,
    e2e_network_specs,
    flownet_apply,
    flownet_specs,
)

__all__ = [
    "Ctx",
    "init_params",
    "trainable_mask",
    "dffnet_apply",
    "dffnet_specs",
    "network_specs",
    "flownet_apply",
    "flownet_specs",
    "e2e_apply",
    "e2e_network_specs",
]
