"""Spatial (H-sharded) execution of the fused Pallas chains.

GSPMD partitions the XLA convs of a ``--spatial`` forward automatically, but
it cannot partition a ``pallas_call`` — so the fused full-res chains (the
measured batch-1 latency win, PARITY.md per-shape table) previously forced
the whole forward onto the XLA path under spatial sharding (VERDICT r3 item
5: the two features cancelled exactly where they should compose).

Each fused chain is row-local with a bounded receptive radius:

* DFFNet full-res chain  fm_conv (dilated 9x9, radius 8) -> rb2d (two 3x3,
  radius 2) -> SRD attention (spatially pointwise)      => radius 10
* E2E motion-head chain  4 stacked 3x3 convs            => radius 4

so ONE halo exchange at chain entry makes per-shard execution exact at every
INTERIOR cut: kept output rows read only input rows within ``HALO`` of the
shard, and the kernels' own edge handling at shard-local boundaries only
contaminates rows inside the discarded halo.

The TRUE image edges need one correction.  ``ppermute``'s zero-fill gives
edge shards zero halo rows, which behave like zero *pixels* — but a chain of
convs needs zero *padding of every intermediate*: the chain's outputs at the
fake rows are nonzero (BN shifts, windows straddling the fake/real boundary)
and bleed back into the first ``EDGE_ROWS`` kept rows (measured: 2 rows for
the fm chain — the first conv is linear over the zero rows, only the rb2d
pair bleeds; 3 for the motion head).  The wrapper therefore recomputes a thin
top/bottom strip (32 rows) with the caller's exact-zero-pad XLA branch and
patches those rows — <3% extra compute at the shapes that matter, and the
result is exact everywhere.

The halo is 16 rows — >= both radii and a multiple of the kernels' row tiles,
so shard-local heights keep every kernel's H % 32 == 0 contract when the
global H divides by 32 * n_shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dffx.parallel.mesh import DATA_AXIS, SPATIAL_AXIS

#: exchanged rows per side; >= the largest fused-chain receptive radius (10)
#: and a multiple of 16 so shard-local heights keep the kernels' row-tile
#: alignment (fm: H % 32, rb2d/mhead: H % 16)
HALO = 16


def spatial_active(mesh) -> bool:
    """True when ``mesh`` has a >1 spatial axis — i.e. forward inputs are
    H-sharded and an unwrapped pallas_call would force an all-gather."""
    return (mesh is not None
            and getattr(mesh, "shape", {}).get(SPATIAL_AXIS, 1) > 1)


def spatial_ok(mesh, h: int) -> bool:
    """True when the fused chains can run H-sharded over ``mesh``: a spatial
    axis > 1 and a global height that splits into x32 shard heights."""
    if mesh is None or SPATIAL_AXIS not in getattr(mesh, "shape", {}):
        return False
    s = mesh.shape[SPATIAL_AXIS]
    return s > 1 and h % (32 * s) == 0


#: default declared edge-bleed depth (rows a chain's fake-zero-halo error can
#: reach past the cut), used when a caller doesn't declare its own — covers
#: the deepest CURRENT chain (motion head, 3).  Callers with deeper chains
#: MUST pass ``bleed`` (VERDICT r4 weak 5: a future chain silently inheriting
#: a one-size constant is exactly the hazard this parameter removes).
DEFAULT_BLEED = 3
#: safety margin rows patched beyond the declared bleed — patching extra rows
#: is free correctness-wise (both paths are exact there)
EDGE_MARGIN = 1


def halo_sharded_chain(fn, x: jax.Array, mesh: Mesh, params, *,
                       edge_fn=None, halo: int = HALO,
                       bleed: int = DEFAULT_BLEED):
    """Run ``y = fn(x, params)`` — a row-local NDHWC chain (same H/W in and
    out) with zero-pad edge semantics and receptive radius <= ``halo`` — with
    H (axis 2) sharded over ``mesh``'s spatial axis.

    ``params`` is an arbitrary pytree, replicated into every shard.  The
    batch axis stays sharded over ``data`` (size 1 in the serving mesh).

    ``edge_fn(x_strip, params)`` is the chain's exact-zero-pad XLA twin; it
    recomputes ``bleed + EDGE_MARGIN`` rows at each true image edge (see
    module docstring).  Without it the first/last ``bleed`` rows are
    approximate — callers on the exact-parity serving path must supply it.

    ``bleed`` is the chain's DECLARED edge-bleed depth: the receptive radius
    of everything downstream of the chain's first conv (the first conv sees
    the same zeros either way; each later conv propagates the fake-row error
    one radius further).  fm chain: 2 (rb2d pair), motion head: 3, rb_of
    chain: 2 per block.
    """
    s = mesh.shape[SPATIAL_AXIS]
    if s == 1:
        return fn(x, params)
    h = x.shape[2]
    assert h % (32 * s) == 0, (x.shape, s)

    def body(xl, ps):
        # neighbor rows: shard i's bottom rows become shard i+1's top halo
        # and vice versa; edge shards receive ppermute's zero fill (patched
        # below via edge_fn)
        top = jax.lax.ppermute(
            xl[:, :, -halo:], SPATIAL_AXIS, [(i, i + 1) for i in range(s - 1)]
        )
        bot = jax.lax.ppermute(
            xl[:, :, :halo], SPATIAL_AXIS, [(i, i - 1) for i in range(1, s)]
        )
        xx = jnp.concatenate([top, xl, bot], axis=2)
        return fn(xx, ps)[:, :, halo:-halo]

    spec = P(DATA_AXIS, None, SPATIAL_AXIS)
    # check_vma=False: the varying-axes checker requires vma annotations on
    # every pallas_call out_shape, which the kernels (correctly) don't carry;
    # the body is trivially per-shard so the check adds nothing here
    out = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, P()), out_specs=spec,
        check_vma=False,
    )(x, params)

    if edge_fn is not None:
        edge_rows = bleed + EDGE_MARGIN
        # the strip's own far edge is fake, so it must exceed edge_rows +
        # the chain's full receptive radius (<= halo); round to x32 so the
        # XLA twin sees a tile-aligned height
        strip = min(-(-(edge_rows + halo) // 32) * 32, h)
        assert strip > edge_rows, (strip, edge_rows)
        top_out = edge_fn(x[:, :, :strip], params)[:, :, :edge_rows]
        bot_out = edge_fn(x[:, :, h - strip:], params)[:, :, strip - edge_rows:]
        out = jax.lax.dynamic_update_slice_in_dim(
            out, top_out.astype(out.dtype), 0, axis=2)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, bot_out.astype(out.dtype), h - edge_rows, axis=2)
    return out
