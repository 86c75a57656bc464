"""Packed (space-to-depth) tail evaluation must be numerically equivalent to
the plain path — it is a reparameterization of the same convolutions
(dffx/models/packed.py), not an approximation."""

import numpy as np
import pytest

import jax.numpy as jnp

from dffx.models import Ctx, dffnet_apply, init_params, network_specs
from dffx.ops import conv3d, deconv3d


def test_pack_roundtrip(rng):
    from dffx.models.packed import pack, unpack

    x = jnp.asarray(rng.standard_normal((2, 3, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack(pack(x))), np.asarray(x))


def test_pack_conv_s1_exact(rng):
    from dffx.models.packed import _conv, pack, pack_conv_s1, unpack

    x = jnp.asarray(rng.standard_normal((1, 3, 16, 24, 6)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, 6, 5)) * 0.2).astype(np.float32))
    ref = conv3d(x, w, padding=1)
    got = unpack(_conv(pack(x), pack_conv_s1(w), [(1, 1), (1, 1), (1, 1)]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_conv_s1_grouped_concat(rng):
    from dffx.models.packed import _conv, pack, pack_conv_s1, unpack

    a = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, 7, 5)) * 0.2).astype(np.float32))
    ref = conv3d(jnp.concatenate([a, b], -1), w, padding=1)
    cat_packed = jnp.concatenate([pack(a), pack(b)], -1)
    got = unpack(_conv(cat_packed, pack_conv_s1(w, in_groups=[4, 3]),
                       [(1, 1), (1, 1), (1, 1)]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_conv_s2_exact(rng):
    from dffx.models.packed import _conv, pack, pack_conv_s2

    x = jnp.asarray(rng.standard_normal((1, 3, 16, 24, 6)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, 6, 5)) * 0.2).astype(np.float32))
    ref = conv3d(x, w, stride=(1, 2, 2), padding=1)
    got = _conv(pack(x), pack_conv_s2(w), [(1, 1), (1, 0), (1, 0)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_deconv_exact(rng):
    from dffx.models.packed import _conv, pack_deconv, unpack

    x = jnp.asarray(rng.standard_normal((1, 3, 8, 12, 6)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, 6, 5)) * 0.2).astype(np.float32))
    ref = deconv3d(x, w, stride=(1, 2, 2), padding=1, output_padding=(0, 1, 1))
    got = unpack(_conv(x, pack_deconv(w), [(1, 1), (0, 1), (0, 1)]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_full_model_packed_tail_matches_plain(rng):
    params = init_params(network_specs(), seed=0)
    fs = jnp.asarray(rng.uniform(-1, 1, (1, 5, 64, 96, 3)).astype(np.float32))
    fd = jnp.asarray(np.linspace(0.1, 1.5, 5, dtype=np.float32)[None])
    ref = dffnet_apply(params, fs, fd, Ctx())
    got = dffnet_apply(params, fs, fd, Ctx(use_packed=True))
    # only the D4 head flows through the packed tail; the others must be
    # bit-identical programs
    for g, r, name in zip(got, ref, ["mid", "p1", "p2", "p3"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-5, err_msg=name)
