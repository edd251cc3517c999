"""Pallas fused flat-scan kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from fabstir_vectordb_tpu.ops.pallas.flat_scan import pallas_l2_topk


def reference_topk(x, mask, q, k):
    d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    d[:, ~mask] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    vals = np.take_along_axis(d, idx, axis=1)
    idx = np.where(np.isfinite(vals), idx, -1)
    return vals, idx


def test_matches_reference(rng):
    n, dim, b, k, tile = 512, 128, 8, 8, 128
    x = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[[3, 100, 400]] = False
    d, i = pallas_l2_topk(
        jnp.asarray(x), jnp.asarray((x * x).sum(1)), jnp.asarray(mask),
        jnp.asarray(q), k, tile=tile, interpret=True,
    )
    want_d, want_i = reference_topk(x, mask, q, k)
    np.testing.assert_array_equal(np.asarray(i), want_i)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-3, atol=1e-3)


def test_all_masked_padding(rng):
    n, dim, b, k = 256, 64, 4, 8
    x = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[:3] = True  # fewer valid rows than k
    d, i = pallas_l2_topk(
        jnp.asarray(x), jnp.asarray((x * x).sum(1)), jnp.asarray(mask),
        jnp.asarray(q), k, tile=128, interpret=True,
    )
    i = np.asarray(i)
    d = np.asarray(d)
    assert (i[:, :3] >= 0).all()
    assert (i[:, 3:] == -1).all()
    assert np.isinf(d[:, 3:]).all()


def test_rejects_unaligned():
    with pytest.raises(ValueError):
        pallas_l2_topk(
            jnp.zeros((100, 8)), jnp.zeros(100), jnp.ones(100, bool),
            jnp.zeros((1, 8)), 4, tile=64, interpret=True,
        )
