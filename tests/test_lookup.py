"""Gather-free lookup must recover rows bit-exactly on the real device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from platinum_tpu.ops import lookup


@pytest.mark.parametrize("m,method", [
    (4, "select"), (8, "select"), (16, "onehot"), (64, "onehot"),
    (256, "onehot"), (1024, "onehot"), (300, "gather"),
])
def test_rows_exact(m, method):
    rng = np.random.default_rng(m)
    # float payloads + integer payloads stored as value floats
    table = np.concatenate(
        [rng.standard_normal((m, 12)).astype(np.float32) * 100.0,
         rng.integers(0, 2 ** 22, (m, 4)).astype(np.float32)], axis=1,
    )
    idx = rng.integers(0, m, (4096,)).astype(np.int32)
    tj = jnp.asarray(table)
    ij = jnp.asarray(idx)
    out = jax.jit(lambda t, i: lookup.rows(t, i, method=method))(tj, ij)
    np.testing.assert_array_equal(np.asarray(out), table[idx])
    # integer payloads must round-trip through int cast exactly
    ints = np.asarray(out)[:, 12:].astype(np.int32)
    np.testing.assert_array_equal(ints, table[idx][:, 12:].astype(np.int32))


def test_auto_strategy_boundaries():
    rng = np.random.default_rng(0)
    for m in (2, lookup.SELECT_MAX, lookup.SELECT_MAX + 1, 512):
        table = rng.standard_normal((m, 3)).astype(np.float32)
        idx = rng.integers(0, m, (256,)).astype(np.int32)
        out = jax.jit(lookup.rows)(jnp.asarray(table), jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_scalars():
    table = jnp.asarray(np.arange(10, dtype=np.float32) * 3.5)
    idx = jnp.asarray(np.array([0, 9, 4, 4], np.int32))
    out = jax.jit(lookup.scalars)(table, idx)
    np.testing.assert_array_equal(np.asarray(out), [0.0, 31.5, 14.0, 14.0])


def test_interp_rows_matches_gather():
    rng = np.random.default_rng(7)
    table = rng.random((300, 4)).astype(np.float32)
    idx = rng.integers(0, 299, (2048,)).astype(np.int32)
    frac = rng.random(2048).astype(np.float32)
    out = jax.jit(lambda t, i, f: lookup.interp_rows(t, i, f, method="onehot"))(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(frac))
    ref = table[idx] * (1 - frac[:, None]) + table[idx + 1] * frac[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
