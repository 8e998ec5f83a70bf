"""GMoN (Gini-weighted median of means) robust sample combination.

Parity with gmon.metal:14-55: per pixel, sort the per-bucket mean estimates
by luma, compute the Gini coefficient G of the luma distribution (capped by
an option), and average the middle nBuckets − 2·int(G·nBuckets/2) buckets —
full mean when estimates agree (G→0), median when they don't (G→1), which
suppresses fireflies. The per-pixel insertion sort over ≤32 buckets becomes
one vectorized sort along the bucket axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LUMA = jnp.asarray(np.array([0.2126, 0.7152, 0.0722], np.float32))


def gmon_combine(buckets: jnp.ndarray, n_full: int | jnp.ndarray,
                 cap: float = 1.0) -> jnp.ndarray:
    """buckets: (B, R, 3) per-bucket running means (only the first n_full are
    valid); returns (R, 3) robust estimate.

    n_full may be traced; B is static. Invalid buckets are pushed to +inf
    luma so they sort to the top and are excluded from the window.
    """
    b = buckets.shape[0]
    idx = jnp.arange(b)[:, None]
    valid = idx < n_full

    luma = jnp.sum(buckets * LUMA, axis=-1)
    luma_sortkey = jnp.where(valid, luma, jnp.inf)
    order = jnp.argsort(luma_sortkey, axis=0)
    sorted_vals = jnp.take_along_axis(buckets, order[..., None], axis=0)
    sorted_luma = jnp.take_along_axis(jnp.where(valid, luma, 0.0), order, axis=0)
    sorted_valid = jnp.take_along_axis(valid, order, axis=0)

    n = jnp.asarray(n_full, jnp.float32)
    ranks = (jnp.arange(b, dtype=jnp.float32) + 1.0)[:, None]
    s = jnp.sum(sorted_luma, axis=0)
    ws = jnp.sum(ranks * sorted_luma * sorted_valid, axis=0)
    g = (2.0 * ws) / jnp.maximum(n * s, 1e-20) - (n + 1.0) / n
    g = jnp.clip(g, 0.0, cap)

    c = jnp.floor(g * jnp.floor(n / 2.0)).astype(jnp.int32)
    lo = c[None, :]
    hi = (jnp.asarray(n_full, jnp.int32) - c)[None, :]
    in_window = (idx >= lo) & (idx < hi) & sorted_valid
    count = jnp.maximum(jnp.sum(in_window, axis=0), 1)
    total = jnp.sum(jnp.where(in_window[..., None], sorted_vals, 0.0), axis=0)
    return total / count[..., None]
