"""Gather-free table lookups (TPU hot-path primitive).

On this TPU toolchain a per-lane row gather `table[idx]` costs ~0.7-2.8 ms
for 262k lanes REGARDLESS of table size (it lowers to a serialized
scalar-core loop), while dense VPU/MXU work at the same lane count is
10-100x cheaper. Every hot-path lookup therefore goes through `rows()`,
which picks a dense strategy by table height:

  M <= SELECT_MAX   unrolled where-chain (M broadcast selects)
  M <= ONEHOT_MAX   one-hot matmul on the MXU: (idx == iota) @ table
  otherwise         real gather (cold paths / giant tables only)

One-hot matmul exactness: rows are copied as 1.0*x + 0.0*y sums. With
HIGHEST precision the f32 MXU path reproduces f32 payloads bit-exactly for
normal floats, but 0.0*NaN poisons rows and denormals may flush — so
integer payloads must be stored as small *value* floats (|x| < 2^24, e.g.
float(flags)), never bitcast. `tests/test_lookup.py` asserts bit-exact row
recovery on-chip for both strategies.

This module replaces what a GPU does with __ldg loads inside the megakernel
(reference: material/light row reads in kernel.metal:118-188, 379-435).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SELECT_MAX = 8
ONEHOT_MAX = 8192


def rows(table: jnp.ndarray, idx: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """table: (M, K) f32 or int32 (small values); idx: (R,) int32 in [0, M).
    Returns (R, K) with the table's dtype. Integer tables must hold values
    with |x| < 2^24 (value-exact in f32)."""
    m = table.shape[0]
    out_dtype = table.dtype
    if jnp.issubdtype(out_dtype, jnp.integer):
        out = rows(table.astype(jnp.float32), idx, method=method)
        return out.astype(out_dtype)
    if method == "auto":
        method = ("select" if m <= SELECT_MAX
                  else "onehot" if m <= ONEHOT_MAX
                  else "gather")
    if method == "select":
        acc = jnp.broadcast_to(table[0], idx.shape + (table.shape[1],))
        for r in range(1, m):
            acc = jnp.where((idx == r)[..., None], table[r], acc)
        return acc
    if method == "onehot":
        oh = onehot(idx, m)
        return jax.lax.dot(oh, table,
                           precision=jax.lax.Precision.HIGHEST)
    return table[idx]


def interp_rows(table: jnp.ndarray, idx: jnp.ndarray, frac: jnp.ndarray,
                method: str = "auto") -> jnp.ndarray:
    """Linearly interpolated row lookup: (1-frac)*table[idx] + frac*table[idx+1]
    as ONE sparse-weight matmul (exact linear-interp parity, no gathers).
    table: (M, K) f32 — the caller guarantees idx+1 <= M-1 (clamp first).
    """
    m = table.shape[0]
    if method == "auto":
        method = "onehot" if m <= ONEHOT_MAX else "gather"
    if method == "onehot":
        # Two plain one-hot matmuls + lerp: XLA fuses the one-hot construction
        # into the MXU tiles (0.05 ms/262k lanes), whereas a combined
        # fractional-weight matrix materializes (N, M) f32 and costs ~80x.
        r0 = jax.lax.dot(onehot(idx, m), table,
                         precision=jax.lax.Precision.HIGHEST)
        r1 = jax.lax.dot(onehot(jnp.minimum(idx + 1, m - 1), m), table,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        r0 = table[idx]
        r1 = table[jnp.minimum(idx + 1, m - 1)]
    return r0 * (1.0 - frac[..., None]) + r1 * frac[..., None]


def onehot(idx: jnp.ndarray, m: int) -> jnp.ndarray:
    """(R,) int32 → (R, M) f32 one-hot (out-of-range rows are all-zero)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (m,), idx.ndim)
    return (idx[..., None] == iota).astype(jnp.float32)


def scalars(table: jnp.ndarray, idx: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """table: (M,) → (R,) lookup via rows() on a (M, 1) view."""
    return rows(table[:, None], idx, method=method)[..., 0]
