"""Orthonormal shading frames, vectorized over rays (pure JAX).

Parity with the reference's Frame struct (kernel.metal:40-70): Z-up frames
built either from a normal alone or from normal + tangent (+ handedness),
with the same degenerate-tangent fallback (|n·t| > 0.9 → normal-only frame).
A frame is a tuple of three (..., 3) arrays (t, b, n).
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def from_normal(n: jnp.ndarray):
    a = jnp.where(
        (jnp.abs(n[..., 0]) > 0.5)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    b = _normalize(jnp.cross(n, a))
    t = jnp.cross(n, b)
    return t, b, n


def from_nt(n: jnp.ndarray, t: jnp.ndarray, sign: jnp.ndarray):
    """Frame from normal + tangent with handedness sign; falls back to
    from_normal where the tangent is degenerate."""
    bad = jnp.abs(jnp.sum(n * t, axis=-1)) > 0.9
    ft, fb, fn = from_normal(n)
    b = _normalize(jnp.cross(n, t)) * sign[..., None]
    t2 = jnp.cross(b, n)
    sel = bad[..., None]
    return (
        jnp.where(sel, ft, t2),
        jnp.where(sel, fb, b),
        n,
    )


def world_to_local(frame, w: jnp.ndarray) -> jnp.ndarray:
    t, b, n = frame
    return jnp.stack(
        [jnp.sum(w * t, -1), jnp.sum(w * b, -1), jnp.sum(w * n, -1)], axis=-1
    )


def local_to_world(frame, l: jnp.ndarray) -> jnp.ndarray:
    t, b, n = frame
    return (
        t * l[..., 0:1] + b * l[..., 1:2] + n * l[..., 2:3]
    )
