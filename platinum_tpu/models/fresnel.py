"""Fresnel terms (pure JAX). Parity with bsdf.metal:45-95."""

from __future__ import annotations

import jax.numpy as jnp


def schlick(f0: jnp.ndarray, cos_theta: jnp.ndarray) -> jnp.ndarray:
    """Schlick approximation; f0 (..., 3) or (...,), cos_theta (...,)."""
    k = 1.0 - jnp.clip(cos_theta, 0.0, 1.0)
    k2 = k * k
    w = (k2 * k2 * k)
    if f0.ndim == cos_theta.ndim + 1:
        w = w[..., None]
    return f0 + (1.0 - f0) * w


def fresnel_dielectric(cos_theta: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    """Exact unpolarized dielectric Fresnel reflectance; ior = n_t / n_i.
    Total internal reflection → 1."""
    cos_theta = jnp.clip(cos_theta, 0.0, 1.0)
    sin2_t = (1.0 - cos_theta * cos_theta) / jnp.maximum(ior * ior, 1e-20)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    parallel = (ior * cos_theta - cos_t) / jnp.maximum(ior * cos_theta + cos_t, 1e-20)
    perp = (cos_theta - ior * cos_t) / jnp.maximum(cos_theta + ior * cos_t, 1e-20)
    f = 0.5 * (parallel * parallel + perp * perp)
    return jnp.where(sin2_t >= 1.0, 1.0, f)


def avg_dielectric_fresnel_fit(ior: jnp.ndarray) -> jnp.ndarray:
    """Kulla-Conty 2017 numerical fit for hemispherically-averaged Fresnel."""
    hi = (ior - 1.0) / (4.08567 + 1.00071 * ior)
    lo = 0.997118 + 0.1014 * ior - 0.965241 * ior * ior - 0.130607 * ior**3
    return jnp.where(ior >= 1.0, hi, lo)


def avg_conductor_fresnel(albedo: jnp.ndarray) -> jnp.ndarray:
    """Average Schlick Fresnel for conductors: (20·F0 + 1)/21
    (bsdf.metal:346)."""
    return (20.0 * albedo + 1.0) / 21.0
