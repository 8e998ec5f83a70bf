"""Trowbridge-Reitz GGX microfacet distribution (pure JAX, vectorized).

Parity with the reference's GGX class (bsdf.metal:102-183): anisotropic NDF,
Smith height-correlated masking/shadowing, Dupuy-Benyoub bounded VNDF
sampling, reflection pdf, and the smooth-surface cutoff (alpha < 1e-3 treated
as perfect specular). All directions are tangent-space (+Z normal); `alpha`
is (..., 2) so every lane can have its own (possibly anisotropic) roughness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.ops.samplers import sample_disk

SMOOTH_ALPHA = 1e-3


def alpha_from_roughness(roughness: jnp.ndarray, anisotropy: jnp.ndarray | None = None) -> jnp.ndarray:
    """(..., 2) GGX alphas; anisotropy stretches x/y like the reference
    (aspect = sqrt(1 - 0.9·aniso))."""
    a = roughness * roughness
    if anisotropy is None:
        return jnp.stack([a, a], axis=-1)
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropy)
    return jnp.stack([a / aspect, a * aspect], axis=-1)


def is_smooth(alpha: jnp.ndarray) -> jnp.ndarray:
    return (alpha[..., 0] < SMOOTH_ALPHA) & (alpha[..., 1] < SMOOTH_ALPHA)


def mdf(alpha: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Microfacet (normal) distribution function D(w)."""
    ax, ay = alpha[..., 0], alpha[..., 1]
    cos2 = w[..., 2] * w[..., 2]
    cos4 = cos2 * cos2
    k = (
        w[..., 0] * w[..., 0] / (ax * ax) + w[..., 1] * w[..., 1] / (ay * ay)
    ) / jnp.maximum(cos2, 1e-20)
    k = (1.0 + k) * (1.0 + k)
    return 1.0 / (np.pi * ax * ay * jnp.maximum(cos4 * k, 1e-20))


def _lambda(alpha: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    ax, ay = alpha[..., 0], alpha[..., 1]
    cos2 = jnp.maximum(w[..., 2] * w[..., 2], 1e-20)
    alpha2 = jnp.where(
        ax == ay,
        ax * ax,
        ax * ax * w[..., 0] * w[..., 0] + ay * ay * w[..., 1] * w[..., 1],
    )
    return (jnp.sqrt(1.0 + alpha2 / cos2) - 1.0) * 0.5


def g1(alpha, w):
    return 1.0 / (1.0 + _lambda(alpha, w))


def g(alpha, wo, wi):
    return 1.0 / (1.0 + _lambda(alpha, wo) + _lambda(alpha, wi))


def vmdf(alpha, w, wm):
    """Visible NDF."""
    return (
        g1(alpha, w)
        / jnp.maximum(jnp.abs(w[..., 2]), 1e-20)
        * mdf(alpha, wm)
        * jnp.abs(jnp.sum(w * wm, axis=-1))
    )


def sample_vmdf(alpha: jnp.ndarray, w: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample a visible microfacet normal (spherical-cap method, parity with
    bsdf.metal:137-153).

    The optimization_barrier on `w` works around a reproducible XLA:TPU
    miscompile (observed on the axon v5e toolchain): when `w` arrives as a
    fused computed expression (e.g. stack([sqrt(1-c^2), 0, c])), the fusion
    through this function produces corrupt microfacet normals (pz
    collapses to 0 → wm.z == 0 for ~70% of samples). Materializing `w`
    defeats the bad fusion; verified against CPU and numpy references.
    """
    w = jax.lax.optimization_barrier(w)
    wh = jnp.stack(
        [w[..., 0] * alpha[..., 0], w[..., 1] * alpha[..., 1], w[..., 2]], axis=-1
    )
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-20)
    wh = wh * jnp.where(wh[..., 2:3] < 0.0, -1.0, 1.0)

    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wh.shape)
    b_raw = jnp.cross(z, wh)
    b_len = jnp.linalg.norm(b_raw, axis=-1, keepdims=True)
    b = jnp.where(
        (wh[..., 2:3] < 0.9999),
        b_raw / jnp.maximum(b_len, 1e-20),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wh.shape),
    )
    t = jnp.cross(wh, b)

    p = sample_disk(u)
    h = jnp.sqrt(jnp.maximum(0.0, 1.0 - p[..., 0] * p[..., 0]))
    mix_t = 0.5 * wh[..., 2] + 0.5
    py = h * (1.0 - mix_t) + p[..., 1] * mix_t
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - p[..., 0] ** 2 - py**2))
    nh = b * p[..., 0:1] + t * py[..., None] + wh * pz[..., None]

    wm = jnp.stack(
        [
            alpha[..., 0] * nh[..., 0],
            alpha[..., 1] * nh[..., 1],
            jnp.maximum(1e-6, nh[..., 2]),
        ],
        axis=-1,
    )
    return wm / jnp.maximum(jnp.linalg.norm(wm, axis=-1, keepdims=True), 1e-20)


def single_scatter_brdf(alpha, wo, wi, wm):
    return (
        mdf(alpha, wm)
        * g(alpha, wo, wi)
        / jnp.maximum(4.0 * jnp.abs(wo[..., 2]) * jnp.abs(wi[..., 2]), 1e-20)
    )


def pdf(alpha, wo, wm):
    """pdf of sample_vmdf-generated reflections."""
    return vmdf(alpha, wo, wm) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo * wm, axis=-1)), 1e-20
    )


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Metal-convention reflect: i points toward the surface."""
    return i - 2.0 * jnp.sum(i * n, axis=-1, keepdims=True) * n


def refract(i: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Metal-convention refract; returns 0-vector on total internal
    reflection. eta = n_incident / n_transmitted."""
    eta = jnp.expand_dims(jnp.broadcast_to(eta, i.shape[:-1]), -1)
    cos_i = jnp.sum(n * i, axis=-1, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    out = eta * i - (eta * cos_i + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, 0.0, out)
