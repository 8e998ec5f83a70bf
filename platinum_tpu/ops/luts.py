"""GGX energy-compensation LUTs: container + clamp-to-edge sampling.

The reference ships 8 LUT textures baked by its MultiscatterLutGenerator tool
(renderer_pt.hpp:154-165; loaded at renderer_pt.cpp:385-446). This framework
bakes its own with `platinum_tpu.tools.lut_baker` (same integrands) and loads
them from a bundled .npz; sampling reproduces Metal's normalized-coordinate
clamp-to-edge linear filtering (texel centers at (i+0.5)/N).

LUT set (parametrization: x = cosθ, y = roughness, z = iorParam = (η−1)/η for
η>1 or 1−η for η<1):
  E            (128, 128)     single-scatter GGX directional albedo
  E_avg        (128,)         its cosine-weighted hemispherical average
  E_ms         (32, 32, 32)   Fresnel-weighted multiscatter dielectric albedo [z,y,x]
  E_ms_avg     (32, 32)       its average [y=roughness, x=iorParam]
  E_trans_in   (32, 32, 32)   transparent dielectric albedo, entering (η>1)
  E_trans_out  (32, 32, 32)   transparent dielectric albedo, exiting (η<1)
  E_trans_in_avg / E_trans_out_avg (32, 32)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

RESOURCE_DIR = os.path.join(os.path.dirname(__file__), "..", "resources")
# Self-baked bundle (tools/lut_baker.py output)
LUT_BUNDLE = os.path.join(RESOURCE_DIR, "ggx_luts.npz")
# Bundle converted from the reference's shipped LUT EXRs
# (tools/import_luts.py over resource/lut/ — SURVEY §2.7 sanctions loading
# these exact values for bit-comparable energy compensation; the self-baked
# set carries ~1% Monte-Carlo noise). Preferred by get_luts() when present.
LUT_BUNDLE_REF = os.path.join(RESOURCE_DIR, "ggx_luts_ref.npz")

LUT_NAMES = (
    "E", "E_avg", "E_ms", "E_ms_avg",
    "E_trans_in", "E_trans_out", "E_trans_in_avg", "E_trans_out_avg",
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Luts:
    E: jnp.ndarray
    E_avg: jnp.ndarray
    E_ms: jnp.ndarray
    E_ms_avg: jnp.ndarray
    E_trans_in: jnp.ndarray
    E_trans_out: jnp.ndarray
    E_trans_in_avg: jnp.ndarray
    E_trans_out_avg: jnp.ndarray


_CACHED: dict = {}


def load_luts(path: str | None = None) -> Luts:
    path = path or LUT_BUNDLE
    if path not in _CACHED:
        data = np.load(path)
        _CACHED[path] = Luts(**{
            k: jnp.asarray(data[k], jnp.float32) for k in LUT_NAMES
        })
    return _CACHED[path]


def placeholder_luts() -> Luts:
    """Identity-ish LUTs (E = 1 → no energy compensation); used when the
    baked bundle is unavailable."""
    return Luts(
        E=jnp.ones((128, 128)),
        E_avg=jnp.ones((128,)),
        E_ms=jnp.ones((32, 32, 32)),
        E_ms_avg=jnp.ones((32, 32)),
        E_trans_in=jnp.ones((32, 32, 32)),
        E_trans_out=jnp.ones((32, 32, 32)),
        E_trans_in_avg=jnp.ones((32, 32)),
        E_trans_out_avg=jnp.ones((32, 32)),
    )


def get_luts() -> Luts:
    """Default LUT set: the reference-derived bundle when present (exact
    energy-compensation parity), else the self-baked one, else identity."""
    if os.path.exists(LUT_BUNDLE_REF):
        return load_luts(LUT_BUNDLE_REF)
    if os.path.exists(LUT_BUNDLE):
        return load_luts()
    return placeholder_luts()


# ---------------------------------------------------------------------------
# Metal-style normalized clamp-to-edge linear sampling
# ---------------------------------------------------------------------------

def _axis(coord, n):
    x = jnp.clip(coord * n - 0.5, 0.0, n - 1.0)
    x0 = jnp.floor(x)
    f = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    return i0, i1, f


def sample1d(lut: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    (n,) = lut.shape
    i0, i1, f = _axis(u, n)
    return lut[i0] * (1 - f) + lut[i1] * f


def sample2d(lut: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """lut is (H, W) indexed [v, u]."""
    h, w = lut.shape
    x0, x1, fx = _axis(u, w)
    y0, y1, fy = _axis(v, h)
    return (
        (lut[y0, x0] * (1 - fx) + lut[y0, x1] * fx) * (1 - fy)
        + (lut[y1, x0] * (1 - fx) + lut[y1, x1] * fx) * fy
    )


def sample3d(lut: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, w_: jnp.ndarray) -> jnp.ndarray:
    """lut is (D, H, W) indexed [w, v, u]."""
    d, h, w = lut.shape
    x0, x1, fx = _axis(u, w)
    y0, y1, fy = _axis(v, h)
    z0, z1, fz = _axis(w_, d)

    def bil(z):
        return (
            (lut[z, y0, x0] * (1 - fx) + lut[z, y0, x1] * fx) * (1 - fy)
            + (lut[z, y1, x0] * (1 - fx) + lut[z, y1, x1] * fx) * fy
        )

    return bil(z0) * (1 - fz) + bil(z1) * fz


# ---------------------------------------------------------------------------
# Host-side (numpy) mirrors of the samplers — used by the flattener to bake
# per-material energy rows (same clamp-to-edge texel-center semantics)
# ---------------------------------------------------------------------------

def _axis_np(coord, n):
    x = np.clip(np.asarray(coord, np.float64) * n - 0.5, 0.0, n - 1.0)
    x0 = np.floor(x)
    return x0.astype(np.int64), np.minimum(x0 + 1, n - 1).astype(np.int64), x - x0


def sample1d_np(lut, u):
    lut = np.asarray(lut)
    i0, i1, f = _axis_np(u, lut.shape[0])
    return lut[i0] * (1 - f) + lut[i1] * f


def sample2d_np(lut, u, v):
    lut = np.asarray(lut)
    h, w = lut.shape
    x0, x1, fx = _axis_np(u, w)
    y0, y1, fy = _axis_np(v, h)
    return ((lut[y0, x0] * (1 - fx) + lut[y0, x1] * fx) * (1 - fy)
            + (lut[y1, x0] * (1 - fx) + lut[y1, x1] * fx) * fy)


def sample3d_np(lut, u, v, w_):
    lut = np.asarray(lut)
    d, h, w = lut.shape
    x0, x1, fx = _axis_np(u, w)
    y0, y1, fy = _axis_np(v, h)
    z0, z1, fz = _axis_np(w_, d)

    def bil(z):
        return ((lut[z, y0, x0] * (1 - fx) + lut[z, y0, x1] * fx) * (1 - fy)
                + (lut[z, y1, x0] * (1 - fx) + lut[z, y1, x1] * fx) * fy)

    return bil(z0) * (1 - fz) + bil(z1) * fz


_HOST_CACHE: dict = {}


def get_host_luts():
    """Host-side (numpy) LUT bundle for flatten-time baking — avoids
    device→host readbacks of the jnp Luts (expensive on tunneled TPUs)."""
    if "host" not in _HOST_CACHE:
        if os.path.exists(LUT_BUNDLE):
            data = np.load(LUT_BUNDLE)
            arrays = {k: np.asarray(data[k], np.float32) for k in LUT_NAMES}
        else:
            ph = placeholder_luts()
            import jax

            arrays = {k: np.asarray(jax.device_get(getattr(ph, k)))
                      for k in LUT_NAMES}
        _HOST_CACHE["host"] = Luts(**arrays)
    return _HOST_CACHE["host"]
