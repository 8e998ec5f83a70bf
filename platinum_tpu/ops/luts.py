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
  E_aniso      (32, 32, 32)   azimuth-averaged ANISOTROPIC albedo
                              [z=|aniso|, y=rough, x=cosθ] — net-new vs
                              the reference (see Luts field comment)
  E_avg_aniso  (32, 32)       its cosine-weighted average [y=rough, x=aniso]
  E_ms_aniso   (8, 32, 32, 32) ANISOTROPIC Fresnel-weighted multiscatter
                              dielectric albedo [q=|aniso|, z=iorParam,
                              y=rough, x=cosθ] — net-new (see Luts)
  E_ms_avg_aniso (8, 32, 32)  its average [q=|aniso|, y=rough, x=iorParam]
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
# (tools/import_luts.py over resource/lut/). NOT the default: the
# reference's tables normalize ITS estimator, and this framework's
# sampling conventions deliberately differ (see _bundle_path) — they are
# measurably wrong normalizers here (rough-glass furnace -3.2%). Opt in
# with PLATINUM_TPU_LUTS=ref for bit-comparable parity experiments.
LUT_BUNDLE_REF = os.path.join(RESOURCE_DIR, "ggx_luts_ref.npz")

LUT_NAMES = (
    "E", "E_avg", "E_ms", "E_ms_avg",
    "E_trans_in", "E_trans_out", "E_trans_in_avg", "E_trans_out_avg",
    "E_aniso", "E_avg_aniso", "E_ms_aniso", "E_ms_avg_aniso",
)


def _bundle_arrays(data) -> dict:
    """Bundle .npz -> {name: np.float32 array} with back-compat fallbacks.

    Bundles baked before the anisotropic energy tables existed (incl. the
    reference-derived bundle — the reference's LUT set is isotropic-only)
    lack E_aniso/E_avg_aniso. The fallback is a singleton-axis broadcast
    of the isotropic tables: sample3d/sample2d clamp a size-1 axis to its
    only slice, so lookups reproduce the old isotropic behavior exactly."""
    out = {k: np.asarray(data[k], np.float32)
           for k in LUT_NAMES if k in data}
    if "E_aniso" not in out:
        out["E_aniso"] = out["E"][None]
    if "E_avg_aniso" not in out:
        out["E_avg_aniso"] = out["E_avg"][:, None]
    if "E_ms_aniso" not in out and "E_ms" in out:
        out["E_ms_aniso"] = out["E_ms"][None]
    if "E_ms_avg_aniso" not in out and "E_ms_avg" in out:
        out["E_ms_avg_aniso"] = out["E_ms_avg"][None]
    return out


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
    # Azimuth-averaged ANISOTROPIC single-scatter albedo
    # E̅(aniso, rough, cosθ) (32³) + its cosine-weighted average
    # E̅_avg(rough, aniso) (32²) — net-new vs the reference, whose LUT set
    # is isotropic-only: both implementations' conductor multiscatter
    # used E at the scalar roughness (= geometric-mean alpha), which
    # OVERestimates E under anisotropy (MC: 0.90 vs true 0.77 at μ=0.9,
    # r=0.5, aniso=0.9) so (1−E) under-fills — measured −1.8% on an
    # aniso=0.9 metal furnace. The true albedo is nearly azimuth-flat,
    # so a φ-averaged table indexed by |aniso| (x/y-swap symmetry)
    # closes it. Baked by tools/lut_baker.bake_E_aniso.
    E_aniso: jnp.ndarray
    E_avg_aniso: jnp.ndarray
    # ANISOTROPIC Fresnel-weighted multiscatter dielectric albedo
    # E_ms(|aniso|, iorParam, rough, cosθ) (8·32³) + its average
    # E_ms_avg(|aniso|, rough, iorParam) (8·32²) — the aniso axis the
    # isotropic E_ms lacks. Same rationale as E_aniso: looking E_ms up
    # at the scalar roughness over-estimates the dielectric specular
    # albedo under anisotropy so the diffuse (1−E_ms) terms under-fill
    # (measured −3.1e-3 on an aniso=0.9 r=0.6 dielectric furnace with
    # the isotropic table). 8 aniso bins suffice: the correction is
    # ≤0.3% and smooth in |aniso|. Baked by lut_baker.bake_E_ms_aniso.
    E_ms_aniso: jnp.ndarray
    E_ms_avg_aniso: jnp.ndarray
    # Mean clearcoat Fresnel over the visible NDF, F̄(wo) =
    # ∫ Dv(wm|wo)·F(wo·wm, 1.5) dwm, (32 rough, 32 cos). This is the
    # EXACT marginal probability (÷ clearcoat) that sample() picks the
    # coat lobe (its wm draw is independent of the base lobes' randoms),
    # so evaluate() dims the base with it — the reference dims with
    # F at the deterministic half-vector wm(wo, wi) instead, which
    # differs from the true sampling marginal and costs a measured
    # ±0.8% on coat=1 furnaces. Computed at load (deterministic
    # midpoint quadrature, not MC — no bundle entry needed).
    F_coat_avg: jnp.ndarray
    # Fresnel-WEIGHTED single-scatter coat albedo over the same warp,
    # E_F(wo) = ∫ Dv(wm|wo)·F(wo·wm)·(G2/G1)(wm) dwm with below-horizon
    # reflections rejected. F(wm) and the VNDF sample weight G2/G1 are
    # negatively correlated (grazing wm: high F, strong masking), so the
    # Fresnel-free 1/E under-compensates the coat lobe at high roughness
    # (measured -0.9% at coat roughness 0.9); F̄/E_F is the exact
    # normalizer: the sampled coat yield becomes c·F̄ identically,
    # cancelling the base dimming's (1 - c·F̄).
    E_F_coat: jnp.ndarray


_CACHED: dict = {}


def _bake_coat_fresnel_avg(n_rough: int = 32, n_cos: int = 32,
                           n_quad: int = 64, ior: float = 1.5):
    """Deterministic (n_quad² midpoint) quadrature over the spherical-cap
    VNDF warp — the same warp ggx.sample_vmdf uses, so the tables ARE the
    sampler's marginals. COUPLING: this is a numpy reimplementation of
    that warp; if ggx.sample_vmdf ever changes (e.g. bounded-VNDF), this
    bake must change with it — test_coat_tables_properties_and_warp_match
    cross-checks the two by MC. Returns (F̄, E_F): the mean coat Fresnel
    and the Fresnel-weighted single-scatter albedo (G2/G1 weight,
    below-horizon reflections rejected), both (n_rough, n_cos) float32."""
    r = (np.arange(n_rough, dtype=np.float64) + 0.5) / n_rough
    c = (np.arange(n_cos, dtype=np.float64) + 0.5) / n_cos
    rough, cos_o = np.meshgrid(r, c, indexing="ij")       # (R, C)
    alpha = np.maximum(rough * rough, 1e-4)[..., None]    # (R, C, 1)
    sin_o = np.sqrt(np.maximum(0.0, 1.0 - cos_o * cos_o))[..., None]
    cos_o = cos_o[..., None]

    u = (np.arange(n_quad, dtype=np.float64) + 0.5) / n_quad
    u1, u2 = np.meshgrid(u, u, indexing="ij")
    u1, u2 = u1.ravel(), u2.ravel()                       # (Q,)

    # wo = (sin_o, 0, cos_o); wh = normalize(alpha·wo.xy, wo.z)
    whx, whz = alpha * sin_o, np.broadcast_to(cos_o, alpha.shape).copy()
    n = np.sqrt(whx * whx + whz * whz)
    whx, whz = whx / n, whz / n                           # why = 0
    alpha2 = alpha * alpha
    mix = 0.5 * whz + 0.5                                 # (R, C, 1)

    def lam(z):
        z2 = np.maximum(z * z, 1e-20)
        return (np.sqrt(1.0 + alpha2 * (1.0 - z2) / z2) - 1.0) * 0.5

    # Accumulate the quadrature in chunks: the (R, C, chunk) float64
    # intermediates dominate memory (the unchunked bake peaked ~700 MB)
    f_sum = np.zeros(alpha.shape[:2])
    fw_sum = np.zeros(alpha.shape[:2])
    q_total = u1.size
    for lo in range(0, q_total, 512):
        u1c, u2c = u1[lo:lo + 512], u2[lo:lo + 512]
        # tangent frame: b = normalize(cross(z, wh)) = (0, 1, 0) for
        # why=0, t = cross(wh, b) = (-whz, 0, whx)
        # disk point (sqrt-polar), cap-mix on the y component
        pr = np.sqrt(u1c)
        px = pr * np.cos(2.0 * np.pi * u2c)               # (q,)
        py_raw = pr * np.sin(2.0 * np.pi * u2c)
        h = np.sqrt(np.maximum(0.0, 1.0 - px * px))
        py = h * (1.0 - mix) + py_raw * mix               # (R, C, q)
        pz = np.sqrt(np.maximum(0.0, 1.0 - px * px - py * py))
        # nh = b·px + t·py + wh·pz  (b = +Y)
        nhx = -whz * py + whx * pz
        nhz = whx * py + whz * pz
        # wm = normalize(alpha·nh.xy, max(eps, nh.z)); nh.y = px
        wmx, wmy, wmz = alpha * nhx, alpha * px, np.maximum(1e-6, nhz)
        n = np.sqrt(wmx * wmx + wmy * wmy + wmz * wmz)
        cos_wm = np.clip((sin_o * wmx + cos_o * wmz) / n, 0.0, 1.0)

        sin2_t = (1.0 - cos_wm * cos_wm) / (ior * ior)
        cos_t = np.sqrt(np.maximum(0.0, 1.0 - sin2_t))
        par = (ior * cos_wm - cos_t) / np.maximum(ior * cos_wm + cos_t, 1e-20)
        per = (cos_wm - ior * cos_t) / np.maximum(cos_wm + ior * cos_t, 1e-20)
        f = 0.5 * (par * par + per * per)
        f = np.where(sin2_t >= 1.0, 1.0, f)

        # wi = reflect(-wo, wm); VNDF sample weight ss·cos/pdf = G2/G1,
        # zero when the reflection leaves the hemisphere (bad_coat
        # rejection)
        wmx_n, wmz_n = wmx / n, wmz / n
        wiz = 2.0 * (sin_o * wmx_n + cos_o * wmz_n) * wmz_n - cos_o
        w_vndf = np.where(
            wiz > 0.0,
            (1.0 + lam(cos_o)) / (1.0 + lam(cos_o) + lam(wiz)),
            0.0,
        )
        f_sum += f.sum(axis=-1)
        fw_sum += (f * w_vndf).sum(axis=-1)
    return ((f_sum / q_total).astype(np.float32),
            (fw_sum / q_total).astype(np.float32))


_COAT_TABLES: tuple | None = None


def _coat_tables() -> tuple:
    global _COAT_TABLES
    if _COAT_TABLES is None:
        _COAT_TABLES = _bake_coat_fresnel_avg()
    return _COAT_TABLES


def load_luts(path: str | None = None) -> Luts:
    path = path or LUT_BUNDLE
    if path not in _CACHED:
        arrays = _bundle_arrays(np.load(path))
        _CACHED[path] = Luts(**{
            k: jnp.asarray(v, jnp.float32) for k, v in arrays.items()
        }, F_coat_avg=jnp.asarray(_coat_tables()[0]),
           E_F_coat=jnp.asarray(_coat_tables()[1]))
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
        E_aniso=jnp.ones((1, 128, 128)),
        E_avg_aniso=jnp.ones((128, 1)),
        E_ms_aniso=jnp.ones((1, 32, 32, 32)),
        E_ms_avg_aniso=jnp.ones((1, 32, 32)),
        F_coat_avg=jnp.asarray(_coat_tables()[0]),
        E_F_coat=jnp.asarray(_coat_tables()[1]),
    )


def _bundle_path() -> str | None:
    """Which bundle both the device (get_luts) and host (get_host_luts)
    paths load — they MUST agree or flatten-baked energy rows and direct
    LUT lookups diverge.

    Default: the SELF-BAKED bundle. It is baked against THIS estimator's
    sampling conventions (invalid-flip/off-hemisphere rejections, oriented
    cosines, weight-1 transmitted MIS), which round 3 deliberately changed
    from the reference's; the reference's shipped tables normalize ITS
    estimator and are measurably wrong for ours where the estimators
    diverge (rough-glass furnace -3.2% with the reference's E_trans —
    the tables differ by up to 0.13 there, and up to 0.64 in E_ms).
    Set PLATINUM_TPU_LUTS=ref for the reference-derived bundle
    (bit-comparable compensation values for parity experiments), or to a
    .npz path for a custom bake. An env selection that names a missing
    bundle raises rather than silently serving identity (E=1) tables —
    a silent fallback would lose all energy compensation."""
    env = os.environ.get("PLATINUM_TPU_LUTS", "").strip()
    if env and env != "own":
        path = LUT_BUNDLE_REF if env == "ref" else env
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"PLATINUM_TPU_LUTS={env!r} names a LUT bundle that does "
                f"not exist ({path}); unset it for the default self-baked "
                f"bundle")
        return path
    return LUT_BUNDLE if os.path.exists(LUT_BUNDLE) else None


def get_luts() -> Luts:
    """Default LUT set: see _bundle_path(); identity placeholder when no
    bundle is available."""
    path = _bundle_path()
    return load_luts(path) if path else placeholder_luts()


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


def sample4d(lut: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
             w_: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """lut is (Q, D, H, W) indexed [q, w, v, u]. A singleton leading axis
    degrades bit-exactly to sample3d of its only slice (the legacy-bundle
    fallback relies on this: _axis clamps to f == 0)."""
    qn, d, h, w = lut.shape
    x0, x1, fx = _axis(u, w)
    y0, y1, fy = _axis(v, h)
    z0, z1, fz = _axis(w_, d)
    a0, a1, fa = _axis(q, qn)

    def tri(a):
        def bil(z):
            return (
                (lut[a, z, y0, x0] * (1 - fx) + lut[a, z, y0, x1] * fx) * (1 - fy)
                + (lut[a, z, y1, x0] * (1 - fx) + lut[a, z, y1, x1] * fx) * fy
            )

        return bil(z0) * (1 - fz) + bil(z1) * fz

    return tri(a0) * (1 - fa) + tri(a1) * fa


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


def sample4d_np(lut, u, v, w_, q):
    """Host mirror of sample4d; `q` must be a scalar (the flattener's
    per-material anisotropy) — u/v/w_ may be arrays."""
    lut = np.asarray(lut)
    qn = lut.shape[0]
    a0, a1, fa = _axis_np(q, qn)
    return sample3d_np(lut[a0], u, v, w_) * (1 - fa) + sample3d_np(
        lut[a1], u, v, w_) * fa


_HOST_CACHE: dict = {}


def get_host_luts():
    """Host-side (numpy) LUT bundle for flatten-time baking — avoids
    device→host readbacks of the jnp Luts (expensive on tunneled TPUs).
    Loads the SAME bundle get_luts() prefers (see _bundle_path), so
    flatten-baked energy rows and direct LUT lookups agree; cached per
    bundle path so a PLATINUM_TPU_LUTS change mid-process cannot leave
    the two paths on different bundles."""
    path = _bundle_path()
    if path not in _HOST_CACHE:
        if path:
            arrays = _bundle_arrays(np.load(path))
        else:
            ph = placeholder_luts()
            import jax

            arrays = {k: np.asarray(jax.device_get(getattr(ph, k)))
                      for k in LUT_NAMES}
        _HOST_CACHE[path] = Luts(**arrays, F_coat_avg=_coat_tables()[0],
                                 E_F_coat=_coat_tables()[1])
    return _HOST_CACHE[path]
