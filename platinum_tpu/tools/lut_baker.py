"""GGX energy LUT baker (JAX Monte Carlo).

TPU-native rework of the reference's MultiscatterLutGenerator tool
(ms_lut_gen.{cpp,metal}): tabulates the 8 Kulla-Conty/Turquin energy LUTs by
VNDF importance sampling, vectorized over all texels at once instead of
65,536 ping-pong GPU passes. Integrands match ms_lut_gen.metal:225-336:

  E            mean[ f_ss · |wi.z| / pdf ]            (pure GGX, no Fresnel)
  E_avg        mean[ 2 · f_ss · |wi.z| · μo / pdf ],  μo ~ U(0,1)
  E_ms         mean over Fresnel-weighted (single + Kulla-Conty ms) dielectric
  E_trans_in/out  full transparent dielectric with Fresnel-split refl/refr
                  (η = 1/(1−p) entering, η = 1−p exiting)

Writes a bundled .npz (runtime) and optional EXR slices (tool parity).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.models import fresnel, ggx
from platinum_tpu.ops.luts import (LUT_BUNDLE, RESOURCE_DIR, sample1d,
                                   sample2d, sample3d)
from platinum_tpu.ops.samplers import PCG4DStream


def _wo_from_cos(cos_theta):
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [sin_theta, jnp.zeros_like(cos_theta), cos_theta], axis=-1
    )


def _sample_single_scatter(alpha, wo, u2):
    """f, wi, pdf of the pure GGX BRDF (ms_lut_gen.metal:231-246)."""
    wm = ggx.sample_vmdf(alpha, wo, u2)
    wi = ggx.reflect(-wo, wm)
    bad = (wm[..., 2] <= 0.0) | (wo[..., 2] * wi[..., 2] < 0.0)
    f = jnp.where(bad, 0.0, ggx.single_scatter_brdf(alpha, wo, wi, wm))
    pdf = jnp.where(bad, 1.0, ggx.pdf(alpha, wo, wm))
    return f, wi, pdf


def _sample_ms_dielectric(alpha, rough, ior, wo, u2, lut_e, lut_eavg):
    """Fresnel-weighted single + Kulla-Conty multiscatter dielectric
    (ms_lut_gen.metal:251-281)."""
    wm = ggx.sample_vmdf(alpha, wo, u2)
    wi = ggx.reflect(-wo, wm)
    bad = wo[..., 2] * wi[..., 2] < 0.0

    brdf_ss = ggx.single_scatter_brdf(alpha, wo, wi, wm)
    f_ss = fresnel.fresnel_dielectric(
        jnp.abs(jnp.sum(wo * wm, axis=-1)), ior
    )
    e_wo = sample2d(lut_e, wo[..., 2], rough)
    e_wi = sample2d(lut_e, wi[..., 2], rough)
    e_avg = sample1d(lut_eavg, rough)
    f_avg = fresnel.avg_dielectric_fresnel_fit(ior)
    brdf_ms = (1.0 - e_wo) * (1.0 - e_wi) / (np.pi * jnp.maximum(1.0 - e_avg, 1e-5))
    fresnel_ms = f_avg * f_avg * e_avg / jnp.maximum(1.0 - f_avg * (1.0 - e_avg), 1e-5)

    f = jnp.where(bad, 0.0, f_ss * brdf_ss + fresnel_ms * brdf_ms)
    pdf = jnp.where(bad, 1.0, ggx.pdf(alpha, wo, wm))
    return f, wi, pdf


def _sample_transparent(alpha, ior, wo, u3):
    """Transparent dielectric with Fresnel-split reflect/refract
    (ms_lut_gen.metal:285-331)."""
    wm = ggx.sample_vmdf(alpha, wo, u3[..., :2])
    f_ss = fresnel.fresnel_dielectric(jnp.abs(jnp.sum(wo * wm, axis=-1)), ior)
    reflecting = u3[..., 2] < f_ss

    wi_r = ggx.reflect(-wo, wm)
    wm_signed = wm * jnp.where(jnp.sum(wo * wm, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    wi_t = ggx.refract(-wo, wm_signed, 1.0 / ior)
    wi = jnp.where(reflecting[..., None], wi_r, wi_t)

    same_side = wo[..., 2] * wi[..., 2] > 0.0
    bad = jnp.where(reflecting, ~same_side, same_side)

    # reflection branch
    f_refl = ggx.single_scatter_brdf(alpha, wo, wi, wm)
    pdf_refl = ggx.pdf(alpha, wo, wm)
    # refraction branch
    dot_i = jnp.sum(wi * wm, axis=-1)
    dot_o = jnp.sum(wo * wm, axis=-1)
    denom = (dot_i * ior + dot_o) ** 2
    dwm_dwi = jnp.abs(dot_i) / jnp.maximum(denom, 1e-20)
    f_refr = (
        ggx.mdf(alpha, wm) * ggx.g(alpha, wo, wi)
        * jnp.abs(dot_i * dot_o / (wi[..., 2] * wo[..., 2] * jnp.maximum(denom, 1e-20)))
    )
    pdf_refr = ggx.vmdf(alpha, wo, wm) * dwm_dwi

    k = jnp.where(reflecting, f_ss, 1.0 - f_ss)
    f = k * jnp.where(reflecting, f_refl, f_refr)
    pdf = k * jnp.where(reflecting, pdf_refl, pdf_refr)
    f = jnp.where(bad, 0.0, f)
    pdf = jnp.where(bad, 1.0, pdf)
    return f, wi, pdf


def _mc(texel_fn, shape, spp, samples_per_call=None, seed_base=0):
    """Accumulate texel_fn(stream) over spp samples. Samples are vectorized,
    not looped: each jit call evaluates a (samples_per_call, n_texels) batch
    of streams at once (texel parameter arrays broadcast against the leading
    sample axis), which is the TPU-friendly shape. Batch size defaults to
    ~4M lanes/call — dispatch overhead dominates below that."""
    n = int(np.prod(shape))
    if samples_per_call is None:
        samples_per_call = max(64, int(2 ** np.floor(np.log2(4e6 / n))))
    k = min(samples_per_call, spp)
    lin = np.arange(n, dtype=np.uint32)
    px = jnp.asarray(np.broadcast_to(lin & 0xFFFF, (k, n)))
    py = jnp.asarray(np.broadcast_to(lin >> 16, (k, n)))

    @jax.jit
    def run_batch(sample0):
        s = sample0 + jnp.arange(k, dtype=jnp.uint32)[:, None]
        stream = PCG4DStream.create(px, py, jnp.broadcast_to(s, (k, n)))
        return jnp.sum(texel_fn(stream), axis=0)

    assert spp % k == 0, (spp, k)
    acc = np.zeros(n, np.float64)
    for s0 in range(0, spp, k):
        acc += np.asarray(run_batch(jnp.uint32(s0 + seed_base)), np.float64)
    return (acc / spp).reshape(shape).astype(np.float32)


def bake_E(size=128, spp=4096):
    ys, xs = np.indices((size, size)).astype(np.float32)
    rough = jnp.asarray(((ys + 0.5) / size).reshape(-1))
    cos_t = jnp.asarray(((xs + 0.5) / size).reshape(-1))
    alpha = ggx.alpha_from_roughness(rough)
    wo = _wo_from_cos(cos_t)

    def texel(stream):
        _, u2 = stream.next_2d()
        f, wi, pdf = _sample_single_scatter(alpha, wo, u2)
        v = f * jnp.abs(wi[..., 2]) / pdf
        # corner-texel fudge kept for parity (ms_lut_gen.metal:375-377)
        corner = (rough < 2.0 / 32.0) & (cos_t < 1.0 / 32.0)
        return jnp.where(corner, v * 0.961, v)

    return _mc(texel, (size, size), spp)


def bake_E_avg(size=128, spp=16384):
    rough = jnp.asarray((np.arange(size, dtype=np.float32) + 0.5) / size)
    alpha = ggx.alpha_from_roughness(rough)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, u1 = stream.next_1d()
        wo = _wo_from_cos(u1)
        f, wi, pdf = _sample_single_scatter(alpha, wo, u2)
        return 2.0 * f * jnp.abs(wi[..., 2]) * wo[..., 2] / pdf

    return _mc(texel, (size,), spp)


def bake_E_aniso(size=32, spp=8192):
    """Azimuth-averaged directional albedo of ANISOTROPIC GGX:
    E̅(aniso, rough, cosθ), z = anisotropy (alpha stretched by
    aspect = sqrt(1 − 0.9·aniso), ggx.alpha_from_roughness).

    Net-new vs the reference (its LUT set is isotropic-only and its
    conductor multiscatter ignores anisotropy — measured −1.8% on an
    aniso=0.9 metal furnace). The true albedo is nearly azimuth-flat
    (MC: ±0.001 for μ ≥ 0.3 at aniso 0.9; ~±0.09 only at grazing), so
    a φ-averaged 3-D table captures it; by x/y-swap symmetry E̅ depends
    on |aniso| only. No corner fudge (that was reference parity for E)."""
    zz, yy, xx = np.indices((size, size, size)).astype(np.float32)
    aniso = jnp.asarray(((zz + 0.5) / size).reshape(-1))
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    cos_t = jnp.asarray(((xx + 0.5) / size).reshape(-1))
    alpha = ggx.alpha_from_roughness(rough, aniso)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, uphi = stream.next_1d()
        phi = 2.0 * np.pi * uphi
        wo = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                        jnp.broadcast_to(cos_t, phi.shape)], axis=-1)
        f, wi, pdf = _sample_single_scatter(alpha, wo, u2)
        return f * jnp.abs(wi[..., 2]) / pdf

    return _mc(texel, (size, size, size), spp)


def _sample_ms_dielectric_aniso(alpha, rough, aniso, ior, wo, u2,
                                lut_e_aniso, lut_eavg_aniso):
    """ANISOTROPIC variant of _sample_ms_dielectric: the GGX lobe uses the
    stretched alpha and the Kulla-Conty ms term's energy lookups come from
    the azimuth-averaged aniso tables — exactly the terms the runtime's
    dielectric specular evaluates under anisotropy (models/bsdf
    _conductor_multiscatter with _sample_E), so this integrand IS the
    directional albedo the diffuse (1−E_ms) compensation must see."""
    wm = ggx.sample_vmdf(alpha, wo, u2)
    wi = ggx.reflect(-wo, wm)
    bad = wo[..., 2] * wi[..., 2] < 0.0

    brdf_ss = ggx.single_scatter_brdf(alpha, wo, wi, wm)
    f_ss = fresnel.fresnel_dielectric(
        jnp.abs(jnp.sum(wo * wm, axis=-1)), ior
    )
    e_wo = sample3d(lut_e_aniso, wo[..., 2], rough, aniso)
    e_wi = sample3d(lut_e_aniso, jnp.abs(wi[..., 2]), rough, aniso)
    e_avg = sample2d(lut_eavg_aniso, aniso, rough)
    f_avg = fresnel.avg_dielectric_fresnel_fit(ior)
    brdf_ms = (1.0 - e_wo) * (1.0 - e_wi) / (np.pi * jnp.maximum(1.0 - e_avg, 1e-5))
    fresnel_ms = f_avg * f_avg * e_avg / jnp.maximum(1.0 - f_avg * (1.0 - e_avg), 1e-5)

    f = jnp.where(bad, 0.0, f_ss * brdf_ss + fresnel_ms * brdf_ms)
    pdf = jnp.where(bad, 1.0, ggx.pdf(alpha, wo, wm))
    return f, wi, pdf


def bake_E_ms_aniso(lut_e_aniso, lut_eavg_aniso, size=32, asize=8,
                    spp=2048):
    """Azimuth-averaged ANISOTROPIC Fresnel-weighted multiscatter
    dielectric albedo E_ms(|aniso|, iorParam, rough, cosθ) — the aniso
    axis the isotropic E_ms lacks (measured −3.1e-3 on an aniso=0.9
    r=0.6 dielectric furnace). 8 aniso bins: the correction is ≤0.3%
    and smooth in |aniso|; by x/y-swap symmetry |aniso| suffices."""
    qq, zz, yy, xx = np.indices((asize, size, size, size)).astype(np.float32)
    aniso = jnp.asarray(((qq + 0.5) / asize).reshape(-1))
    iorp = ((zz + 0.5) / size).reshape(-1)
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    cos_t = jnp.asarray(((xx + 0.5) / size).reshape(-1))
    ior = jnp.asarray(1.0 / (1.0 - iorp))
    alpha = ggx.alpha_from_roughness(rough, aniso)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    lut_e_aniso = jnp.asarray(lut_e_aniso)
    lut_eavg_aniso = jnp.asarray(lut_eavg_aniso)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, uphi = stream.next_1d()
        phi = 2.0 * np.pi * uphi
        wo = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                        jnp.broadcast_to(cos_t, phi.shape)], axis=-1)
        f, wi, pdf = _sample_ms_dielectric_aniso(
            alpha, rough, aniso, ior, wo, u2, lut_e_aniso, lut_eavg_aniso)
        return f * jnp.abs(wi[..., 2]) / pdf

    # cap the per-call batch: the default targets ~4M lanes but the
    # leading texel count here is already 0.5M, so k would be forced to
    # the 64 floor (33M lanes/call — VMEM-hostile)
    return _mc(texel, (asize, size, size, size), spp, samples_per_call=8)


def bake_E_ms_avg_aniso(lut_e_aniso, lut_eavg_aniso, size=32, asize=8,
                        spp=16384):
    """Cosine-weighted hemispherical average of bake_E_ms_aniso:
    E_ms_avg(|aniso|, rough, iorParam)."""
    qq, yy, xx = np.indices((asize, size, size)).astype(np.float32)
    aniso = jnp.asarray(((qq + 0.5) / asize).reshape(-1))
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    iorp = ((xx + 0.5) / size).reshape(-1)
    ior = jnp.asarray(1.0 / (1.0 - iorp))
    alpha = ggx.alpha_from_roughness(rough, aniso)
    lut_e_aniso = jnp.asarray(lut_e_aniso)
    lut_eavg_aniso = jnp.asarray(lut_eavg_aniso)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, u1 = stream.next_1d()
        stream, uphi = stream.next_1d()
        phi = 2.0 * np.pi * uphi
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1 * u1))
        wo = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), u1],
                       axis=-1)
        f, wi, pdf = _sample_ms_dielectric_aniso(
            alpha, rough, aniso, ior, wo, u2, lut_e_aniso, lut_eavg_aniso)
        return 2.0 * f * jnp.abs(wi[..., 2]) * jnp.abs(u1) / pdf

    return _mc(texel, (asize, size, size), spp, samples_per_call=64)


def bake_E_avg_aniso(size=32, spp=32768):
    """Cosine-weighted hemispherical average of bake_E_aniso:
    E̅_avg(rough, aniso) — rows = roughness, cols = anisotropy (matching
    sample2d(lut, aniso, rough))."""
    yy, xx = np.indices((size, size)).astype(np.float32)
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    aniso = jnp.asarray(((xx + 0.5) / size).reshape(-1))
    alpha = ggx.alpha_from_roughness(rough, aniso)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, u1 = stream.next_1d()
        stream, uphi = stream.next_1d()
        phi = 2.0 * np.pi * uphi
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1 * u1))
        wo = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), u1],
                       axis=-1)
        f, wi, pdf = _sample_single_scatter(alpha, wo, u2)
        return 2.0 * f * jnp.abs(wi[..., 2]) * u1 / pdf

    return _mc(texel, (size, size), spp)


def _ior_grid(size, out: bool):
    p = (np.arange(size, dtype=np.float32) + 0.5) / size
    return (1.0 - p) if out else 1.0 / (1.0 - p)


def bake_E_ms(lut_e, lut_eavg, size=32, spp=4096):
    zz, yy, xx = np.indices((size, size, size)).astype(np.float32)
    iorp = ((zz + 0.5) / size).reshape(-1)
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    cos_t = jnp.asarray(((xx + 0.5) / size).reshape(-1))
    ior = jnp.asarray(1.0 / (1.0 - iorp))
    alpha = ggx.alpha_from_roughness(rough)
    wo = _wo_from_cos(cos_t)
    lut_e = jnp.asarray(lut_e)
    lut_eavg = jnp.asarray(lut_eavg)

    def texel(stream):
        _, u2 = stream.next_2d()
        f, wi, pdf = _sample_ms_dielectric(alpha, rough, ior, wo, u2, lut_e, lut_eavg)
        return f * jnp.abs(wi[..., 2]) / pdf

    return _mc(texel, (size, size, size), spp)


def bake_E_ms_avg(lut_e, lut_eavg, size=32, spp=16384):
    yy, xx = np.indices((size, size)).astype(np.float32)
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    iorp = ((xx + 0.5) / size).reshape(-1)
    ior = jnp.asarray(1.0 / (1.0 - iorp))
    alpha = ggx.alpha_from_roughness(rough)
    lut_e = jnp.asarray(lut_e)
    lut_eavg = jnp.asarray(lut_eavg)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, u1 = stream.next_1d()
        wo = _wo_from_cos(u1)
        f, wi, pdf = _sample_ms_dielectric(alpha, rough, ior, wo, u2, lut_e, lut_eavg)
        return 2.0 * f * jnp.abs(wi[..., 2]) * jnp.abs(wo[..., 2]) / pdf

    return _mc(texel, (size, size), spp)


def bake_E_trans(out: bool, size=32, spp=4096):
    zz, yy, xx = np.indices((size, size, size)).astype(np.float32)
    iorp = ((zz + 0.5) / size).reshape(-1)
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    cos_t = jnp.asarray(((xx + 0.5) / size).reshape(-1))
    ior = jnp.asarray((1.0 - iorp) if out else 1.0 / (1.0 - iorp))
    alpha = ggx.alpha_from_roughness(rough)
    wo = _wo_from_cos(cos_t)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, u1 = stream.next_1d()
        u3 = jnp.concatenate([u2, u1[..., None]], axis=-1)
        f, wi, pdf = _sample_transparent(alpha, ior, wo, u3)
        return f * jnp.abs(wi[..., 2]) / pdf

    return _mc(texel, (size, size, size), spp)


def bake_E_trans_avg(out: bool, size=32, spp=16384):
    yy, xx = np.indices((size, size)).astype(np.float32)
    rough = jnp.asarray(((yy + 0.5) / size).reshape(-1))
    iorp = ((xx + 0.5) / size).reshape(-1)
    ior = jnp.asarray((1.0 - iorp) if out else 1.0 / (1.0 - iorp))
    alpha = ggx.alpha_from_roughness(rough)

    def texel(stream):
        stream, u2 = stream.next_2d()
        stream, ua = stream.next_1d()
        stream, ub = stream.next_1d()
        u3 = jnp.concatenate([u2, ua[..., None]], axis=-1)
        wo = _wo_from_cos(ub)
        f, wi, pdf = _sample_transparent(alpha, ior, wo, u3)
        return 2.0 * f * jnp.abs(wi[..., 2]) * jnp.abs(wo[..., 2]) / pdf

    return _mc(texel, (size, size), spp)


def bake_all(spp_2d=4096, spp_avg=16384, spp_3d=2048, verbose=True,
             out_path=None, write_exr_slices=False):
    def log(*a):
        if verbose:
            print(*a, flush=True)

    log("baking E (128x128)...")
    E = bake_E(spp=spp_2d)
    log("baking E_avg (128)...")
    E_avg = bake_E_avg(spp=spp_avg)
    log("baking E_ms (32^3)...")
    E_ms = bake_E_ms(E, E_avg, spp=spp_3d)
    log("baking E_ms_avg (32^2)...")
    E_ms_avg = bake_E_ms_avg(E, E_avg, spp=spp_avg)
    log("baking E_trans_in (32^3)...")
    E_trans_in = bake_E_trans(out=False, spp=spp_3d)
    log("baking E_trans_out (32^3)...")
    E_trans_out = bake_E_trans(out=True, spp=spp_3d)
    log("baking E_trans_in_avg / out_avg (32^2)...")
    E_trans_in_avg = bake_E_trans_avg(out=False, spp=spp_avg)
    E_trans_out_avg = bake_E_trans_avg(out=True, spp=spp_avg)
    log("baking E_aniso (32^3) / E_avg_aniso (32^2)...")
    E_aniso = bake_E_aniso(spp=max(spp_3d, 8192))
    E_avg_aniso = bake_E_avg_aniso(spp=spp_avg * 2)
    log("baking E_ms_aniso (8x32^3) / E_ms_avg_aniso (8x32^2)...")
    E_ms_aniso = bake_E_ms_aniso(E_aniso, E_avg_aniso, spp=spp_3d)
    E_ms_avg_aniso = bake_E_ms_avg_aniso(E_aniso, E_avg_aniso, spp=spp_avg)

    luts = dict(
        E=E, E_avg=E_avg, E_ms=E_ms, E_ms_avg=E_ms_avg,
        E_trans_in=E_trans_in, E_trans_out=E_trans_out,
        E_trans_in_avg=E_trans_in_avg, E_trans_out_avg=E_trans_out_avg,
        E_aniso=E_aniso, E_avg_aniso=E_avg_aniso,
        E_ms_aniso=E_ms_aniso, E_ms_avg_aniso=E_ms_avg_aniso,
    )
    out_path = out_path or LUT_BUNDLE
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **luts)
    log(f"wrote {out_path}")

    if write_exr_slices:
        from platinum_tpu.io.exr import write_exr

        exr_dir = os.path.join(RESOURCE_DIR, "lut")
        os.makedirs(exr_dir, exist_ok=True)
        write_exr(os.path.join(exr_dir, "ggx_E.exr"), E)
        write_exr(os.path.join(exr_dir, "ggx_E_avg.exr"), E_avg[None, :])
        for name, arr in (("ggx_ms_E", E_ms), ("ggx_E_trans_in", E_trans_in),
                          ("ggx_E_trans_out", E_trans_out)):
            for z in range(arr.shape[0]):
                write_exr(os.path.join(exr_dir, f"{name}_{z}.exr"), arr[z])
        write_exr(os.path.join(exr_dir, "ggx_ms_E_avg.exr"), E_ms_avg)
        write_exr(os.path.join(exr_dir, "ggx_E_trans_in_avg.exr"), E_trans_in_avg)
        write_exr(os.path.join(exr_dir, "ggx_E_trans_out_avg.exr"), E_trans_out_avg)
    return luts


if __name__ == "__main__":
    bake_all()
