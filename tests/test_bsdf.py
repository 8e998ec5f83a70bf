import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from platinum_tpu.models import fresnel, ggx


def test_fresnel_dielectric_known_values():
    # Normal incidence, ior 1.5 → ((1.5-1)/(1.5+1))^2 = 0.04
    f0 = float(fresnel.fresnel_dielectric(jnp.array(1.0), jnp.array(1.5)))
    assert abs(f0 - 0.04) < 1e-4
    # Grazing → 1
    fg = float(fresnel.fresnel_dielectric(jnp.array(0.0), jnp.array(1.5)))
    assert abs(fg - 1.0) < 1e-4
    # Total internal reflection: ior < 1, shallow angle
    ftir = float(fresnel.fresnel_dielectric(jnp.array(0.3), jnp.array(1 / 1.5)))
    assert ftir == 1.0


def test_avg_fresnel_fit_monotonic():
    iors = jnp.linspace(1.01, 2.0, 16)
    f = np.asarray(fresnel.avg_dielectric_fresnel_fit(iors))
    assert (np.diff(f) > 0).all()
    assert 0.0 < f[0] < f[-1] < 0.3


def test_ggx_ndf_normalization():
    """∫ D(wm) cos(θ) dwm = 1 over the hemisphere."""
    for rough in (0.3, 0.6, 1.0):
        alpha = ggx.alpha_from_roughness(jnp.array([rough]))
        nt, np_ = 512, 256
        th = (np.arange(nt) + 0.5) / nt * np.pi / 2
        ph = (np.arange(np_) + 0.5) / np_ * 2 * np.pi
        TH, PH = np.meshgrid(th, ph, indexing="ij")
        wm = np.stack(
            [np.sin(TH) * np.cos(PH), np.sin(TH) * np.sin(PH), np.cos(TH)], -1
        ).reshape(-1, 3)
        a = jnp.broadcast_to(alpha, (len(wm), 2))
        d = np.asarray(ggx.mdf(a, jnp.asarray(wm)))
        integral = (
            d * wm[:, 2] * np.sin(TH).reshape(-1)
        ).sum() * (np.pi / 2 / nt) * (2 * np.pi / np_)
        assert abs(integral - 1.0) < 2e-2, (rough, integral)


def test_vmdf_estimator_matches_numeric_albedo():
    """MC single-scatter albedo via VNDF sampling == numeric integration."""
    from platinum_tpu.ops.samplers import PCG4DStream

    n = 1 << 15
    rough, cos_o = 0.5, 0.4
    alpha = ggx.alpha_from_roughness(jnp.full((n,), rough))
    wo = jnp.broadcast_to(
        jnp.array([np.sqrt(1 - cos_o**2), 0.0, cos_o]), (n, 3)
    )
    st = PCG4DStream.create(jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32), 0)
    _, u2 = st.next_2d()
    wm = ggx.sample_vmdf(alpha, wo, u2)
    wi = ggx.reflect(-wo, wm)
    bad = (wm[..., 2] <= 0) | (wo[..., 2] * wi[..., 2] < 0)
    f = jnp.where(bad, 0.0, ggx.single_scatter_brdf(alpha, wo, wi, wm))
    pdf = jnp.where(bad, 1.0, ggx.pdf(alpha, wo, wm))
    e_mc = float(jnp.mean(f * jnp.abs(wi[..., 2]) / pdf))

    # numeric reference
    nt, np_ = 256, 256
    th = (np.arange(nt) + 0.5) / nt * np.pi / 2
    ph = (np.arange(np_) + 0.5) / np_ * 2 * np.pi
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    wi_g = np.stack(
        [np.sin(TH) * np.cos(PH), np.sin(TH) * np.sin(PH), np.cos(TH)], -1
    ).reshape(-1, 3)
    wo1 = np.array([np.sqrt(1 - cos_o**2), 0.0, cos_o])
    wm_g = wi_g + wo1
    wm_g /= np.linalg.norm(wm_g, axis=-1, keepdims=True)
    a = jnp.broadcast_to(ggx.alpha_from_roughness(jnp.array(rough)), (len(wi_g), 2))
    fg = np.asarray(
        ggx.single_scatter_brdf(
            a, jnp.asarray(np.tile(wo1, (len(wi_g), 1))),
            jnp.asarray(wi_g), jnp.asarray(wm_g),
        )
    )
    e_num = (fg * wi_g[:, 2] * np.sin(TH).reshape(-1)).sum() * (
        np.pi / 2 / nt
    ) * (2 * np.pi / np_)
    assert abs(e_mc - e_num) < 0.02, (e_mc, e_num)


def test_refract_snell():
    i = jnp.array([[0.0, 0.0, -1.0]])  # straight down onto +z normal
    n = jnp.array([[0.0, 0.0, 1.0]])
    t = np.asarray(ggx.refract(i, n, jnp.array([1 / 1.5])))
    assert np.allclose(t, [[0, 0, -1]], atol=1e-6)
    # 45 degrees: sin_t = sin(45)/1.5
    s = np.sin(np.deg2rad(45))
    i2 = jnp.array([[s, 0.0, -s]])
    t2 = np.asarray(ggx.refract(i2, n, jnp.array([1 / 1.5])))
    assert abs(t2[0, 0] - s / 1.5) < 1e-6
    # TIR from inside
    i3 = jnp.array([[0.9, 0.0, -np.sqrt(1 - 0.81)]])
    t3 = np.asarray(ggx.refract(i3, n, jnp.array([1.5])))
    assert np.allclose(t3, 0.0)


@pytest.fixture(scope="module")
def luts_available():
    from platinum_tpu.ops.luts import LUT_BUNDLE

    if not os.path.exists(LUT_BUNDLE):
        pytest.skip("LUT bundle not baked yet")


def _furnace(env=0.5, spp=24, bounces=32, **mat):
    from platinum_tpu.app.scenes import make_furnace_scene
    from platinum_tpu.render import integrator
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_furnace_scene(env_value=env, **mat)
    settings = RenderSettings(width=24, height=24, spp=spp, max_bounces=bounces,
                              sampler="pcg4d")
    flat = flatten_scene(scene, cam, settings)
    return np.asarray(integrator.render(flat, settings))


def test_furnace_metallic_rough(luts_available):
    img = _furnace(albedo=1.0, metallic=1.0, roughness=0.5)
    assert not np.isnan(img).any()
    assert abs(img.mean() - 0.5) < 0.015, img.mean()


def test_furnace_metallic_mirror(luts_available):
    img = _furnace(albedo=1.0, metallic=1.0, roughness=0.0)
    # Perfect mirror: exact 0.5 except silhouette rays that exceed
    # max_bounces (grazing reflections marching along the sphere) — each
    # truncated path removes 0.5/spp from one pixel.
    assert abs(img.mean() - 0.5) < 0.005
    assert np.abs(img - 0.5).max() < 0.5 / 24 + 1e-3


def test_furnace_opaque_dielectric(luts_available):
    img = _furnace(albedo=1.0, metallic=0.0, roughness=0.3)
    assert abs(img.mean() - 0.5) < 0.02, img.mean()


def test_furnace_glass(luts_available):
    img = _furnace(albedo=1.0, transmission=1.0, roughness=0.2, ior=1.5,
                   spp=32, bounces=48)
    assert not np.isnan(img).any()
    # transmitted BSDF segments take MIS weight 1 (NEE has zero yield on
    # them) — with that fix the glass furnace closes to ~1e-3
    assert abs(img.mean() - 0.5) < 0.01, img.mean()


def test_furnace_clearcoat(luts_available):
    img = _furnace(albedo=1.0, roughness=0.4, clearcoat=1.0)
    assert not np.isnan(img).any()
    # evaluate() dims the base by the TRUE marginal coat-selection
    # probability c·F̄(wo) (the reference reads an UNINITIALIZED fresnel
    # for smooth coats, bsdf.metal:487-488/:220, and uses F at the wrong
    # wm for rough ones) and the coat lobe is compensated by F̄/E_F, so
    # the layered furnace is energy-exact: measured -6e-4 (smooth coat),
    # within 1.1e-3 for coat roughness ≤ 0.6. See tools/furnace_sweep.py.
    assert abs(img.mean() - 0.5) < 0.004, img.mean()


def test_furnace_metal_blend_mixture_pdf(luts_available):
    """metallic=0.5: metal, dielectric-specular and diffuse lobes all share
    the reflection hemisphere, so the MIS partition of unity depends on
    sample() reporting the full mixture pdf across TOP-LEVEL lobes too
    (settings.mixture_pdf default). Measured: -5.8e-3 deficit with the
    reference's partial-pdf estimator, -0.7e-3 with the mixture."""
    from platinum_tpu.render.types import RenderSettings
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.app.scenes import make_furnace_scene
    from platinum_tpu.render import integrator

    from platinum_tpu.render.flatten import analyze_features

    scene, cam = make_furnace_scene(albedo=1.0, roughness=0.7, metallic=0.5,
                                    env_value=0.5)
    settings = RenderSettings(width=32, height=32, spp=48, max_bounces=16,
                              kernel="mis", sampler="pcg4d")
    flat = flatten_scene(scene, cam, settings)
    # production feature set (Renderer uses analyze_features): untextured
    # roughness takes the exact per-material energy-row path; the
    # tex_rough 3-D trilinear LUT path costs a further ~3e-3 (the
    # reference always pays it — it has no row fast path)
    img = np.asarray(integrator.render(flat, settings,
                                       features=analyze_features(flat)))
    assert abs(img.mean() - 0.5) < 2.5e-3, img.mean()


def test_furnace_transmission_blend(luts_available):
    """transmission=0.5: paths repeatedly interact with the INSIDE of the
    sphere, so the opaque lobe's energy terms must be evaluated at |cos|
    (the reference feeds signed cosines into clamp-to-edge LUTs and loses
    16-22% per interior bounce; measured -6.2% on this furnace before the
    fix, -0.8% after)."""
    img = _furnace(albedo=1.0, roughness=0.4, transmission=0.5, ior=1.5,
                   spp=48, bounces=24)
    assert not np.isnan(img).any()
    assert abs(img.mean() - 0.5) < 0.015, img.mean()


def test_furnace_thin_glass(luts_available):
    """Thin-walled glass compensates with the Fresnel-free GGX albedo
    1/E(wo) (the reflect and flipped-transmit halves share ONE microfacet
    lobe), not the thick-interface refraction tables. With invalid flips
    rejected in the transmit branch (bsdf.py sample(), see comment there)
    the lobe's Fresnel-free albedo is exactly the E LUT and the furnace is
    energy-exact: measured -1.5e-4 (r 0.4), -1.1e-4 (r 0.2), -4.3e-4
    (r 0.8) at 96 spp (this test renders 48 spp — ~sqrt(2)x the noise —
    hence the 4e-3 band). Was +1.1% before the rejection, -5.3% before
    the 1/E compensation + transmitted-MIS weight fixes."""
    img = _furnace(albedo=1.0, transmission=1.0, roughness=0.4, ior=1.5,
                   thin=True, spp=48, bounces=24)
    assert not np.isnan(img).any()
    assert abs(img.mean() - 0.5) < 0.004, img.mean()


@pytest.fixture(scope="module")
def aniso_luts_available(luts_available):
    from platinum_tpu.ops.luts import get_host_luts

    if get_host_luts().E_aniso.shape[0] == 1:
        pytest.skip("LUT bundle lacks the anisotropic energy tables")


def test_furnace_aniso_metal(aniso_luts_available):
    """Anisotropic conductor energy compensation via the net-new
    E_aniso/E_avg_aniso tables (the reference's LUT set is isotropic-only
    and its multiscatter looks E up at the scalar roughness — the
    geometric-mean alpha — which OVERestimates E under anisotropy, so
    (1-E) under-fills: measured -1.8% on this furnace before the fix)."""
    img = _furnace(albedo=1.0, metallic=1.0, roughness=0.4, anisotropy=0.9,
                   spp=48)
    assert not np.isnan(img).any()
    assert abs(img.mean() - 0.5) < 0.005, img.mean()


def test_aniso_energy_table_matches_mc(aniso_luts_available):
    """E_aniso texels must equal the azimuth-averaged directional albedo
    of the REAL anisotropic sampler (ggx.sample_vmdf + single_scatter_brdf)
    — a divergence would silently re-open the aniso energy gap."""
    from platinum_tpu.ops.luts import get_host_luts, sample3d_np

    lut = get_host_luts().E_aniso
    rng = np.random.default_rng(11)
    n = 200_000
    for mu, rough, aniso in [(0.7, 0.5, 0.9), (0.3, 0.3, 0.9),
                             (0.5, 0.7, 0.5)]:
        # grid-aligned texel centers avoid interpolation error
        def snap(v):
            return (np.floor(v * 32) + 0.5) / 32
        mu_s, rough_s, aniso_s = snap(mu), snap(rough), snap(aniso)
        alpha = ggx.alpha_from_roughness(jnp.float32(rough_s),
                                         jnp.float32(aniso_s))
        phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        s = np.sqrt(1 - mu_s * mu_s)
        wo = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi),
                                   np.full(n, mu_s)], -1, dtype=np.float32))
        u2 = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
        a = jnp.broadcast_to(alpha, (n, 2))
        wm = ggx.sample_vmdf(a, wo, u2)
        wi = ggx.reflect(-wo, wm)
        bad = (wm[..., 2] <= 0) | (wo[..., 2] * wi[..., 2] < 0)
        f = jnp.where(bad, 0.0, ggx.single_scatter_brdf(a, wo, wi, wm))
        pdf = jnp.where(bad, 1.0, ggx.pdf(a, wo, wm))
        e_mc = float(jnp.mean(f * jnp.abs(wi[..., 2]) / pdf))
        e_tab = float(sample3d_np(lut, mu_s, rough_s, aniso_s))
        assert abs(e_mc - e_tab) < 0.01, (mu, rough, aniso, e_mc, e_tab)


@pytest.fixture(scope="module")
def aniso_ms_luts_available(luts_available):
    from platinum_tpu.ops.luts import get_host_luts

    if get_host_luts().E_ms_aniso.shape[0] == 1:
        pytest.skip("LUT bundle lacks the anisotropic E_ms tables")


def test_furnace_aniso_dielectric(aniso_ms_luts_available):
    """Anisotropic OPAQUE DIELECTRIC energy: the diffuse (1−E_ms) terms
    must see the anisotropy-corrected dielectric-specular albedo (the
    4-D E_ms_aniso table). With the isotropic E_ms this furnace read
    −3.1e-3 (the geometric-mean-alpha lookup over-estimates E_ms, so
    the diffuse compensation under-fills); with the aniso table it
    closes to −1.1e-3 at 768 spp (the remainder is the azimuth-
    averaging correlation gap: the product of azimuth-averaged
    (1−E_ms) factors ≠ the average of the products — closing it needs
    a 5-D table; tools/furnace_sweep.py)."""
    img = _furnace(albedo=1.0, metallic=0.0, roughness=0.6, anisotropy=0.9,
                   spp=96)
    assert not np.isnan(img).any()
    assert abs(img.mean() - 0.5) < 0.003, img.mean()


def test_aniso_ms_table_matches_mc(aniso_ms_luts_available):
    """E_ms_aniso texels must equal the azimuth-averaged directional
    albedo of the REAL anisotropic Fresnel-weighted dielectric lobe
    (single-scatter GGX + Kulla-Conty ms with the aniso energy tables) —
    the integrand models/bsdf's dielectric specular evaluates under
    anisotropy. A divergence would silently re-open the aniso E_ms gap."""
    from platinum_tpu.models import fresnel as fr
    from platinum_tpu.ops.luts import (get_host_luts, sample2d_np,
                                       sample3d_np, sample4d_np)

    luts = get_host_luts()
    rng = np.random.default_rng(13)
    n = 200_000
    for mu, rough, aniso, ior in [(0.7, 0.6, 0.9, 1.5),
                                  (0.4, 0.3, 0.6, 1.5)]:
        def snap(v, bins=32):
            return (np.floor(v * bins) + 0.5) / bins
        asize = luts.E_ms_aniso.shape[0]
        mu_s, rough_s = snap(mu), snap(rough)
        aniso_s = snap(aniso, asize)
        iorp_s = snap((ior - 1.0) / ior)
        ior_s = 1.0 / (1.0 - iorp_s)
        alpha = ggx.alpha_from_roughness(jnp.float32(rough_s),
                                         jnp.float32(aniso_s))
        phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        s = np.sqrt(1 - mu_s * mu_s)
        wo = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi),
                                   np.full(n, mu_s)], -1, dtype=np.float32))
        u2 = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
        a = jnp.broadcast_to(alpha, (n, 2))
        wm = ggx.sample_vmdf(a, wo, u2)
        wi = ggx.reflect(-wo, wm)
        bad = np.asarray(wo[..., 2] * wi[..., 2] < 0)
        brdf_ss = np.asarray(ggx.single_scatter_brdf(a, wo, wi, wm))
        f_ss = np.asarray(fr.fresnel_dielectric(
            jnp.abs(jnp.sum(wo * wm, axis=-1)), jnp.float32(ior_s)))
        e_wo = sample3d_np(luts.E_aniso, mu_s, rough_s, aniso_s)
        e_wi = sample3d_np(luts.E_aniso, np.abs(np.asarray(wi[..., 2])),
                           rough_s, aniso_s)
        e_avg = sample2d_np(luts.E_avg_aniso, aniso_s, rough_s)
        f_avg = float(fr.avg_dielectric_fresnel_fit(jnp.float32(ior_s)))
        brdf_ms = (1 - e_wo) * (1 - e_wi) / (np.pi * max(1 - e_avg, 1e-5))
        fresnel_ms = f_avg * f_avg * e_avg / max(1 - f_avg * (1 - e_avg),
                                                 1e-5)
        f = np.where(bad, 0.0, f_ss * brdf_ss + fresnel_ms * brdf_ms)
        pdf = np.where(bad, 1.0, np.asarray(ggx.pdf(a, wo, wm)))
        e_mc = float(np.mean(f * np.abs(np.asarray(wi[..., 2])) / pdf))
        e_tab = float(sample4d_np(luts.E_ms_aniso, mu_s, rough_s, iorp_s,
                                  aniso_s))
        assert abs(e_mc - e_tab) < 0.01, (mu, rough, aniso, e_mc, e_tab)


def test_lut_bundle_aniso_fallback():
    """Bundles baked before the anisotropic tables existed (incl. the
    reference-derived one — the reference's LUT set is isotropic-only)
    must load with a singleton-axis fallback whose lookups reproduce the
    isotropic tables bit-exactly at EVERY anisotropy."""
    from platinum_tpu.ops.luts import (_bundle_arrays, sample2d_np,
                                       sample3d_np)

    rng = np.random.default_rng(5)
    legacy = {
        "E": rng.uniform(0, 1, (128, 128)).astype(np.float32),
        "E_avg": rng.uniform(0, 1, 128).astype(np.float32),
        "E_ms": rng.uniform(0, 1, (32, 32, 32)).astype(np.float32),
        "E_ms_avg": rng.uniform(0, 1, (32, 32)).astype(np.float32),
    }
    out = _bundle_arrays(legacy)
    assert out["E_aniso"].shape == (1, 128, 128)
    assert out["E_avg_aniso"].shape == (128, 1)
    assert out["E_ms_aniso"].shape == (1, 32, 32, 32)
    assert out["E_ms_avg_aniso"].shape == (1, 32, 32)
    cos = rng.uniform(0, 1, 64)
    rough = rng.uniform(0, 1, 64)
    iorp = rng.uniform(0, 1, 64)
    from platinum_tpu.ops.luts import sample1d_np, sample4d_np

    for an in (0.0, 0.3, 1.0):
        np.testing.assert_array_equal(
            sample3d_np(out["E_aniso"], cos, rough, an),
            sample2d_np(legacy["E"], cos, rough))
        np.testing.assert_array_equal(
            sample2d_np(out["E_avg_aniso"], an, rough),
            sample1d_np(legacy["E_avg"], rough))
        np.testing.assert_array_equal(
            sample4d_np(out["E_ms_aniso"], cos, rough, iorp, an),
            sample3d_np(legacy["E_ms"], cos, rough, iorp))
        np.testing.assert_array_equal(
            sample3d_np(out["E_ms_avg_aniso"], iorp, rough, an),
            sample2d_np(legacy["E_ms_avg"], iorp, rough))


def test_coat_tables_properties_and_warp_match():
    """The load-time-baked clearcoat tables (ops/luts._bake_coat_fresnel_avg)
    must (a) satisfy basic bounds (E_F ≤ F̄, both in (0,1], comp ≥ 1),
    (b) reduce to the plain Fresnel as roughness → 0, and (c) agree with a
    Monte-Carlo estimate over the REAL sampler (ggx.sample_vmdf) — the
    quadrature reimplements the spherical-cap warp in numpy, and any
    divergence between the two warps would silently break the exact
    layered-coat energy accounting."""
    from platinum_tpu.ops import luts as lm

    fbar, ef = lm._coat_tables()
    assert fbar.shape == ef.shape == (32, 32)
    assert (fbar > 0).all() and (fbar <= 1.0).all()
    assert (ef > 0).all() and (ef <= fbar + 1e-6).all()

    # (b) first roughness row (r = 1/64): VNDF is nearly a delta at z,
    # so F̄ ≈ F(cos) away from grazing
    cos = (np.arange(32) + 0.5) / 32
    f_exact = np.asarray(fresnel.fresnel_dielectric(jnp.asarray(cos),
                                                    jnp.asarray(1.5)))
    assert np.abs(fbar[0, 8:] - f_exact[8:]).max() < 2e-3

    # (c) MC cross-check on interior cells via the real sampler
    rng = np.random.default_rng(7)
    n = 20000
    for r_cell, c_cell in ((10, 16), (24, 8), (28, 26)):
        rough = (r_cell + 0.5) / 32
        cos_o = (c_cell + 0.5) / 32
        alpha = jnp.full((n, 2), max(rough * rough, 1e-4))
        wo = jnp.broadcast_to(jnp.asarray(
            [np.sqrt(1 - cos_o**2), 0.0, cos_o], jnp.float32), (n, 3))
        u = jnp.asarray(rng.random((n, 2)), jnp.float32)
        wm = ggx.sample_vmdf(alpha, wo, u)
        f = np.asarray(fresnel.fresnel_dielectric(
            jnp.abs(jnp.sum(wo * wm, axis=-1)), jnp.asarray(1.5)))
        wi = np.asarray(ggx.reflect(-wo, wm))
        w = np.where(wi[:, 2] > 0.0,
                     np.asarray(ggx.g(alpha, wo, jnp.asarray(wi)))
                     / np.asarray(ggx.g1(alpha, wo)), 0.0)
        se_f = f.std() / np.sqrt(n)
        se_fw = (f * w).std() / np.sqrt(n)
        assert abs(f.mean() - fbar[r_cell, c_cell]) < 5 * se_f + 2e-3, (
            r_cell, c_cell, f.mean(), fbar[r_cell, c_cell])
        assert abs((f * w).mean() - ef[r_cell, c_cell]) < 5 * se_fw + 2e-3, (
            r_cell, c_cell, (f * w).mean(), ef[r_cell, c_cell])
