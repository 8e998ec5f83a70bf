"""Principled BSDF (pure JAX, vectorized over rays).

Parity target: /root/reference/src/renderer_pt/shaders/bsdf.metal — a
principled GGX BSDF (Enterprise-PBR-like) with four lobes blended by material
parameters:

  metallic conductor     GGX + Schlick Fresnel (+ Kulla-Conty multiscatter)
  transparent dielectric GGX reflect/refract, real Fresnel, thin mode,
                         Turquin multiscatter via E_trans LUTs
  opaque dielectric      GGX + energy-compensated diffuse (E/E_ms LUTs)
  clearcoat              GGX at fixed IOR 1.5

All directions are in the local shading frame (+Z = shading normal); wo/wi
conventions match the reference. Every lobe is computed for every lane and
selected by masks (the wavefront material-sort pass later narrows this).

Deviations (documented):
  * emission is returned deterministically via `emitted_radiance` with the
    lobe-selection probability folded in (reference emits stochastically
    from the diffuse sub-lobe, bsdf.metal:675-681 — same expectation);
  * anisotropy rotation is honored (the reference uploads but ignores it).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.models import fresnel, ggx
from platinum_tpu.ops import lookup
from platinum_tpu.ops import luts as luts_mod
from platinum_tpu.ops import samplers as smp
from platinum_tpu.render.types import (
    MAT_ANISOTROPIC,
    MAT_EMISSIVE,
    MAT_THIN,
    MaterialTable,
)

# Sample flag bits (parity with bsdf::SampleFlags)
SAMPLE_REFLECTED = 1
SAMPLE_TRANSMITTED = 2
SAMPLE_DIFFUSE = 4
SAMPLE_GLOSSY = 8
SAMPLE_SPECULAR = 16
SAMPLE_EMITTED = 32

MIN_COS = 1.5e-3
CLEARCOAT_IOR = 1.5


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShadingContext:
    """Per-ray shading parameters after texture lookups (the TPU analogue of
    bsdf::ShadingContext, bsdf.metal:12-43). All fields (R,) or (R, k)."""

    albedo: jnp.ndarray        # (R, 3) working space
    emission: jnp.ndarray      # (R, 3) premultiplied strength, working space
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    transmission: jnp.ndarray
    ior: jnp.ndarray
    anisotropy: jnp.ndarray
    anisotropy_rotation: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_roughness: jnp.ndarray
    flags: jnp.ndarray         # (R,) i32 material flags
    # Per-material energy rows (see MaterialTable.energy); enable the cheap
    # 1D energy path when roughness/metallic are untextured.
    energy: jnp.ndarray | None = None      # (M, K, 4)
    energy_avg: jnp.ndarray | None = None  # (M, 4)
    mat_idx: jnp.ndarray | None = None     # (R,)
    # Extra per-lane rows resolved once at context creation (gather-free):
    base_alpha: jnp.ndarray | None = None  # (R,) base-color alpha
    tex_rows: jnp.ndarray | None = None    # (R, 6) i32 texture slots (-1 none)
    energy_avg_row: jnp.ndarray | None = None  # (R, 4) per-lane energy avgs

    @property
    def alpha(self):
        aniso = jnp.where((self.flags & MAT_ANISOTROPIC) != 0, self.anisotropy, 0.0)
        return ggx.alpha_from_roughness(self.roughness, aniso)

    @property
    def coat_alpha(self):
        return ggx.alpha_from_roughness(self.clearcoat_roughness)

    @property
    def thin(self):
        return (self.flags & MAT_THIN) != 0


def make_shading_context(
    materials: MaterialTable, mat_idx: jnp.ndarray, uv: jnp.ndarray,
    atlas=None, atlas_table=None, slots=None,
) -> ShadingContext:
    """Gather material parameters per ray; apply texture lookups when an
    atlas is present."""
    base_alpha = None
    if materials.packed is not None:
        row = lookup.rows(materials.packed, mat_idx)  # gather-free wide row
        albedo = row[..., 0:3]
        base_alpha = row[..., 3]
        emission = row[..., 4:7]
        roughness = row[..., 7]
        metallic = row[..., 8]
        transmission = row[..., 9]
        ior = row[..., 10]
        anisotropy = row[..., 11]
        anisotropy_rotation = row[..., 12]
        clearcoat = row[..., 13]
        clearcoat_roughness = row[..., 14]
        flags = row[..., 15].astype(jnp.int32)  # value float, see flatten
    else:
        albedo = materials.base_color[mat_idx, :3]
        emission = materials.emission[mat_idx]
        roughness = materials.roughness[mat_idx]
        metallic = materials.metallic[mat_idx]
        transmission = materials.transmission[mat_idx]
        ior = materials.ior[mat_idx]
        anisotropy = materials.anisotropy[mat_idx]
        anisotropy_rotation = materials.anisotropy_rotation[mat_idx]
        clearcoat = materials.clearcoat[mat_idx]
        clearcoat_roughness = materials.clearcoat_roughness[mat_idx]
        flags = materials.flags[mat_idx]

    tex_rows = None
    if atlas is not None and atlas_table is not None:
        from platinum_tpu.ops.texturing import sample_material_textures

        tex_rows = lookup.rows(materials.textures, mat_idx)
        tex = sample_material_textures(atlas, atlas_table, tex_rows, uv,
                                       slots=slots)
        albedo = jnp.where(tex.has_base[:, None], tex.base_rgb, albedo)
        emission = emission * jnp.where(
            tex.has_emission[:, None], tex.emission_rgb, 1.0
        )
        roughness = roughness * jnp.where(tex.has_rm, tex.rough, 1.0)
        metallic = metallic * jnp.where(tex.has_rm, tex.metal, 1.0)
        transmission = jnp.where(tex.has_transmission, tex.transmission, transmission)
        clearcoat = jnp.where(tex.has_clearcoat, tex.clearcoat, clearcoat)

    return ShadingContext(
        albedo=albedo,
        emission=emission,
        roughness=roughness,
        metallic=metallic,
        transmission=transmission,
        ior=ior,
        anisotropy=anisotropy,
        anisotropy_rotation=anisotropy_rotation,
        clearcoat=clearcoat,
        clearcoat_roughness=clearcoat_roughness,
        flags=flags,
        energy=materials.energy,
        energy_avg=materials.energy_avg,
        mat_idx=mat_idx,
        base_alpha=base_alpha,
        tex_rows=tex_rows,
        energy_avg_row=(lookup.rows(materials.energy_avg, mat_idx)
                        if materials.energy_avg is not None else None),
    )


@dataclass(frozen=True)
class BSDFSample:
    wi: jnp.ndarray     # (R, 3) local
    f: jnp.ndarray      # (R, 3)
    pdf: jnp.ndarray    # (R,)
    flags: jnp.ndarray  # (R,) i32


@dataclass(frozen=True)
class BSDFEval:
    f: jnp.ndarray    # (R, 3)
    pdf: jnp.ndarray  # (R,)


# ---------------------------------------------------------------------------
# LUT-based energy terms (bsdf.metal:262-326, defs.metal:349-361)
# ---------------------------------------------------------------------------

def _ior_param(ior):
    return (ior - 1.0) / jnp.maximum(ior, 1e-6)


def _use_rows(ctx, features) -> bool:
    return "tex_rough" not in features and ctx.energy is not None


def _energy_row(ctx, cos):
    """Interpolated (R, 6) [E, E_ms, E_trans_in, E_trans_out, F_coat_avg,
    E_F_coat] at per-lane cos from the per-material rows. Callers orient
    the cosines to the wo-side hemisphere first (see _orient_cosines).
    Gather-free: linear interpolation over the flattened (M*K, 6) table
    as ONE sparse-weight matmul (exact parity with the former two-gather
    formulation; see ops.lookup.interp_rows). Bin counts guarantee
    frac==0 at each material's last bin, so idx+1 never bleeds weight
    into the next material's rows."""
    m, k, w = ctx.energy.shape
    x = jnp.clip(cos * k - 0.5, 0.0, k - 1.0)
    x0 = jnp.floor(x)
    f = x - x0
    lin = ctx.mat_idx * k + x0.astype(jnp.int32)
    return lookup.interp_rows(ctx.energy.reshape(m * k, w), lin, f)


def _orient_cosines(wo_z, wi_z):
    """Flip the (wo, wi) cosine pair into wo's hemisphere: a double-sided
    opaque interaction is symmetric under (wo, wi) -> (-wo, -wi), so the
    energy terms of an INTERIOR bounce (both cosines negative) must be
    looked up at the mirrored angles. The reference feeds signed cosines
    into its clamp-to-edge samplers, silently evaluating every
    inside-the-medium interaction at grazing incidence — measured 16-22%
    energy loss per interior bounce on a transmission-blend furnace
    (-6.2% overall, -0.8% with this fix). Cross-hemisphere pairs (wi
    below wo's horizon) keep their sign and clamp, exactly as before.
    """
    s = jnp.where(wo_z < 0.0, -1.0, 1.0)
    return wo_z * s, wi_z * s


def _aniso_amount(ctx, features):
    """Per-lane |anisotropy| for energy-table lookups (0 when the material
    is not flagged anisotropic; x/y-swap symmetry makes E̅ a function of
    |aniso| only), or None when the scene has no aniso materials."""
    if ctx is None or features is None or "aniso" not in features:
        return None
    return jnp.abs(jnp.where((ctx.flags & MAT_ANISOTROPIC) != 0,
                             ctx.anisotropy, 0.0))


def _sample_E(luts, cos, rough, an):
    """Single-scatter GGX albedo E(cosθ, rough), anisotropy-corrected per
    lane when `an` (|aniso|) is given: both this framework (pre-round-3)
    and the reference look E up at the scalar roughness — the
    geometric-mean alpha — which OVERestimates E under anisotropy so the
    (1−E) multiscatter terms under-fill (measured −1.8% on an aniso=0.9
    metal furnace). The azimuth-averaged E_aniso table closes it; iso
    lanes (an == 0) keep the full-resolution 2-D table exactly."""
    e = luts_mod.sample2d(luts.E, cos, rough)
    if an is None:
        return e
    return jnp.where(an > 0.0,
                     luts_mod.sample3d(luts.E_aniso, cos, rough, an), e)


def _conductor_multiscatter(luts, rough, wo_z, wi_z, f_avg,
                            ctx=None, features=None):
    """Kulla-Conty multiple-scattering lobe; f_avg may be (R,) or (R,3).
    Double-sided (see _orient_cosines). Anisotropy-corrected energy
    tables (see _sample_E); the rows path bakes the correction in at
    flatten time (per-material anisotropy is a constant there)."""
    wo_z, wi_z = _orient_cosines(wo_z, wi_z)
    if ctx is not None and features is not None and _use_rows(ctx, features):
        e_wo = _energy_row(ctx, wo_z)[..., 0]
        e_wi = _energy_row(ctx, wi_z)[..., 0]
        e_avg = ctx.energy_avg_row[..., 0]
    else:
        an = _aniso_amount(ctx, features)
        e_wo = _sample_E(luts, wo_z, rough, an)
        e_wi = _sample_E(luts, wi_z, rough, an)
        e_avg = luts_mod.sample1d(luts.E_avg, rough)
        if an is not None:
            e_avg = jnp.where(
                an > 0.0,
                luts_mod.sample2d(luts.E_avg_aniso, an, rough), e_avg)
    brdf_ms = (1.0 - e_wo) * (1.0 - e_wi) / (np.pi * jnp.maximum(1.0 - e_avg, 1e-5))
    if f_avg.ndim == rough.ndim + 1:
        e_avg = e_avg[..., None]
        brdf_ms = brdf_ms[..., None]
    fresnel_ms = f_avg * f_avg * e_avg / jnp.maximum(1.0 - f_avg * (1.0 - e_avg), 1e-5)
    return fresnel_ms * brdf_ms


def _transparent_multiscatter(luts, rough, wo_z, ior, ctx=None, features=None,
                              thin=None):
    """Turquin 1/E_wo energy compensation for the transparent lobe.

    `thin` (bool mask): thin-walled glass reflects and transmits through
    the SAME microfacet lobe (the transmit side is just the reflect lobe
    flipped), so its single-scatter directional albedo is the Fresnel-free
    GGX albedo E(wo) — compensate with 1/E, not with the refraction
    E_trans tables (which bake thick-interface Snell geometry). The
    reference uses the refraction tables for thin too and ships a "thin
    glass is not energy preserving" TODO (bsdf.metal:427). With invalid
    flips rejected in sample() (see comment there) the 1/E compensation
    is exact: thin furnace measured within 5e-4 across roughness
    (was -5.3% with the reference's tables)."""
    into = ior >= 1.0
    if ctx is not None and features is not None and _use_rows(ctx, features):
        row = _energy_row(ctx, jnp.abs(wo_z))
        e_wo = jnp.where(into, row[..., 2], row[..., 3])
        if thin is not None:
            e_wo = jnp.where(thin, row[..., 0], e_wo)
    else:
        param_in = _ior_param(ior)
        param_out = 1.0 - ior
        e_in = luts_mod.sample3d(luts.E_trans_in, jnp.abs(wo_z), rough, param_in)
        e_out = luts_mod.sample3d(luts.E_trans_out, jnp.abs(wo_z), rough, param_out)
        e_wo = jnp.where(into, e_in, e_out)
        if thin is not None:
            # thin 1/E uses the exact GGX albedo — aniso-corrected like
            # _sample_E (the thick E_trans tables stay isotropic: an
            # aniso axis would make them 4-D; documented limitation)
            e_wo = jnp.where(
                thin,
                _sample_E(luts, jnp.abs(wo_z), rough,
                          _aniso_amount(ctx, features)),
                e_wo)
    return 1.0 / jnp.maximum(e_wo, 1e-3)


def _coat_fbar(luts, ctx, wo_z, features=None, coat_smooth=None):
    """Mean coat Fresnel F̄(wo) — the TRUE marginal coat-selection
    probability per unit clearcoat (exact F(|wo.z|) for smooth coats,
    where the VNDF is a delta at z). Rows path when available (coat
    roughness is untexturable, so per-material rows are always valid)."""
    cos = jnp.abs(wo_z)
    if features is not None and _use_rows(ctx, features):
        fbar = _energy_row(ctx, cos)[..., 4]
    else:
        fbar = luts_mod.sample2d(luts.F_coat_avg, cos, ctx.clearcoat_roughness)
    if coat_smooth is None:
        coat_smooth = ggx.is_smooth(ctx.coat_alpha)
    return jnp.where(
        coat_smooth, fresnel.fresnel_dielectric(cos, CLEARCOAT_IOR), fbar)


def _coat_multiscatter(luts, ctx, wo_z, features=None):
    """Energy compensation for the clearcoat GGX lobe: F̄(wo)/E_F(wo).

    The coat sample's yield is E[F(wm)·(G2/G1)] = E_F(wo) per unit
    clearcoat; F and the VNDF weight G2/G1 are negatively correlated
    (grazing wm: high Fresnel, strong masking), so the Fresnel-free 1/E
    under-compensates at high roughness. Scaling f by F̄/E_F makes the
    sampled coat yield c·F̄(wo) IDENTICALLY — exactly cancelling the
    (1 − c·F̄) base dimming evaluate() applies, so the layered furnace
    is energy-exact. The reference ships the coat uncompensated
    (single-scatter only). Tables baked at load: ops/luts.py; folded
    into the gather-free per-material rows when available."""
    cos = jnp.abs(wo_z)
    if features is not None and _use_rows(ctx, features):
        row = _energy_row(ctx, cos)
        f_avg, e_f = row[..., 4], row[..., 5]
    else:
        f_avg = luts_mod.sample2d(luts.F_coat_avg, cos, ctx.clearcoat_roughness)
        e_f = luts_mod.sample2d(luts.E_F_coat, cos, ctx.clearcoat_roughness)
    return f_avg / jnp.maximum(e_f, 1e-4)


def _diffuse_factor(luts, ctx, wo_z, wi_z, features=None):
    """Energy-conserving diffuse attenuation under a Fresnel-weighted GGX
    (Enterprise PBR; bsdf.metal:291-305). Double-sided (see
    _orient_cosines; the reference passes signed cosines and clamps)."""
    wo_z, wi_z = _orient_cosines(wo_z, wi_z)
    if features is not None and _use_rows(ctx, features):
        e_ms_wo = _energy_row(ctx, wo_z)[..., 1]
        e_ms_wi = _energy_row(ctx, wi_z)[..., 1]
        e_ms_avg = ctx.energy_avg_row[..., 1]
    else:
        p = _ior_param(ctx.ior)
        e_ms_wo = luts_mod.sample3d(luts.E_ms, wo_z, ctx.roughness, p)
        e_ms_wi = luts_mod.sample3d(luts.E_ms, wi_z, ctx.roughness, p)
        e_ms_avg = luts_mod.sample2d(luts.E_ms_avg, p, ctx.roughness)
        an = _aniso_amount(ctx, features)
        if an is not None:
            # aniso-corrected dielectric-specular albedo (same rationale
            # as _sample_E: the isotropic E_ms at the geometric-mean
            # alpha over-estimates E under anisotropy, so the diffuse
            # (1−E_ms) terms under-fill — measured −3.1e-3 at r=0.6,
            # aniso=0.9); iso lanes keep the exact 32³ table
            on = an > 0.0
            e_ms_wo = jnp.where(on, luts_mod.sample4d(
                luts.E_ms_aniso, wo_z, ctx.roughness, p, an), e_ms_wo)
            e_ms_wi = jnp.where(on, luts_mod.sample4d(
                luts.E_ms_aniso, wi_z, ctx.roughness, p, an), e_ms_wi)
            e_ms_avg = jnp.where(on, luts_mod.sample3d(
                luts.E_ms_avg_aniso, p, ctx.roughness, an), e_ms_avg)
    return (1.0 - e_ms_wo) * (1.0 - e_ms_wi) / (
        np.pi * jnp.maximum(1.0 - e_ms_avg, 1e-5)
    )


def _opaque_dielectric_factor(luts, ctx, wo_z, f_avg, features=None):
    """Blending weight of the dielectric GGX vs the diffuse base
    (bsdf.metal:311-326). Double-sided: the blending weight depends only
    on wo's angle to the surface."""
    wo_z = jnp.abs(wo_z)
    if features is not None and _use_rows(ctx, features):
        row = _energy_row(ctx, wo_z)
        e_wo = row[..., 0]
        e_ms_wo = row[..., 1]
    else:
        p = _ior_param(ctx.ior)
        an = _aniso_amount(ctx, features)
        e_wo = _sample_E(luts, wo_z, ctx.roughness, an)
        e_ms_wo = luts_mod.sample3d(luts.E_ms, wo_z, ctx.roughness, p)
        if an is not None:
            # aniso-corrected E_ms (4-D table; see _diffuse_factor)
            e_ms_wo = jnp.where(an > 0.0, luts_mod.sample4d(
                luts.E_ms_aniso, wo_z, ctx.roughness, p, an), e_ms_wo)
    fresnel_ms = f_avg * f_avg * e_wo / jnp.maximum(1.0 - f_avg * (1.0 - e_wo), 1e-5)
    return jnp.clip(f_avg * e_ms_wo + fresnel_ms * (1.0 - e_ms_wo), 0.0, 0.999)


# ---------------------------------------------------------------------------
# Anisotropy rotation helpers
# ---------------------------------------------------------------------------

def _rotate_xy(v, cos_a, sin_a):
    x = v[..., 0] * cos_a - v[..., 1] * sin_a
    y = v[..., 0] * sin_a + v[..., 1] * cos_a
    return jnp.stack([x, y, v[..., 2]], axis=-1)


def _aniso_rotation(ctx):
    rot = jnp.where(
        (ctx.flags & MAT_ANISOTROPIC) != 0, ctx.anisotropy_rotation, 0.0
    ) * (2.0 * np.pi)
    return jnp.cos(rot), jnp.sin(rot)


# ---------------------------------------------------------------------------
# Evaluation (NEE path) — bsdf.metal:199-224 and per-lobe evals
# ---------------------------------------------------------------------------

ALL_FEATURES = frozenset(
    {"metallic", "transparent", "clearcoat", "smooth", "aniso", "thin",
     "tex_rough", "env", "area_lights", "alpha"}
    # every texture slot enabled (flatten.analyze_features prunes these)
    | {f"texslot{k}" for k in range(6)}
)


def scene_features(materials_host) -> frozenset:
    """Static material-feature analysis for lobe pruning: which BSDF lobes /
    paths can occur anywhere in the scene. `materials_host` is a host-side
    view (numpy arrays) of the material table. Roughness/metallic textures
    can only *reduce* values (they multiply factors), so texture presence is
    folded conservatively."""
    import numpy as _np

    m = materials_host
    feats = set()
    has_rm_tex = bool((_np.asarray(m.textures)[:, 1] >= 0).any())
    if has_rm_tex:
        feats.add("tex_rough")
    metallic = _np.asarray(m.metallic)
    rough = _np.asarray(m.roughness)
    if (metallic > 0).any():
        feats.add("metallic")
    if (_np.asarray(m.transmission) > 0).any():
        feats.add("transparent")
    if (_np.asarray(m.clearcoat) > 0).any():
        feats.add("clearcoat")
        if (_np.asarray(m.clearcoat_roughness) ** 2 < 1e-3).any():
            feats.add("smooth")
    if (_np.asarray(m.anisotropy) != 0).any():
        feats.add("aniso")
    if ((rough * rough) < 1e-3).any() or has_rm_tex:
        feats.add("smooth")
    if (_np.asarray(m.flags) & MAT_THIN).any():
        feats.add("thin")
    return frozenset(feats)


def evaluate(ctx: ShadingContext, wo: jnp.ndarray, wi: jnp.ndarray,
             luts=None, multiscatter: bool = True,
             features: frozenset = ALL_FEATURES) -> BSDFEval:
    luts = luts or luts_mod.get_luts()
    shape = wo.shape[:-1]

    # Rotate into the anisotropy frame
    if "aniso" in features:
        cos_a, sin_a = _aniso_rotation(ctx)
        wo = _rotate_xy(wo, cos_a, -sin_a)
        wi = _rotate_xy(wi, cos_a, -sin_a)

    # reflection-hemisphere gate — exact parity with the reference's
    # top-level eval (bsdf.metal:200-201 rejects wo.z/wi.z < 1.5e-3):
    # NEE never evaluates transmitted directions there either; the
    # transmission formulas live only on the post-sampling path
    valid = (wo[..., 2] >= MIN_COS) & (wi[..., 2] >= MIN_COS)
    alpha = ctx.alpha
    smooth = (ggx.is_smooth(alpha) if "smooth" in features
              else jnp.zeros(shape, bool))

    m = ctx.metallic
    transparent = (1.0 - m) * ctx.transmission
    opaque = (1.0 - m) * (1.0 - transparent)

    wm = wo + wi
    wm_len = jnp.linalg.norm(wm, axis=-1, keepdims=True)
    wm = wm / jnp.maximum(wm_len, 1e-20)
    wm = wm * jnp.where(wm[..., 2:3] < 0, -1.0, 1.0)
    wm_ok = wm_len[..., 0] > 1e-10
    dot_wo_wm = jnp.abs(jnp.sum(wo * wm, axis=-1))

    ss = ggx.single_scatter_brdf(alpha, wo, wi, wm)
    ggx_pdf = ggx.pdf(alpha, wo, wm)

    f = jnp.zeros(shape + (3,))
    pdf = jnp.zeros(shape)

    # --- metallic lobe ----------------------------------------------------
    if "metallic" in features:
        f_metal = fresnel.schlick(ctx.albedo, dot_wo_wm) * ss[..., None]
        if multiscatter:
            f_avg_c = fresnel.avg_conductor_fresnel(ctx.albedo)
            f_metal = f_metal + _conductor_multiscatter(
                luts, ctx.roughness, wo[..., 2], wi[..., 2], f_avg_c,
                ctx=ctx, features=features,
            )
        use_metal = (m > 0.0) & ~smooth & wm_ok
        f = f + jnp.where(use_metal[..., None], f_metal * m[..., None], 0.0)
        pdf = pdf + jnp.where(use_metal, ggx_pdf * m, 0.0)

    # --- transparent lobe (reflection side only: wi.z > 0 here) ------------
    if "transparent" in features:
        f_ss_t = fresnel.fresnel_dielectric(jnp.sum(wo * wm, axis=-1), ctx.ior)
        f_trans = jnp.broadcast_to((f_ss_t * ss)[..., None], shape + (3,))
        if multiscatter:
            comp = _transparent_multiscatter(
                luts, ctx.roughness, wo[..., 2], ctx.ior, ctx=ctx,
                features=features,
                thin=(ctx.thin if "thin" in features else None))
            f_trans = f_trans * comp[..., None]
        use_trans = (transparent > 0.0) & ~smooth & wm_ok
        f = f + jnp.where(use_trans[..., None], f_trans * transparent[..., None], 0.0)
        pdf = pdf + jnp.where(use_trans, f_ss_t * ggx_pdf * transparent, 0.0)

    # --- opaque dielectric lobe --------------------------------------------
    f_avg = fresnel.avg_dielectric_fresnel_fit(ctx.ior)
    bf = _opaque_dielectric_factor(luts, ctx, wo[..., 2], f_avg, features)
    c_diffuse = _diffuse_factor(luts, ctx, wo[..., 2], wi[..., 2], features)
    diffuse_pdf = jnp.abs(wi[..., 2]) / np.pi

    f_ss_o = fresnel.fresnel_dielectric(dot_wo_wm, ctx.ior)
    dielectric = f_ss_o * ss
    if multiscatter:
        dielectric = dielectric + _conductor_multiscatter(
            luts, ctx.roughness, wo[..., 2], wi[..., 2], f_avg,
            ctx=ctx, features=features,
        )
    f_opaque_rough = dielectric[..., None] + ctx.albedo * c_diffuse[..., None]
    pdf_opaque_rough = ggx_pdf * bf + diffuse_pdf * (1.0 - bf)
    f_opaque_smooth = ctx.albedo * c_diffuse[..., None]
    pdf_opaque_smooth = diffuse_pdf * (1.0 - bf)

    f_opaque = jnp.where(smooth[..., None], f_opaque_smooth, f_opaque_rough)
    pdf_opaque = jnp.where(smooth, pdf_opaque_smooth, pdf_opaque_rough)
    use_opaque = opaque > 0.0
    f = f + jnp.where(use_opaque[..., None], f_opaque * opaque[..., None], 0.0)
    pdf = pdf + jnp.where(use_opaque, pdf_opaque * opaque, 0.0)

    # --- clearcoat ----------------------------------------------------------
    if "clearcoat" in features:
        coat_alpha = ctx.coat_alpha
        coat_smooth = ggx.is_smooth(coat_alpha)
        coat_ss = ggx.single_scatter_brdf(coat_alpha, wo, wi, wm)
        coat_f_ss = fresnel.fresnel_dielectric(
            jnp.sum(wo * wm, axis=-1), CLEARCOAT_IOR
        )
        coat_pdf = ggx.pdf(coat_alpha, wo, wm)
        # The base-DIMMING weight is the marginal probability sample()
        # picks the coat: c·F̄(wo) with F̄ the mean Fresnel over the coat
        # VNDF (luts.F_coat_avg; the coat's wm draw is independent of the
        # base randoms). The coat CONTRIBUTION keeps F at the
        # deterministic wm(wo,wi) — that term is exact as-is (wm is a
        # function of wi for a reflection lobe). The reference instead
        # (a) dims rough coats with F(wm(wo,wi)) — not the sampling
        # marginal, measured ±0.8% on coat=1 furnaces — and (b) drops
        # the SMOOTH coat's dimming entirely (bsdf.metal:487-488 returns
        # {} WITHOUT setting fresnel_ss, so `coat *= coatFresnel_ss` at
        # :220 reads an uninitialized float): +0.7% MIS-only overshoot
        # (the simple kernel measures exact). A smooth coat's F̄ is
        # F(|wo.z|) (delta VNDF at z), taken exactly rather than from
        # the table edge.
        coat_dim = ctx.clearcoat * _coat_fbar(luts, ctx, wo[..., 2],
                                              features, coat_smooth)
        coat_add = ctx.clearcoat * jnp.where(
            coat_smooth | ~wm_ok, 0.0, coat_f_ss)
        if multiscatter:
            # F̄/E_F compensation on the coat lobe (the reference leaves
            # the coat single-scatter: at coat roughness 0.6 the
            # uncompensated lobe loses ~0.7% on a coat=1 furnace)
            coat_ss = coat_ss * _coat_multiscatter(luts, ctx, wo[..., 2],
                                                   features)
        f = f * (1.0 - coat_dim[..., None]) + jnp.where(
            (coat_add > 0)[..., None], coat_ss[..., None] * coat_add[..., None],
            0.0
        )
        pdf = pdf * (1.0 - coat_dim) + jnp.where(
            coat_add > 0, coat_pdf * coat_add, 0.0)

    f = jnp.where(valid[..., None], f, 0.0)
    pdf = jnp.where(valid, pdf, 0.0)
    return BSDFEval(f=f, pdf=pdf)


# ---------------------------------------------------------------------------
# Sampling — bsdf.metal:228-252 dispatch + per-lobe samplers
# ---------------------------------------------------------------------------

def sample(ctx: ShadingContext, wo: jnp.ndarray, r4: jnp.ndarray, rc: jnp.ndarray,
           luts=None, multiscatter: bool = True,
           features: frozenset = ALL_FEATURES,
           mixture_pdf: bool = True) -> BSDFSample:
    """Importance-sample the BSDF.

    `mixture_pdf` (default on) returns, for non-delta samples, the FULL
    mixture f and pdf at the sampled direction (= what evaluate() reports)
    instead of the picked sub-lobe's partial (f_lobe, pdf_lobe *
    p_pick). The reference returns the partials (bsdf.metal
    sampleOpaqueDielectric:625-685) while its evaluate reports the
    mixture (evalOpaqueDielectric:447-485) — under MIS the two strategies'
    weights then don't sum to 1 on directions reachable by more than one
    sub-lobe, and the white furnace loses ~1% on rough dielectrics (the
    reference inherits this bias; measured here as a 5e-3 deficit on the
    furnace mean). With mixture_pdf the sampled-direction density matches
    the density NEE uses and the furnace closes to LUT accuracy (<2e-3).
    Set False to reproduce the reference's estimator exactly."""
    luts = luts or luts_mod.get_luts()
    shape = wo.shape[:-1]
    wo_in = wo

    has_smooth = "smooth" in features
    has_metal = "metallic" in features
    has_trans = "transparent" in features
    has_coat = "clearcoat" in features

    if "aniso" in features:
        cos_a, sin_a = _aniso_rotation(ctx)
        wo = _rotate_xy(wo, cos_a, -sin_a)

    alpha = ctx.alpha
    smooth = ggx.is_smooth(alpha) if has_smooth else jnp.zeros(shape, bool)
    thin = ctx.thin if "thin" in features else jnp.zeros(shape, bool)

    m = ctx.metallic
    t = ctx.transmission
    c = ctx.clearcoat

    # Lobe-selection probabilities (bsdf.metal:229-252)
    if has_coat:
        coat_alpha = ctx.coat_alpha
        coat_smooth = ggx.is_smooth(coat_alpha)
        wm_coat = jnp.where(
            coat_smooth[..., None],
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wo.shape),
            ggx.sample_vmdf(coat_alpha, wo, rc),
        )
        p_coat = c * fresnel.fresnel_dielectric(
            jnp.abs(jnp.sum(wo * wm_coat, axis=-1)), CLEARCOAT_IOR
        )
        p_coat = jnp.where(c > 0.0, p_coat, 0.0)
    else:
        p_coat = jnp.zeros(shape)
    p_metal = p_coat + (1.0 - p_coat) * m
    p_transparent = p_coat + (1.0 - p_coat) * (m + (1.0 - m) * t)

    rw = r4[..., 3]
    sel_coat = (rw < p_coat) if has_coat else jnp.zeros(shape, bool)
    sel_metal = ~sel_coat & (rw < p_metal) if has_metal else jnp.zeros(shape, bool)
    sel_trans = (
        ~sel_coat & ~sel_metal & (rw < p_transparent)
        if has_trans else jnp.zeros(shape, bool)
    )

    u2 = r4[..., :2]
    rz = r4[..., 2]

    wm = ggx.sample_vmdf(alpha, wo, u2)
    dot_wo_wm = jnp.sum(wo * wm, axis=-1)
    wi_spec_mirror = jnp.stack(
        [-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1
    )

    # --- metallic ------------------------------------------------------------
    if has_metal:
        wi_metal_r = ggx.reflect(-wo, wm)
        bad_metal = wo[..., 2] * wi_metal_r[..., 2] < 0.0
        f_metal_r = fresnel.schlick(ctx.albedo, jnp.abs(dot_wo_wm)) * \
            ggx.single_scatter_brdf(alpha, wo, wi_metal_r, wm)[..., None]
        if multiscatter:
            f_metal_r = f_metal_r + _conductor_multiscatter(
                luts, ctx.roughness, wo[..., 2], wi_metal_r[..., 2],
                fresnel.avg_conductor_fresnel(ctx.albedo),
                ctx=ctx, features=features,
            )
        pdf_metal_r = ggx.pdf(alpha, wo, wm)
        f_metal_s = fresnel.schlick(ctx.albedo, wo[..., 2]) / jnp.maximum(
            jnp.abs(wo[..., 2]), 1e-20
        )[..., None]

        wi_metal = jnp.where(smooth[..., None], wi_spec_mirror, wi_metal_r)
        f_metal = jnp.where(smooth[..., None], f_metal_s,
                            jnp.where(bad_metal[..., None], 0.0, f_metal_r))
        pdf_metal = jnp.where(smooth, 1.0, jnp.where(bad_metal, 0.0, pdf_metal_r))
        flags_metal = jnp.where(
            smooth, SAMPLE_REFLECTED | SAMPLE_SPECULAR,
            SAMPLE_REFLECTED | SAMPLE_GLOSSY,
        )

    # --- transparent dielectric ----------------------------------------------
    if has_trans:
        ior_t = jnp.where((wo[..., 2] < 0.0) & ~thin, 1.0 / ctx.ior, ctx.ior)
        # rough path
        f_ss = fresnel.fresnel_dielectric(jnp.abs(dot_wo_wm), ior_t)
        reflecting = rz < f_ss
        wi_refl = ggx.reflect(-wo, wm)
        wi_thin = wi_refl * jnp.array([1.0, 1.0, -1.0])
        wm_signed = wm * jnp.where(dot_wo_wm[..., None] < 0, -1.0, 1.0)
        wi_refr = ggx.refract(-wo, wm_signed, 1.0 / ior_t)
        wi_tr = jnp.where(
            reflecting[..., None], wi_refl,
            jnp.where(thin[..., None], wi_thin, wi_refr),
        )
        same_side = wo[..., 2] * wi_tr[..., 2] > 0.0
        # Invalid flips are rejected in the thin-transmit branch too
        # (same_side ⇔ the underlying reflection was below-horizon). The
        # reference keeps those samples (bsdf.metal:600-602 has no check on
        # the thin branch) — a grazing-angle tail its own "thin glass is
        # not energy preserving" TODO notes. Rejecting them makes the thin
        # lobe a clean flip-mirrored GGX reflection whose Fresnel-free
        # directional albedo is EXACTLY the E LUT (every GGX term is
        # z-sign-invariant, so the flipped evaluation equals the
        # reflection's value), closing the furnace 1/E compensation; it
        # also guarantees SAMPLE_TRANSMITTED directions are genuinely on
        # the far side, so the weight-1 transmitted MIS never overlaps a
        # direction NEE can evaluate. Measured: thin furnace +1.1% → ~0.
        bad_tr = jnp.where(reflecting, ~same_side, same_side)
        # eval (bsdf.metal:376-417): reflection or thin → ss brdf; else btdf
        ss_tr = ggx.single_scatter_brdf(alpha, wo, wi_tr, wm)
        pdf_r = ggx.pdf(alpha, wo, wm)
        dot_i = jnp.sum(wi_tr * wm, axis=-1)
        denom = (dot_i * ior_t + dot_wo_wm) ** 2
        dwm_dwi = jnp.abs(dot_i) / jnp.maximum(denom, 1e-20)
        btdf = ggx.mdf(alpha, wm) * ggx.g(alpha, wo, wi_tr) * jnp.abs(
            dot_i * dot_wo_wm
            / (wi_tr[..., 2] * wo[..., 2] * jnp.maximum(denom, 1e-20))
        )
        pdf_t = ggx.vmdf(alpha, wo, wm) * dwm_dwi
        is_refl_like = reflecting | thin
        k = jnp.where(reflecting, f_ss, 1.0 - f_ss)
        base = jnp.where(reflecting, ss_tr, jnp.where(thin, ss_tr, btdf))
        f_tr_rough = k * base
        f_tr_rough = jnp.where(
            reflecting, f_tr_rough,
            f_tr_rough,  # albedo applied below on transmission only
        )
        color_tr = jnp.where(reflecting[..., None], jnp.ones_like(ctx.albedo), ctx.albedo)
        if multiscatter:
            comp = _transparent_multiscatter(
                luts, ctx.roughness, wo[..., 2], ior_t, ctx=ctx,
                features=features,
                thin=(thin if "thin" in features else None))
            f_tr_rough = f_tr_rough * comp
        pdf_tr_rough = k * jnp.where(reflecting | thin, pdf_r, pdf_t)

        # smooth path (bsdf.metal:586-617)
        f_ss_smooth = fresnel.fresnel_dielectric(jnp.abs(wo[..., 2]), ior_t)
        refl_s = rz < f_ss_smooth
        wi_tr_smooth_t = jnp.where(
            thin[..., None], -wo,
            ggx.refract(
                -wo,
                jnp.concatenate(
                    [jnp.zeros(shape + (2,)),
                     jnp.where(wo[..., 2] < 0, -1.0, 1.0)[..., None]], axis=-1
                ),
                1.0 / ior_t,
            ),
        )
        wi_tr_smooth = jnp.where(refl_s[..., None], wi_spec_mirror, wi_tr_smooth_t)
        bad_tr_smooth = ~refl_s & (jnp.abs(wi_tr_smooth[..., 2]) < 1e-9)
        pdf_tr_smooth = jnp.where(refl_s, f_ss_smooth, 1.0 - f_ss_smooth)
        color_smooth = jnp.where(refl_s[..., None], jnp.ones_like(ctx.albedo), ctx.albedo)
        f_tr_smooth = (
            pdf_tr_smooth / jnp.maximum(jnp.abs(wi_tr_smooth[..., 2]), 1e-20)
        )

        wi_trans = jnp.where(smooth[..., None], wi_tr_smooth, wi_tr)
        f_trans = jnp.where(
            smooth[..., None],
            jnp.where(bad_tr_smooth[..., None], 0.0, f_tr_smooth[..., None] * color_smooth),
            jnp.where(bad_tr[..., None], 0.0, f_tr_rough[..., None] * color_tr),
        )
        pdf_trans = jnp.where(
            smooth,
            jnp.where(bad_tr_smooth, 0.0, pdf_tr_smooth),
            jnp.where(bad_tr, 0.0, pdf_tr_rough),
        )
        transmitted = jnp.where(smooth, ~refl_s, ~reflecting)
        flags_trans = (
            jnp.where(transmitted, SAMPLE_TRANSMITTED, SAMPLE_REFLECTED)
            | jnp.where(smooth, SAMPLE_SPECULAR, SAMPLE_GLOSSY)
        )

    # --- opaque dielectric -----------------------------------------------------
    f_avg = fresnel.avg_dielectric_fresnel_fit(ctx.ior)
    bf = _opaque_dielectric_factor(luts, ctx, wo[..., 2], f_avg, features)
    pick_dielectric = rz < bf

    # dielectric sub-lobe
    f_ss_os = fresnel.fresnel_dielectric(jnp.abs(wo[..., 2]), ctx.ior)
    f_op_d_smooth = f_ss_os / jnp.maximum(jnp.abs(wo[..., 2]), 1e-20)
    pdf_op_d_smooth = bf

    f_ss_or = fresnel.fresnel_dielectric(jnp.abs(dot_wo_wm), ctx.ior)
    wi_op_r = ggx.reflect(-wo, wm)
    bad_op = jnp.sum(wm * wm, axis=-1) < 1e-12
    diel_rough = f_ss_or * ggx.single_scatter_brdf(alpha, wo, wi_op_r, wm)
    if multiscatter:
        diel_rough = diel_rough + _conductor_multiscatter(
            luts, ctx.roughness, wo[..., 2], wi_op_r[..., 2], f_avg,
            ctx=ctx, features=features,
        )
    pdf_op_d_rough = ggx.pdf(alpha, wo, wm) * bf

    wi_op_d = jnp.where(smooth[..., None], wi_spec_mirror, wi_op_r)
    f_op_d = jnp.where(
        smooth[..., None], f_op_d_smooth[..., None],
        jnp.where(bad_op[..., None], 0.0, diel_rough[..., None]),
    ) * jnp.ones_like(ctx.albedo)
    pdf_op_d = jnp.where(smooth, pdf_op_d_smooth,
                         jnp.where(bad_op, 0.0, pdf_op_d_rough))
    flags_op_d = jnp.where(
        smooth, SAMPLE_REFLECTED | SAMPLE_SPECULAR, SAMPLE_REFLECTED | SAMPLE_GLOSSY
    )

    # diffuse sub-lobe
    wi_diff = smp.sample_cosine_hemisphere(u2)
    wi_diff = wi_diff * jnp.where(wo[..., 2:3] < 0.0, -1.0, 1.0)
    c_diffuse = _diffuse_factor(luts, ctx, wo[..., 2], wi_diff[..., 2], features)
    f_diff = ctx.albedo * c_diffuse[..., None]
    pdf_diff = jnp.abs(wi_diff[..., 2]) / np.pi * (1.0 - bf)
    flags_diff = jnp.full(shape, SAMPLE_REFLECTED | SAMPLE_DIFFUSE, jnp.int32)
    flags_diff = flags_diff | jnp.where(
        (ctx.flags & MAT_EMISSIVE) != 0, SAMPLE_EMITTED, 0
    )

    wi_opaque = jnp.where(pick_dielectric[..., None], wi_op_d, wi_diff)
    f_opaque = jnp.where(pick_dielectric[..., None], f_op_d, f_diff)
    pdf_opaque = jnp.where(pick_dielectric, pdf_op_d, pdf_diff)
    flags_opaque = jnp.where(pick_dielectric, flags_op_d, flags_diff)

    # --- clearcoat ----------------------------------------------------------
    if has_coat:
        f_coat_ss = fresnel.fresnel_dielectric(
            jnp.abs(jnp.sum(wo * wm_coat, axis=-1)), CLEARCOAT_IOR
        )
        wi_coat_r = ggx.reflect(-wo, wm_coat)
        bad_coat = wo[..., 2] * wi_coat_r[..., 2] < 0.0
        f_coat_rough = f_coat_ss * ggx.single_scatter_brdf(coat_alpha, wo, wi_coat_r, wm_coat)
        if multiscatter:
            f_coat_rough = f_coat_rough * _coat_multiscatter(
                luts, ctx, wo[..., 2], features)
        pdf_coat_rough = f_coat_ss * ggx.pdf(coat_alpha, wo, wm_coat)
        f_coat_s = fresnel.fresnel_dielectric(wo[..., 2], CLEARCOAT_IOR)

        wi_coat = jnp.where(coat_smooth[..., None], wi_spec_mirror, wi_coat_r)
        f_coat = jnp.where(
            coat_smooth,
            f_coat_s / jnp.maximum(jnp.abs(wo[..., 2]), 1e-20),
            jnp.where(bad_coat, 0.0, f_coat_rough),
        )
        pdf_coat = jnp.where(coat_smooth, f_coat_s,
                             jnp.where(bad_coat, 0.0, pdf_coat_rough))
        flags_coat = jnp.where(
            coat_smooth, SAMPLE_REFLECTED | SAMPLE_SPECULAR,
            SAMPLE_REFLECTED | SAMPLE_GLOSSY,
        )

    # --- select lobe ----------------------------------------------------------
    def pick(sel, a, b, expand=False):
        return jnp.where(sel[..., None] if expand else sel, a, b)

    wi, f, pdf, flags = wi_opaque, f_opaque, pdf_opaque, flags_opaque
    if has_trans:
        wi = pick(sel_trans, wi_trans, wi, expand=True)
        f = pick(sel_trans, f_trans, f, expand=True)
        pdf = pick(sel_trans, pdf_trans, pdf)
        flags = pick(sel_trans, flags_trans, flags)
    if has_metal:
        wi = pick(sel_metal, wi_metal, wi, expand=True)
        f = pick(sel_metal, f_metal, f, expand=True)
        pdf = pick(sel_metal, pdf_metal, pdf)
        flags = pick(sel_metal, flags_metal, flags)
    if has_coat:
        wi = pick(sel_coat, wi_coat, wi, expand=True)
        f = pick(sel_coat, jnp.broadcast_to(f_coat[..., None], shape + (3,)), f,
                 expand=True)
        pdf = pick(sel_coat, pdf_coat, pdf)
        flags = pick(sel_coat, flags_coat, flags)
    flags = flags.astype(jnp.int32)

    # zero-pdf lanes are dead samples
    dead = pdf <= 0.0
    flags = jnp.where(dead, 0, flags)
    f = jnp.where(dead[..., None], 0.0, f)

    # Rotate wi back out of the anisotropy frame
    if "aniso" in features:
        wi = _rotate_xy(wi, cos_a, sin_a)

    if mixture_pdf:
        # Replace the partial (sub-lobe) f/pdf with the full mixture at
        # the sampled direction — see docstring — but ONLY where
        # evaluate() models the direction: non-delta, reflection-side,
        # ev.pdf > 0. evaluate() deliberately covers the reflection
        # hemisphere only (NEE never usefully refracts), so transmitted
        # samples keep their (unbiased) partial f/pdf. evaluate() rotates
        # into the aniso frame itself, so it gets the ORIGINAL wo and the
        # rotated-back wi.
        ev = evaluate(ctx, wo_in, wi, luts, multiscatter=multiscatter,
                      features=features)
        keep = (dead | ((flags & SAMPLE_SPECULAR) != 0)
                | (wo_in[..., 2] * wi[..., 2] <= 0.0) | (ev.pdf <= 0.0))
        f = jnp.where(keep[..., None], f, ev.f)
        pdf = jnp.where(keep, pdf, ev.pdf)
    return BSDFSample(wi=wi, f=f, pdf=pdf, flags=flags)


def emitted_radiance(ctx: ShadingContext, wo: jnp.ndarray, luts=None,
                     features: frozenset = ALL_FEATURES) -> jnp.ndarray:
    """Deterministic expected emission on hit: emission scaled by the
    probability of the opaque-diffuse path (reference emits Le/(1-bf) from
    the diffuse sub-lobe stochastically; same expectation). The coat-pick
    probability uses the same true marginal c·F̄(wo) as evaluate()'s base
    dimming (F(|wo.z|) exactly for smooth coats); pruned to zero for
    coat-free scenes like every other lobe."""
    if "clearcoat" in features:
        luts = luts or luts_mod.get_luts()
        p_coat = ctx.clearcoat * _coat_fbar(luts, ctx, wo[..., 2], features)
    else:
        p_coat = 0.0
    p_opaque = (1.0 - p_coat) * (1.0 - ctx.metallic) * (1.0 - ctx.transmission)
    is_emissive = (ctx.flags & MAT_EMISSIVE) != 0
    return jnp.where(is_emissive[..., None], ctx.emission * p_opaque[..., None], 0.0)


def wants_nee(ctx: ShadingContext) -> jnp.ndarray:
    """NEE is skipped for purely specular contexts (kernel.metal:585)."""
    return (ctx.roughness > 0.0) | (ctx.metallic + ctx.transmission < 1.0)
