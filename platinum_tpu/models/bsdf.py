"""Principled BSDF (pure JAX, vectorized over rays).

Parity target: /root/reference/src/renderer_pt/shaders/bsdf.metal — a
principled GGX BSDF (Enterprise-PBR-like) with four lobes blended by material
parameters:

  metallic conductor  · GGX + Schlick Fresnel
  transparent dielectric · GGX reflection/refraction, real Fresnel, thin mode
  opaque dielectric   · GGX + energy-compensated diffuse
  clearcoat           · GGX at fixed IOR 1.5

with Kulla-Conty / Turquin multiple-scattering energy compensation via LUTs.

This module is built incrementally; every lobe keeps the same vectorized
signature. Current status: diffuse (Lambert) + emission are exact; GGX lobes
land with the `ggx` module. All directions are in the local shading frame
(+Z = shading normal); wo/wi conventions match the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.ops import samplers as smp
from platinum_tpu.render.types import MAT_EMISSIVE, MaterialTable

# Sample flag bits (parity with bsdf::SampleFlags)
SAMPLE_REFLECTED = 1
SAMPLE_TRANSMITTED = 2
SAMPLE_DIFFUSE = 4
SAMPLE_GLOSSY = 8
SAMPLE_SPECULAR = 16
SAMPLE_EMITTED = 32

MIN_COS = 1.5e-3


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
    clearcoat: jnp.ndarray
    clearcoat_roughness: jnp.ndarray
    flags: jnp.ndarray         # (R,) i32 material flags


def make_shading_context(
    materials: MaterialTable, mat_idx: jnp.ndarray, uv: jnp.ndarray,
    atlas=None, atlas_table=None,
) -> ShadingContext:
    """Gather material parameters per ray; apply texture lookups when an
    atlas is present (texture support lands with ops.texturing)."""
    albedo = materials.base_color[mat_idx, :3]
    emission = materials.emission[mat_idx]
    roughness = materials.roughness[mat_idx]
    metallic = materials.metallic[mat_idx]
    transmission = materials.transmission[mat_idx]

    if atlas is not None and atlas_table is not None:
        from platinum_tpu.ops.texturing import sample_material_textures

        tex = sample_material_textures(
            atlas, atlas_table, materials.textures[mat_idx], uv
        )
        albedo = jnp.where(tex.has_base[:, None], tex.base_rgb, albedo)
        emission = emission * jnp.where(
            tex.has_emission[:, None], tex.emission_rgb, 1.0
        )
        roughness = roughness * jnp.where(tex.has_rm, tex.rough, 1.0)
        metallic = metallic * jnp.where(tex.has_rm, tex.metal, 1.0)
        transmission = jnp.where(tex.has_transmission, tex.transmission, transmission)

    return ShadingContext(
        albedo=albedo,
        emission=emission,
        roughness=roughness,
        metallic=metallic,
        transmission=transmission,
        ior=materials.ior[mat_idx],
        anisotropy=materials.anisotropy[mat_idx],
        clearcoat=materials.clearcoat[mat_idx],
        clearcoat_roughness=materials.clearcoat_roughness[mat_idx],
        flags=materials.flags[mat_idx],
    )


def emitted_radiance(ctx: ShadingContext) -> jnp.ndarray:
    """Deterministic expected emission on hit. The reference emits Le
    stochastically from the diffuse sub-lobe with probability-compensation
    (bsdf.metal:675-681); the expectation is emission scaled by the opaque-
    dielectric lobe probability (1-m)(1-t) — we add that directly (equal
    mean, lower variance)."""
    opaque = (1.0 - ctx.metallic) * (1.0 - (1.0 - ctx.metallic) * ctx.transmission)
    # Reference lobe probabilities: pOpaque = (1-pClearcoat)(1-pMetal-...)
    # For emission, clearcoat weighting matches pOpaque w/o coat Fresnel ≈ 1-c·F;
    # coat Fresnel term is small — parity within variance. TODO: refine w/ GGX coat.
    m, t = ctx.metallic, ctx.transmission
    p_opaque = (1.0 - m) * (1.0 - t)
    is_emissive = (ctx.flags & MAT_EMISSIVE) != 0
    return jnp.where(is_emissive[:, None], ctx.emission * p_opaque[:, None], 0.0)


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


def sample(ctx: ShadingContext, wo: jnp.ndarray, r4: jnp.ndarray, rc: jnp.ndarray,
           luts=None, multiscatter: bool = True) -> BSDFSample:
    """Importance-sample the BSDF. r4: (R, 4) lobe-select + direction draws,
    rc: (R, 2) clearcoat VNDF draw. Currently: Lambert diffuse lobe."""
    del rc, luts, multiscatter
    wi = smp.sample_cosine_hemisphere(r4[..., :2])
    # Sample on the same side as wo (two-sided diffuse, bsdf.metal:668-669)
    flip = jnp.where(wo[..., 2] < 0.0, -1.0, 1.0)
    wi = wi * flip[..., None]
    pdf = jnp.abs(wi[..., 2]) / np.pi
    f = ctx.albedo / np.pi
    flags = jnp.full(wo.shape[:-1], SAMPLE_REFLECTED | SAMPLE_DIFFUSE, jnp.int32)
    return BSDFSample(wi=wi, f=f, pdf=pdf, flags=flags)


def evaluate(ctx: ShadingContext, wo: jnp.ndarray, wi: jnp.ndarray,
             luts=None, multiscatter: bool = True) -> BSDFEval:
    """Evaluate the BSDF for given directions (used by NEE)."""
    del luts, multiscatter
    same_side = (wo[..., 2] * wi[..., 2]) > 0.0
    cos_ok = (jnp.abs(wo[..., 2]) >= MIN_COS) & (jnp.abs(wi[..., 2]) >= MIN_COS)
    valid = same_side & cos_ok
    f = jnp.where(valid[..., None], ctx.albedo / np.pi, 0.0)
    pdf = jnp.where(valid, jnp.abs(wi[..., 2]) / np.pi, 0.0)
    return BSDFEval(f=f, pdf=pdf)


def wants_nee(ctx: ShadingContext) -> jnp.ndarray:
    """NEE is skipped for purely specular contexts (kernel.metal:585)."""
    return (ctx.roughness > 0.0) | (ctx.metallic + ctx.transmission < 1.0)
