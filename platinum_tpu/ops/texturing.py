"""Texture sampling from the packed atlas (pure JAX).

TPUs have no texture samplers (the reference leans on Metal's
`sampler(address::repeat, filter::linear)` throughout bsdf.metal and
kernel.metal); textures are shelf-packed into one RGBA float atlas at flatten
time (render.flatten._pack_atlas) and sampled here with explicit bilinear
gathers. Wrap mode is repeat (within each atlas sub-rectangle), matching the
reference's samplers. sRGB decode happened at pack time; values here are
linear.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from platinum_tpu.core.material import TextureSlot


def _srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def sample_atlas(atlas: jnp.ndarray, entry: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear, repeat-wrapped sample.

    atlas: (AH, AW, 4) f32 (linear) or u8 (storage encoding); entry:
    (R, 5) int32 (x, y, w, h, srgb_flag); uv: (R, 2). Returns (R, 4)
    linear. u8 taps decode AFTER the gather and BEFORE the bilinear blend
    (decode-then-filter, like hardware sRGB samplers). Entries with
    w == 0 return zeros.
    """
    x0e = entry[..., 0].astype(jnp.float32)
    y0e = entry[..., 1].astype(jnp.float32)
    w = jnp.maximum(entry[..., 2].astype(jnp.float32), 1.0)
    h = jnp.maximum(entry[..., 3].astype(jnp.float32), 1.0)
    is_u8 = atlas.dtype == jnp.uint8
    srgb = (entry[..., 4] == 1)[..., None] if entry.shape[-1] > 4 else False

    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    uf = jnp.floor(u)
    vf = jnp.floor(v)
    fu = (u - uf)[..., None]
    fv = (v - vf)[..., None]

    def texel(ui, vi):
        ui = jnp.mod(ui, w)
        vi = jnp.mod(vi, h)
        xi = (x0e + ui).astype(jnp.int32)
        yi = (y0e + vi).astype(jnp.int32)
        t = atlas[yi, xi]
        if not is_u8:
            return t
        f = t.astype(jnp.float32) * (1.0 / 255.0)
        rgb = jnp.where(srgb, _srgb_to_linear(f[..., :3]), f[..., :3])
        return jnp.concatenate([rgb, f[..., 3:4]], axis=-1)

    c00 = texel(uf, vf)
    c10 = texel(uf + 1, vf)
    c01 = texel(uf, vf + 1)
    c11 = texel(uf + 1, vf + 1)
    out = (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (c01 * (1 - fu) + c11 * fu) * fv
    return jnp.where((entry[..., 2] > 0)[..., None], out, 0.0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TexSamples:
    has_base: jnp.ndarray
    base_rgb: jnp.ndarray
    base_alpha: jnp.ndarray
    has_emission: jnp.ndarray
    emission_rgb: jnp.ndarray
    has_rm: jnp.ndarray
    rough: jnp.ndarray
    metal: jnp.ndarray
    has_transmission: jnp.ndarray
    transmission: jnp.ndarray
    has_clearcoat: jnp.ndarray
    clearcoat: jnp.ndarray


def _entry(atlas_table, tex_ids, slot):
    tid = tex_ids[..., int(slot)]
    has = tid >= 0
    entry = atlas_table[jnp.maximum(tid, 0)]
    entry = jnp.where(has[..., None], entry, 0)
    return has, entry


def sample_material_textures(atlas, atlas_table, tex_ids, uv,
                             idt=None, slots=None) -> TexSamples:
    """Gather all non-normal material texture slots for a batch of rays.
    tex_ids: (R, 6) i32 atlas entries (-1 = unbound). `slots` (static
    frozenset of TextureSlot ints, from flatten.analyze_features) prunes
    slots no material in the scene binds — each pruned slot saves four
    bilinear taps per lane."""
    n = uv.shape[0]

    def slot_sample(slot):
        if slots is not None and int(slot) not in slots:
            return jnp.zeros((n,), bool), jnp.zeros((n, 4))
        has, e = _entry(atlas_table, tex_ids, slot)
        return has, sample_atlas(atlas, e, uv)

    has_base, base = slot_sample(TextureSlot.BASE_COLOR)
    has_em, emission = slot_sample(TextureSlot.EMISSION)
    has_rm, rm = slot_sample(TextureSlot.ROUGHNESS_METALLIC)
    has_tr, tr = slot_sample(TextureSlot.TRANSMISSION)
    has_cc, cc = slot_sample(TextureSlot.CLEARCOAT)

    base_rgb = base[..., :3]
    em_rgb = emission[..., :3]
    if idt is not None:
        base_rgb = base_rgb @ idt.T
        em_rgb = em_rgb @ idt.T

    return TexSamples(
        has_base=has_base,
        base_rgb=base_rgb,
        base_alpha=base[..., 3],
        has_emission=has_em,
        emission_rgb=em_rgb,
        has_rm=has_rm,
        rough=rm[..., 0],
        metal=rm[..., 1],
        has_transmission=has_tr,
        transmission=tr[..., 0],
        has_clearcoat=has_cc,
        clearcoat=cc[..., 0],
    )


def sample_normal_map(atlas, atlas_table, tex_ids, uv):
    """(has (R,), tangent-space normal (R, 3)) for the normal slot;
    values decoded from [0,1] to [-1,1] like kernel.metal:170-176."""
    has, e = _entry(atlas_table, tex_ids, TextureSlot.NORMAL)
    n = sample_atlas(atlas, e, uv)[..., :3] * 2.0 - 1.0
    return has, n


def sample_base_alpha(atlas, atlas_table, tex_ids, uv):
    """Base-color alpha only (for stochastic-transparency any-hit tests,
    parity with intersections.metal:8-39)."""
    has, e = _entry(atlas_table, tex_ids, TextureSlot.BASE_COLOR)
    a = sample_atlas(atlas, e, uv)[..., 3]
    return jnp.where(has, a, 1.0)
