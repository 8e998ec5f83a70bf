"""Light sampling: power-proportional area lights + alias-sampled env maps.

Parity with kernel.metal:375-467 and 580-650: light selection splits between
environment and area lights with probability pInfinite = nEnv/(nEnv+1) (1.0 if
no area lights); area lights are picked proportionally to power by binary
search over the cumulative-power table (searchsorted here); positions are
uniform on the triangle with solid-angle-converted pdf; env lights sample the
per-pixel alias table.

Documented deviation: the reference reports the env sample pdf as
alias_pdf/(4π) (kernel.metal:465), ignoring the equirect sinθ Jacobian — its
env NEE estimator is biased by (2/π)/sinθ. We use the true solid-angle
density alias_pdf/(2π²·sinθ), which passes the white-furnace test exactly.
MIS uses the balance heuristic in its folded one-sample form
f/(pdf_light + pdf_bsdf).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from platinum_tpu.ops import samplers as smp
from platinum_tpu.render.types import EnvironmentLight, Geometry, LightTable

ENV_DISTANCE = jnp.float32(1e7)


@dataclass(frozen=True)
class LightSample:
    li: jnp.ndarray        # (R, 3) emitted radiance
    wi: jnp.ndarray        # (R, 3) world-space direction surface→light
    dist: jnp.ndarray      # (R,) distance to the light sample
    pdf: jnp.ndarray       # (R,) pdf of the position/direction sample
    p_light: jnp.ndarray   # (R,) probability of having picked this light


def dir_to_equirect_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Parity with rayDirToUv (kernel.metal:20-25)."""
    phi = jnp.arctan2(-d[..., 2], -d[..., 0])
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    return jnp.stack([phi / (2.0 * np.pi), theta / np.pi], axis=-1)


def equirect_uv_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """Parity with uvToRayDir (kernel.metal:27-34)."""
    y = jnp.cos(uv[..., 1] * np.pi)
    r = jnp.sin(uv[..., 1] * np.pi)
    phi = uv[..., 0] * 2.0 * np.pi
    d = jnp.stack([-jnp.cos(phi) * r, y, -jnp.sin(phi) * r], axis=-1)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)


def env_radiance(env: EnvironmentLight, d: jnp.ndarray) -> jnp.ndarray:
    """Bilinear env lookup for a world direction (wrap-x, clamp-y)."""
    h, w = env.pixels.shape[:2]
    uv = dir_to_equirect_uv(d)
    x = uv[..., 0] * w - 0.5
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = env.pixels[y0i, x0i]
    c10 = env.pixels[y0i, x1i]
    c01 = env.pixels[y1i, x0i]
    c11 = env.pixels[y1i, x1i]
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def _equirect_density(pdf_pixel: jnp.ndarray, sin_theta: jnp.ndarray) -> jnp.ndarray:
    """True solid-angle density of the alias-table sampler: a pixel with
    relative weight pdf covers solid angle (2π/W)(π/H)sinθ, and pdf is
    normalized to mean 1 over W·H pixels → density = pdf/(2π² sinθ)."""
    return pdf_pixel / (2.0 * np.pi * np.pi * jnp.maximum(sin_theta, 1e-4))


def env_pdf_of_dir(env: EnvironmentLight, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf the env sampler assigns to direction d — used for MIS
    when a BSDF ray escapes (cf. kernel.metal:527-538)."""
    h, w = env.pixels.shape[:2]
    uv = dir_to_equirect_uv(d)
    x = jnp.clip((uv[..., 0] % 1.0) * w, 0, w - 1).astype(jnp.int32)
    y = jnp.clip(uv[..., 1] * h, 0, h - 1).astype(jnp.int32)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - d[..., 1] * d[..., 1], 0.0))
    return _equirect_density(env.pdf[y * w + x], sin_theta)


def sample_env_light(env: EnvironmentLight, u2: jnp.ndarray) -> LightSample:
    """Alias-table draw (cf. kernel.metal:440-467). Unlike the reference
    (which returns the texel-corner direction), the position inside the
    chosen texel is jittered — required for unbiased small env maps (a 1×1
    constant env would otherwise always return the pole). The jitter reuses
    the leftover randomness of the two alias draws."""
    h, w = env.pixels.shape[:2]
    n = h * w
    scaled = u2[..., 0] * n
    slot = jnp.minimum(scaled.astype(jnp.int32), n - 1)
    ux = jnp.clip(scaled - slot.astype(jnp.float32), 0.0, 1.0)  # leftover draw

    p_slot = env.p[slot]
    take_alias = u2[..., 1] >= p_slot
    i = jnp.where(take_alias, env.alias[slot], slot)
    # Rescale the accept draw's remainder into a fresh uniform
    uy = jnp.where(
        take_alias,
        (u2[..., 1] - p_slot) / jnp.maximum(1.0 - p_slot, 1e-9),
        u2[..., 1] / jnp.maximum(p_slot, 1e-9),
    )
    uy = jnp.clip(uy, 0.0, 1.0 - 1e-6)

    x = i % w
    y = i // w
    uv = jnp.stack(
        [(x.astype(jnp.float32) + ux) / w, (y.astype(jnp.float32) + uy) / h], -1
    )
    wi = equirect_uv_to_dir(uv)
    li = env_radiance(env, wi)
    sin_theta = jnp.sin(uv[..., 1] * np.pi)
    pdf = _equirect_density(env.pdf[i], sin_theta)
    shape = i.shape
    return LightSample(
        li=li,
        wi=wi,
        dist=jnp.full(shape, ENV_DISTANCE),
        pdf=pdf,
        p_light=jnp.ones(shape),  # caller multiplies by pInfinite/nEnv
    )


def sample_area_light(
    geometry: Geometry,
    lights: LightTable,
    hit_pos: jnp.ndarray,   # (R, 3)
    u_select: jnp.ndarray,  # (R,)
    u2: jnp.ndarray,        # (R, 2)
) -> LightSample:
    """Power-proportional pick + uniform point on the triangle
    (kernel.metal:379-435)."""
    # O(1) alias-table pick (replaces the reference's binary search,
    # kernel.metal:379-394), reusing the draw's leftover bits for the accept
    from platinum_tpu.ops import lookup

    n = lights.packed.shape[0]
    scaled = u_select * n
    slot = jnp.minimum(scaled.astype(jnp.int32), n - 1)
    frac = jnp.clip(scaled - slot.astype(jnp.float32), 0.0, 1.0)
    row = lookup.rows(lights.packed, slot)
    take_alias = frac >= row[..., 14]
    alias = row[..., 15].astype(jnp.int32)  # value float, see flatten
    idx = jnp.where(take_alias, alias, slot)
    row = lookup.rows(lights.packed, idx)

    v0 = row[..., 0:3]
    e1 = row[..., 3:6]
    e2 = row[..., 6:9]
    emission = row[..., 9:12]
    area = row[..., 12]
    p_light = row[..., 13]

    b = smp.sample_tri_uniform(u2)
    pos = v0 + e1 * b[..., 0:1] + e2 * b[..., 1:2]
    nrm = jnp.cross(e1, e2)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)

    delta = pos - hit_pos
    dist2 = jnp.sum(delta * delta, axis=-1)
    dist = jnp.sqrt(dist2)
    wi = delta / jnp.maximum(dist[..., None], 1e-20)
    cos_l = jnp.abs(jnp.sum(nrm * wi, axis=-1))
    pdf = dist2 / jnp.maximum(cos_l * area, 1e-20)
    return LightSample(li=emission, wi=wi, dist=dist, pdf=pdf, p_light=p_light)


def p_infinite(lights: LightTable, env: EnvironmentLight) -> jnp.ndarray:
    """Probability of sampling an infinite (env) light (kernel.metal:593-597),
    extended so scenes with no env light at all get 0."""
    n_env = env.count.astype(jnp.float32)
    base = jnp.where(
        lights.count == 0, 1.0, n_env / (n_env + 1.0)
    )
    return jnp.where(env.count == 0, jnp.where(lights.count == 0, 1.0, 0.0), base)
