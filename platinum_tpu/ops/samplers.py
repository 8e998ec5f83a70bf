"""Counter-based QMC/RNG samplers and sampling warps (pure JAX, vectorized).

Capability parity with /root/reference/src/renderer_pt/shaders/samplers.metal:
three samplers behind one functional interface — Halton (PCG-offset radical
inverse over a prime table; the reference's production sampler), PCG4D (pure
hash chain), and a Z-sampler-style scrambled Sobol (see `zsampler.py`) — plus
the warps sampleDisk/DiskPolar/CosineHemisphere/TriUniform.

All samplers are counter-based: the value drawn for (pixel, sample_index,
dimension) is a pure function of those integers, so sample streams are
deterministic under any sharding of pixels or samples across devices. This is
what makes spp-sharding embarrassingly parallel and bit-reproducible.

Streams are small pytrees: `next_1d()` / `next_2d()` return (new_stream,
value). The dimension counter is a *traced* int32 so streams can advance
inside `lax.scan` bounce loops without unrolling.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
ONE_MINUS_EPS = np.float32(1.0 - 2 ** -24)
_INV_2_32 = np.float32(2.3283064365386963e-10)  # 2^-32


def _primes(n: int) -> np.ndarray:
    """First n primes (sieve)."""
    out, cand = [], 2
    while len(out) < n:
        if all(cand % p for p in out if p * p <= cand):
            out.append(cand)
        cand += 1
    return np.asarray(out, dtype=np.uint32)


# 512 dims: enough for 50 bounces x ~8 dims + camera dims, with headroom.
PRIME_TABLE = _primes(512)
_PRIME_TABLE_J = jnp.asarray(PRIME_TABLE)

# Max radical-inverse digits per base (so dynamic-dim loops have a static
# bound): base 2 needs 32 digits for a 32-bit index; larger bases fewer.
_MAX_DIGITS = 32


def uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → float32 in [0, 1), clamped below 1 like the reference."""
    f = bits.astype(jnp.float32) * _INV_2_32
    return jnp.minimum(f, ONE_MINUS_EPS)


def pcg4d_parts(x, y, z, w):
    """PCG4D hash (Jarzynski & Olano) over four separate uint32 lanes.

    Kept un-stacked on purpose: a stacked (R, 4) state uses 4 of 128 TPU
    lanes and pays a relayout per draw; four dense (R,) planes are pure
    VPU int ops (measured ~3x faster per draw)."""
    x = x.astype(U32) * U32(1664525) + U32(1013904223)
    y = y.astype(U32) * U32(1664525) + U32(1013904223)
    z = z.astype(U32) * U32(1664525) + U32(1013904223)
    w = w.astype(U32) * U32(1664525) + U32(1013904223)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x, y, z, w = (t ^ (t >> 16) for t in (x, y, z, w))
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """PCG4D hash over a stacked (..., 4) uint32 (host/setup-time helper)."""
    x, y, z, w = pcg4d_parts(v[..., 0], v[..., 1], v[..., 2], v[..., 3])
    return jnp.stack([x, y, z, w], axis=-1)


def hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """32-bit integer scramble hash (lowbias-style)."""
    x = x.astype(U32)
    x = ((x >> 16) ^ x) * U32(0x45D9F3B)
    x = ((x >> 16) ^ x) * U32(0x45D9F3B)
    return (x >> 16) ^ x


def radical_inverse_dynamic(index: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of `index` in (possibly per-element dynamic) `base`.

    Fixed 32-iteration loop (worst case: base 2 with a full 32-bit index);
    exhausted indices contribute nothing, so early digits dominate cost only
    in compile-time-static terms.
    """
    base = jnp.broadcast_to(base.astype(U32), index.shape)
    inv_b = 1.0 / base.astype(jnp.float32)

    def body(_, carry):
        i, f, r = carry
        digit = i % base
        f = f * inv_b
        r = r + f * digit.astype(jnp.float32)
        i = i // base
        return i, f, r

    init = (index.astype(U32),
            jnp.ones(index.shape, jnp.float32),
            jnp.zeros(index.shape, jnp.float32))
    _, _, r = jax.lax.fori_loop(0, _MAX_DIGITS, body, init)
    return jnp.minimum(r, ONE_MINUS_EPS)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaltonStream:
    """Halton sampler: per-(pixel, sample) PCG-hashed index into the Halton
    sequence; each draw consumes the next prime-base dimension."""

    offset: jnp.ndarray  # uint32, any shape (one stream per ray)
    dim: jnp.ndarray     # int32 scalar or broadcastable, traced

    @staticmethod
    def create(pixel_x, pixel_y, sample_index) -> "HaltonStream":
        px = jnp.asarray(pixel_x, U32)
        py = jnp.asarray(pixel_y, U32)
        s = jnp.broadcast_to(jnp.asarray(sample_index, U32), px.shape)
        seed = jnp.stack([px, py, s, px + py], axis=-1)
        offset = pcg4d(seed)[..., 0]
        return HaltonStream(offset=offset, dim=jnp.int32(0))

    def next_1d(self):
        base = _PRIME_TABLE_J[self.dim]
        u = radical_inverse_dynamic(self.offset, base)
        return replace(self, dim=self.dim + 1), u

    def next_2d(self):
        b0 = _PRIME_TABLE_J[self.dim]
        b1 = _PRIME_TABLE_J[self.dim + 1]
        u0 = radical_inverse_dynamic(self.offset, b0)
        u1 = radical_inverse_dynamic(self.offset, b1)
        return replace(self, dim=self.dim + 2), jnp.stack([u0, u1], axis=-1)

    def skip(self, n: int):
        return replace(self, dim=self.dim + n)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PCG4DStream:
    """Pure hash-chain sampler; fastest, no tables. State is four dense
    (R,) uint32 planes (lane-dense on TPU; see pcg4d_parts)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray

    @staticmethod
    def create(pixel_x, pixel_y, sample_index) -> "PCG4DStream":
        px = jnp.asarray(pixel_x, U32)
        py = jnp.asarray(pixel_y, U32)
        s = jnp.broadcast_to(jnp.asarray(sample_index, U32), px.shape)
        return PCG4DStream(*pcg4d_parts(px, py, s, px + py))

    def next_1d(self):
        x, y, z, w = pcg4d_parts(self.x, self.y, self.z, self.w)
        return PCG4DStream(x, y, z, w), uniform_from_bits(x)

    def next_2d(self):
        x, y, z, w = pcg4d_parts(self.x, self.y, self.z, self.w)
        u = jnp.stack([uniform_from_bits(x), uniform_from_bits(y)], axis=-1)
        return PCG4DStream(x, y, z, w), u

    def skip(self, n: int):
        s = self
        for _ in range(n):  # cheap; n is a small static int
            s = PCG4DStream(*pcg4d_parts(s.x, s.y, s.z, s.w))
        return s


def make_stream(kind: str, pixel_x, pixel_y, sample_index,
                width: int = 4096, height: int = 4096, spp: int = 4096):
    kind = kind.lower()
    if kind == "halton":
        return HaltonStream.create(pixel_x, pixel_y, sample_index)
    if kind in ("pcg4d", "pcg"):
        return PCG4DStream.create(pixel_x, pixel_y, sample_index)
    if kind in ("z", "zsampler", "sobol"):
        from platinum_tpu.ops.zsampler import ZStream
        return ZStream.create(pixel_x, pixel_y, sample_index, width, height, spp)
    raise ValueError(f"unknown sampler kind: {kind}")


# ---------------------------------------------------------------------------
# Warps
# ---------------------------------------------------------------------------

def sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform disk via sqrt-polar; u is (..., 2) → (..., 2) xy."""
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * np.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_disk_polar(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform disk in polar coords (r, theta)."""
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * np.pi * u[..., 1]
    return jnp.stack([r, theta], axis=-1)


def sample_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere around +Z; u is (..., 2) → (..., 3)."""
    phi = u[..., 0] * 2.0 * np.pi
    sin_theta = jnp.sqrt(u[..., 1])
    cos_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 1]))
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def sample_tri_uniform(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform barycentrics on a triangle (Heitz's lower-distortion mapping,
    matching the reference's sampleTriUniform)."""
    ux, uy = u[..., 0], u[..., 1]
    lt = ux < uy
    b0 = jnp.where(lt, ux * 0.5, ux - uy * 0.5)
    b1 = jnp.where(lt, uy - ux * 0.5, uy * 0.5)
    return jnp.stack([b0, b1], axis=-1)
