"""Z-sampler: Morton-indexed, base-4 permuted scrambled-Sobol sampler.

Parity with the reference's ZSampler (defs.metal:37-105,
samplers.metal:62-152; Ahmed & Wonka's screen-space blue-noise-ish "Z
sampler"): the pixel's Morton index + Gray-coded sample index form a
canonical base-4 index; each dimension applies hash-seeded digit
permutations, then evaluates a scrambled Sobol point (dims 1/2 matrices) with
Laine-Karras-style hashing. All integer math, fully vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.ops.samplers import ONE_MINUS_EPS, hash_u32

U32 = jnp.uint32

# Sobol generator matrices for the first two dimensions: dim 1 is the
# van der Corput bit-reversal; dim 2 is the canonical Sobol second-dimension
# direction-number table (the 8-value doubling pattern).
Z_MATRIX_1 = np.array([1 << (31 - i) for i in range(32)], dtype=np.uint32)
Z_MATRIX_2 = np.array([
    0x80000000, 0xC0000000, 0xA0000000, 0xF0000000,
    0x88000000, 0xCC000000, 0xAA000000, 0xFF000000,
    0x80800000, 0xC0C00000, 0xA0A00000, 0xF0F00000,
    0x88880000, 0xCCCC0000, 0xAAAA0000, 0xFFFF0000,
    0x80008000, 0xC000C000, 0xA000A000, 0xF000F000,
    0x88008800, 0xCC00CC00, 0xAA00AA00, 0xFF00FF00,
    0x80808080, 0xC0C0C0C0, 0xA0A0A0A0, 0xF0F0F0F0,
    0x88888888, 0xCCCCCCCC, 0xAAAAAAAA, 0xFFFFFFFF,
], dtype=np.uint32)

# All 24 permutations of (0,1,2,3) in the reference's order
PERMUTATIONS = np.array([
    [0, 1, 2, 3], [0, 1, 3, 2], [0, 2, 1, 3], [0, 2, 3, 1],
    [0, 3, 2, 1], [0, 3, 1, 2], [1, 0, 2, 3], [1, 0, 3, 2],
    [1, 2, 0, 3], [1, 2, 3, 0], [1, 3, 2, 0], [1, 3, 0, 2],
    [2, 1, 0, 3], [2, 1, 3, 0], [2, 0, 1, 3], [2, 0, 3, 1],
    [2, 3, 0, 1], [2, 3, 1, 0], [3, 1, 2, 0], [3, 1, 0, 2],
    [3, 2, 1, 0], [3, 2, 0, 1], [3, 0, 2, 1], [3, 0, 1, 2],
], dtype=np.uint32)
# Flattened for a single-gather lookup: row * 4 + digit
_PERM_FLAT = jnp.asarray(PERMUTATIONS.reshape(-1))
_ZM1 = [np.uint32(x) for x in Z_MATRIX_1]
_ZM2 = [np.uint32(x) for x in Z_MATRIX_2]


def _reverse_bits32(v):
    v = ((v << 16) | (v >> 16)) & U32(0xFFFFFFFF)
    v = ((v & U32(0x00FF00FF)) << 8) | ((v & U32(0xFF00FF00)) >> 8)
    v = ((v & U32(0x0F0F0F0F)) << 4) | ((v & U32(0xF0F0F0F0)) >> 4)
    v = ((v & U32(0x33333333)) << 2) | ((v & U32(0xCCCCCCCC)) >> 2)
    v = ((v & U32(0x55555555)) << 1) | ((v & U32(0xAAAAAAAA)) >> 1)
    return v


def _z_hash(i, d):
    """Per-prefix permutation hash (samplers.metal:104-111)."""
    mask = U32((1 << 24) - 1)
    alpha = U32(0x9E377A)
    i = i ^ (U32(0x55555555) * d.astype(U32))
    x = (i * alpha) & mask
    return (x * U32(24)) >> U32(24)


def _scramble(v, seed):
    v = _reverse_bits32(v)
    v = v ^ (v * U32(0x3D20ADEA))
    v = v + seed
    v = v * ((seed >> U32(16)) | U32(1))
    v = v ^ (v * U32(0x05526C56))
    v = v ^ (v * U32(0x53A22864))
    return _reverse_bits32(v)


def _sobol(index, matrix_list, dim):
    v = jnp.zeros_like(index)
    for i in range(32):
        bit = (index >> U32(i)) & U32(1)
        v = v ^ (matrix_list[i] * bit)
    return _scramble(v, hash_u32(dim.astype(U32)))


@dataclass(frozen=True)
class ZStream:
    z: jnp.ndarray    # (R,) uint32 canonical index
    dim: jnp.ndarray  # traced int32

    # static config (meta fields)
    log2_res: int
    log2_spp: int
    base4_digits: int

    @staticmethod
    def create(pixel_x, pixel_y, sample_index, width: int = 4096,
               height: int = 4096, spp: int = 4096) -> "ZStream":
        px = jnp.asarray(pixel_x, U32)
        py = jnp.asarray(pixel_y, U32)
        resolution = max(width, height)
        log2_res = max(1, int(np.ceil(np.log2(max(resolution, 2)))))
        log2_spp = int(np.ceil(np.log2(max(spp, 1)))) if spp > 1 else 0
        base4_digits = log2_res + (log2_spp + 1) // 2

        z = jnp.zeros(px.shape, U32)
        for i in range(log2_res):
            z = z | (((px >> U32(i)) & U32(1)) << U32(2 * i))
            z = z | (((py >> U32(i)) & U32(1)) << U32(2 * i + 1))
        s = jnp.broadcast_to(jnp.asarray(sample_index, U32), px.shape)
        z = (z << U32(log2_spp)) | s
        if log2_spp & 1:
            z = (z << U32(1)) | (s & U32(1))
        return ZStream(z=z, dim=jnp.int32(0), log2_res=log2_res,
                       log2_spp=log2_spp, base4_digits=base4_digits)

    def _index(self):
        """Permuted sample index for the current dimension
        (samplers.metal:113-138)."""
        d = self.dim
        z_pi = jnp.zeros_like(self.z)
        last_digit = self.log2_spp & 1
        for j in range(last_digit, self.base4_digits):
            shift = self.base4_digits - j - 1
            x = self.z >> U32(2 * shift)
            digit = x & U32(3)
            prefix = x >> U32(2)
            row = _z_hash(prefix, d)
            digit = _PERM_FLAT[row * U32(4) + digit]
            z_pi = (z_pi << U32(2)) | digit
        if self.log2_spp & 1:
            digit = self.z & U32(1)
            z_pi = (z_pi << U32(1)) | (digit ^ (_z_hash(self.z >> U32(1), d) & U32(1)))
        return z_pi

    def next_1d(self):
        idx = self._index()
        v = _sobol(idx, _ZM1, self.dim)
        u = jnp.minimum(v.astype(jnp.float32) * np.float32(2.3283064365386963e-10),
                        ONE_MINUS_EPS)
        return replace(self, dim=self.dim + 1), u

    def next_2d(self):
        idx = self._index()
        v0 = _sobol(idx, _ZM1, self.dim)
        v1 = _sobol(idx, _ZM2, self.dim)
        scale = np.float32(2.3283064365386963e-10)
        u = jnp.minimum(
            jnp.stack([v0.astype(jnp.float32), v1.astype(jnp.float32)], -1) * scale,
            ONE_MINUS_EPS,
        )
        return replace(self, dim=self.dim + 1), u

    def skip(self, n: int):
        return replace(self, dim=self.dim + n)


jax.tree_util.register_dataclass(
    ZStream,
    data_fields=("z", "dim"),
    meta_fields=("log2_res", "log2_spp", "base4_digits"),
)
