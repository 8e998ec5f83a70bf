"""Does (R, 3) vector layout waste the VPU's 128-lane axis?

The whole shading stack operates on (R, 3) arrays. TPU tiling puts the
minor-most axis on the 128-wide lane dimension, so a (R, 3) elementwise op
may use 3/128 lanes (~2.3%). This probe times an identical ~30-op vec3
chain (cross/dot/normalize/select, then a GGX-like transcendental mix) in
three layouts: (R, 3) row-vectors, (3, R) component-major, and unpacked
(R,) component arrays. If the gap is large, shading should go
component-major.

Usage: python perf/bench_layout.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

R = 262144


def _timeit(fn, *args, iters=20):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def chain_rows(a, b, c):
    # (R, 3) convention, axis=-1
    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-20)
    h = norm(a + b)
    n = norm(jnp.cross(a, b))
    ndh = jnp.sum(n * h, -1, keepdims=True)
    f = c + (1.0 - c) * (1.0 - jnp.abs(ndh)) ** 5
    w = jnp.where(ndh > 0, f * h, c * n)
    g = jnp.exp(-jnp.abs(ndh)) * jnp.sqrt(jnp.abs(w))
    return jnp.sum(g * norm(w + h), -1)


def chain_comp(ax, ay, az, bx, by, bz, cx, cy, cz):
    # unpacked component (R,) convention
    def norm3(x, y, z):
        inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
        return x * inv, y * inv, z * inv
    hx, hy, hz = norm3(ax + bx, ay + by, az + bz)
    nx, ny, nz = norm3(ay * bz - az * by, az * bx - ax * bz,
                       ax * by - ay * bx)
    ndh = nx * hx + ny * hy + nz * hz
    one_m = (1.0 - jnp.abs(ndh)) ** 5
    fx = cx + (1.0 - cx) * one_m
    fy = cy + (1.0 - cy) * one_m
    fz = cz + (1.0 - cz) * one_m
    pos = ndh > 0
    wx = jnp.where(pos, fx * hx, cx * nx)
    wy = jnp.where(pos, fy * hy, cy * ny)
    wz = jnp.where(pos, fz * hz, cz * nz)
    e = jnp.exp(-jnp.abs(ndh))
    gx = e * jnp.sqrt(jnp.abs(wx))
    gy = e * jnp.sqrt(jnp.abs(wy))
    gz = e * jnp.sqrt(jnp.abs(wz))
    sx, sy, sz = norm3(wx + hx, wy + hy, wz + hz)
    return gx * sx + gy * sy + gz * sz


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))

    f_rows = jax.jit(chain_rows)
    f_comp = jax.jit(chain_comp)
    print({"layout": "(R,3) rows", "ms": round(_timeit(f_rows, a, b, c), 3)})
    comps = [jnp.asarray(np.asarray(x)[:, i].copy())
             for x in (a, b, c) for i in (0, 1, 2)]
    print({"layout": "(R,) comps", "ms": round(_timeit(f_comp, *comps), 3)})
    at, bt, ct = (jnp.asarray(np.asarray(x).T.copy()) for x in (a, b, c))
    f_rowsT = jax.jit(lambda a, b, c: chain_rows(a.T, b.T, c.T))
    print({"layout": "(3,R) via T", "ms": round(_timeit(f_rowsT, at, bt, ct),
                                                3)})


if __name__ == "__main__":
    main()
