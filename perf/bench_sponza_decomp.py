"""E2E-variant decomposition for the HEADLINE sponza config.

Every variant is a full fused render_sample program (so XLA fusion is
preserved and comparisons are valid, unlike stage-isolated timings);
differences between variants localize where the 634 ms/spp goes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from dataclasses import replace

from platinum_tpu.app.scenes import make_colonnade_scene
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.integrator import make_tracers, render_sample
from platinum_tpu.render.types import RenderSettings


def _timeit(fn, n_iters=3, repeats=2):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n_iters):
            out = fn(i)
        float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / n_iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    scene, cam = make_colonnade_scene()
    base = RenderSettings(width=512, height=512, spp=1, max_bounces=8,
                          kernel="mis", sampler="pcg4d", tracer="packet",
                          compact=True, instancing="off")
    flat = flatten_scene(scene, cam, base, accel_min_tris=1)
    feats = analyze_features(flat)
    print("# features:", sorted(feats), flush=True)

    def run(name, settings, features=feats):
        f = jax.jit(lambda fl, i: render_sample(fl, settings, i,
                                                features=features))
        t0 = time.perf_counter()
        np.asarray(f(flat, jnp.int32(0)))
        c = time.perf_counter() - t0
        dt = _timeit(lambda i: f(flat, jnp.int32(i)))
        print({"cfg": name, "ms": round(dt * 1e3, 1),
               "compile_s": round(c, 1)}, flush=True)

    run("full_compact", base)
    run("full_dense", replace(base, compact=False))
    run("fuse_shadow", replace(base, fuse_shadow=True))
    run("chunk4096", replace(base, compact=False, chunk_shade=4096))
    run("chunk8192", replace(base, compact=False, chunk_shade=8192))
    run("chunk8192+fuse", replace(base, compact=False, chunk_shade=8192,
                                  fuse_shadow=True))
    run("simple_kernel(no NEE)", replace(base, kernel="simple"))
    run("bounces2", replace(base, max_bounces=2, compact=False))
    run("bounces4", replace(base, max_bounces=4, compact=False))

    # trace-only: 8 sequential closest waves from the camera
    tc, _ = make_tracers(flat, base)
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    n = 512 * 512
    px = jnp.arange(n, dtype=jnp.uint32) % 512
    py = jnp.arange(n, dtype=jnp.uint32) // 512
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.full((n, 2), 0.5), jnp.full((n, 2), 0.5))

    def trace8(i):
        t = None
        for _ in range(8):
            rec = tc(o, d, 1e-3, jnp.inf)
            t = rec.t
        return t

    jt = jax.jit(trace8)
    np.asarray(jt(0))
    dt = _timeit(lambda i: jt(i))
    print({"cfg": "trace8_primary", "ms": round(dt * 1e3, 1)}, flush=True)


if __name__ == "__main__":
    main()
