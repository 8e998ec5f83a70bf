"""Shading-cost decomposition for the spheres (GGX-sweep) config.

Times one full render_sample vs ablations (no textures, BSDF-only kernel,
trace-only) to locate where shading time goes before optimizing it.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from platinum_tpu.app.scenes import make_spheres_scene
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
    scene, cam = make_spheres_scene()
    base = RenderSettings(width=512, height=512, spp=1, max_bounces=8,
                          kernel="mis", sampler="pcg4d", tracer="packet")
    flat = flatten_scene(scene, cam, base, accel_min_tris=1)
    feats = analyze_features(flat)
    print("# features:", sorted(feats), flush=True)

    def run(name, settings, features):
        f = jax.jit(lambda fl, i: render_sample(fl, settings, i,
                                                features=features))
        t0 = time.perf_counter()
        np.asarray(f(flat, jnp.int32(0)))
        c = time.perf_counter() - t0
        dt = _timeit(lambda i: f(flat, jnp.int32(i)))
        print({"cfg": name, "ms": round(dt * 1e3, 1),
               "compile_s": round(c, 1)}, flush=True)

    run("full", base, feats)
    run("no_tex", base, frozenset(f for f in feats
                                  if not f.startswith("texslot")))
    run("simple_kernel", RenderSettings(width=512, height=512, spp=1,
                                        max_bounces=8, kernel="simple",
                                        sampler="pcg4d", tracer="packet"),
        feats)
    run("bounces2", RenderSettings(width=512, height=512, spp=1,
                                   max_bounces=2, kernel="mis",
                                   sampler="pcg4d", tracer="packet"), feats)

    # trace-only: camera rays through the packet tracer, 8 waves
    tc, _ = make_tracers(flat, base)
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    n = 512 * 512
    px = jnp.arange(n, dtype=jnp.uint32) % 512
    py = jnp.arange(n, dtype=jnp.uint32) // 512
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.full((n, 2), 0.5), jnp.full((n, 2), 0.5))

    def trace8(i):
        t = None
        oo, dd = o, d
        for _ in range(8):
            rec = tc(oo, dd, 1e-3, jnp.inf)
            t = rec.t
        return t

    jt = jax.jit(trace8)
    np.asarray(jt(0))
    dt = _timeit(lambda i: jt(i))
    print({"cfg": "trace8_primary", "ms": round(dt * 1e3, 1)}, flush=True)


if __name__ == "__main__":
    main()
