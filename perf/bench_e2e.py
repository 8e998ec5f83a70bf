"""End-to-end colonnade probe: one full MIS render_sample (8 bounces),
instanced vs baked, plus raw traversal — quick readout after kernel work.

Usage: python perf/bench_e2e.py [instanced|baked|trace ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

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
    which = sys.argv[1:] or ["trace", "baked", "instanced"]
    scene, cam = make_colonnade_scene()
    for mode in which:
        inst = "on" if mode == "instanced" else "off"
        settings = RenderSettings(width=512, height=512, spp=1, max_bounces=8,
                                  kernel="mis", sampler="pcg4d",
                                  tracer="packet", compact=True,
                                  instancing=inst)
        t0 = time.perf_counter()
        flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
        t_flat = time.perf_counter() - t0
        if mode == "trace":
            from platinum_tpu.models.camera_rays import spawn_camera_rays

            tc, ta = make_tracers(flat, settings)
            n = 512 * 512
            px = jnp.arange(n, dtype=jnp.uint32) % 512
            py = jnp.arange(n, dtype=jnp.uint32) // 512
            o, d = spawn_camera_rays(flat.camera, px, py,
                                     jnp.full((n, 2), 0.5),
                                     jnp.full((n, 2), 0.5))
            rng = np.random.default_rng(0)
            perm = rng.permutation(n)
            oi = jnp.asarray(np.asarray(o)[perm])
            di = np.asarray(d)[perm] + rng.normal(0, 0.35, (n, 3)).astype(
                np.float32)
            di = jnp.asarray(di / np.linalg.norm(di, axis=-1, keepdims=True))
            jc = jax.jit(lambda o, d: tc(o, d, 1e-3, jnp.inf).t)
            t0 = time.perf_counter()
            jc(o, d).block_until_ready()
            cs = time.perf_counter() - t0
            p = _timeit(lambda i: jc(o, d), 4)
            q = _timeit(lambda i: jc(oi, di), 4)
            print({"cfg": "trace", "compile_s": round(cs, 1),
                   "primary_ms": round(p * 1e3, 2),
                   "primary_mrays": round(n / p / 1e6, 2),
                   "incoher_ms": round(q * 1e3, 2),
                   "incoher_mrays": round(n / q / 1e6, 2)}, flush=True)
            continue
        feats = analyze_features(flat)
        f = jax.jit(lambda fl, i: render_sample(fl, settings, i,
                                                features=feats,
                                                return_stats=True))
        t0 = time.perf_counter()
        _, rays = f(flat, jnp.int32(0))
        rays = float(np.asarray(rays))
        cs = time.perf_counter() - t0
        dt = _timeit(lambda i: f(flat, jnp.int32(i))[0])
        print({"cfg": mode, "flatten_s": round(t_flat, 1),
               "compile_s": round(cs, 1), "ms_per_spp": round(dt * 1e3, 1),
               "mrays": round(rays / dt / 1e6, 2)}, flush=True)


if __name__ == "__main__":
    main()
