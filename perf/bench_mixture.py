"""Same-process A/B: the e2e cost of mixture-pdf MIS on the headline config.

settings.mixture_pdf (default ON) adds one evaluate() per bounce in
exchange for an exact MIS partition of unity (furnace 8.9e-4 vs -5.8e-3).
Stage-level numbers (perf/bench_shade_stages.py) put evaluate() at
~4.7 ms per 262k wave (~5% of a bounce), but XLA CSEs the shared
subexpressions with sample(), so the true fused e2e delta is unknown
until measured here. COVERAGE.md's round-4 queue: if the delta is
significant, specialize — though note the CSE argument says the extra
work is exactly the irreducible new math at the sampled direction.

Usage (relay up): python perf/bench_mixture.py [spp_per_call] [iters]
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _timeit(fn, n_iters, repeats=2):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n_iters):
            out = fn(i)
        float(np.asarray(out).ravel()[0])   # forced fetch; see bench.py
        dt = (time.perf_counter() - t0) / n_iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax.numpy as jnp

    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render_step_n
    from platinum_tpu.render.types import RenderSettings

    spp_per_call = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    scene, cam = make_colonnade_scene()
    base = RenderSettings(width=512, height=512, spp=16, max_bounces=8,
                          kernel="mis", sampler="pcg4d", tracer="packet",
                          compact=True, instancing="off")
    results = {}
    for name, mix in (("mixture_pdf=True", True), ("mixture_pdf=False", False)):
        settings = dataclasses.replace(base, mixture_pdf=mix)
        flat = flatten_scene(scene, cam, settings)
        feats = analyze_features(flat)
        accum = render_step_n(flat, settings,
                              jnp.zeros((settings.num_pixels, 3)),
                              jnp.int32(0), spp_per_call, features=feats)

        def step(i, _f=flat, _s=settings, _ft=feats):
            nonlocal accum
            accum = render_step_n(_f, _s, accum,
                                  jnp.int32((i + 1) * spp_per_call),
                                  spp_per_call, features=_ft)
            return accum[:1]

        dt = _timeit(step, iters) / spp_per_call
        results[name] = dt * 1e3
        print(f"{name}: {dt * 1e3:.1f} ms/spp", flush=True)

    a, b = results["mixture_pdf=True"], results["mixture_pdf=False"]
    print(f"delta: {a - b:+.1f} ms/spp ({(a / b - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
