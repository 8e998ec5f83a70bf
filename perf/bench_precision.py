"""On-chip A/B: MT block-matmul precision (MXU fp32 pass count).

The (10,256)x(10,128) Möller-Trumbore matmuls run at
Precision.HIGHEST = 6 bf16 passes for fp32-exact results (the brute
oracle is fp32). "high" (a hand-built bf16x3 decomposition — Mosaic
lowers only HIGHEST/DEFAULT, so Ah·Bh + Ah·Bl + Al·Bh at 3 passes)
and DEFAULT (1 pass) trade exactness for MXU issue count. MT is ~50%
of the incoherent superstep cost, so if the kernel is MXU-issue-bound
there is up to ~25-40%% e2e at stake; if it is dependent-chain-latency
bound, the pass count should barely matter — this measures which.

Reports, per precision tier, same-process: headline ms/spp and the
image RMSE vs the HIGHEST render (equal sampler streams, so the RMSE is
purely intersection drift — the fidelity cost of the speedup).

"two_phase" (round 5) adds the 4-pass bf16x3 broad + exact-fp32-refine
tier whose hit sets are EXACT (rmse vs highest must read ~0).

Usage (relay up): python perf/bench_precision.py [quick]
"""

import json
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, "/root/repo")


def _timeit(fn, n_iters, repeats=2):
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
    quick = "quick" in sys.argv
    import jax.numpy as jnp

    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render_step_n
    from platinum_tpu.render.types import RenderSettings

    n_iters = 2 if quick else 4
    spp_per_call = 2
    scene, cam = make_colonnade_scene()
    base = RenderSettings(width=512, height=512, spp=8, max_bounces=4,
                          kernel="mis", sampler="pcg4d", tracer="packet",
                          compact=True, instancing="off")
    ref_img = None
    for prec in ("highest", "two_phase", "high", "default"):
        s = replace(base, mt_precision=prec)
        flat = flatten_scene(scene, cam, s)
        feats = analyze_features(flat)
        img = render_step_n(flat, s, jnp.zeros((s.num_pixels, 3)),
                            jnp.int32(0), 8, features=feats)
        img = np.asarray(img)
        if ref_img is None:
            ref_img = img
        rmse = float(np.sqrt(np.mean((img - ref_img) ** 2)))

        def step(i):
            return render_step_n(flat, s, jnp.zeros((s.num_pixels, 3)),
                                 jnp.int32(8 + spp_per_call * (i + 1)),
                                 spp_per_call, features=feats)

        dt = _timeit(lambda i: step(i)[:1, :1], n_iters) / spp_per_call
        print(json.dumps({"mt_precision": prec,
                          "ms_per_spp": round(dt * 1e3, 2),
                          "rmse_vs_highest_8spp": round(rmse, 6)}),
              flush=True)


if __name__ == "__main__":
    main()
