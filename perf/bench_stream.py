"""On-chip A/B: HBM-streamed leaf blocks vs the incumbent designs.

Two same-process comparisons (the tunnel drifts ~30% between processes,
so only same-process numbers are comparable):

  1. Bistro-class colonnade (>=1M tris, beyond VMEM):
     partitioned multi-pass trace (today's default) vs ONE streamed
     structure. Streaming re-walks nothing, so it should win roughly by
     the partition count minus DMA overhead.
  2. Headline colonnade (~166k tris, fits VMEM):
     resident blocks vs streamed blocks. Measures the pure DMA cost of
     stream mode when it is not needed — if small, `stream="auto"`
     could become the default beyond-VMEM path with no downside.

Usage (relay up): python perf/bench_stream.py [quick]
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


def _bench(scene, cam, settings, n_iters, spp_per_call=2):
    import jax.numpy as jnp

    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render_step_n

    flat = flatten_scene(scene, cam, settings)
    feats = analyze_features(flat)
    # warm both the compile cache and the accumulator
    render_step_n(flat, settings, jnp.zeros((settings.num_pixels, 3)),
                  jnp.int32(0), spp_per_call, features=feats)

    def step(i):
        return render_step_n(flat, settings,
                             jnp.zeros((settings.num_pixels, 3)),
                             jnp.int32(spp_per_call * (i + 1)),
                             spp_per_call, features=feats)

    dt = _timeit(lambda i: step(i)[:1, :1], n_iters) / spp_per_call
    parts = len(flat.wbvh_parts) if flat.wbvh_parts else 1
    return dt, int(flat.geometry.indices.shape[0]), parts, flat.wbvh_stream


def main():
    quick = "quick" in sys.argv
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.render.types import RenderSettings

    n_iters = 2 if quick else 4

    # --- 1. beyond-VMEM: partitioned vs streamed -------------------------
    scene, cam = make_colonnade_scene(columns=24, rows=12)
    base = RenderSettings(width=960, height=540, spp=4, max_bounces=4,
                          kernel="mis", sampler="pcg4d", tracer="packet",
                          compact=True, instancing="off")
    for name, s in (("partitioned", base),
                    ("streamed", replace(base, stream="auto"))):
        dt, tris, parts, stream = _bench(scene, cam, s, n_iters)
        print(json.dumps({"config": "bistro_class", "mode": name,
                          "tris": tris, "partitions": parts,
                          "stream": bool(stream),
                          "ms_per_spp": round(dt * 1e3, 2)}), flush=True)

    # --- 2. fits-VMEM: resident vs streamed (pure DMA overhead) ----------
    scene, cam = make_colonnade_scene()
    base = RenderSettings(width=512, height=512, spp=4, max_bounces=4,
                          kernel="mis", sampler="pcg4d", tracer="packet",
                          compact=True, instancing="off")
    for name, s in (("resident", base),
                    ("streamed", replace(base, stream="on"))):
        dt, tris, parts, stream = _bench(scene, cam, s, n_iters * 2)
        print(json.dumps({"config": "headline_512", "mode": name,
                          "tris": tris, "stream": bool(stream),
                          "ms_per_spp": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
