"""Decide the production default for mt_precision (VERDICT r4 #5).

mt_precision="high" (bf16x3 3-pass MT matmuls) measured -13% e2e on the
headline with oracle-matching hit sets on converged frames
(perf/bench_precision.py). Decision rule per the verdict: if CONVERGED
images under "high" hold <= 1e-3 RMSE against "highest" (the fidelity
bar), make "high" the default; goldens/oracle tests keep "highest"
pinned. This renders golden-class configs at converged spp under both
tiers with identical sampler streams — the RMSE is pure intersection
drift.

Usage: python perf/bench_mt_default.py
"""

import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax.numpy as jnp

    from platinum_tpu.app.scenes import (
        make_colonnade_scene, make_helmet_scene, make_spheres_scene)
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    configs = {
        "spheres_128_128spp": (make_spheres_scene(grid=4), RenderSettings(
            width=128, height=128, spp=128, max_bounces=4, kernel="mis",
            sampler="halton", tracer="packet")),
        "colonnade_128_64spp": (make_colonnade_scene(columns=6, rows=3),
                                RenderSettings(
            width=128, height=128, spp=64, max_bounces=6, kernel="mis",
            sampler="halton", tracer="packet", instancing="off")),
    }
    worst = 0.0
    for name, ((scene, cam), settings) in configs.items():
        imgs = {}
        for tier in ("highest", "high"):
            s = replace(settings, mt_precision=tier)
            flat = flatten_scene(scene, cam, s, accel_min_tris=1)
            t0 = time.time()
            imgs[tier] = np.asarray(render(
                flat, s, features=analyze_features(flat)))
            print(f"# {name} {tier}: {time.time() - t0:.1f}s "
                  f"mean {imgs[tier].mean():.5f}", flush=True)
        rmse = float(np.sqrt(np.mean(
            (imgs["high"] - imgs["highest"]) ** 2)))
        worst = max(worst, rmse)
        print({"config": name, "rmse_high_vs_highest": rmse}, flush=True)
    verdict = "high CAN be default" if worst <= 1e-3 else \
        "high exceeds the 1e-3 bar — keep highest"
    print({"worst_rmse": worst, "decision": verdict}, flush=True)


if __name__ == "__main__":
    main()
