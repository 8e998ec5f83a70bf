"""Attribute the round-3 Cornell regression (33.6 -> 53.3 ms/spp).

Cornell is shading-dominated (12 triangles, brute intersector), so the
fidelity campaign's extra per-bounce work shows up here at full strength
while the trace-dominated configs hid it (+2.8% on the colonnade,
perf/bench_mixture.py). Candidates: mixture_pdf's extra evaluate() per
bounce, oriented cosines, emitted_radiance changes.

Same-process A/B (the only comparison the tunnel allows — PERFORMANCE.md).
Usage: python perf/bench_cornell_ab.py
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _render_config  # noqa: E402

from platinum_tpu.app.scenes import make_cornell_scene  # noqa: E402
from platinum_tpu.render.types import RenderSettings  # noqa: E402


def main():
    scene, cam = make_cornell_scene()
    base = RenderSettings(width=512, height=512, spp=64, max_bounces=8,
                          kernel="mis", sampler="pcg4d")
    variants = [
        ("mixture_on (default)", base),
        ("mixture_off (reference estimator)",
         dataclasses.replace(base, mixture_pdf=False)),
    ]
    for name, st in variants:
        dt, rays, _, _, _ = _render_config(scene, cam, st, accel_min_tris=32,
                                           n_iters=6)
        print(f"{name}: {dt * 1e3:.2f} ms/spp "
              f"({rays / dt / 1e6:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
