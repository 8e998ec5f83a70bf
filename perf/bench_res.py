"""Headline resolution A/B: Sponza-class colonnade at 512x512 vs 1920x1080.

BASELINE.json's north star names "Sponza, 1080p"; the bench headline has
been running 512x512 since round 1. Bigger waves amortise fixed per-wave
costs (grid-step machinery ~5 ms/wave, sorts, dispatch) and denser pixel
sampling tightens packet coherence, so the per-ray number may differ.
Same-process A/B (tunnel windows drift ~30% between processes).

Usage: python perf/bench_res.py            # on chip
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import _render_config  # noqa: E402
from platinum_tpu.app.scenes import make_colonnade_scene  # noqa: E402
from platinum_tpu.render.types import RenderSettings  # noqa: E402


def main():
    scene, cam = make_colonnade_scene()
    out = []
    for name, w, h, spc in (("sponza_512", 512, 512, 4),
                            ("sponza_1080p", 1920, 1080, 2),
                            ("sponza_512_b", 512, 512, 4)):
        s = RenderSettings(width=w, height=h, spp=16, max_bounces=8,
                           kernel="mis", sampler="pcg4d", tracer="packet",
                           compact=True, compact_plan="auto",
                           instancing="off")
        dt, rays, _, _, _ = _render_config(scene, cam, s, n_iters=4,
                                           spp_per_call=spc)
        r = {"config": name, "ms_per_spp": round(dt * 1e3, 2),
             "mrays_per_sec": round(rays / dt / 1e6, 3),
             "rays_per_spp": rays}
        out.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
