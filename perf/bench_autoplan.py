"""Compaction-schedule A/B: static plan vs measured compact_plan="auto".

Measured live fractions (perf/live_fractions.py) show the static
halve-every-2-bounces plan leaves 4-5x oversized waves on the bench
scenes (helmet collapses to 0.017 live after bounce ONE). This times
dense vs static-compact vs auto-plan on the three shading-heavy BENCH
configs, same-process (tunnel windows drift between processes).

Usage: python perf/bench_autoplan.py [sponza|spheres|helmet ...]
"""

import json
import sys
from dataclasses import replace

sys.path.insert(0, "/root/repo")

from bench import _render_config  # noqa: E402
from platinum_tpu.app.scenes import (  # noqa: E402
    make_colonnade_scene, make_helmet_scene, make_spheres_scene)
from platinum_tpu.render.types import RenderSettings  # noqa: E402


def run(name, scene_cam, settings, spc, n_iters=4):
    scene, cam = scene_cam
    try:
        dt, rays, _, _, _ = _render_config(scene, cam, settings,
                                           n_iters=n_iters, spp_per_call=spc)
    except Exception as e:  # noqa: BLE001
        print(f"# {name} FAILED: {type(e).__name__}: {e}", flush=True)
        return
    r = {"config": name, "ms_per_spp": round(dt * 1e3, 2),
         "mrays_per_sec": round(rays / dt / 1e6, 3)}
    print(json.dumps(r), flush=True)


CONFIGS = {
    "sponza": (make_colonnade_scene, RenderSettings(
        width=512, height=512, spp=16, max_bounces=8, kernel="mis",
        sampler="pcg4d", tracer="packet", instancing="off"), 4),
    "spheres": (make_spheres_scene, RenderSettings(
        width=512, height=512, spp=256, max_bounces=6, kernel="mis",
        sampler="pcg4d", tracer="packet"), 4),
    "helmet": (make_helmet_scene, RenderSettings(
        width=1920, height=1080, spp=16, max_bounces=6, kernel="mis",
        sampler="pcg4d", tracer="packet"), 2),
}


def headroom_ablation(name):
    """Sweep the auto-plan headroom factor on one config: lower headroom
    = smaller waves but more HT truncation variance (still unbiased)."""
    from platinum_tpu.render import autoplan
    from platinum_tpu.render.flatten import flatten_scene

    make, base, spc = CONFIGS[name]
    scene, cam = make()
    s = replace(base, compact=True)
    flat = flatten_scene(scene, cam, s)
    live = autoplan.measure_live_fractions(flat, s)
    print("# live:", " ".join(f"{v:.4f}" for v in live), flush=True)
    n = s.num_pixels
    for hr in (1.1, 1.5, 2.5):
        plan = autoplan.plan_from_live(live, n, s.max_bounces, headroom=hr)
        print(f"# headroom {hr}: {plan}", flush=True)
        run(f"{name}_hr{hr}", (scene, cam),
            replace(s, compact_plan=plan), spc)


def main():
    which = sys.argv[1:] or list(CONFIGS)
    if which[0] == "headroom":
        headroom_ablation(which[1] if len(which) > 1 else "helmet")
        return
    for name in which:
        make, base, spc = CONFIGS[name]
        sc = make()
        run(f"{name}_dense", sc, base, spc)
        run(f"{name}_static", sc, replace(base, compact=True), spc)
        run(f"{name}_auto", sc,
            replace(base, compact=True, compact_plan="auto"), spc)
        run(f"{name}_dense_b", sc, base, spc)


if __name__ == "__main__":
    main()
