"""Benchmark: the five BASELINE.md configurations on the real chip.

Prints one JSON line per config ("#"-prefixed context lines aside) and ends
with exactly ONE bare JSON line: the headline metric (Sponza-class ray
throughput, the number BASELINE.json's north star names — >= 100
Mrays/sec/chip). Detailed results go to BENCH_DETAIL.json, updated after
every config.

Delivery guarantees (round 3 shipped rc=124 with zero output — a cold
compile cache starved the whole capture before the first config printed):

- Every config runs in its OWN SUBPROCESS with a hard timeout: a native
  crash or a hung compile/tunnel loses that config, never the capture.
- A GLOBAL wall-clock budget (BENCH_BUDGET_S, default 1500 s) with
  SIGALRM + SIGTERM handlers: whatever happens, the final metric line is
  flushed from the results accumulated so far before the driver's timeout
  can hit.
- The FASTEST config (Cornell, brute intersector, small compile) runs
  first so something prints within minutes even on a cold cache; the
  headline runs second.
- Compiles are shared across config subprocesses via the persistent
  compilation cache (utils/cache.py), so a warm run fits easily.
- Each result carries a `cfg` fingerprint (settings + flattened-scene
  stats) so silent scene drift between rounds is detectable
  (BENCH_DETAIL.json diffs).

Methodology: best half of timed iterations (tunnel variance); multi-spp
batching per device program (the remote-TPU tunnel costs up to ~28 ms per
dispatch); wavefront compaction plans measured per scene (render/autoplan).

Env knobs: BENCH_CONFIGS=comma list (default all), BENCH_ITERS,
BENCH_BUDGET_S, BENCH_CONFIG_TIMEOUT_S.
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

HEADLINE = "sponza_class_512"
HEADLINE_LABEL = "Sponza-class 271k tris, 512x512, MIS, 8 bounces"

# Execution order: fastest-to-print first, headline second, then by value.
CONFIG_ORDER = [
    "cornell_512",
    HEADLINE,
    "sponza_class_512_mt3_knob",
    "metalrough_spheres",
    "metalrough_spheres_gmon",
    "helmet_env_1080p",
    "studio_loop",
    "sponza_instanced_512",
    "bistro_class_studio",
]


# --------------------------------------------------------------------------
# Child-side measurement
# --------------------------------------------------------------------------

def _timeit(fn, n_iters, repeats=2):
    """Time n_iters calls as one batch ending in a FORCED value fetch —
    block_until_ready does not reliably block through the axon tunnel, so
    per-call timings read ~0 in healthy windows. Min over repeats."""
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


def _fingerprint(settings, flat) -> str:
    """Config hash: settings plus flattened-scene stats, so a silently
    drifted scene (round 2's broken-helmet incident) changes the hash."""
    stats = [
        repr(settings),
        str(flat.geometry.indices.shape if flat.geometry is not None else 0),
        str(getattr(flat.lights, "n_lights", None)),
        str(len(flat.wbvh_parts) if flat.wbvh_parts else 0),
        str(bool(flat.wbvh_stream)),
    ]
    return hashlib.sha256("|".join(stats).encode()).hexdigest()[:12]


def _render_config(scene, cam, settings, features=None, accel_min_tris=1,
                   n_iters=6, spp_per_call=4):
    """Returns (sec_per_sample, rays_per_sample, flat, feats, accum)."""
    import jax
    import jax.numpy as jnp

    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render_sample, render_step_n

    flat = flatten_scene(scene, cam, settings, accel_min_tris=accel_min_tris)
    feats = features or analyze_features(flat)
    if settings.compact_plan == "auto":
        from platinum_tpu.render.autoplan import resolve_auto_plan

        settings = resolve_auto_plan(flat, settings)
        print(f"# measured compact_plan: {settings.compact_plan}",
              flush=True)

    @jax.jit
    def stats(fl):
        return render_sample(fl, settings, jnp.int32(0), return_stats=True,
                             features=feats)[1]

    rays_per_sample = float(stats(flat))

    accum = jnp.zeros((settings.num_pixels, 3))
    accum = render_step_n(flat, settings, accum, jnp.int32(0), spp_per_call,
                          features=feats)  # compile + warm

    def step(i):
        nonlocal accum
        accum = render_step_n(flat, settings, accum,
                              jnp.int32((i + 1) * spp_per_call),
                              spp_per_call, features=feats)
        return accum[:1]

    dt = _timeit(step, n_iters) / spp_per_call
    return dt, rays_per_sample, flat, feats, accum


def _measure(scene_cam, settings, n_iters, **kw):
    scene, cam = scene_cam
    dt, rays, flat, _, _ = _render_config(scene, cam, settings,
                                          n_iters=n_iters, **kw)
    return {
        "ms_per_spp": round(dt * 1e3, 2),
        "spp_per_sec": round(1.0 / dt, 2),
        "mrays_per_sec": round(rays / dt / 1e6, 3),
        "cfg": _fingerprint(settings, flat),
    }


def _via_foreign_glb(scene_cam, tag: str):
    """Round-trip a scene through an on-disk .glb and the real import path
    (io/gltf.py), using the FOREIGN-layout writer (interleaved 36-byte
    strides, compacted multi-primitive meshes, u8/u16 indices, non-indexed
    small prims, TRS-quaternion nodes) so the benched configuration
    exercises the loader against a file layout it didn't originate
    (VERDICT r3 missing #2). Environment and camera physics aren't part of
    glTF and are carried over from the source scene."""
    import copy
    import tempfile

    from platinum_tpu.core.scene import Scene
    from platinum_tpu.io.gltf import load_gltf
    from platinum_tpu.tools.foreign_glb import export_glb_foreign

    scene, cam_id = scene_cam
    # per-run unique dir: concurrent bench runs on a shared /tmp must not
    # race on the same path or load a half-written file
    path = os.path.join(tempfile.mkdtemp(prefix="ptpu-bench-"),
                        f"bench_{tag}.glb")
    export_glb_foreign(scene, path)
    print(f"# {tag}: exported {os.path.getsize(path)/1e6:.1f} MB foreign "
          f".glb, loading via io/gltf.py", flush=True)
    loaded = Scene()
    load_gltf(loaded, path)
    node_id = loaded.get_cameras()[0][0]
    loaded.node(node_id).camera = copy.copy(scene.node(cam_id).camera)
    loaded.environment = copy.copy(scene.environment)
    tid = scene.environment.texture_id
    if tid is not None:
        loaded.environment.texture_id = loaded.add_asset(
            scene.asset(tid), retained=True)
    return loaded, node_id


def _edit_loop_cadence(scene, cam, settings, scale=4, frames=4):
    """Edit-loop frame cadence with the preview ladder (VERDICT r4 #5):
    median ms per (render + readback) preview frame at 1/scale res — the
    number the user feels while orbiting/editing a heavy scene. Target
    <= 300 ms (reference: 1 full-res spp/frame interactive,
    renderer_pt.cpp:131-158)."""
    import dataclasses
    import time as _t

    from platinum_tpu.render.renderer import Renderer

    r = Renderer(scene)
    r.start_render(cam, dataclasses.replace(settings, spp=max(settings.spp,
                                                              frames + 1)),
                   preview_scale=scale, preview_spp=frames)
    r.render()          # compile + frame 0
    r.readback()
    times = []
    while r._pv is not None and r._pv["done"] < r._pv["spp"]:
        t0 = _t.perf_counter()
        r.render()
        r.readback()
        times.append((_t.perf_counter() - t0) * 1e3)
    times.sort()
    return round(times[len(times) // 2], 1) if times else None


def run_one_config(name: str, n_iters: int) -> dict:
    """Child-side: run a single named config, return its result dict."""
    import jax
    import jax.numpy as jnp

    from platinum_tpu.app.scenes import (
        make_colonnade_scene,
        make_cornell_scene,
        make_helmet_scene,
    )
    from platinum_tpu.render.types import RenderSettings

    if name == "cornell_512":
        # Cornell box, 512x512, Lambert + single light + NEE. tracer=auto
        # picks the dense brute intersector for 12 triangles — the honest
        # best algorithm at this size (the BVH path is timed by the rest).
        return _measure(make_cornell_scene(), RenderSettings(
            width=512, height=512, spp=64, max_bounces=8, kernel="mis",
            sampler="halton"), n_iters, accel_min_tris=32)

    if name == HEADLINE:
        # Sponza-class (colonnade, 271k tris, 216 lights), deep BVH,
        # wavefront compaction stressed. instancing="off" is measured
        # faster for the headline (~10%); the instanced path is benched
        # separately. compact_plan="auto" compiles the compaction schedule
        # to the scene's measured per-bounce live fractions.
        return _measure(
            _via_foreign_glb(make_colonnade_scene(), "sponza"),
            RenderSettings(
                width=512, height=512, spp=16, max_bounces=8, kernel="mis",
                sampler="halton", tracer="packet", compact=True,
                instancing="off", compact_plan="auto"), n_iters)

    if name == "sponza_class_512_mt3_knob":
        # HEADLINE KNOB (clearly labeled, NOT the headline number): same
        # config with mt_precision="high" — the bf16x3 3-pass MT tier
        # (measured -13%, borderline-hit drift only).
        return _measure(make_colonnade_scene(), RenderSettings(
            width=512, height=512, spp=16, max_bounces=8, kernel="mis",
            sampler="halton", tracer="packet", compact=True,
            instancing="off", compact_plan="auto", mt_precision="high"),
            n_iters)

    if name == "metalrough_spheres":
        # Full GGX sweep + normal mapping, 256 spp, loaded back through the
        # real glTF import path.
        from platinum_tpu.app.scenes import make_spheres_scene

        return _measure(
            _via_foreign_glb(make_spheres_scene(), "spheres"),
            RenderSettings(
            width=512, height=512, spp=256, max_bounces=6, kernel="mis",
            sampler="halton", tracer="packet", compact=True,
            compact_plan="auto"), n_iters)

    if name == "metalrough_spheres_gmon":
        # GMoN robust estimator END-TO-END (the reference defaults GMoN ON
        # with 15 buckets, pt_viewport.hpp:79-101; combine gmon.metal:14-55):
        # per-bucket accumulators + Gini-trimmed combine through the full
        # Renderer pipeline on chip (VERDICT r4 #4).
        from platinum_tpu.app.scenes import make_spheres_scene
        from platinum_tpu.render.renderer import Renderer
        from platinum_tpu.render.types import FLAG_GMON

        scene, cam = make_spheres_scene()
        settings = RenderSettings(
            width=512, height=512, spp=32, max_bounces=6, kernel="mis",
            sampler="halton", tracer="packet", compact=True,
            compact_plan="auto", flags=FLAG_GMON, gmon_buckets=8)
        r = Renderer(scene)
        r.start_render(cam, settings=settings)
        r.render()  # compile + first bucket step
        t0 = time.perf_counter()
        while not (r.status & 4):   # DONE
            r.render()
        img = r.readback()          # forced fetch through the GMoN combine
        dt = (time.perf_counter() - t0) / max(settings.spp - 1, 1)
        assert np.isfinite(img).all() and img.mean() > 0.0
        return {"ms_per_spp": round(dt * 1e3, 2),
                "spp_per_sec": round(1.0 / dt, 2),
                "gmon_buckets": settings.gmon_buckets,
                "cfg": _fingerprint(settings, r.flat)}

    if name == "helmet_env_1080p":
        return _measure(
            _via_foreign_glb(make_helmet_scene(), "helmet"),
            RenderSettings(
                width=1920, height=1080, spp=16, max_bounces=6, kernel="mis",
                sampler="halton", tracer="packet", compact=True,
                compact_plan="auto"), n_iters, spp_per_call=2)

    if name == "sponza_instanced_512":
        # Two-level TLAS/BLAS instancing path (geometry memory O(meshes),
        # transform edits refit without rebuild).
        return _measure(make_colonnade_scene(), RenderSettings(
            width=512, height=512, spp=16, max_bounces=8, kernel="mis",
            sampler="halton", tracer="packet", compact=True,
            instancing="on"), n_iters)

    if name == "studio_loop":
        # Progressive accumulate + tonemap + PNG export.
        from platinum_tpu.app.scenes import make_colonnade_scene
        from platinum_tpu.io.png import write_png
        from platinum_tpu.post.options import PostProcessOptions
        from platinum_tpu.post.pipeline import postprocess_jit
        from platinum_tpu.render.flatten import analyze_features, flatten_scene
        from platinum_tpu.render.integrator import render_step_n

        scene, cam = make_colonnade_scene()
        settings = RenderSettings(width=960, height=540, spp=8,
                                  max_bounces=6, kernel="mis",
                                  sampler="halton", tracer="packet",
                                  compact=True)
        flat = flatten_scene(scene, cam, settings)
        feats = analyze_features(flat)
        opts = PostProcessOptions()
        accum = jnp.zeros((settings.num_pixels, 3))
        accum = render_step_n(flat, settings, accum, jnp.int32(0), 2,
                              features=feats)

        def loop(i):
            nonlocal accum
            accum = render_step_n(flat, settings, accum,
                                  jnp.int32(2 * (i + 1)), 2, features=feats)
            return postprocess_jit(
                accum.reshape(settings.height, settings.width, 3), opts,
                settings.working_space, settings.output_space)

        img = loop(0)
        dt = _timeit(lambda i: loop(i)[:1, :1], n_iters) / 2
        write_png("/tmp/bench_studio.png", np.asarray(img))
        interact = _edit_loop_cadence(scene, cam, settings)
        return {"ms_per_spp": round(dt * 1e3, 2),
                "spp_per_sec": round(1.0 / dt, 2),
                "interact_ms_per_frame": interact,
                "cfg": _fingerprint(settings, flat)}

    if name == "bistro_class_studio":
        # >=1M-triangle colonnade variant: exceeds the VMEM-resident limit,
        # exercises the beyond-VMEM stream path (HBM leaf blocks DMA-staged
        # at trace time).
        from platinum_tpu.app.scenes import make_colonnade_scene
        from platinum_tpu.render.flatten import analyze_features, flatten_scene
        from platinum_tpu.render.integrator import render_step_n

        scene, cam = make_colonnade_scene(columns=24, rows=12)
        settings = RenderSettings(width=960, height=540, spp=4,
                                  max_bounces=4, kernel="mis",
                                  sampler="halton", tracer="packet",
                                  compact=True, instancing="off")
        flat = flatten_scene(scene, cam, settings)
        feats = analyze_features(flat)
        accum = jnp.zeros((settings.num_pixels, 3))
        accum = render_step_n(flat, settings, accum, jnp.int32(0), 2,
                              features=feats)

        def bloop(i):
            return render_step_n(flat, settings,
                                 jnp.zeros((settings.num_pixels, 3)),
                                 jnp.int32(2 * (i + 1)), 2, features=feats)

        dt = _timeit(lambda i: bloop(i), max(2, n_iters // 3)) / 2
        interact = _edit_loop_cadence(scene, cam, settings)
        return {"tris": int(flat.geometry.indices.shape[0]),
                "partitions": len(flat.wbvh_parts) if flat.wbvh_parts else 1,
                "stream": bool(flat.wbvh_stream),
                "ms_per_spp": round(dt * 1e3, 2),
                "spp_per_sec": round(1.0 / dt, 2),
                "interact_ms_per_frame": interact,
                "cfg": _fingerprint(settings, flat)}

    raise ValueError(f"unknown config {name!r}")


def child_main(name: str, n_iters: int) -> None:
    import jax

    r = run_one_config(name, n_iters)
    r["config"] = name
    r["chip"] = jax.devices()[0].device_kind
    print("@RESULT " + json.dumps(r), flush=True)


# --------------------------------------------------------------------------
# Parent-side orchestration
# --------------------------------------------------------------------------

class _Budget:
    def __init__(self, total_s: float):
        self.t0 = time.monotonic()
        self.total = total_s

    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def remaining(self) -> float:
        return self.total - self.elapsed()


def _final_lines(results: list[dict], chip: str) -> str:
    head = next((r for r in results if r.get("config") == HEADLINE), None)
    label = HEADLINE_LABEL
    if head is None:
        with_rays = [r for r in results if "mrays_per_sec" in r]
        if with_rays:
            head = with_rays[-1]
            label = f"FALLBACK {head['config']} (headline config missing)"
        else:
            head = {"mrays_per_sec": 0.0}
            label += " — NO CONFIG COMPLETED"
    return json.dumps({
        "metric": f"Mrays/sec/chip ({label}, {chip})",
        "value": head["mrays_per_sec"],
        "unit": "Mrays/s",
        "vs_baseline": round(head["mrays_per_sec"] / 100.0, 4),
    })


def _write_detail(results: list[dict], chip: str) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json")
    try:
        with open(path, "w") as f:
            json.dump({"chip": chip, "results": results}, f, indent=1)
    except OSError:
        pass


def parent_main() -> None:
    budget = _Budget(float(os.environ.get("BENCH_BUDGET_S", "1500")))
    cap = float(os.environ.get("BENCH_CONFIG_TIMEOUT_S", "600"))
    n_iters = int(os.environ.get("BENCH_ITERS", "6"))
    which = [s for s in os.environ.get("BENCH_CONFIGS", "").split(",") if s]
    results: list[dict] = []
    chip = "unknown"
    flushed = False

    def flush(*_a):
        nonlocal flushed
        if flushed:
            return
        flushed = True
        _write_detail(results, chip)
        print(_final_lines(results, chip), flush=True)

    def on_signal(signum, _frame):
        print(f"# budget/termination signal {signum} — flushing "
              f"{len(results)} results", flush=True)
        flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, on_signal)
    signal.signal(signal.SIGTERM, on_signal)
    # leave time to kill a running child and flush before any outer timeout
    signal.alarm(max(30, int(budget.total - 10)))

    for name in CONFIG_ORDER:
        if which and name not in which:
            continue
        remaining = budget.remaining()
        if remaining < 90:
            print(f"# budget exhausted ({budget.elapsed():.0f}s) — "
                  f"skipping remaining configs", flush=True)
            break
        iters = n_iters if remaining > 300 else max(2, n_iters // 3)
        tmo = max(60.0, min(cap, remaining - 30))
        print(f"# [t={budget.elapsed():.0f}s] config {name} "
              f"(timeout {tmo:.0f}s, iters {iters})", flush=True)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--config", name, "--iters", str(iters)]
        try:
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                    stderr=subprocess.DEVNULL, text=True)
        except OSError as e:
            print(f"# config {name} SPAWN FAILED: {e}", flush=True)
            continue
        deadline = time.monotonic() + tmo
        got = None
        try:
            import selectors

            sel = selectors.DefaultSelector()
            sel.register(proc.stdout, selectors.EVENT_READ)
            buf = ""
            while True:
                if time.monotonic() > deadline:
                    proc.kill()
                    print(f"# config {name} TIMED OUT after {tmo:.0f}s",
                          flush=True)
                    break
                if not sel.select(timeout=1.0):
                    if proc.poll() is not None:
                        break
                    continue
                chunk = proc.stdout.readline()
                if chunk == "":
                    break
                line = buf + chunk.rstrip("\n")
                buf = ""
                if line.startswith("@RESULT "):
                    got = json.loads(line[len("@RESULT "):])
                elif line.startswith("#"):
                    print(line, flush=True)
        finally:
            try:
                proc.kill()
            except OSError:
                pass
            proc.wait()
        if got is None:
            rc = proc.returncode
            print(f"# config {name} FAILED (rc={rc})", flush=True)
            continue
        chip = got.pop("chip", chip)
        results.append(got)
        print("# " + json.dumps(got), flush=True)
        _write_detail(results, chip)

    signal.alarm(0)
    flush()


def main():
    args = sys.argv[1:]
    if "--config" in args:
        name = args[args.index("--config") + 1]
        iters = int(args[args.index("--iters") + 1]) if "--iters" in args \
            else int(os.environ.get("BENCH_ITERS", "6"))
        child_main(name, iters)
    else:
        parent_main()


if __name__ == "__main__":
    main()
