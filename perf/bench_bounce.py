"""One-bounce shading decomposition on the colonnade (timed pieces).

Times each stage of the bounce body separately (jitted in isolation, so
XLA cross-stage fusion is forfeited — treat as upper bounds that localize
the cost): hit interpolation, BSDF sample, BSDF evaluate (NEE), light
sampling, and the two traces.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from platinum_tpu.app.scenes import make_colonnade_scene, make_spheres_scene
from platinum_tpu.models import bsdf as bsdf_mod
from platinum_tpu.models import lights as lights_mod
from platinum_tpu.models.camera_rays import spawn_camera_rays
from platinum_tpu.ops.hitdata import interpolate_hit
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.integrator import make_tracers
from platinum_tpu.render.types import RenderSettings


def _timeit(fn, n_iters=4, repeats=2):
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
    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    scene, cam = (make_colonnade_scene() if name == "colonnade"
                  else make_spheres_scene())
    settings = RenderSettings(width=512, height=512, spp=1, max_bounces=8,
                              kernel="mis", sampler="pcg4d", tracer="packet",
                              instancing="off")
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    feats = analyze_features(flat)
    tex_slots = frozenset(int(f[7:]) for f in feats if f.startswith("texslot"))
    n = 512 * 512
    px = jnp.arange(n, dtype=jnp.uint32) % 512
    py = jnp.arange(n, dtype=jnp.uint32) // 512
    o, d = spawn_camera_rays(flat.camera, px, py, jnp.full((n, 2), 0.5),
                             jnp.full((n, 2), 0.5))
    tc, ta = make_tracers(flat, settings)
    rec = jax.jit(lambda: tc(o, d, 1e-3, jnp.inf))()
    jax.block_until_ready(rec.t)

    geom = flat.geometry
    rng = np.random.default_rng(0)
    r2 = jnp.asarray(rng.random((n, 4), np.float32))
    rc = jnp.asarray(rng.random((n, 2), np.float32))

    hd = jax.jit(lambda: interpolate_hit(geom, rec, o, d))()
    jax.block_until_ready(hd.pos)
    ctx = jax.jit(lambda: bsdf_mod.make_shading_context(
        flat.materials, hd.mat_idx, hd.uv, flat.atlas, flat.atlas_table,
        slots=tex_slots))()
    jax.block_until_ready(ctx.albedo)

    def timed(name, fn, pick):
        f = jax.jit(fn)
        jax.block_until_ready(pick(f()))
        dt = _timeit(lambda i: pick(f()))
        print({"stage": name, "ms": round(dt * 1e3, 1)}, flush=True)

    timed("interpolate_hit", lambda: interpolate_hit(geom, rec, o, d),
          lambda x: x.pos)
    timed("shading_ctx", lambda: bsdf_mod.make_shading_context(
        flat.materials, hd.mat_idx, hd.uv, flat.atlas, flat.atlas_table,
        slots=tex_slots), lambda x: x.albedo)
    timed("bsdf_sample", lambda: bsdf_mod.sample(
        ctx, hd.wo, r2, rc, luts=flat.luts, multiscatter=True,
        features=feats).f, lambda x: x)
    wi = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    timed("bsdf_evaluate", lambda: bsdf_mod.evaluate(
        ctx, hd.wo, wi, luts=flat.luts, multiscatter=True,
        features=feats).f, lambda x: x)
    timed("area_light_sample", lambda: lights_mod.sample_area_light(
        geom, flat.lights, hd.pos, rc[:, 0], r2[:, :2]).li, lambda x: x)
    timed("env_pdf", lambda: lights_mod.env_pdf_of_dir(flat.env, d),
          lambda x: x)
    timed("trace_closest", lambda: tc(o, d, 1e-3, jnp.inf).t, lambda x: x)
    timed("trace_any", lambda: ta(hd.pos, wi, 1e-3, 20.0), lambda x: x)


if __name__ == "__main__":
    main()
