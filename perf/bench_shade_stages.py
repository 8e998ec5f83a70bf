"""Stage-level shading cost decomposition (colonnade / headline config).

bench_sponza_decomp localizes ~85% of the 636 ms/spp in shading (trace is
43 ms for 8 waves). This bench times each shading stage as its own fused
K-iteration loop on realistic hit data (one traced primary wave), to find
WHICH stage dominates before optimizing it. Each loop perturbs its inputs
with the loop index (defeats CSE) and carries a data-dependent scalar.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from platinum_tpu.app.scenes import make_colonnade_scene
from platinum_tpu.models import bsdf as bsdf_mod
from platinum_tpu.models import lights as lights_mod
from platinum_tpu.models.camera_rays import spawn_camera_rays
from platinum_tpu.ops.hitdata import interpolate_hit
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.integrator import make_tracers
from platinum_tpu.render.types import RenderSettings

K = 8  # iterations fused per timed program (≈ bounces per sample)


def _fetch(x):
    return float(np.asarray(x).ravel()[0])


def timeit(jfn, *args, n=3):
    _fetch(jfn(*args))  # compile
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        _fetch(jfn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / K


def main():
    scene, cam = make_colonnade_scene()
    st = RenderSettings(width=512, height=512, spp=1, max_bounces=8,
                        kernel="mis", sampler="pcg4d", tracer="packet",
                        instancing="off")
    flat = flatten_scene(scene, cam, st, accel_min_tris=1)
    feats = analyze_features(flat)
    print("# features:", sorted(feats), flush=True)

    n = st.num_pixels
    px = jnp.arange(n, dtype=jnp.uint32) % st.width
    py = jnp.arange(n, dtype=jnp.uint32) // st.width
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.full((n, 2), 0.5), jnp.full((n, 2), 0.5))
    tc, ta = make_tracers(flat, st)
    rec = jax.jit(lambda: tc(o, d, 1e-3, jnp.inf))()
    print("# hits:", int(rec.hit.sum()), "/", n, flush=True)

    geom, mats = flat.geometry, flat.materials
    hd = jax.jit(lambda: interpolate_hit(geom, rec, o, d,
                                         instances=flat.instances))()
    ctx = jax.jit(lambda: bsdf_mod.make_shading_context(
        mats, hd.mat_idx, hd.uv, flat.atlas, flat.atlas_table,
        slots=frozenset()))()

    key = jax.random.PRNGKey(0)
    r4 = jax.random.uniform(key, (n, 4))
    rc = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    u2 = jax.random.uniform(jax.random.fold_in(key, 2), (n, 2))
    u1 = jax.random.uniform(jax.random.fold_in(key, 3), (n,))
    wi = jax.jit(lambda: bsdf_mod.sample(ctx, hd.wo, r4, rc, luts=flat.luts,
                                         multiscatter=True,
                                         features=feats).wi)()

    def loop(body):
        def run():
            def it(i, acc):
                return acc + body(i)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(run)

    def t_interp(i):
        r2 = type(rec)(t=rec.t + 1e-6 * i, tri=rec.tri, bary=rec.bary,
                       hit=rec.hit, inst=rec.inst)
        h = interpolate_hit(geom, r2, o, d, instances=flat.instances)
        return jnp.sum(h.pos[:, 0]) + jnp.sum(h.uv)

    def t_ctx(i):
        c = bsdf_mod.make_shading_context(
            mats, jnp.minimum(hd.mat_idx + i * 0, mats.packed.shape[0] - 1),
            hd.uv + 1e-6 * i, flat.atlas, flat.atlas_table, slots=frozenset())
        return jnp.sum(c.roughness) + jnp.sum(c.albedo[:, 0])

    def t_sample(i, ms=True):
        s = bsdf_mod.sample(ctx, hd.wo, jnp.clip(r4 + 1e-5 * i, 0, 1), rc,
                            luts=flat.luts, multiscatter=ms, features=feats)
        return jnp.sum(s.f[:, 0]) + jnp.sum(s.pdf)

    def t_eval(i, ms=True):
        e = bsdf_mod.evaluate(ctx, hd.wo, wi + 1e-6 * i, luts=flat.luts,
                              multiscatter=ms, features=feats)
        return jnp.sum(e.f[:, 0]) + jnp.sum(e.pdf)

    def t_light(i):
        lsmp = lights_mod.sample_area_light(
            geom, flat.lights, hd.pos + 1e-6 * i, u1, u2)
        return jnp.sum(lsmp.li[:, 0]) + jnp.sum(lsmp.pdf)

    def t_shadow(i):
        occ = ta(hd.pos + 1e-6 * i, d, 1e-3, jnp.full((n,), 10.0),
                 active=rec.hit)
        return jnp.sum(occ.astype(jnp.float32))

    def t_trace(i):
        r = tc(o + 1e-6 * i, d, 1e-3, jnp.inf)
        return jnp.sum(r.t)

    for name, body in [
        ("interpolate_hit", t_interp),
        ("shading_context", t_ctx),
        ("bsdf.sample(ms)", lambda i: t_sample(i, True)),
        ("bsdf.sample(no_ms)", lambda i: t_sample(i, False)),
        ("bsdf.evaluate(ms)", lambda i: t_eval(i, True)),
        ("bsdf.evaluate(no_ms)", lambda i: t_eval(i, False)),
        ("sample_area_light", t_light),
        ("trace_any(shadow)", t_shadow),
        ("trace_closest", t_trace),
    ]:
        dt = timeit(loop(body))
        print({"stage": name, "ms_per_wave": round(dt * 1e3, 2)}, flush=True)


if __name__ == "__main__":
    main()
