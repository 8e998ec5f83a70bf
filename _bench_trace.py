"""Benchmark the packet tracer vs old XLA traverse on Cornell + colonnade."""
import time, numpy as np, jax, jax.numpy as jnp
from platinum_tpu.app.scenes import make_cornell_scene, make_colonnade_scene
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render.integrator import init_path_state
from platinum_tpu.ops.pallas_trace import make_packet_tracer

def bench(scene_name, make_scene, n=10):
    scene, cam = make_scene()
    settings = RenderSettings(width=512, height=512, spp=1, max_bounces=2,
                              sampler="pcg4d", tracer="packet")
    import time as _t
    t0 = _t.perf_counter()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    print(f"{scene_name}: flatten {_t.perf_counter()-t0:.2f}s; tris={flat.geometry.indices.shape[0]}, "
          f"wnodes={flat.wbvh_nodes.shape}, wtris={flat.wbvh_tris.shape}")
    tc, ta = make_packet_tracer(flat.wbvh_nodes, flat.wbvh_tris)

    s = jax.jit(lambda f, i: init_path_state(f, settings, i), static_argnums=())
    st = init_path_state(flat, settings, jnp.int32(0))
    o, d = st["o"], st["d"]

    @jax.jit
    def trace1(o, d):
        rec = tc(o, d, 1e-3, jnp.inf)
        return rec.t.sum(), rec.tri

    r = trace1(o, d); jax.block_until_ready(r)
    # determinism check
    t_sums = [float(trace1(o, d)[0]) for _ in range(3)]
    assert len(set(t_sums)) == 1, f"nondeterministic: {t_sums}"
    ts = []
    for i in range(n):
        t0 = time.perf_counter(); jax.block_until_ready(trace1(o, d))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = sum(ts[:n//2]) / (n//2)
    R = o.shape[0]
    print(f"  primary rays: {R/dt/1e6:.2f} Mrays/s  ({dt*1e3:.2f} ms/call, det ok)")

    # incoherent bounce-like rays: random directions from hit points
    key = jax.random.PRNGKey(0)
    d2 = jax.random.normal(key, d.shape)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    @jax.jit
    def trace2(o, d2):
        rec = tc(o, d2, 1e-3, jnp.inf)
        return rec.t.sum()
    jax.block_until_ready(trace2(o, d2))
    ts = []
    for i in range(n):
        t0 = time.perf_counter(); jax.block_until_ready(trace2(o, d2))
        ts.append(time.perf_counter() - t0)
    ts.sort(); dt = sum(ts[:n//2]) / (n//2)
    print(f"  incoherent rays: {R/dt/1e6:.2f} Mrays/s  ({dt*1e3:.2f} ms/call)")

bench("cornell", make_cornell_scene)
bench("colonnade", make_colonnade_scene)
