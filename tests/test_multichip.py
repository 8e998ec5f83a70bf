"""Multi-device sharding tests on an 8-device virtual CPU mesh.

Run in subprocesses because the axon sitecustomize pins this interpreter's
JAX backend to the TPU at startup (see conftest)."""

import json
import os

from conftest import run_in_cpu_mesh

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip(cpu_mesh_env):
    out = run_in_cpu_mesh(
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        cpu_mesh_env,
    )
    assert "dryrun_multichip OK" in out


def test_sharded_matches_single_device(cpu_mesh_env):
    """Determinism: tile+sample sharded rendering must equal the unsharded
    sequential accumulation (counter-based samplers make this exact up to
    fp reassociation in the pmean)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render import integrator
from platinum_tpu.parallel.shard import render_sharded

scene, cam = make_cornell_scene()
settings = RenderSettings(width=16, height=16, spp=4, max_bounces=3, sampler="pcg4d")
flat = flatten_scene(scene, cam, settings)

ref = np.asarray(integrator.render(flat, settings))

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("sample", "tile"))
img = np.asarray(render_sharded(flat, settings, mesh))

err = np.abs(img - ref).max()
print("MAXERR", err)
assert err < 1e-5, err
"""
    out = run_in_cpu_mesh(code, cpu_mesh_env)
    assert "MAXERR" in out


def test_sharded_packet_tracer_matches_single_device(cpu_mesh_env):
    """VERDICT r2 #7a: the FLAGSHIP path (Pallas packet tracer, interpret
    mode on CPU) under tile+sample sharding must match the unsharded
    render on the same scene — not just the brute-force path."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from platinum_tpu.app.scenes import make_spheres_scene
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render import integrator
from platinum_tpu.parallel.shard import render_sharded

scene, cam = make_spheres_scene(grid=2)
settings = RenderSettings(width=16, height=16, spp=2, max_bounces=3,
                          sampler="pcg4d", tracer="packet")
flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
assert flat.wbvh_nodes is not None   # packet path engaged
feats = analyze_features(flat)

ref = np.asarray(integrator.render(flat, settings, features=feats))

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("sample", "tile"))
img = np.asarray(render_sharded(flat, settings, mesh, features=feats))

err = np.abs(img - ref).max()
print("MAXERR", err)
assert err < 1e-5, err
"""
    out = run_in_cpu_mesh(code, cpu_mesh_env, timeout=1200)
    assert "MAXERR" in out


def test_two_process_distributed_cpu(cpu_mesh_env):
    """VERDICT r2 #7b: a true 2-process jax.distributed run on CPU driving
    parallel.multihost — each process owns 4 virtual devices, renders its
    pixel shard, and the cross-process psum produces the full image on
    both."""
    import subprocess
    import sys

    code = """
import os, sys
import numpy as np, jax
proc = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:49731",
                           num_processes=2, process_id=proc)
import jax.numpy as jnp
from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.parallel import multihost

scene, cam = make_cornell_scene()
settings = RenderSettings(width=16, height=16, spp=2, max_bounces=2,
                          sampler="pcg4d")
flat = flatten_scene(scene, cam, settings)
img = multihost.render_multihost(flat, settings)
arr = np.asarray(img)
print(f"P{proc} MEAN", float(arr.mean()), arr.shape)
"""
    env = dict(cpu_mesh_env)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8",
        "--xla_force_host_platform_device_count=4"))
    import os

    procs = [subprocess.Popen([sys.executable, "-c", code, str(p)],
                              env=env, cwd=REPO_DIR,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for p in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"stdout:\n{out}\nstderr:\n{err[-2000:]}"
    m0 = float(outs[0][1].split("MEAN")[1].split()[0])
    m1 = float(outs[1][1].split("MEAN")[1].split()[0])
    assert abs(m0 - m1) < 1e-6, (m0, m1)   # both ranks see the full image
    assert m0 > 0.01


def test_sharded_gmon_matches_single_device(cpu_mesh_env):
    """GMoN buckets as sample shards (SURVEY §2.8): the sharded bucket
    accumulators must match the single-device Renderer's GMoN buckets
    (same sample->bucket assignment, deterministic samplers)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.render.flatten import flatten_scene, analyze_features
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render import integrator
from platinum_tpu.ops.gmon import gmon_combine
from platinum_tpu.parallel.shard import render_sharded_gmon

scene, cam = make_cornell_scene()
settings = RenderSettings(width=16, height=16, spp=4, max_bounces=3, sampler="pcg4d")
flat = flatten_scene(scene, cam, settings)
feats = analyze_features(flat)

# single-device reference: 2 buckets, each the mean of its 2 samples
buckets = []
for s in range(2):
    acc = jnp.zeros((settings.num_pixels, 3))
    for k in range(2):
        acc = integrator.render_step(flat, settings, acc, jnp.int32(k),
                                     sample_seed=jnp.int32(k * 2 + s),
                                     features=feats)
    buckets.append(np.asarray(acc))
ref = np.asarray(gmon_combine(jnp.asarray(np.stack(buckets)), 2, 1.0))

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("sample", "tile"))
img = np.asarray(render_sharded_gmon(flat, settings, mesh,
                                     features=feats)).reshape(-1, 3)

err = np.abs(img - ref).max()
print("GMONERR", err)
# fp reassociation differs between the shard_map and plain programs
assert err < 2e-3, err
"""
    out = run_in_cpu_mesh(code, cpu_mesh_env)
    assert "GMONERR" in out


def test_multihost_single_process(cpu_mesh_env):
    """multihost module: single-process no-op init + global mesh shape."""
    code = """
import jax
from platinum_tpu.parallel import multihost
assert multihost.initialize() is False
mesh = multihost.global_mesh()
assert mesh.shape["sample"] * mesh.shape["tile"] == len(jax.devices())
assert multihost.is_coordinator()
print("MULTIHOST OK", dict(mesh.shape))
"""
    out = run_in_cpu_mesh(code, cpu_mesh_env)
    assert "MULTIHOST OK" in out


def test_geometry_sharded_tracer_matches_sequential(cpu_mesh_env):
    """Geometry sharding (parallel.geometry): partitions distributed over a
    'geom' mesh axis must produce the identical hits/occlusion the
    single-device sequential partitioned tracer does — same winners, same
    tie-breaking — for both baked-soup and INSTANCED partitions."""
    code = """
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from platinum_tpu.app.scenes import make_colonnade_scene
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render.integrator import make_tracers
from platinum_tpu.parallel.geometry import make_geom_sharded_tracer

rng = np.random.default_rng(3)
r = 1024
o = jnp.asarray(rng.uniform(-8, 8, (r, 3)).astype(np.float32))
d = rng.normal(0, 1, (r, 3)).astype(np.float32)
d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
mesh = Mesh(np.asarray(jax.devices()), ("geom",))

# --- baked-soup partitions (tiny budget forces several) ---------------
scene, cam = make_colonnade_scene(columns=4, rows=2, sphere_res=(10, 14))
s = RenderSettings(width=8, height=8, tracer="packet", partition_tris=800,
                   instancing="off", stream="off")
flat = flatten_scene(scene, cam, s, accel_min_tris=1)
assert flat.wbvh_parts is not None and len(flat.wbvh_parts) >= 3

tc_seq, ta_seq = make_tracers(flat, s)
tc_g, ta_g = make_geom_sharded_tracer(flat.wbvh_parts, mesh)
r1 = jax.jit(lambda o, d: tc_seq(o, d, 1e-3, jnp.inf))(o, d)
r2 = jax.jit(lambda o, d: tc_g(o, d, 1e-3, jnp.inf))(o, d)
np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
np.testing.assert_array_equal(np.asarray(r1.tri), np.asarray(r2.tri))
np.testing.assert_allclose(np.asarray(r1.t), np.asarray(r2.t), rtol=0, atol=0)
occ1 = np.asarray(jax.jit(lambda o, d: ta_seq(o, d, 1e-3, 9.0))(o, d))
occ2 = np.asarray(jax.jit(lambda o, d: ta_g(o, d, 1e-3, 9.0))(o, d))
np.testing.assert_array_equal(occ1, occ2)
print("SOUP OK", len(flat.wbvh_parts))

# --- instanced partitions (partition-of-TLAS) --------------------------
import sys, os
sys.path.insert(0, os.path.join(os.environ["REPO_DIR"], "tests"))
from test_tlas import _instanced_scene
scene2, cam2 = _instanced_scene(n_inst=24)
s2 = RenderSettings(width=8, height=8, instancing="on", tracer="packet",
                    partition_bytes=60_000, stream="off")
flat2 = flatten_scene(scene2, cam2, s2, accel_min_tris=1)
assert flat2.wbvh_parts is not None and len(flat2.wbvh_parts) >= 2
tc_seq2, _ = make_tracers(flat2, s2)
tc_g2, _ = make_geom_sharded_tracer(flat2.wbvh_parts, mesh)
q1 = jax.jit(lambda o, d: tc_seq2(o, d, 1e-3, jnp.inf))(o, d)
q2 = jax.jit(lambda o, d: tc_g2(o, d, 1e-3, jnp.inf))(o, d)
np.testing.assert_array_equal(np.asarray(q1.hit), np.asarray(q2.hit))
np.testing.assert_array_equal(np.asarray(q1.tri), np.asarray(q2.tri))
np.testing.assert_array_equal(np.asarray(q1.inst), np.asarray(q2.inst))
print("INSTANCED OK", len(flat2.wbvh_parts))
"""
    env = dict(cpu_mesh_env)
    env["REPO_DIR"] = REPO_DIR
    out = run_in_cpu_mesh(code, env, timeout=2400)
    assert "SOUP OK" in out and "INSTANCED OK" in out


def test_geom_sharded_step_matches_unsharded(cpu_mesh_env):
    """3-axis sharding (sample x tile x geom): the full progressive step
    with geometry distributed over the mesh must reproduce the unsharded
    partitioned render."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from platinum_tpu.app.scenes import make_colonnade_scene
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render import integrator
from platinum_tpu.parallel.geometry import make_geom_sharded_step

scene, cam = make_colonnade_scene(columns=4, rows=2, sphere_res=(10, 14))
settings = RenderSettings(width=16, height=16, spp=2, max_bounces=3,
                          sampler="pcg4d", tracer="packet",
                          partition_tris=800, instancing="off",
                          stream="off")
flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
assert flat.wbvh_parts is not None and len(flat.wbvh_parts) >= 2
feats = analyze_features(flat)

ref = np.asarray(integrator.render(flat, settings, features=feats))

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2),
            ("sample", "tile", "geom"))
step = make_geom_sharded_step(flat, settings, mesh, features=feats)
accum = jnp.zeros((settings.num_pixels, 3))
for i in range(settings.spp // 2):
    accum = step(accum, jnp.int32(i))
img = np.asarray(accum).reshape(ref.shape)

err = np.abs(img - ref).max()
print("MAXERR", err)
assert err < 1e-5, err
"""
    out = run_in_cpu_mesh(code, cpu_mesh_env, timeout=2400)
    assert "MAXERR" in out


def test_cli_mesh_render(cpu_mesh_env):
    """`render --mesh sample=2,tile=4` drives the sharded path end-to-end
    from the CLI (and the geom variant engages partition sharding)."""
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = f"{td}/m.png"
        proc = subprocess.run(
            [sys.executable, "-m", "platinum_tpu.app.cli", "render",
             "cornell", "--spp", "2", "--size", "32x32",
             "--mesh", "sample=2,tile=4", "-o", out],
            env=cpu_mesh_env, cwd=REPO_DIR, capture_output=True, text=True,
            timeout=1200,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "mesh {'sample': 2, 'tile': 4}" in proc.stderr
        assert os.path.exists(out)

        # geom variant: partition sharding from the CLI. stream defaults
        # to "auto", which would otherwise take the streamed-single-
        # structure path and never build partitions — the CLI must force
        # stream off when a geom axis is requested (regression: this
        # combination used to SystemExit with unfixable guidance).
        from platinum_tpu.app.scenes import make_colonnade_scene
        from platinum_tpu.io.sceneio import save_scene

        scene_g, _cam = make_colonnade_scene(columns=3, rows=2,
                                             sphere_res=(8, 12))
        scn = f"{td}/colo.ptscene"
        save_scene(scene_g, scn)
        out_g = f"{td}/g.png"
        proc = subprocess.run(
            [sys.executable, "-m", "platinum_tpu.app.cli", "render",
             scn, "--spp", "1", "--size", "16x16", "--bounces", "2",
             "--tracer", "packet", "--partition-tris", "400",
             "--instancing", "off",
             "--mesh", "geom=2", "-o", out_g],
            env=cpu_mesh_env, cwd=REPO_DIR, capture_output=True, text=True,
            timeout=1200,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "implies --stream off" in proc.stderr
        assert os.path.exists(out_g)


def test_multihost_kill_and_resume(cpu_mesh_env, tmp_path):
    """Failure recovery (SURVEY §5, VERDICT r3 #9): a 2-process
    jax.distributed render is SIGKILLed mid-render after writing an
    accumulator checkpoint; a fresh process pair resumes from the
    checkpoint and must produce the same image as an uninterrupted run
    (counter-based samplers + exact accumulator restore make the resumed
    op sequence identical)."""
    import signal
    import subprocess
    import sys
    import time

    code = """
import os, sys
import numpy as np, jax
phase, proc, port = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=proc)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.render.flatten import flatten_scene, analyze_features
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.parallel import multihost
from platinum_tpu.parallel.mesh import replicate
from platinum_tpu.parallel.shard import make_sharded_step

scene, cam = make_cornell_scene()
settings = RenderSettings(width=16, height=16, spp=8, max_bounces=2,
                          sampler="pcg4d")
flat = flatten_scene(scene, cam, settings)
mesh = multihost.global_mesh()
flat = replicate(mesh, flat)
step = make_sharded_step(flat, settings, mesh,
                         features=analyze_features(flat))
sharding = NamedSharding(mesh, P("tile", None))
ckpt = sys.argv[4]
out = sys.argv[5]
n_steps = settings.spp // mesh.shape["sample"]
half = n_steps // 2

if phase == "part2":
    accum = jax.device_put(jnp.asarray(np.load(ckpt)), sharding)
    start = half
else:
    accum = jax.device_put(jnp.zeros((settings.num_pixels, 3)), sharding)
    start = 0

for i in range(start, n_steps):
    accum = step(flat, accum, jnp.int32(i))
    if phase == "part1" and i + 1 == half:
        if multihost.is_coordinator():
            np.save(ckpt, np.asarray(accum))
        print("CKPT_SAVED", flush=True)
        import time as _t
        _t.sleep(600)   # hold until the parent SIGKILLs us

arr = np.asarray(accum)
if multihost.is_coordinator():
    np.save(out, arr)
print("DONE", float(arr.mean()), flush=True)
"""
    env = dict(cpu_mesh_env)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8",
        "--xla_force_host_platform_device_count=4")
    ckpt = str(tmp_path / "accum_ckpt.npy")
    out_full = str(tmp_path / "full.npy")
    out_resumed = str(tmp_path / "resumed.npy")

    def launch(phase, port, out):
        return [subprocess.Popen(
            [sys.executable, "-c", code, phase, str(p), port, ckpt, out],
            env=env, cwd=REPO_DIR, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True) for p in range(2)]

    # uninterrupted reference
    procs = launch("full", "49741", out_full)
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"full: {out}\n{err[-2000:]}"

    # part 1: wait for the checkpoint marker, then SIGKILL both ranks
    procs = launch("part1", "49742", out_resumed)
    deadline = time.monotonic() + 600
    seen = False
    while time.monotonic() < deadline and not seen:
        if os.path.exists(ckpt):
            # marker file exists; give the non-coordinator a beat to pass
            # its own save point, then kill HARD (no cleanup, no atexit)
            time.sleep(2.0)
            seen = True
        else:
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(0.5)
    assert seen, "checkpoint never appeared"
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait()
        assert p.returncode != 0  # really killed mid-run

    # part 2: fresh pair resumes from the checkpoint
    procs = launch("part2", "49743", out_resumed)
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"part2: {out}\n{err[-2000:]}"

    import numpy as np

    full = np.load(out_full)
    resumed = np.load(out_resumed)
    err = np.abs(full - resumed).max()
    assert err < 1e-6, err
    assert full.mean() > 0.01
