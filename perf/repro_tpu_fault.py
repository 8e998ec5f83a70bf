"""Minimal-repro search for the axon TPU-runtime fault (VERDICT r4 #7).

Round 4 bisected the ray-stream tracer's "TPU device error" to the
wave-scale XLA scatter/argsort glue (the Pallas MT kernel passes its
structural bisect on hardware, and the fault reproduces with the kernel in
interpret mode). But the boundary was folklore: WHICH program shape faults
was never pinned, so every future kernel campaign would hit it blind.

This script probes the program classes individually, each in its own
subprocess (a faulted device kills the process, not the search), ordered
from single primitives to the full tracer:

  prims_combo   argsort+take + scatter-compact + scatter-min chained in one
                jit at 524k (the bench_xla_prims ops, now composed)
  gather3d      (400k, 16, 8) node-record row gather (the _expand fetch)
  full_nomt     the COMPLETE raystream tracer program with the Pallas MT
                call replaced by a dense dummy -> pure XLA glue, no kernel
  full_interp   the complete tracer, MT kernel in interpret mode
  full_hw       the complete tracer, MT kernel compiled for the chip

Usage:
  python perf/repro_tpu_fault.py            # run all probes, print the map
  python perf/repro_tpu_fault.py <probe>    # run one probe in-process

The boundary map (PASS/FAULT per probe) goes into PERFORMANCE.md; the
narrowest FAULTing probe is the minimal repro future campaigns check
against before touching the device.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

N_WAVE = 262144


def _scene():
    from test_pallas_trace import _build, _random_soup

    v0, v1, v2 = _random_soup(t=5000, seed=3)
    wide, _ = _build(v0, v1, v2, leaf_cap=16)
    return wide


def _wave(n=N_WAVE):
    import numpy as np

    rng = np.random.default_rng(0)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def probe_prims_combo():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    n = 524288
    keys = jnp.asarray(rng.integers(0, 1 << 20, n), jnp.int32)
    vals = jnp.asarray(rng.random((n, 2)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 262144, n), jnp.int32)
    mask = jnp.asarray(rng.random(n) < 0.2)

    @jax.jit
    def combo(k, v, s, m):
        acc = jnp.zeros((262144,), jnp.float32)
        for _ in range(5):
            p = jnp.argsort(k)
            v = v[p]
            s = s[p]
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            pos = jnp.where(m, pos, n // 2)
            c = jnp.zeros(n // 2 + 1, v.dtype).at[pos].set(v[:, 0],
                                                           mode="drop")
            acc = acc + jnp.full((262144,), jnp.inf).at[s].min(v[:, 1])
            k = (k + c.astype(jnp.int32).sum()) % (1 << 20)
        return acc.sum()

    out = combo(keys, vals, seg, mask)
    print(float(out))


def probe_gather3d():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.random((2048, 16, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 2048, 400000), jnp.int32)

    @jax.jit
    def g(i, nd):
        r = nd[i]
        return (r * 1.0001).sum()

    print(float(g(ids, nodes)))


def _full(monkey_nomt: bool, interpret: bool | None):
    import jax.numpy as jnp

    os.environ["PLATINUM_TPU_RAYSTREAM_HW"] = "1"
    from platinum_tpu.ops import raystream

    if monkey_nomt:
        import functools

        import jax

        @functools.lru_cache(maxsize=None)
        def _dummy_call(g, n_blocks, any_hit, interp, mt_prec):
            M = raystream.MT_CHUNKS_PER_STEP

            @jax.jit
            def call(bid3, feat_blk, lims, wtris):
                t = jnp.where(bid3 >= 0, lims[:, :, 1, :] * 0.5, jnp.inf)
                s = jnp.where(bid3 >= 0, bid3.astype(jnp.float32) * 64.0,
                              -1.0)
                z = jnp.zeros((g, M, raystream.LANES), jnp.float32)
                return t, s, z, z

            return call

        raystream._build_mt_call = _dummy_call

    wide = _scene()
    tc, _ = raystream.make_stream_tracer(
        wide.nodes, wide.tri_blocks, wide.meta, wide.tri_of_slot,
        interpret=interpret)
    o, d = _wave()
    rec = tc(jnp.asarray(o), jnp.asarray(d), 1e-3, 1e30)
    import numpy as np

    print("hits:", int(np.asarray(rec.hit).sum()))


def probe_full_nomt():
    _full(monkey_nomt=True, interpret=False)


def probe_full_interp():
    _full(monkey_nomt=False, interpret=True)


def probe_full_hw():
    _full(monkey_nomt=False, interpret=False)


PROBES = ["prims_combo", "gather3d", "full_nomt", "full_interp", "full_hw"]


def main():
    if len(sys.argv) > 1:
        name = sys.argv[1]
        globals()[f"probe_{name}"]()
        print(f"PROBE_OK {name}", flush=True)
        return

    results = {}
    for name in PROBES:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=1200,
                cwd="/root/repo")
            ok = proc.returncode == 0 and f"PROBE_OK {name}" in proc.stdout
            tail = (proc.stdout + proc.stderr)[-600:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT"
        results[name] = {
            "status": "PASS" if ok else "FAULT",
            "secs": round(time.time() - t0, 1),
            "tail": None if ok else tail,
        }
        print(f"# {name}: {results[name]['status']} "
              f"({results[name]['secs']}s)", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
