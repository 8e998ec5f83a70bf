"""XLA primitive costs on the chip that gate the ray-stream tracer design
(perf/sim_raystream.py said GO at the work-count level; these measured
numbers price the irregular-op plumbing the implementation needs):

  - argsort+take at wave scales (per-level pair grouping)
  - scatter-set compaction (masked positions; the classic prefix-sum
    stream compaction pattern)
  - scatter-min (final per-ray hit reduction across leaf pairs)
  - row gather (ray data by sorted pair ids)
  - one-hot MXU fetch of node records (bf16: round-out widened bounds)
  - segment-min via sorted-order cummax trick vs scatter-min

Usage: python perf/bench_xla_prims.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=8, repeats=3):
    fn(*args)  # compile
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    out = {}

    for n in (262144, 524288, 1048576, 2097152):
        keys = jnp.asarray(rng.integers(0, 1 << 20, n), jnp.int32)
        vals = jnp.asarray(rng.random((n, 2)), jnp.float32)

        @jax.jit
        def srt(k, v):
            p = jnp.argsort(k)
            return v[p]

        out[f"argsort_take_{n}"] = round(timeit(srt, keys, vals), 2)

    for n in (1048576, 4194304):
        mask = jnp.asarray(rng.random(n) < 0.2)
        vals = jnp.asarray(rng.random(n), jnp.float32)
        cap = n // 2

        @jax.jit
        def compact(m, v):
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            pos = jnp.where(m, pos, cap)  # dropped
            return jnp.zeros(cap + 1, v.dtype).at[pos].set(
                v, mode="drop")

        out[f"scatter_compact_{n}"] = round(timeit(compact, mask, vals), 2)

    for n in (524288,):
        seg = jnp.asarray(np.sort(rng.integers(0, 262144, n)), jnp.int32)
        vals = jnp.asarray(rng.random(n), jnp.float32)

        @jax.jit
        def scatter_min(s, v):
            return jnp.full(262144, jnp.inf, v.dtype).at[s].min(v)

        out[f"scatter_min_{n}"] = round(timeit(scatter_min, seg, vals), 2)

        @jax.jit
        def segmin(s, v):
            return jax.ops.segment_min(v, s, num_segments=262144,
                                       indices_are_sorted=True)

        out[f"segment_min_sorted_{n}"] = round(timeit(segmin, seg, vals), 2)

    for n, w in ((524288, 8),):
        idx = jnp.asarray(rng.integers(0, 262144, n), jnp.int32)
        rows = jnp.asarray(rng.random((262144, w)), jnp.float32)

        @jax.jit
        def gat(i, r):
            return r[i]

        out[f"gather_rows_{n}x{w}"] = round(timeit(gat, idx, rows), 2)

    # one-hot node-record fetch: (cap, n_nodes) bf16 one-hot @ records
    for cap, nn in ((524288, 256), (524288, 2048)):
        ids = jnp.asarray(rng.integers(0, nn, cap), jnp.int32)
        rec = jnp.asarray(rng.random((nn, 144)), jnp.float32)

        @jax.jit
        def onehot_fetch(i, r):
            oh = (i[:, None] == jnp.arange(nn)[None, :]).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, r.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        out[f"onehot_fetch_{cap}x{nn}"] = round(
            timeit(onehot_fetch, ids, rec), 2)

    # dense slab-test-shaped op chain: (cap, 16) x ~30 ops
    cap = 524288
    a = jnp.asarray(rng.random((cap, 16, 6)), jnp.float32)

    @jax.jit
    def slab(x):
        lo = x[..., 0:3]
        hi = x[..., 3:6]
        o = x[..., 0:3] * 0.5
        iv = 1.0 / (x[..., 3:6] + 1.1)
        t0 = (lo - o) * iv
        t1 = (hi - o) * iv
        tn = jnp.minimum(t0, t1).max(-1)
        tf = jnp.maximum(t0, t1).min(-1)
        return ((tn <= tf) & (tf >= 0)).astype(jnp.float32).sum(-1)

    out[f"dense_slab_{cap}x16"] = round(timeit(slab, a), 2)

    for k, v in out.items():
        print(f"{k}: {v} ms", flush=True)


if __name__ == "__main__":
    main()
