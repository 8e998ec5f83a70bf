"""Latency-aware TPU microbenchmark harness.

The remote-TPU tunnel on this box has erratic per-call latency: healthy
windows are ~0.03 ms/call, degraded windows ~27 ms/call, and windows last
minutes. Naively timing one program per measurement therefore measures the
tunnel, not the chip. Rules this harness enforces:

  1. every measurement records the trivial-call latency right before it;
  2. work is amortized K-fold INSIDE one program (unrolled or fori_loop) so
     program time >> call latency, and the call latency is subtracted;
  3. results carry a `healthy` flag so callers can discard poisoned runs.

Used by bench.py and the performance notes; not part of the render path.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

_trivial = None
_tx = None


def call_latency(n: int = 10) -> float:
    """Current per-call round-trip latency (seconds, best quarter)."""
    global _trivial, _tx
    if _trivial is None:
        _trivial = jax.jit(lambda x: x + 1.0)
        _tx = jnp.zeros((8,))
        _trivial(_tx).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _trivial(_tx).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    k = max(1, n // 4)
    return sum(ts[:k]) / k


@dataclass
class Measurement:
    per_iter: float     # seconds per amortized iteration, latency-subtracted
    total: float        # best whole-program seconds
    latency: float      # per-call latency at measurement time
    healthy: bool       # latency below 1 ms → trustworthy

    def __str__(self):
        ms = self.per_iter * 1e3
        tag = "" if self.healthy else "  [DEGRADED WINDOW — retime]"
        return f"{ms:9.3f} ms/iter (lat {self.latency*1e3:.2f} ms){tag}"


def measure(run, *args, iters_inside: int, repeats: int = 6) -> Measurement:
    """Time `run(*args)` (a jitted callable whose body repeats the op
    `iters_inside` times); returns latency-subtracted per-iteration cost."""
    lat = call_latency()
    out = run(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    k = max(1, repeats // 3)
    total = sum(ts[:k]) / k
    per = max(0.0, total - lat) / iters_inside
    return Measurement(per_iter=per, total=total, latency=lat,
                       healthy=lat < 1e-3)
