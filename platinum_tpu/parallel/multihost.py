"""Multi-host (DCN) orchestration for distributed rendering.

SURVEY.md §5's final scaling layer: multiple hosts, each driving its own
TPU slice, coordinated over the data-center network. The design follows
the standard JAX multi-controller recipe:

  * every host runs the SAME program and calls `initialize()` first
    (jax.distributed handshake over DCN — coordinator address from env or
    arguments, as on Cloud TPU pods);
  * `global_mesh()` builds one Mesh over ALL devices with the DCN-crossing
    axis OUTERMOST ('sample' — spp shards only combine once per image, so
    the slow DCN link carries one pmean per progressive step, while the
    'tile' axis stays inside each slice and rides ICI);
  * the shard_map render steps in parallel/shard.py work unchanged on the
    global mesh: jax partitions arrays across hosts, each host feeds only
    its addressable shards, and XLA inserts the cross-host collectives.

There is exactly one chip (and one host) in this sandbox, so this module
is exercised in single-process mode by tests; the code paths are the
standard ones that run on real pods unchanged.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join the multi-host process group (no-op for a single process).

    On Cloud TPU the three arguments auto-detect from the metadata server;
    elsewhere pass them or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID. Returns True when running multi-process."""
    num = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def global_mesh(sample_axis: int | None = None) -> Mesh:
    """('sample', 'tile') mesh over all global devices, with the
    host-crossing boundary on the 'sample' axis.

    jax.devices() returns devices grouped by process; reshaping to
    (num_hosts * k, local // k) keeps every 'tile' row inside one host's
    slice (ICI) and sends only the per-step spp combine across DCN."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    hosts = jax.process_count()
    if sample_axis is None:
        sample_axis = hosts if hosts > 1 else (2 if n % 2 == 0 else 1)
    if n % sample_axis:
        raise ValueError(f"{n} devices not divisible by sample={sample_axis}")
    return Mesh(devices.reshape(sample_axis, n // sample_axis),
                ("sample", "tile"))


def is_coordinator() -> bool:
    """True on the process that should write outputs / checkpoints."""
    return jax.process_index() == 0


def render_multihost(flat, settings, features=None, mesh: Mesh | None = None):
    """Render across every process's devices on the global mesh.

    Each process feeds its addressable shards; XLA inserts the DCN
    collectives for the spp combine. Every rank returns the (replicated)
    full image — write it only from is_coordinator()."""
    from platinum_tpu.parallel.shard import render_sharded

    if features is None:
        from platinum_tpu.render.flatten import analyze_features

        features = analyze_features(flat)
    mesh = mesh or global_mesh()
    return render_sharded(flat, settings, mesh, features=features)
