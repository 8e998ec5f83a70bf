"""Device mesh + sharding for multi-chip rendering.

The reference is single-GPU (SURVEY.md §2.8); this module is the framework's
distributed backend, built on jax.sharding. Parallel axes:

  tile   — pixels (rays) sharded across devices; embarrassingly parallel,
           each device traces its rows against the replicated scene.
  sample — spp sharded across devices; deterministic because samplers are
           counter-based in (pixel, sample); accumulators combine with a
           mean (psum over ICI).

Scenes (geometry/BVH/materials/lights/env/atlas) are replicated; ray state
and accumulators are sharded. Collectives ride ICI via jax.sharding — XLA
inserts the all-reduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axes=("sample", "tile"), sample_parallel=None) -> Mesh:
    """1D or 2D device mesh over `axes`.

    For a 2D ("sample", "tile") mesh the sample axis takes the largest
    power-of-two factor of the device count up to `sample_parallel`
    (default: up to n // 2, so both axes are populated when n > 1); the
    tile axis gets the rest. Pass sample_parallel=1 for a pure tile mesh
    or sample_parallel=n for a pure sample mesh."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if len(axes) == 1:
        shape = (n,)
    else:
        limit = max(1, min(n, sample_parallel if sample_parallel else n // 2))
        s = 1
        while s * 2 <= limit and n % (s * 2) == 0:
            s *= 2
        shape = (s, n // s)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def shard_pixels(mesh: Mesh, array: jnp.ndarray, axis: str = "tile"):
    """Shard a (num_pixels, ...) array's leading dim across `axis`."""
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. FlatScene) on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if isinstance(x, jnp.ndarray) else x,
        tree,
    )


def pixel_sharding(mesh: Mesh, axis: str = "tile") -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))
