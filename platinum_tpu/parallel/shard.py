"""Sharded progressive rendering: tile × sample parallelism via shard_map.

The framework's multi-chip render path (SURVEY.md §2.8's "data parallelism to
add"): a 2D mesh with a 'sample' axis (spp sharding; each device row traces
different sample indices, combined with a pmean over ICI) and a 'tile' axis
(pixel sharding; rays are embarrassingly parallel against the replicated
scene). Counter-based samplers make this bit-deterministic: device (s, t)
renders sample step·S + s of pixels [t·P/T, (t+1)·P/T) — the same numbers a
single chip would produce sequentially.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from platinum_tpu.models import bsdf as _bsdf
from platinum_tpu.render.integrator import render_sample
from platinum_tpu.render.types import FlatScene, RenderSettings


def make_sharded_step(flat_example: FlatScene, settings: RenderSettings, mesh: Mesh,
                      features: frozenset | None = None):
    """Build a jitted sharded progressive step:
        step(flat, accum, step_idx) -> accum
    where accum is (num_pixels, 3) sharded over 'tile' and each step advances
    the accumulator by S = mesh.shape['sample'] samples per pixel."""
    n_sample = mesh.shape.get("sample", 1)
    n_tile = mesh.shape.get("tile", 1)
    if settings.num_pixels % n_tile:
        raise ValueError(
            f"num_pixels {settings.num_pixels} not divisible by tile axis {n_tile}"
        )
    shard_px = settings.num_pixels // n_tile
    feats = features if features is not None else _bsdf.ALL_FEATURES

    def step_impl(flat, accum, step_idx):
        t = jax.lax.axis_index("tile").astype(jnp.uint32)
        s = jax.lax.axis_index("sample").astype(jnp.int32)
        pixel_ids = t * shard_px + jnp.arange(shard_px, dtype=jnp.uint32)
        sample_idx = step_idx * n_sample + s
        radiance = render_sample(flat, settings, sample_idx,
                                 pixel_ids=pixel_ids, features=feats)
        radiance = jax.lax.pmean(radiance, "sample")  # combine spp shard (ICI)
        k = step_idx.astype(jnp.float32)
        return (accum * k + radiance) / (k + 1.0)

    sharded = shard_map(
        step_impl,
        mesh=mesh,
        in_specs=(P(), P("tile", None), P()),
        out_specs=P("tile", None),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def render_sharded(flat: FlatScene, settings: RenderSettings, mesh: Mesh,
                   steps: int | None = None,
                   features: frozenset | None = None) -> jnp.ndarray:
    """Render settings.spp samples across the mesh; returns (H, W, 3)."""
    n_sample = mesh.shape.get("sample", 1)
    steps = steps if steps is not None else -(-settings.spp // n_sample)
    step = make_sharded_step(flat, settings, mesh, features=features)
    accum = jax.device_put(
        jnp.zeros((settings.num_pixels, 3)),
        NamedSharding(mesh, P("tile", None)),
    )
    from platinum_tpu.parallel.mesh import replicate

    flat = replicate(mesh, flat)
    for i in range(steps):
        accum = step(flat, accum, jnp.int32(i))
    return accum.reshape(settings.height, settings.width, 3)


def make_sharded_gmon_step(flat_example: FlatScene, settings: RenderSettings,
                           mesh: Mesh, features: frozenset | None = None):
    """GMoN-bucketed sharded step: the 'sample' mesh axis IS the bucket axis
    (SURVEY.md §2.8). Each sample-row device keeps its OWN accumulator —
    no pmean — so after N steps device s holds bucket s's running mean of
    samples {step*S + s}. Combine with ops.gmon.gmon_combine at readback:
        step(flat, buckets, step_idx) -> buckets   # (S, num_pixels, 3)
    buckets sharded P('sample', 'tile', None)."""
    n_sample = mesh.shape.get("sample", 1)
    n_tile = mesh.shape.get("tile", 1)
    if settings.num_pixels % n_tile:
        raise ValueError(
            f"num_pixels {settings.num_pixels} not divisible by tile axis {n_tile}"
        )
    shard_px = settings.num_pixels // n_tile
    feats = features if features is not None else _bsdf.ALL_FEATURES

    def step_impl(flat, buckets, step_idx):
        t = jax.lax.axis_index("tile").astype(jnp.uint32)
        s = jax.lax.axis_index("sample").astype(jnp.int32)
        pixel_ids = t * shard_px + jnp.arange(shard_px, dtype=jnp.uint32)
        sample_idx = step_idx * n_sample + s
        radiance = render_sample(flat, settings, sample_idx,
                                 pixel_ids=pixel_ids, features=feats)
        k = step_idx.astype(jnp.float32)
        return (buckets * k + radiance[None]) / (k + 1.0)

    sharded = shard_map(
        step_impl,
        mesh=mesh,
        in_specs=(P(), P("sample", "tile", None), P()),
        out_specs=P("sample", "tile", None),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def render_sharded_gmon(flat: FlatScene, settings: RenderSettings, mesh: Mesh,
                        steps: int | None = None, cap: float = 1.0,
                        features: frozenset | None = None) -> jnp.ndarray:
    """GMoN render across the mesh: sample-axis devices are the buckets;
    firefly-robust median-of-means combine at the end."""
    from platinum_tpu.ops.gmon import gmon_combine
    from platinum_tpu.parallel.mesh import replicate

    n_sample = mesh.shape.get("sample", 1)
    steps = steps if steps is not None else -(-settings.spp // n_sample)
    step = make_sharded_gmon_step(flat, settings, mesh, features=features)
    buckets = jax.device_put(
        jnp.zeros((n_sample, settings.num_pixels, 3)),
        NamedSharding(mesh, P("sample", "tile", None)),
    )
    flat = replicate(mesh, flat)
    for i in range(steps):
        buckets = step(flat, buckets, jnp.int32(i))
    img = gmon_combine(buckets, n_sample, cap)
    return img.reshape(settings.height, settings.width, 3)
