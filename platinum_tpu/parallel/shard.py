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

from platinum_tpu.render.integrator import render_sample
from platinum_tpu.render.types import FlatScene, RenderSettings


def make_sharded_step(flat_example: FlatScene, settings: RenderSettings, mesh: Mesh):
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

    def step_impl(flat, accum, step_idx):
        t = jax.lax.axis_index("tile").astype(jnp.uint32)
        s = jax.lax.axis_index("sample").astype(jnp.int32)
        pixel_ids = t * shard_px + jnp.arange(shard_px, dtype=jnp.uint32)
        sample_idx = step_idx * n_sample + s
        radiance = render_sample(flat, settings, sample_idx, pixel_ids=pixel_ids)
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
                   steps: int | None = None) -> jnp.ndarray:
    """Render settings.spp samples across the mesh; returns (H, W, 3)."""
    n_sample = mesh.shape.get("sample", 1)
    steps = steps if steps is not None else -(-settings.spp // n_sample)
    step = make_sharded_step(flat, settings, mesh)
    accum = jax.device_put(
        jnp.zeros((settings.num_pixels, 3)),
        NamedSharding(mesh, P("tile", None)),
    )
    from platinum_tpu.parallel.mesh import replicate

    flat = replicate(mesh, flat)
    for i in range(steps):
        accum = step(flat, accum, jnp.int32(i))
    return accum.reshape(settings.height, settings.width, 3)
