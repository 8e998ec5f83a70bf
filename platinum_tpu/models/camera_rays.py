"""Camera ray generation with thin-lens DoF and polygonal-aperture bokeh.

Parity with spawnRayFromCamera (kernel.metal:195-238): pixel jitter on the
film plane at the focus distance, optional lens sampling on a polar disk with
a bokeh-density power remap (r^(2^bokehPower)) and an N-bladed polygonal
aperture blended toward a circle by `roundness`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platinum_tpu.render.types import CameraConstants


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def spawn_camera_rays(
    cam: CameraConstants,
    pixel_x: jnp.ndarray,       # (R,) f32/int pixel coords
    pixel_y: jnp.ndarray,
    pixel_sample: jnp.ndarray,  # (R, 2) jitter in [0,1)
    lens_sample: jnp.ndarray,   # (R, 2)
):
    """Returns (origins (R,3), directions (R,3))."""
    shape = jnp.shape(pixel_x)
    origin = jnp.broadcast_to(cam.position, shape + (3,))

    # Lens offset (DoF) — only when the aperture is open
    r = jnp.sqrt(lens_sample[..., 0])
    theta = 2.0 * np.pi * lens_sample[..., 1]
    r = jnp.power(jnp.maximum(r, 1e-20), jnp.exp2(cam.bokeh_power))

    # Polygonal aperture: radius of an n-gon at this angle, blended to 1
    n = cam.aperture_blades
    r_polygon = jnp.cos(np.pi / n) / jnp.cos(
        jnp.mod(theta + 1.5 * np.pi, 2.0 * np.pi / n) - np.pi / n
    )
    r = r * jnp.where(
        cam.roundness < 1.0,
        r_polygon * (1.0 - cam.roundness) + cam.roundness,
        1.0,
    )

    lens_xy = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], -1)
    lens_xy = lens_xy * cam.aperture_radius
    du = _normalize(cam.pixel_delta_u)
    dv = _normalize(cam.pixel_delta_v)
    lens_offset = lens_xy[..., 0:1] * du + lens_xy[..., 1:2] * dv
    origin = origin + jnp.where(cam.aperture_radius > 0.0, lens_offset, 0.0)

    fx = pixel_x.astype(jnp.float32) + pixel_sample[..., 0]
    fy = pixel_y.astype(jnp.float32) + pixel_sample[..., 1]
    film = (
        cam.top_left
        + fx[..., None] * cam.pixel_delta_u
        + fy[..., None] * cam.pixel_delta_v
    )
    direction = _normalize(film - origin)
    return origin, direction
