"""Studio preview renderer: the editor-viewport equivalent.

Capability parity with /root/reference/src/renderer_studio/ (raster editor
viewport): a fast single-bounce shaded preview with an object-id AOV for
click-to-select picking (readbackObjectIdAt, renderer_studio.cpp:114-138),
Laplacian edge outlines with selection highlighting (edge_pass.metal), a
procedural infinite ground grid with axis coloring and distance fade
(grid.metal), and an orbit/pan/zoom camera (studio_camera.cpp). On TPU the
idiomatic implementation is a one-bounce ray "raster": primary rays traced
against the same flattened scene the path tracer uses, headlight-shaded.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.core.camera import Camera
from platinum_tpu.core.transform import Transform
from platinum_tpu.models.camera_rays import spawn_camera_rays
from platinum_tpu.ops.hitdata import interpolate_hit
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.integrator import make_tracers
from platinum_tpu.render.types import FlatScene, RenderSettings

# Theme colors (parity with the viewport section of theme.hpp)
GRID_COLOR = np.array([0.42, 0.42, 0.42], np.float32)
AXIS_X_COLOR = np.array([0.85, 0.3, 0.3], np.float32)
AXIS_Z_COLOR = np.array([0.3, 0.45, 0.85], np.float32)
BACKGROUND = np.array([0.16, 0.16, 0.18], np.float32)
SELECTION = np.array([1.0, 0.55, 0.1], np.float32)
OUTLINE = np.array([0.05, 0.05, 0.05], np.float32)
GIZMO_COLOR = np.array([0.9, 0.9, 0.92], np.float32)


def camera_gizmo_segments(scene, exclude_node: int = -1) -> np.ndarray:
    """(S, 6) world-space line segments [a.xyz, b.xyz] drawing a wireframe
    frustum for every camera node (parity with the studio camera pass,
    renderer_studio.cpp:219-262: 8 lines per camera)."""
    segs = []
    for node_id, cam, m in scene.get_cameras():
        if node_id == exclude_node or cam is None:
            continue
        pos = m[:3, 3]
        u, v, w = m[:3, 0], m[:3, 1], m[:3, 2]
        depth = 0.8
        f = max(float(cam.focal_length), 1e-3)
        hw = depth * cam.sensor_size[0] / (2.0 * f)
        hh = depth * cam.sensor_size[1] / (2.0 * f)
        c = pos - w * depth
        corners = [c + u * sx * hw + v * sy * hh
                   for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1))]
        for k in range(4):
            segs.append(np.concatenate([pos, corners[k]]))
            segs.append(np.concatenate([corners[k], corners[(k + 1) % 4]]))
    if not segs:
        return np.zeros((0, 6), np.float32)
    return np.asarray(segs, np.float32)


def _draw_segments(color, o, d, scene_t, segs, h, w):
    """Analytic 3D line rasterisation: a pixel takes the gizmo color when
    its view ray passes within an angular tolerance of a segment and the
    segment point is not occluded by geometry."""
    if segs.shape[0] == 0:
        return color
    a = segs[:, 0:3][None]          # (1,S,3)
    b = segs[:, 3:6][None]
    ab = b - a
    o_ = o[:, None, :]
    d_ = d[:, None, :]
    ao = a - o_
    # closest points between ray (o+t d) and segment (a + s ab)
    dd = jnp.sum(d_ * d_, -1)
    de = jnp.sum(d_ * ab, -1)
    ee = jnp.sum(ab * ab, -1)
    doo = jnp.sum(d_ * ao, -1)
    eo = jnp.sum(ab * ao, -1)
    den = dd * ee - de * de
    safe = jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
    s_par = jnp.clip(jnp.where(jnp.abs(den) > 1e-12,
                               (de * doo - dd * eo) / safe, 0.0), 0.0, 1.0)
    p = a + ab * s_par[..., None]
    t_ray = jnp.maximum(jnp.sum((p - o_) * d_, -1), 1e-4)
    q = o_ + d_ * t_ray[..., None]
    dist = jnp.linalg.norm(p - q, axis=-1)
    tol = t_ray * 3e-3  # ~screen-constant line width
    vis = (dist < tol) & (t_ray < scene_t[:, None] - 1e-3)
    any_vis = vis.any(axis=1)
    return jnp.where(any_vis[:, None], GIZMO_COLOR, color)


@partial(jax.jit, static_argnames=("settings",))
def _studio_pass(flat: FlatScene, settings: RenderSettings,
                 selected_node: jnp.ndarray,
                 gizmo_segs: jnp.ndarray):
    """Returns (color (H,W,3), object_id (H,W) int32)."""
    w, h = settings.width, settings.height
    n = w * h
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = pix % w
    py = pix // w
    center = jnp.full((n, 2), 0.5)
    o, d = spawn_camera_rays(flat.camera, px, py, center, center)

    trace_closest, _ = make_tracers(flat, settings)
    rec = trace_closest(o, d, 1e-3, jnp.inf)
    hd = interpolate_hit(flat.geometry, rec, o, d,
                         instances=flat.instances)
    from platinum_tpu.ops import lookup

    if flat.instances is not None:
        # instanced path: the node id lives in the instance table
        node_id = lookup.rows(
            flat.instances.rows, jnp.where(rec.hit, rec.inst, 0)
        )[..., 18].astype(jnp.int32)
    else:
        node_id = lookup.rows(
            flat.geometry.tri_geo, jnp.where(rec.hit, rec.tri, 0)
        )[..., 10].astype(jnp.int32)  # value float, see flatten
    node_id = jnp.where(rec.hit, node_id, -1)

    # Headlight shade: albedo * (0.25 + 0.75|n.d|), like the studio main pass
    albedo = lookup.rows(flat.materials.packed, hd.mat_idx)[..., 0:3]
    ndotl = jnp.abs(jnp.sum(hd.normal * -d, axis=-1))
    shaded = albedo * (0.25 + 0.75 * ndotl)[:, None]

    # Infinite ground grid where rays miss geometry (grid.metal equivalent)
    denom = d[:, 1]
    t_plane = -o[:, 1] / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    gp = o + d * t_plane[:, None]
    hits_plane = (~rec.hit) & (t_plane > 0.0) & (jnp.abs(gp[:, 0]) < 200) & (
        jnp.abs(gp[:, 2]) < 200
    )
    fx = jnp.abs(gp[:, 0] - jnp.round(gp[:, 0]))
    fz = jnp.abs(gp[:, 2] - jnp.round(gp[:, 2]))
    fw = jnp.maximum(t_plane * 2e-3, 8e-3)  # crude screen-space AA width
    line = (fx < fw) | (fz < fw)
    on_x_axis = jnp.abs(gp[:, 2]) < fw * 2
    on_z_axis = jnp.abs(gp[:, 0]) < fw * 2
    fade = jnp.clip(1.0 - t_plane / 120.0, 0.0, 1.0)
    grid_rgb = jnp.where(
        on_x_axis[:, None], AXIS_X_COLOR,
        jnp.where(on_z_axis[:, None], AXIS_Z_COLOR, GRID_COLOR),
    )
    bg = jnp.broadcast_to(BACKGROUND, (n, 3))
    grid_col = jnp.where(
        (hits_plane & (line | on_x_axis | on_z_axis))[:, None],
        bg + (grid_rgb - bg) * fade[:, None],
        bg,
    )

    color = jnp.where(rec.hit[:, None], shaded, grid_col)
    # Camera gizmos (wireframe frusta), depth-tested against the scene
    scene_t = jnp.where(rec.hit, rec.t, 1e30)
    color = _draw_segments(color, o, d, scene_t, gizmo_segs, h, w)
    color = color.reshape(h, w, 3)
    ids = node_id.reshape(h, w)

    # Edge outlines: 3x3 Laplacian over object ids (edge_pass.metal)
    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(0, 1))

    lap = sum(
        (shift(ids, dy, dx) != ids).astype(jnp.float32)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0))
    )
    edge = lap > 0
    neighbors_selected = sum(
        (shift(ids, dy, dx) == selected_node).astype(jnp.int32)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0))
    ) > 0
    is_sel_edge = (
        edge & (neighbors_selected | (ids == selected_node))
        & (selected_node >= 0)  # -1 = nothing selected (matches miss ids)
    )
    color = jnp.where(edge[..., None], OUTLINE, color)
    color = jnp.where(is_sel_edge[..., None], SELECTION, color)
    return color, ids


class StudioRenderer:
    """Editor viewport: shaded preview, object picking, selection outlines."""

    def __init__(self, scene, width: int = 960, height: int = 540):
        self.scene = scene
        self.settings = RenderSettings(width=width, height=height, spp=1,
                                       max_bounces=1, sampler="pcg4d")
        self.camera = StudioCamera()
        self._flat = None
        self._ids = None

    def invalidate(self):
        """Call after scene edits; re-flattens on next render."""
        self._flat = None

    def handle_resize_viewport(self, width: int, height: int):
        from dataclasses import replace

        self.settings = replace(self.settings, width=width, height=height)
        self.invalidate()

    def render(self, selected_node: int = -1) -> np.ndarray:
        if self._flat is None:
            cam_node = self.camera.attach(self.scene)
            self._flat = flatten_scene(self.scene, cam_node, self.settings)
            self._gizmos = camera_gizmo_segments(self.scene,
                                                 exclude_node=cam_node)
        color, ids = _studio_pass(self._flat, self.settings,
                                  jnp.int32(selected_node),
                                  jnp.asarray(self._gizmos))
        self._ids = ids
        return np.asarray(color)

    def readback_object_id_at(self, x: int, y: int) -> int:
        """Click-to-select picking (parity with readbackObjectIdAt)."""
        if self._ids is None:
            self.render()
        return int(np.asarray(self._ids[y, x]))

    # Input forwarding (parity with the studio input handlers)
    def handle_orbit(self, dx: float, dy: float):
        self.camera.orbit(dx, dy)
        self.invalidate()

    def handle_pan(self, dx: float, dy: float):
        self.camera.pan(dx, dy)
        self.invalidate()

    def handle_zoom(self, amount: float):
        self.camera.zoom(amount)
        self.invalidate()

    def camera_to(self, position, target):
        self.camera.move_to(position, target)
        self.invalidate()


@dataclass
class StudioCamera:
    """Orbit/pan/zoom camera with pole clamping
    (parity with studio_camera.cpp:15-59)."""

    target: np.ndarray = None
    distance: float = 20.0
    azimuth: float = 0.6
    elevation: float = 0.5

    def __post_init__(self):
        if self.target is None:
            self.target = np.zeros(3, np.float32)
        self.target = np.asarray(self.target, np.float32)

    @property
    def position(self) -> np.ndarray:
        ce = np.cos(self.elevation)
        return self.target + self.distance * np.array([
            ce * np.sin(self.azimuth), np.sin(self.elevation),
            ce * np.cos(self.azimuth),
        ], np.float32)

    def orbit(self, dx: float, dy: float):
        self.azimuth -= dx * 0.01
        self.elevation = float(np.clip(self.elevation + dy * 0.01,
                                       -np.pi / 2 + 1e-3, np.pi / 2 - 1e-3))

    def pan(self, dx: float, dy: float):
        fwd = (self.target - self.position)
        fwd /= np.linalg.norm(fwd)
        right = np.cross(np.array([0, 1, 0], np.float32), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        scale = self.distance * 0.002
        self.target = self.target + (right * dx + up * dy) * scale

    def zoom(self, amount: float):
        self.distance = float(np.clip(self.distance * (0.9 ** amount), 0.05, 1e5))

    def move_to(self, position, target):
        position = np.asarray(position, np.float32)
        self.target = np.asarray(target, np.float32)
        delta = position - self.target
        self.distance = float(np.linalg.norm(delta))
        self.elevation = float(np.arcsin(np.clip(delta[1] / self.distance, -1, 1)))
        self.azimuth = float(np.arctan2(delta[0], delta[2]))

    def attach(self, scene) -> int:
        """Create/update the studio camera node in the scene; returns its id."""
        for nid in list(scene._nodes):
            if scene.node(nid).name == "__studio_camera__":
                node = scene.node(nid)
                break
        else:
            node = scene.create_node("__studio_camera__")
            node.camera = Camera.with_focal_length(35.0)
        node.camera.focus_distance = self.distance
        node.transform = Transform(
            translation=self.position, target=self.target, track=True
        )
        return node.id
