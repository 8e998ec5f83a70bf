"""Progressive renderer API.

The framework's user-facing render controller — capability parity with
renderer_pt::Renderer (renderer_pt.hpp:14-209): startRender latches camera /
size / spp / GMoN / colorspace settings, render() advances one progressive
sample (all GPU work async; the accumulator is donated device state), status
exposes Ready/Busy/Done, renderProgress/renderTime drive UI, readback pulls
the image to host, and the post stack + export produce final PNG/EXR output.

Progressive accumulation doubles as checkpointing (SURVEY.md §5): the
accumulator can be saved/restored as EXR at any point and rendering resumed.
"""

from __future__ import annotations

import enum
import time

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.core import colorspace as cs
from platinum_tpu.ops.gmon import gmon_combine
from platinum_tpu.post.options import PostProcessOptions
from platinum_tpu.post.pipeline import postprocess_jit
from platinum_tpu.render import integrator
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import FLAG_GMON, FlatScene, RenderSettings


class RenderStatus(enum.IntFlag):
    READY = 1
    BUSY = 2
    DONE = 4


class Renderer:
    def __init__(self, scene, post_options: PostProcessOptions | None = None):
        self.scene = scene
        self.post_options = post_options or PostProcessOptions()
        self.settings: RenderSettings | None = None
        self.flat: FlatScene | None = None
        self._buckets = None        # list of B (H*W, 3) accumulators
        self._accumulated = 0
        self._start_time = None
        self._end_time = None

    # ------------------------------------------------------------------
    # Control (parity with startRender/render/status, renderer_pt.cpp)
    # ------------------------------------------------------------------

    def start_render(self, camera_node_id: int | None = None,
                     settings: RenderSettings | None = None,
                     preview_scale: int = 0, preview_spp: int = 8):
        """Latch settings, flatten the scene and reset accumulation.

        `preview_scale` > 1 enables the PREVIEW CADENCE LADDER: the first
        `preview_spp` progressive steps render at (W/scale, H/scale) — a
        scale² cheaper frame, hitting interactive cadence on scenes whose
        full-res step is seconds — and `readback()` upscales them until the
        full-res accumulator has caught up in per-pixel noise. The
        reference achieves interactive cadence with 1 full-res
        spp/frame on dedicated silicon (renderer_pt.cpp:131-158); the
        ladder is the TPU-native answer to the same capability. Full-res
        accumulation is completely unaffected (it starts from sample 0
        after the preview phase), so final images are identical with the
        ladder on or off."""
        import dataclasses

        self.settings = settings or self.settings or RenderSettings()
        self._host_accel = {}
        self.flat = flatten_scene(self.scene, camera_node_id, self.settings,
                                  host_accel_out=self._host_accel)
        from platinum_tpu.render.flatten import analyze_features

        self._features = analyze_features(self.flat)
        if self.settings.tracer == "bf" and \
                self.flat.wbvh_meta is not None:
            from platinum_tpu.ops.bfstream import _tree_depth
            import numpy as _np

            self.settings = dataclasses.replace(
                self.settings,
                bf_depth=_tree_depth(_np.asarray(self.flat.wbvh_meta)))
        if self.settings.compact_plan == "auto":
            from platinum_tpu.render import autoplan

            self.settings = autoplan.resolve_auto_plan(self.flat,
                                                       self.settings)
        n_buckets = max(1, self.settings.gmon_buckets
                        if self.settings.flags & FLAG_GMON else 1)
        # python list of per-bucket device accumulators: updating one
        # bucket never round-trips (or re-writes) the whole bucket array
        self._buckets = [jnp.zeros((self.settings.num_pixels, 3))
                         for _ in range(n_buckets)]
        self._accumulated = 0

        self._pv = None
        if preview_scale and preview_scale > 1:
            s = self.settings
            pv_settings = dataclasses.replace(
                s, width=-(-s.width // preview_scale),
                height=-(-s.height // preview_scale),
                spp=preview_spp,
                # preview steps are single-spp render_step calls; inheriting
                # a caller's spp_batch > 1 would raise at the first step
                spp_batch=1,
                flags=s.flags & ~FLAG_GMON)
            pv_flat = flatten_scene(self.scene, camera_node_id, pv_settings)
            if pv_settings.compact_plan == "auto":
                from platinum_tpu.render import autoplan as _ap

                pv_settings = _ap.resolve_auto_plan(pv_flat, pv_settings)
            self._pv = dict(
                flat=pv_flat, settings=pv_settings, scale=preview_scale,
                accum=jnp.zeros((pv_settings.num_pixels, 3)),
                done=0, spp=preview_spp,
                features=analyze_features(pv_flat))
        self._start_time = time.perf_counter()
        self._end_time = None

    def render(self):
        """One progressive step (one sample per pixel), like the reference's
        per-frame 1-spp dispatch (renderer_pt.cpp:131-158). During the
        preview-ladder phase a step advances the low-res accumulator
        instead; full-res sample indices are untouched."""
        if self.flat is None or self.status & RenderStatus.DONE:
            return
        if self._pv is not None and self._pv["done"] < self._pv["spp"]:
            pv = self._pv
            t0 = time.perf_counter()
            pv["accum"] = integrator.render_step(
                pv["flat"], pv["settings"], pv["accum"],
                jnp.int32(pv["done"]), sample_seed=jnp.int32(pv["done"]),
                features=pv["features"])
            jax.block_until_ready(pv["accum"])
            pv["done"] += 1
            from platinum_tpu.utils import telemetry as _t

            if _t.enabled():
                _t.log_event("preview_frame", frame=pv["done"],
                             scale=pv["scale"],
                             ms=(time.perf_counter() - t0) * 1e3)
            return
        s = self.settings
        n_buckets = len(self._buckets)
        samples_per_bucket = -(-s.spp // n_buckets)
        bucket = min(self._accumulated // samples_per_bucket, n_buckets - 1)
        local_idx = self._accumulated % samples_per_bucket

        B = max(1, s.spp_batch)
        if B > 1:
            # sample-batched wavefronts: one call advances B samples (the
            # progressive cadence coarsens to B). GMoN bucket boundaries
            # must stay sample-exact, so batching requires one bucket.
            if n_buckets > 1:
                raise ValueError("spp_batch > 1 is incompatible with GMoN "
                                 "bucketing; use spp_batch=1")
            take = min(B, s.spp - self._accumulated)
            if take % B != 0:
                raise ValueError(f"settings.spp ({s.spp}) must be a "
                                 f"multiple of spp_batch ({B})")
            self._buckets[0] = integrator.render_step_n(
                self.flat, s, self._buckets[0],
                jnp.int32(self._accumulated), take,
                features=self._features,
            )
            self._accumulated += take
        else:
            self._buckets[bucket] = integrator.render_step(
                self.flat, s, self._buckets[bucket], jnp.int32(local_idx),
                sample_seed=jnp.int32(self._accumulated),
                features=self._features,
            )
            self._accumulated += 1
        # structured telemetry (PLATINUM_TPU_LOG=1): spp/sec + paths/sec
        from platinum_tpu.utils import telemetry

        if telemetry.enabled():
            now = time.perf_counter()
            if (self._accumulated == s.spp
                    or now - getattr(self, "_last_log", 0.0) > 2.0):
                self._last_log = now
                el = max(now - self._start_time, 1e-9)
                sps = self._accumulated / el
                telemetry.log_event(
                    "render_step", spp_done=self._accumulated, spp=s.spp,
                    elapsed_s=el, spp_per_sec=sps,
                    paths_per_sec=sps * s.num_pixels,
                    progress=self._accumulated / s.spp)
        if self._accumulated >= s.spp:
            jax.block_until_ready(self._buckets)
            self._end_time = time.perf_counter()
            from platinum_tpu.utils import telemetry as _t

            _t.log_event("render_done", spp=s.spp,
                         elapsed_s=self._end_time - self._start_time)

    def update_instance_transform(self, node_id: int, transform=None):
        """Apply a transform edit WITHOUT rebuilding the BVH (instanced
        scenes only — the reference's TLAS-refit path,
        renderer_pt.cpp:653-749): the instance's world-space BLAS node rows
        and feature matrix are recomputed and re-uploaded, the TLAS is
        refit in place, and accumulation restarts. Raises for non-instanced
        scenes (a baked soup needs a re-flatten)."""
        import dataclasses

        import numpy as np

        from platinum_tpu.accel.tlas import update_instance_transform
        from platinum_tpu.render.types import InstanceTable

        if not self._host_accel or self.flat.instances is None:
            raise ValueError("scene is not instanced; call start_render()")
        if transform is not None:
            self.scene.node(node_id).transform = transform
        ibvh = self._host_accel["ibvh"]
        wides = self._host_accel["mesh_wides"]
        idx = None
        for i, inst in enumerate(self._host_accel["instances"]):
            if inst.node_id == node_id:
                idx = i
                break
        if idx is None:
            raise KeyError(f"node {node_id} is not a mesh instance")
        m = self.scene.world_transform(node_id)
        inst_rows = np.asarray(self.flat.instances.rows).copy()
        inst_rows[idx, 0:9] = np.asarray(m[:3, :3], np.float64).reshape(-1)
        nm = np.linalg.inv(np.asarray(m[:3, :3], np.float64)).T
        inst_rows[idx, 9:18] = nm.reshape(-1)
        feat = np.asarray(self.flat.instances.feat).copy()
        if ibvh is not None:
            update_instance_transform(ibvh, wides, idx, m)
            feat[idx] = ibvh.inst_feat[idx]
            accel_update = dict(wbvh_nodes=jnp.asarray(ibvh.nodes))
        else:
            # partitioned instanced scene (accel.tlas.partition_instanced):
            # refit the OWNING partition only and re-upload just its arrays.
            # Each partition's mesh library is compacted to the meshes it
            # uses, so its local update sees the compacted wides list.
            from platinum_tpu.accel.wide import build_octant_orders
            from platinum_tpu.render.flatten import _instanced_part_arrays

            parts = list(self.flat.wbvh_parts)
            for pi, (part, gids, used) in enumerate(
                    self._host_accel["ibvh_parts"]):
                where = np.nonzero(np.asarray(gids) == idx)[0]
                if not len(where):
                    continue
                local = int(where[0])
                sub_wides = [wides[u] for u in used]
                update_instance_transform(part, sub_wides, local, m)
                feat[idx] = part.inst_feat[local]
                parts[pi] = _instanced_part_arrays(part, np.asarray(gids),
                                                   build_octant_orders)
                break
            else:
                raise KeyError(f"instance {idx} not in any partition")
            accel_update = dict(wbvh_parts=tuple(parts))
        self.flat = dataclasses.replace(
            self.flat,
            **accel_update,
            instances=InstanceTable(
                rows=jnp.asarray(inst_rows.astype(np.float32)),
                slot_mat=self.flat.instances.slot_mat,
                feat=jnp.asarray(feat),
            ),
        )
        # progressive restart (accumulators are per-scene-state)
        self._buckets = [jnp.zeros_like(b) for b in self._buckets]
        self._accumulated = 0
        self._start_time = time.perf_counter()
        self._end_time = None

    def render_all(self):
        while not (self.status & RenderStatus.DONE):
            self.render()

    @property
    def status(self) -> RenderStatus:
        if self.flat is None:
            return RenderStatus.READY
        if self._accumulated < self.settings.spp:
            return RenderStatus.READY | RenderStatus.BUSY
        return RenderStatus.READY | RenderStatus.DONE

    @property
    def completed_spp(self) -> int:
        return self._accumulated

    @property
    def render_progress(self) -> float:
        if self.flat is None or self.settings.spp == 0:
            return 0.0
        return self._accumulated / self.settings.spp

    @property
    def render_time(self) -> float:
        if self._start_time is None:
            return 0.0
        end = self._end_time or time.perf_counter()
        return end - self._start_time

    # ------------------------------------------------------------------
    # Output
    # ------------------------------------------------------------------

    def _combined(self) -> jnp.ndarray:
        n_buckets = len(self._buckets)
        if n_buckets == 1:
            return self._buckets[0]
        samples_per_bucket = -(-self.settings.spp // n_buckets)
        full = max(1, min(
            (self._accumulated + samples_per_bucket - 1) // samples_per_bucket,
            n_buckets,
        ))
        cap = self.settings.gmon_cap or 1.0
        return gmon_combine(jnp.stack(self._buckets), full, cap)

    def _preview_active(self) -> bool:
        """Show the upscaled preview until the full-res accumulator has
        comparable per-pixel noise (a handful of full-res samples)."""
        # Never past the end of the render: with spp < 4 the full-res
        # accumulator IS the finished image once _accumulated == spp, and
        # readback()/export must return it, not the upscaled preview.
        return (self._pv is not None and self._pv["done"] > 0
                and self._accumulated < min(self._pv["done"], 4,
                                            self.settings.spp))

    def readback(self) -> np.ndarray:
        """(H, W, 3) linear radiance in the working colorspace. During the
        preview-ladder phase this is the low-res frame upscaled
        (nearest-neighbour) to the full output size."""
        s = self.settings
        if self._preview_active():
            pv = self._pv
            ps = pv["settings"]
            img = np.asarray(pv["accum"]).reshape(ps.height, ps.width, 3)
            k = pv["scale"]
            img = np.repeat(np.repeat(img, k, axis=0), k, axis=1)
            return img[:s.height, :s.width]
        return np.asarray(self._combined()).reshape(s.height, s.width, 3)

    def output_image(self, post_options: PostProcessOptions | None = None) -> np.ndarray:
        """Display-encoded (H, W, 3) float in the output colorspace."""
        s = self.settings
        img = self._combined().reshape(s.height, s.width, 3)
        out = postprocess_jit(
            img, post_options or self.post_options,
            s.working_space, s.output_space,
        )
        return np.asarray(out)

    def export_png(self, path: str, post_options=None):
        from platinum_tpu.io.png import write_png

        write_png(path, self.output_image(post_options),
                  output_space=self.settings.output_space)

    def export_exr(self, path: str):
        from platinum_tpu.io.exr import write_exr

        write_exr(path, self.readback())

    # Checkpoint / resume: the accumulator is the checkpoint (SURVEY.md §5)
    def save_checkpoint(self, path: str):
        np.savez_compressed(
            path, buckets=np.stack([np.asarray(b) for b in self._buckets]),
            accumulated=self._accumulated,
        )

    def load_checkpoint(self, path: str):
        data = np.load(path)
        self._buckets = [jnp.asarray(b) for b in data["buckets"]]
        self._accumulated = int(data["accumulated"])
