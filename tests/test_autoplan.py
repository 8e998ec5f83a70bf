"""Measured wavefront-compaction schedules (render/autoplan.py).

The static compaction plan halves the wave every two bounces; measured
per-bounce live fractions (perf/live_fractions.py) show real scenes
decay much faster. settings.compact_plan lets explicit or auto-measured
schedules replace the static guess; compaction itself stays unbiased
(Horvitz-Thompson reweighting, test_wavefront_compaction_unbiased), so
these tests cover plan construction, validation, resolution, and that a
measured plan renders mean-consistent with the dense wavefront.
"""

from dataclasses import replace

import numpy as np
import pytest

from platinum_tpu.render import autoplan, integrator
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.types import RenderSettings


def test_plan_from_live_properties():
    # fast-decaying scene: 30% live after bounce 1, 10% after 2, ...
    live = [0.3, 0.1, 0.05, 0.02, 0.01, 0.005, 0.003]
    n = 1 << 20
    plan = autoplan.plan_from_live(live, n, max_bounces=8)
    autoplan.validate_plan(plan, n, 8)  # monotone, ends at max_bounces
    # the first segment is full width (camera bounce is always dense)
    assert plan[0][0] == n
    # headroom 1.5 x 0.3 x n = 0.45n -> the bounce-2 cap must be far
    # below the static plan's first cap (which never drops below n/2
    # until bounce 4)
    caps = {b: c for c, b in plan}
    assert min(caps.values()) <= 0.05 * n
    # caps are 512-lane multiples
    assert all(c % 512 == 0 or c == n for c, _ in plan)


def test_plan_from_live_slow_decay_single_segment():
    # nothing ever dies -> no segment worth opening beyond the first
    live = [1.0] * 8
    plan = autoplan.plan_from_live(live, 65536, max_bounces=8)
    assert plan == ((65536, 8),)


def test_validate_plan_rejects_bad_plans():
    with pytest.raises(ValueError):
        autoplan.validate_plan((), 1024, 8)
    with pytest.raises(ValueError):  # caps increase
        autoplan.validate_plan(((512, 2), (1024, 8)), 4096, 8)
    with pytest.raises(ValueError):  # bounce limits not increasing
        autoplan.validate_plan(((1024, 4), (512, 4)), 4096, 8)
    with pytest.raises(ValueError):  # doesn't end at max_bounces
        autoplan.validate_plan(((1024, 4),), 4096, 8)
    with pytest.raises(ValueError):  # cap over n
        autoplan.validate_plan(((8192, 8),), 4096, 8)


def test_unresolved_auto_rejected_by_jit_path():
    from platinum_tpu.app.scenes import make_cornell_scene

    scene, cam = make_cornell_scene()
    s = RenderSettings(width=96, height=96, spp=1, max_bounces=6,
                       kernel="mis", sampler="pcg4d", compact=True,
                       compact_plan="auto")
    flat = flatten_scene(scene, cam, s)
    with pytest.raises(ValueError, match="resolved on the host"):
        integrator.render_step(flat, s, np.zeros((s.num_pixels, 3)),
                               np.int32(0))


def test_compact_plan_requires_compact():
    with pytest.raises(ValueError, match="compact=True"):
        integrator._compaction_plan(
            16384, RenderSettings(width=128, height=128,
                                  compact_plan=((16384, 50),)))


def test_compaction_plan_override_clamp_merge():
    s = RenderSettings(width=128, height=128, max_bounces=8, compact=True,
                       compact_plan=((100000, 2), (50000, 4), (4096, 8)))
    # lane count 16384 < the first two caps: both clamp to n and merge
    plan = integrator._compaction_plan(16384, s)
    assert plan == [(16384, 4), (4096, 8)]


def test_compaction_plan_rescales_for_sharded_waves():
    """Plan caps are full-wave lane counts; a sharded call (n_local <
    num_pixels x spp_batch) must rescale them proportionally — clamping
    to n_local would leave every cap at full shard width and silently
    disable the schedule (the static plan would have compacted)."""
    s = RenderSettings(width=128, height=128, max_bounces=8, compact=True,
                       compact_plan=((16384, 2), (6144, 4), (2048, 8)))
    # full wave: caps pass through unchanged
    assert integrator._compaction_plan(16384, s) == \
        [(16384, 2), (6144, 4), (2048, 8)]
    # half shard (e.g. tile=2): caps scale by 1/2, ceil to 512 grain
    plan = integrator._compaction_plan(8192, s)
    assert plan == [(8192, 2), (3072, 4), (1024, 8)], plan
    autoplan.validate_plan(tuple(plan), 8192, 8)
    # tiny shards fall below the compaction threshold entirely
    assert integrator._compaction_plan(4096, s) == [(4096, 8)]


def test_resolve_auto_plan_and_render():
    """End-to-end: auto-resolve on a real scene, then render with the
    measured plan; mean agrees with the dense wavefront (unbiased)."""
    from platinum_tpu.app.scenes import make_cornell_scene

    scene, cam = make_cornell_scene()
    base = RenderSettings(width=96, height=96, spp=12, max_bounces=6,
                          kernel="mis", sampler="pcg4d")
    dense = replace(base, compact=False)
    auto = replace(base, compact=True, compact_plan="auto")
    flat = flatten_scene(scene, cam, dense)

    resolved = autoplan.resolve_auto_plan(flat, auto)
    assert isinstance(resolved.compact_plan, tuple), resolved.compact_plan
    autoplan.validate_plan(resolved.compact_plan, base.num_pixels,
                           base.max_bounces)

    feats = analyze_features(flat)
    img_d = np.asarray(integrator.render(flat, dense, features=feats))
    img_a = np.asarray(integrator.render(flat, resolved, features=feats))
    assert np.isfinite(img_a).all()
    rel = abs(img_a.mean() - img_d.mean()) / img_d.mean()
    assert rel < 0.03, (img_a.mean(), img_d.mean(), resolved.compact_plan)


def test_renderer_start_render_resolves_auto():
    """Renderer.start_render must resolve "auto" before its jitted
    render steps see the settings."""
    from platinum_tpu.app.scenes import make_cornell_scene
    from platinum_tpu.render.renderer import Renderer

    scene, cam = make_cornell_scene()
    r = Renderer(scene)
    r.start_render(cam, RenderSettings(width=96, height=96, spp=2,
                                       max_bounces=6, kernel="mis",
                                       sampler="pcg4d", compact=True,
                                       compact_plan="auto"))
    assert isinstance(r.settings.compact_plan, tuple)
    r.render()  # one progressive step runs under the resolved plan
    assert r.completed_spp == 1


def test_resolve_auto_noop_cases():
    """auto on a too-small wave or without compact resolves to None."""
    from platinum_tpu.app.scenes import make_cornell_scene

    scene, cam = make_cornell_scene()
    small = RenderSettings(width=32, height=32, spp=1, max_bounces=6,
                           compact=True, compact_plan="auto")
    flat = flatten_scene(scene, cam, small)
    assert autoplan.resolve_auto_plan(flat, small).compact_plan is None
    off = RenderSettings(width=128, height=128, spp=1, max_bounces=6,
                         compact=False, compact_plan="auto")
    assert autoplan.resolve_auto_plan(flat, off).compact_plan is None
