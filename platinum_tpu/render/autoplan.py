"""Measured wavefront-compaction schedules (settings.compact_plan).

The static plan in `integrator._compaction_plan` halves the wave every
TWO bounces down to n/8 — a one-size-fits-all guess. Measured per-bounce
live fractions (perf/live_fractions.py) show real scenes decay much
faster: the Sponza-class colonnade is 0.23 live after bounce 2 against
the plan's 0.5 cap (4x oversized waves by bounce 6), the GGX sphere
sweep is 0.10, and an HDR-environment scene like the helmet collapses to
0.017 live after bounce ONE — yet the static plan doesn't compact at all
until bounce 2. Since trace cost scales ~linearly with wave width, the
tail bounces of every shading-heavy config pay a multi-x overhang.

`compact_plan="auto"` probes the scene's own decay before compiling: a
strided subset of pixels (~16k lanes) runs the stepped bounce path once,
per-bounce live fractions are read back, and the schedule is compiled to
`headroom x live` caps (512-lane multiples, monotone, opening a new
while_loop segment only when the cap shrinks enough to pay its extra
compile). Capping below the instantaneous live count stays unbiased —
`_compact_state` reweights survivors Horvitz-Thompson style (tested in
test_wavefront_compaction_unbiased) — but it trades variance, so the
default headroom keeps truncation rare.

The probe must run OUTSIDE jit (it executes device programs), so "auto"
is resolved by the host-level entry points (Renderer.start_render,
integrator.render, bench) via `resolve_auto_plan`; the jitted paths
reject an unresolved "auto" loudly.

Reference analog: the wavefront-compaction queues of GPU path tracers
size themselves dynamically per bounce; static XLA shapes can't, so a
measured static schedule is the TPU-native counterpart (SURVEY §7 step
6, BASELINE config 4).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.render.types import RenderSettings

PROBE_LANES = 16384   # strided pixel subset: plenty for a population
                      # fraction, cheap even on 1080p scenes
MIN_COMPACT_N = 8192  # below this the static plan doesn't compact either


def measure_live_fractions(flat, settings: RenderSettings,
                           probe_spp: int = 1) -> np.ndarray:
    """Per-bounce live-lane fractions, measured on-device.

    Runs `probe_spp` samples of a strided ~PROBE_LANES-pixel subset
    through the stepped bounce path (dense, no compaction) and returns
    the mean fraction of active lanes after each bounce — shape
    (max_bounces,). Fractions over a uniform pixel stride are unbiased
    estimates of the full wave's occupancy.
    """
    from platinum_tpu.render import integrator
    from platinum_tpu.render.flatten import analyze_features

    probe = replace(settings, compact=False, compact_plan=None,
                    fuse_shadow=False, spp_batch=1)
    # probe with the scene's pruned feature set: the full ALL_FEATURES
    # bounce body would compile every lobe + all texture slots (minutes
    # via the remote compile service) and measure survival under a
    # different shading configuration than the actual render
    feats = analyze_features(flat)
    npx = settings.num_pixels
    stride = max(1, npx // PROBE_LANES)
    ids = np.arange(0, npx, stride, dtype=np.uint32)

    @partial(jax.jit, static_argnames=("s",))
    def _init(fl, s, si):
        return integrator.init_path_state(fl, s, si, jnp.asarray(ids))

    fr = np.zeros(settings.max_bounces, np.float64)
    for si in range(probe_spp):
        state = _init(flat, probe, jnp.int32(si))
        for b in range(settings.max_bounces):
            state = integrator.bounce_step_jit(flat, probe, state,
                                               features=feats)
            fr[b] += float(jnp.mean(state["active"].astype(jnp.float32)))
    return (fr / probe_spp).astype(np.float64)


def plan_from_live(live, n: int, max_bounces: int, headroom: float = 1.5,
                   floor: int = 2048, shrink: float = 0.67):
    """Build a compaction plan [(cap, bounce_limit), ...] from measured
    per-bounce live fractions.

    live[k] = fraction of lanes still active after bounce k+1. The cap
    entering bounce b (b >= 2) is headroom x live-after-(b-1) x n rounded
    up to a 512 multiple, clamped to [floor, n] and made monotone
    nonincreasing. A new plan segment (its own while_loop + bounce-body
    compile) opens only when the cap falls below `shrink` x the current
    segment's, so segment count stays ~log of the total decay.
    """
    assert len(live) >= max_bounces - 1, (len(live), max_bounces)
    floor = max(512, int(floor))
    caps = []
    cap_min = n
    for b in range(2, max_bounces + 1):
        want = float(headroom) * float(live[b - 2]) * n
        c = int(-(-max(want, float(floor)) // 512) * 512)
        cap_min = min(cap_min, min(c, n))
        caps.append(cap_min)

    plan = []
    cur = n
    for i, c in enumerate(caps):
        b = i + 2                      # cap entering bounce b
        if c <= shrink * cur:
            plan.append((cur, b - 1))
            cur = c
    plan.append((cur, max_bounces))
    return tuple(plan)


def validate_plan(plan, n: int, max_bounces: int) -> None:
    """Loud validation of an explicit compact_plan (SURVEY §5 config
    hygiene): caps positive and nonincreasing, bounce limits strictly
    increasing and ending at max_bounces."""
    if not plan:
        raise ValueError("compact_plan must be a non-empty tuple")
    prev_cap, prev_b = None, 0
    for seg in plan:
        if len(seg) != 2:
            raise ValueError(f"compact_plan segment {seg!r} is not "
                             "(cap, bounce_limit)")
        cap, b = int(seg[0]), int(seg[1])
        if cap <= 0 or cap > n:
            raise ValueError(f"compact_plan cap {cap} out of (0, {n}]")
        if prev_cap is not None and cap > prev_cap:
            raise ValueError("compact_plan caps must be nonincreasing: "
                             f"{plan}")
        if b <= prev_b:
            raise ValueError("compact_plan bounce limits must be strictly "
                             f"increasing: {plan}")
        prev_cap, prev_b = cap, b
    if prev_b != max_bounces:
        raise ValueError(f"compact_plan must end at max_bounces="
                         f"{max_bounces}: {plan}")


def resolve_auto_plan(flat, settings: RenderSettings,
                      probe_spp: int = 1) -> RenderSettings:
    """Replace compact_plan="auto" with a measured plan (no-op otherwise).

    Must be called from host code BEFORE the settings reach a jitted
    render path; Renderer.start_render, integrator.render and bench.py
    all do. The probe costs one stepped ~16k-lane sample plus its
    bounce-body compile.
    """
    if settings.compact_plan != "auto":
        return settings
    n_lanes = settings.num_pixels * max(1, settings.spp_batch)
    if not settings.compact or n_lanes < MIN_COMPACT_N \
            or settings.max_bounces <= 3:
        return replace(settings, compact_plan=None)
    live = measure_live_fractions(flat, settings, probe_spp=probe_spp)
    plan = plan_from_live(live, n_lanes, settings.max_bounces)
    return replace(settings, compact_plan=plan)
