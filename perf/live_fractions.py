"""Per-bounce live-lane fractions per bench scene (CPU, low-res).

Live fraction is scene geometry + estimator behavior, not hardware —
so measure on CPU at reduced resolution and use the result to judge
whether the compaction plan (integrator._compaction_plan: halve every
TWO bounces to n/8) leaves tail-bounce population on the table.

Usage: JAX_PLATFORM_NAME=cpu python perf/live_fractions.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from platinum_tpu.app.scenes import (  # noqa: E402
    make_colonnade_scene, make_helmet_scene, make_spheres_scene)
from platinum_tpu.render import integrator  # noqa: E402
from platinum_tpu.render.flatten import flatten_scene  # noqa: E402
from platinum_tpu.render.types import RenderSettings  # noqa: E402


def measure(name, scene, cam, bounces, spp_probe=4):
    s = RenderSettings(width=128, height=128, spp=spp_probe,
                       max_bounces=bounces, kernel="mis", sampler="pcg4d",
                       tracer="brute" if name == "cornell" else "packet")
    flat = flatten_scene(scene, cam, s)
    n = s.width * s.height
    fr = jnp.zeros(bounces)
    for si in range(spp_probe):
        state = integrator._init_state_jit(flat, s, jnp.int32(si))
        row = []
        for _ in range(bounces):
            state = integrator.bounce_step_jit(flat, s, state)
            row.append(jnp.mean(state["active"].astype(jnp.float32)))
        fr = fr + jnp.stack(row)
    fr = jax.device_get(fr / spp_probe)
    print(f"{name:12s} live after bounce k: "
          + " ".join(f"{v:.3f}" for v in fr))
    # the comparison target is the STATIC compaction schedule, so ask the
    # plan builder with compaction on (the probe settings above run dense)
    from dataclasses import replace

    caps = {c[1]: c[0] / n
            for c in integrator._compaction_plan(n, replace(s, compact=True))}
    print(f"{'':12s} static plan caps (bounce->frac): {caps}")


def main():
    measure("colonnade", *make_colonnade_scene(), bounces=8)
    measure("spheres", *make_spheres_scene(), bounces=6)
    measure("helmet", *make_helmet_scene(), bounces=6)


if __name__ == "__main__":
    main()
