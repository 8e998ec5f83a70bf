"""White-furnace sweep across the material space — the fidelity audit tool.

Renders an albedo-1 sphere in a constant 0.5 environment for a grid of
material configurations and prints the signed energy error of each (0 =
perfectly energy-preserving estimator + BSDF). This is the tool that
localized the round-3 fidelity fixes:

  * the MIS partition-of-unity violation in partial-lobe-pdf sampling
    (settings.mixture_pdf; reference-inherited, -5e-3 on rough
    dielectrics),
  * the interior-bounce energy loss from signed cosines hitting the
    clamp-to-edge energy LUTs (models/bsdf._orient_cosines; -6.2% on a
    transmission-blend furnace),
  * the ~3e-3 trilinear cost of the tex_rough 3-D LUT path vs the
    per-material energy rows,
  * transmitted BSDF segments taking the standard p_b/(p_b+p_l) MIS
    weight even though NEE has ZERO yield on transmitted directions
    (evaluate() is reflection-side only, matching bsdf.metal:200) — they
    must take weight 1; this was most of the "Turquin is approximate"
    deficit: thick glass furnace -1.0%/-1.8% (r 0.4/0.8) -> +0.1%.

  * thin glass +1.1% overshoot: the reference's thin-transmit branch
    accepts flipped below-horizon reflections (no validity check,
    bsdf.metal:600-602) that the 1/E compensation's E LUT assumes lost —
    rejecting them (models/bsdf.py sample()) makes 1/E exact; the thin
    furnace closes to within 5e-4 across roughness.

  * clearcoat, three defects: (a) the reference's eval drops the SMOOTH
    coat's base dimming entirely (bsdf.metal:487-488 returns {} without
    setting fresnel_ss; :220 then reads an uninitialized float) — NEE
    sees an undimmed base while sampling pays the coat pick: +0.7%
    MIS-only overshoot; (b) rough coats dim the base with F at the
    deterministic wm(wo,wi), not the true sampling marginal c·F̄(wo)
    (F̄ = mean Fresnel over the coat VNDF — ±0.8% on coat=1 furnaces);
    (c) the coat lobe ships single-scatter, and the naive 1/E
    compensation under-corrects because F(wm) and the VNDF weight
    G2/G1 are negatively correlated. All three fixed: evaluate() dims
    with c·F̄(wo) (load-time-baked quadrature table, exact for smooth
    coats as F(|wo.z|)) and the coat lobe is scaled by F̄/E_F (E_F =
    Fresnel-WEIGHTED albedo), making the sampled coat yield c·F̄
    identically. Coat furnaces: within 1.1e-3 for coat roughness ≤0.6
    (-2.2e-3 at the 0.9 corner).
  * the device LUT path and the flatten-baked energy rows silently
    loaded DIFFERENT bundles (reference-derived vs self-baked). The
    sweep proved the reference's tables are wrong normalizers for this
    estimator (rough-glass furnace -3.2%: its sampling conventions
    differ by design — rejections, oriented cosines, weight-1
    transmitted MIS). Both paths now load the self-baked bundle
    (ops/luts._bundle_path; PLATINUM_TPU_LUTS=ref for parity runs).

With all of the above the sweep sits within 2.1e-3 worst-case across
the isotropic material space (most cases ≤1e-3), and within 1.3e-3 on
the anisotropic cases (the azimuth-averaging gap below; the metal/thin
aniso cases are ≤4e-4).

  * ANISOTROPIC energy (was a documented shared limitation, now fixed
    beyond the reference): both implementations originally looked E up
    at the scalar roughness (= geometric-mean alpha), which
    OVERestimates E under anisotropy (MC: 0.90 vs true 0.77 at μ=0.9,
    r=0.5, aniso=0.9) so the (1−E) multiscatter terms under-fill —
    measured -1.8% on an aniso=0.9 metal furnace. The true directional
    albedo is nearly azimuth-flat, so the net-new azimuth-averaged
    E_aniso/E_avg_aniso tables (tools/lut_baker.bake_E_aniso; indexed
    by |aniso| via x/y-swap symmetry) close it: aniso metal furnaces
    now read -3.4e-4 (0.9), +4e-5 (0.5), -8e-5 (rotated 0.8); aniso
    thin glass -6e-5. The reference's LUT set is isotropic-only.
    Aniso DIELECTRICS additionally need the dielectric-specular
    multiscatter albedo corrected: the 4-D E_ms_aniso /
    E_ms_avg_aniso tables (lut_baker.bake_E_ms_aniso) close the
    r=0.6 aniso=0.9 corner from -3.1e-3 to -1.1e-3 (768 spp). The
    remainder is the azimuth-averaging correlation gap — the product
    of azimuth-averaged (1−E_ms) factors ≠ the average of the
    products; exact closure needs a 5-D azimuth-resolved table.

Usage: python tools/furnace_sweep.py [quick|full]
"""

from __future__ import annotations

import sys

import numpy as np


CASES = [
    dict(albedo=1.0, roughness=0.05, metallic=0.0),
    dict(albedo=1.0, roughness=0.3, metallic=0.0),
    dict(albedo=1.0, roughness=0.7, metallic=0.0),
    dict(albedo=1.0, roughness=1.0, metallic=0.0),
    dict(albedo=1.0, roughness=0.3, metallic=1.0),
    dict(albedo=1.0, roughness=0.7, metallic=1.0),
    dict(albedo=1.0, roughness=0.5, metallic=0.25),
    dict(albedo=1.0, roughness=0.5, metallic=0.5),
    dict(albedo=1.0, roughness=0.5, metallic=0.75),
    dict(albedo=1.0, roughness=0.5, metallic=0.0, ior=1.8),
    dict(albedo=1.0, roughness=0.9, metallic=0.0, ior=1.1),
    dict(albedo=1.0, roughness=0.4, transmission=1.0, ior=1.5),
    dict(albedo=1.0, roughness=0.8, transmission=1.0, ior=1.5),
    dict(albedo=1.0, roughness=0.4, transmission=0.5, ior=1.5),
    dict(albedo=1.0, roughness=0.4, transmission=1.0, ior=1.5, thin=True),
    dict(albedo=1.0, roughness=0.4, clearcoat=1.0),
    dict(albedo=1.0, roughness=0.4, clearcoat=1.0, clearcoat_roughness=0.3),
    dict(albedo=1.0, roughness=0.4, clearcoat=1.0, clearcoat_roughness=0.6),
    dict(albedo=1.0, roughness=0.4, metallic=1.0, anisotropy=0.5),
    dict(albedo=1.0, roughness=0.4, metallic=1.0, anisotropy=0.9),
    dict(albedo=1.0, roughness=0.5, metallic=1.0, anisotropy=0.8,
         anisotropy_rotation=0.25),
    dict(albedo=1.0, roughness=0.6, metallic=0.0, anisotropy=0.9),
    dict(albedo=1.0, roughness=0.4, transmission=1.0, ior=1.5,
         anisotropy=0.9, thin=True),
]


def run(spp=48, size=24, bounces=24):
    from platinum_tpu.app.scenes import make_furnace_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    worst = 0.0
    for c in CASES:
        scene, cam = make_furnace_scene(env_value=0.5, **c)
        s = RenderSettings(width=size, height=size, spp=spp,
                           max_bounces=bounces, kernel="mis",
                           sampler="pcg4d")
        flat = flatten_scene(scene, cam, s)
        img = np.asarray(render(flat, s, features=analyze_features(flat)))
        err = float(img.mean() - 0.5)
        worst = max(worst, abs(err))
        print(f"{err:+.5f}  {c}", flush=True)
    print(f"worst |err|: {worst:.5f}")


if __name__ == "__main__":
    full = "full" in sys.argv
    run(spp=192 if full else 48, size=32 if full else 24)
