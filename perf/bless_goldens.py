"""Re-bless golden EXRs + measure the analytic furnace residual.

Run AFTER all render-affecting changes of a round (LUT bundle, tangents,
estimator fixes) so the blessed images match the shipped code. Prints the
furnace residual so test_golden's analytic tolerance can be set from data.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    t0 = time.time()
    import test_golden

    test_golden.bless()
    print("blessed in", round(time.time() - t0, 1), "s", flush=True)

    from platinum_tpu.app.scenes import make_furnace_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_furnace_scene(albedo=1.0, roughness=1.0, env_value=0.5)
    settings = RenderSettings(width=64, height=64, spp=64, max_bounces=12,
                              kernel="mis", sampler="pcg4d")
    flat = flatten_scene(scene, cam, settings)
    img = np.asarray(render(flat, settings, features=analyze_features(flat)))
    print("furnace mean", float(img.mean()),
          "residual", abs(float(img.mean()) - 0.5), flush=True)


if __name__ == "__main__":
    main()
