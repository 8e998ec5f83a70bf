import time, numpy as np, jax, jax.numpy as jnp
from platinum_tpu.app.scenes import make_colonnade_scene, make_cornell_scene
from platinum_tpu.render.flatten import flatten_scene, analyze_features
from platinum_tpu.render.types import RenderSettings
from platinum_tpu.render.integrator import render_sample
import dataclasses

for scene_name, mk in [("colonnade", make_colonnade_scene)]:
    scene, cam = mk()
    imgs = {}
    for compact in [False, True]:
        settings = RenderSettings(width=512, height=512, spp=1, max_bounces=8,
                                  kernel="mis", sampler="pcg4d", tracer="packet",
                                  compact=compact)
        flat = flatten_scene(scene, cam, settings)
        features = analyze_features(flat)
        f = jax.jit(lambda fl, i: render_sample(fl, settings, i, return_stats=True, features=features))
        img, rays = f(flat, jnp.int32(0)); jax.block_until_ready(img)
        ts=[]
        for i in range(6):
            t0=time.perf_counter(); jax.block_until_ready(f(flat, jnp.int32(i))[0]); ts.append(time.perf_counter()-t0)
        ts.sort(); dt=sum(ts[:3])/3
        # accumulate 8 samples for mean comparison
        acc = np.zeros((settings.num_pixels,3))
        for i in range(8):
            acc += np.asarray(f(flat, jnp.int32(i))[0])
        acc /= 8
        imgs[compact] = acc
        print(f"{scene_name} compact={compact}: {dt*1e3:.1f} ms/sample rays={float(rays)/1e6:.2f}M "
              f"-> {float(rays)/dt/1e6:.2f} Mrays/s mean={acc.mean():.4f}")
    diff = np.abs(imgs[True].mean() - imgs[False].mean()) / imgs[False].mean()
    print(f"{scene_name}: relative mean diff {diff:.4f} (should be small, stochastic)")
