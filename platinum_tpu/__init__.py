"""platinum-tpu: a TPU-native physically-based rendering framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference Metal path tracer (teofum/platinum): glTF scene graph with
JSON+binary persistence, progressive wavefront path tracing with a principled
GGX BSDF, NEE+MIS light sampling, GMoN robust accumulation, physical camera
with DoF/bokeh, and a color-managed post-processing/tonemap stack with
ICC-tagged PNG and EXR export.

Layout:
    core/      scene graph, assets, color science (host-side, numpy)
    io/        glTF import, EXR/PNG codecs, ICC profiles, scene persistence
    accel/     BVH builders (C++ native + numpy) and flat GPU layouts
    ops/       device kernels: samplers, intersection, traversal, texturing
    models/    BSDF / light / camera-ray models (pure JAX)
    render/    scene flattener, wavefront integrator, Renderer API
    post/      post-processing + tonemap stack (fused elementwise JAX)
    parallel/  device mesh + sharding for multi-chip rendering
    utils/     small host helpers (matrices, config, logging)
    tools/     LUT baker and other offline tools
"""

__version__ = "0.1.0"
