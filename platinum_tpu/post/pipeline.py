"""Post-processing pipeline (pure JAX, one fused jit over the image).

Parity with the reference's 5 post passes + tonemap
(renderer_pt.cpp:184-196 → postprocess.metal:425-552): exposure → chromatic
aberration → contrast/saturation → tone curve → vignette → tonemap, in the
reference's pass order. Instead of six ping-pong fullscreen draws this is one
fused elementwise program (CA is the only non-pointwise op — three bilinear
taps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.core import colorspace as cs
from platinum_tpu.post import tonemap as tm
from platinum_tpu.post.options import PostProcessOptions

LUMA = tm.LUMA


def _exposure(color, opt):
    return color * (2.0 ** opt.exposure)


def _contrast_saturation(color, opt):
    eps = 1e-6
    log_c = jnp.log2(jnp.maximum(color, 0.0) + eps)
    k = 1.0 + opt.contrast * 0.01
    adj = np.log2(0.18) + k * (log_c - np.log2(0.18))
    color = jnp.maximum(0.0, jnp.exp2(adj) - eps)

    gray = jnp.sum(color * LUMA, axis=-1, keepdims=True)
    return gray + (1.0 + opt.saturation * 0.01) * (color - gray)


def _tone_curve(color, opt):
    def smoothstep(e0, e1, x):
        t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    luma = jnp.sum(color * LUMA, axis=-1, keepdims=True)
    blacks = smoothstep(0.04, 0.0, luma)
    shadows = smoothstep(0.18, 0.0, luma)
    highlights = smoothstep(0.18, 1.0, luma)
    whites = smoothstep(0.75, 1.0, luma)
    ev = 0.01 * (opt.blacks * blacks + opt.shadows * shadows
                 + opt.highlights * highlights + opt.whites * whites)
    return color * jnp.exp2(ev)


def _vignette(color, opt, uv, aspect):
    a = 1.0 + (aspect - 1.0) * opt.roundness * 0.01
    u = uv[..., 0]
    v = uv[..., 1]
    if_wide = jnp.stack([u, (v - 0.5) / a + 0.5], -1)
    if_tall = jnp.stack([(u - 0.5) * a + 0.5, v], -1)
    uvm = if_wide if aspect > 1.0 else if_tall

    corner = np.sqrt(0.5)
    dist = jnp.linalg.norm(uvm - 0.5, axis=-1) / corner
    end = 1.0 - opt.midpoint * 0.01
    start = end * (1.0 - opt.feather * 0.01)
    power = opt.power * 0.05
    d = jnp.clip((dist - start) / jnp.maximum(end - start, 1e-6), 0.0, 1.0)

    t = jnp.clip((dist - start) / jnp.maximum(end - start, 1e-6), 0.0, 1.0)
    smooth = t * t * (3.0 - 2.0 * t)
    vig = jnp.where(d == 0.0, 0.0, jnp.power(jnp.maximum(d, 1e-20), power)) * smooth
    return color * jnp.exp2(opt.amount * vig)[..., None]


def _bilinear(img, uv):
    """Sample (H, W, 3) at normalized uv (..., 2), clamp addressing."""
    h, w = img.shape[:2]
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def _chromatic_aberration(img, opt, uv, aspect):
    if opt.amount == 0.0:
        return img

    def remap(uv, scale):
        # to aspect-compensated space, scale about center, back
        u, v = uv[..., 0], uv[..., 1]
        if aspect > 1.0:
            vm = (v - 0.5) / aspect + 0.5
            um = u
        else:
            um = (u - 0.5) * aspect + 0.5
            vm = v
        um = (um - 0.5) * scale + 0.5
        vm = (vm - 0.5) * scale + 0.5
        if aspect > 1.0:
            v2 = (vm - 0.5) * aspect + 0.5
            u2 = um
        else:
            u2 = (um - 0.5) / aspect + 0.5
            v2 = vm
        return jnp.stack([u2, v2], -1)

    amount = opt.amount * 0.005 * 0.01
    r = _bilinear(img, remap(uv, 1.0 + amount))[..., 0]
    g = _bilinear(img, remap(uv, 1.0 - amount * opt.green_shift * 0.01))[..., 1]
    b = _bilinear(img, remap(uv, 1.0 - amount))[..., 2]
    return jnp.stack([r, g, b], axis=-1)


def postprocess_image(image: jnp.ndarray, options: PostProcessOptions,
                      working_space: str = "BT709",
                      output_space: str = "sRGB") -> jnp.ndarray:
    """(H, W, 3) linear working-space radiance → (H, W, 3) display-encoded.
    Pass order matches renderer_pt.cpp:184-196."""
    h, w = image.shape[:2]
    aspect = w / h
    ys, xs = jnp.mgrid[0:h, 0:w]
    uv = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=-1)

    color = _exposure(image, options.exposure)
    color = _chromatic_aberration(color, options.chromatic_aberration, uv, aspect)
    color = _contrast_saturation(color, options.contrast_saturation)
    color = _tone_curve(color, options.tone_curve)
    color = _vignette(color, options.vignette, uv, aspect)

    odt = cs.transform(cs.get_colorspace(working_space),
                       cs.get_colorspace(output_space))
    return jnp.clip(tm.apply_tonemap(color, options.tonemap, odt), 0.0, 1.0)


@partial(jax.jit, static_argnames=("options", "working_space", "output_space"))
def postprocess_jit(image, options: PostProcessOptions,
                    working_space: str = "BT709", output_space: str = "sRGB"):
    return postprocess_image(image, options, working_space, output_space)
