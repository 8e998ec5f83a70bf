"""Tonemapping operators (pure JAX, vectorized over (H, W, 3) images).

Parity with the tonemap stage of postprocess.metal:91-412 + 554-600:
AgX (inset matrix → log2 range-map → 6th-order contrast polynomial → look →
outset, iolite-style minimal implementation), Khronos PBR Neutral, and the
flim film-emulation chain (gamut extension, super-sigmoid dye development,
negative + print, black point, midtone saturation), followed by
lift/gamma/gain grading, the working→display ODT matrix, and the sRGB EOTF.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platinum_tpu.post.options import (
    FlimOptions,
    KhronosPbrOptions,
    LiftGammaGain,
    TonemapOptions,
)

LUMA = jnp.asarray(np.array([0.2126, 0.7152, 0.0722], np.float32))

# AgX inset/outset matrices (columns as in the MSL float3x3 literals)
_AGX_IN = np.column_stack([
    (0.842479062253094, 0.0423282422610123, 0.0423756549057051),
    (0.0784335999999992, 0.878468636469772, 0.0784336),
    (0.0792237451477643, 0.0791661274605434, 0.879142973793104),
]).astype(np.float32)
_AGX_OUT = np.column_stack([
    (1.19687900512017, -0.0528968517574562, -0.0529716355144438),
    (-0.0980208811401368, 1.15190312990417, -0.0980434501171241),
    (-0.0990297440797205, -0.0989611768448433, 1.15107367264116),
]).astype(np.float32)
_AGX_MIN_EV = -12.47393
_AGX_MAX_EV = 4.026069


def _sat(x):
    return jnp.clip(x, 0.0, 1.0)


def _mul(m, v):
    """Apply (3,3) matrix to (..., 3) colors (column-vector convention)."""
    return v @ jnp.asarray(m).T


def _agx_contrast(x):
    x2 = x * x
    x4 = x2 * x2
    return (15.5 * x4 * x2 - 40.14 * x4 * x + 31.96 * x4
            - 6.868 * x2 * x + 0.4298 * x2 + 0.1191 * x - 0.00232)


def agx(val: jnp.ndarray, look) -> jnp.ndarray:
    val = _mul(_AGX_IN, val)
    val = jnp.clip(jnp.log2(jnp.maximum(val, 1e-10)), _AGX_MIN_EV, _AGX_MAX_EV)
    val = (val - _AGX_MIN_EV) / (_AGX_MAX_EV - _AGX_MIN_EV)
    val = _agx_contrast(val)

    # look
    luma = jnp.sum(val * LUMA, axis=-1, keepdims=True)
    slope = jnp.asarray(look.slope)
    offset = jnp.asarray(look.offset)
    power = jnp.asarray(look.power)
    val = jnp.power(jnp.maximum(val * slope + offset, 0.0), power)
    val = luma + look.saturation * (val - luma)

    return _sat(_mul(_AGX_OUT, val))


def khronos_pbr(val: jnp.ndarray, opt: KhronosPbrOptions) -> jnp.ndarray:
    compression_start = opt.compression_start - 0.04
    x = jnp.min(val, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    val = val - offset

    peak = jnp.max(val, axis=-1, keepdims=True)
    d = 1.0 - compression_start
    new_peak = 1.0 - d * d / jnp.maximum(peak + d - compression_start, 1e-6)
    compressed = val * new_peak / jnp.maximum(peak, 1e-6)
    g = 1.0 - 1.0 / (opt.desaturation * jnp.maximum(peak - new_peak, 0.0) + 1.0)
    out = compressed + g * (new_peak - compressed)
    return jnp.where(peak < compression_start, val, out)


# ---------------------------------------------------------------------------
# flim
# ---------------------------------------------------------------------------

def _rgb_avg(c):
    return jnp.mean(c, axis=-1, keepdims=True)


def _hsv_from_rgb(rgb):
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)
    delta = cmax - cmin
    safe = jnp.maximum(delta, 1e-20)
    c = (cmax[..., None] - rgb) / safe[..., None]
    r_is = rgb[..., 0] == cmax
    g_is = (rgb[..., 1] == cmax) & ~r_is
    h = jnp.where(
        r_is, c[..., 2] - c[..., 1],
        jnp.where(g_is, 2.0 + c[..., 0] - c[..., 2], 4.0 + c[..., 1] - c[..., 0]),
    ) / 6.0
    h = jnp.where(h < 0, h + 1.0, h)
    s = jnp.where(cmax != 0.0, delta / jnp.maximum(cmax, 1e-20), 0.0)
    h = jnp.where(s == 0.0, 0.0, h)
    return jnp.stack([h, s, cmax], axis=-1)


def _rgb_from_hsv(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = jnp.where(h == 1.0, 0.0, h) * 6.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    out = jnp.stack([r, g, b], axis=-1)
    return jnp.where((s == 0.0)[..., None], v[..., None], out)


def _hue_sat(color, hue, sat, value):
    hsv = _hsv_from_rgb(color)
    h = jnp.mod(hsv[..., 0] + hue + 0.5, 1.0)
    s = _sat(hsv[..., 1] * sat)
    v = hsv[..., 2] * value
    return _rgb_from_hsv(jnp.stack([h, s, v], axis=-1))


def _hsv_to_rgb_np(h, s, v):
    """Host-side HSV→RGB (Blender convention), for static option math."""
    if s == 0.0:
        return np.array([v, v, v])
    if h == 1.0:
        h = 0.0
    h *= 6.0
    i = int(np.floor(h))
    f = h - i
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    return np.array([
        (v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)
    ][i % 6])


def _flim_gamut_matrix(opt: FlimOptions) -> np.ndarray:
    def col(primary_hue, scale, rotate, mul):
        h = (primary_hue + rotate / 360.0) % 1.0
        rgb = _hsv_to_rgb_np(h, 1.0 / scale, 1.0)
        rgb = rgb / rgb.sum()
        return rgb * mul

    cols = [
        col(0.0, opt.extended_gamut_scale[0], opt.extended_gamut_rotation[0],
            opt.extended_gamut_mul[0]),
        col(1 / 3, opt.extended_gamut_scale[1], opt.extended_gamut_rotation[1],
            opt.extended_gamut_mul[1]),
        col(2 / 3, opt.extended_gamut_scale[2], opt.extended_gamut_rotation[2],
            opt.extended_gamut_mul[2]),
    ]
    return np.column_stack(cols).astype(np.float32)


def _super_sigmoid(x, toe, shoulder):
    x = _sat(x)
    tx, ty = np.clip(toe[0], 0, 1), np.clip(toe[1], 0, 1)
    sx, sy = np.clip(shoulder[0], 0, 1), np.clip(shoulder[1], 0, 1)
    slope = (sy - ty) / (sx - tx)

    toe_val = ty * jnp.power(jnp.maximum(x / tx, 1e-20), slope * tx / ty)
    lin_val = slope * x + ty - slope * tx
    sh_pow = -slope / ((sx - 1.0) / (1.0 - sx) ** 2 * (1.0 - sy))
    sh_val = (1.0 - jnp.power(jnp.maximum(1.0 - (x - sx) / (1.0 - sx), 0.0),
                              sh_pow)) * (1.0 - sy) + sy
    return jnp.where(x < tx, toe_val, jnp.where(x < sx, lin_val, sh_val))


def _dye_mix_factor(mono, max_density, opt: FlimOptions):
    offset = 2.0 ** opt.sigmoid_log2_min
    fac = _sat(
        (jnp.log2(mono + offset) - opt.sigmoid_log2_min)
        / (opt.sigmoid_log2_max - opt.sigmoid_log2_min)
    )
    fac = _super_sigmoid(fac, opt.sigmoid_toe, opt.sigmoid_shoulder)
    return _sat(jnp.exp2(-fac * max_density))


def _rgb_color_layer(color, sensitivity, dye, max_density, opt):
    sensitivity = np.asarray(sensitivity, np.float32)
    sensitivity = sensitivity / sensitivity.sum()
    dye = np.asarray(dye, np.float32)
    dye = dye / dye.max()
    mono = jnp.sum(color * sensitivity, axis=-1, keepdims=True)
    mix = _dye_mix_factor(mono, max_density, opt)
    return dye + mix * (1.0 - dye)


def _rgb_develop(color, exposure, max_density, opt):
    color = color * (2.0 ** exposure)
    out = _rgb_color_layer(color, (0, 0, 1), (1, 1, 0), max_density, opt)
    out = out * _rgb_color_layer(color, (0, 1, 0), (1, 0, 1), max_density, opt)
    out = out * _rgb_color_layer(color, (1, 0, 0), (0, 1, 1), max_density, opt)
    return out


def _negative_and_print(color, backlight, opt):
    color = _rgb_develop(color, opt.negative_exposure, opt.negative_density, opt)
    color = color * backlight
    return _rgb_develop(color, opt.print_exposure, opt.print_density, opt)


def _rgb_uniform_offset(color, black_point, white_point):
    mono = _rgb_avg(color)
    lo = black_point / 1000.0
    hi = 1.0 - white_point / 1000.0
    mono2 = _sat((mono - lo) / (hi - lo))
    return color * mono2 / jnp.maximum(mono, 1e-20)


def flim(val: jnp.ndarray, opt: FlimOptions) -> jnp.ndarray:
    val = val * (2.0 ** opt.pre_exposure)

    ext = _flim_gamut_matrix(opt)
    ext_inv = np.linalg.inv(ext).astype(np.float32)
    backlight = np.asarray(opt.print_backlight, np.float32) @ ext

    big = jnp.full((1, 3), 1e7)
    white_cap = _negative_and_print(big, backlight, opt)

    pf = jnp.asarray(opt.pre_formation_filter)
    val = val + opt.pre_formation_filter_strength * (val * pf - val)

    val = val @ jnp.asarray(ext)
    val = _negative_and_print(val, backlight, opt)
    val = val @ jnp.asarray(ext_inv)

    val = jnp.maximum(val, 0.0) / white_cap

    if opt.auto_black_point:
        black_cap = _negative_and_print(jnp.zeros((1, 3)), backlight, opt) / white_cap
        val = _rgb_uniform_offset(val, jnp.mean(black_cap) * 1000.0, 0.0)
    else:
        val = _rgb_uniform_offset(val, opt.black_point, 0.0)

    pof = jnp.asarray(opt.post_formation_filter)
    val = val + opt.post_formation_filter_strength * (val * pof - val)

    val = _sat(val)
    mono = _rgb_avg(val)[..., 0]
    mix = jnp.where(
        mono < 0.5,
        _sat((mono - 0.05) / 0.45),
        _sat((mono - 0.95) / -0.45),
    )
    sat_val = _hue_sat(val, 0.5, opt.midtone_saturation, 1.0)
    val = val + mix[..., None] * (sat_val - val)
    return _sat(val)


# ---------------------------------------------------------------------------
# Grading + ODT + EOTF
# ---------------------------------------------------------------------------

def lift_gamma_gain(color: jnp.ndarray, lgg: LiftGammaGain) -> jnp.ndarray:
    lift_c = np.asarray(lgg.shadow_color, np.float32)
    lift_c = lift_c - lift_c.mean()
    gamma_c = np.asarray(lgg.midtone_color, np.float32)
    gamma_c = gamma_c - gamma_c.mean()
    gain_c = np.asarray(lgg.highlight_color, np.float32)
    gain_c = gain_c - gain_c.mean()

    lift = lift_c + lgg.shadow_offset * 0.01
    gain = 1.0 + gain_c + lgg.highlight_offset * 0.01
    mid_gray = 0.5 + gamma_c + lgg.midtone_offset * 0.01
    gamma = np.log10(np.maximum((0.5 - lift) / np.maximum(gain - lift, 1e-6), 1e-6)) \
        / np.log10(np.maximum(mid_gray, 1e-6))

    t = _sat(jnp.power(jnp.maximum(color, 0.0), 1.0 / jnp.asarray(gamma)))
    return jnp.asarray(lift) + t * (jnp.asarray(gain) - jnp.asarray(lift))


def srgb_eotf_encode(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c < 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )


def apply_tonemap(color: jnp.ndarray, opt: TonemapOptions, odt) -> jnp.ndarray:
    """Full tonemap stage: operator → LGG grading → ODT → sRGB encode.
    `odt` is the (3,3) working→display matrix."""
    name = opt.tonemapper.lower()
    if name == "agx":
        color = agx(color, opt.agx_look)
        color = jnp.power(jnp.maximum(color, 0.0), 2.2)  # linearize AgX output
    elif name in ("khronos_pbr", "khronos", "pbr_neutral"):
        color = khronos_pbr(color, opt.khronos)
    elif name == "flim":
        color = flim(color, opt.flim)
    color = lift_gamma_gain(color, opt.lift_gamma_gain)
    color = _mul(jnp.asarray(odt), color)
    return srgb_eotf_encode(color)
