import numpy as np
import jax.numpy as jnp

from platinum_tpu.core.texture import linear_to_srgb
from platinum_tpu.post import tonemap as tm
from platinum_tpu.post.options import (
    AGX_LOOK_GOLDEN,
    AGX_LOOK_NONE,
    FLIM_PRESET_FLIM,
    FLIM_PRESET_SILVER,
    KhronosPbrOptions,
    LiftGammaGain,
    PostProcessOptions,
    TonemapOptions,
    VignetteOptions,
    ChromaticAberrationOptions,
    ContrastSaturationOptions,
    ToneCurveOptions,
    ExposureOptions,
)
from platinum_tpu.post.pipeline import postprocess_image


def _ramp():
    return jnp.asarray(
        np.linspace(0, 4, 64, dtype=np.float32)[:, None, None]
        * np.ones((1, 4, 3), np.float32)
    )


def test_tonemapper_none_is_srgb_encode():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32))
    opts = PostProcessOptions(tonemap=TonemapOptions(tonemapper="none"))
    out = np.asarray(postprocess_image(img, opts))
    expected = linear_to_srgb(np.asarray(img))
    assert np.allclose(out, expected, atol=2e-3)


def test_agx_monotonic_and_bounded():
    ramp = _ramp()
    out = np.asarray(tm.agx(ramp, AGX_LOOK_NONE))
    assert (out >= 0).all() and (out <= 1).all()
    gray = out[:, 0, 0]
    assert (np.diff(gray) >= -2e-3).all()  # TPU pow/log2 precision wiggle
    assert gray[0] < 0.02 and gray[-1] > 0.8
    # A look changes the output
    out2 = np.asarray(tm.agx(ramp, AGX_LOOK_GOLDEN))
    assert not np.allclose(out, out2)


def test_khronos_pbr_passthrough_and_compression():
    opt = KhronosPbrOptions()
    small = jnp.asarray(np.full((1, 1, 3), 0.2, np.float32))
    out = np.asarray(tm.khronos_pbr(small, opt))
    # Below compression start: only the black-level offset (0.04) applies
    assert np.allclose(out, 0.16, atol=1e-5)
    big = jnp.asarray(np.full((1, 1, 3), 50.0, np.float32))
    out_big = np.asarray(tm.khronos_pbr(big, opt))
    assert (out_big <= 1.0 + 1e-5).all()


def test_flim_bounded_and_presets_differ():
    ramp = _ramp()
    out = np.asarray(tm.flim(ramp, FLIM_PRESET_FLIM))
    assert (out >= 0).all() and (out <= 1).all()
    assert out[0, 0, 0] < 0.02           # black stays black (auto black point)
    assert out[-1, 0, 0] > 0.85          # bright values approach white
    out_silver = np.asarray(tm.flim(ramp, FLIM_PRESET_SILVER))
    assert not np.allclose(out, out_silver)


def test_lift_gamma_gain_default_identity():
    c = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (16, 3)).astype(np.float32))
    out = np.asarray(tm.lift_gamma_gain(c, LiftGammaGain()))
    assert np.allclose(out, np.asarray(c), atol=1e-5)


def test_neutral_passes_are_identity():
    from platinum_tpu.post import pipeline as pl

    img = jnp.asarray(np.random.default_rng(2).uniform(0, 2, (12, 16, 3)).astype(np.float32))
    uv = None  # pipeline computes its own uv; test via full pipeline with "none"
    opts = PostProcessOptions(
        exposure=ExposureOptions(0.0),
        chromatic_aberration=ChromaticAberrationOptions(amount=0.0),
        contrast_saturation=ContrastSaturationOptions(0.0, 0.0),
        tone_curve=ToneCurveOptions(),
        vignette=VignetteOptions(amount=0.0),
        tonemap=TonemapOptions(tonemapper="none"),
    )
    out = np.asarray(postprocess_image(img, opts))
    expected = linear_to_srgb(np.asarray(img))
    assert np.allclose(out, expected, atol=2e-3)


def test_exposure_and_vignette_darken():
    img = jnp.asarray(np.full((16, 16, 3), 0.25, np.float32))
    opts = PostProcessOptions(
        exposure=ExposureOptions(-1.0),
        tonemap=TonemapOptions(tonemapper="none"),
    )
    out = np.asarray(postprocess_image(img, opts))
    expected = linear_to_srgb(np.full((16, 16, 3), 0.125, np.float32))
    assert np.allclose(out, expected, atol=2e-3)

    vopts = PostProcessOptions(
        vignette=VignetteOptions(amount=-4.0, midpoint=0.0, feather=100.0),
        tonemap=TonemapOptions(tonemapper="none"),
    )
    vout = np.asarray(postprocess_image(img, vopts))
    # corners darker than center
    assert vout[0, 0, 0] < vout[8, 8, 0]


def test_gmon_combine_suppresses_fireflies():
    from platinum_tpu.ops.gmon import gmon_combine

    rng = np.random.default_rng(3)
    b, r = 8, 64
    buckets = rng.uniform(0.4, 0.6, (b, r, 3)).astype(np.float32)
    buckets[3, :8] = 50.0  # fireflies in one bucket for some pixels
    out = np.asarray(gmon_combine(jnp.asarray(buckets), b, cap=1.0))
    mean = buckets.mean(axis=0)
    assert out[:8].max() < 2.0          # firefly suppressed
    assert mean[:8].max() > 5.0         # plain mean would keep it
    # Clean pixels ≈ mean
    assert np.allclose(out[8:], mean[8:], atol=0.05)

    # Partial fill: only first 4 buckets valid
    out4 = np.asarray(gmon_combine(jnp.asarray(buckets), 4, cap=1.0))
    assert np.isfinite(out4).all()
