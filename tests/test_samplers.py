import numpy as np
import jax
import jax.numpy as jnp
import pytest

from platinum_tpu.ops import samplers as smp


def _radical_inverse_ref(i, b):
    f, r = 1.0, 0.0
    while i > 0:
        f /= b
        r += f * (i % b)
        i //= b
    return r


def test_radical_inverse_matches_scalar_reference():
    idx = np.array([0, 1, 2, 3, 7, 100, 12345, 2**31 + 17], dtype=np.uint32)
    for base in (2, 3, 5, 7, 11):
        got = smp.radical_inverse_dynamic(jnp.asarray(idx), jnp.uint32(base))
        want = np.array([_radical_inverse_ref(int(i), base) for i in idx])
        assert np.allclose(np.asarray(got), np.minimum(want, smp.ONE_MINUS_EPS), atol=1e-6)


def test_prime_table():
    assert smp.PRIME_TABLE[0] == 2
    assert smp.PRIME_TABLE[3] == 7
    assert len(smp.PRIME_TABLE) >= 404  # reference table size


@pytest.mark.parametrize("kind", ["halton", "pcg4d"])
def test_stream_uniformity_and_determinism(kind):
    n = 4096
    px = jnp.arange(n, dtype=jnp.uint32) % 64
    py = jnp.arange(n, dtype=jnp.uint32) // 64

    stream = smp.make_stream(kind, px, py, 0)
    stream, u1 = stream.next_1d()
    stream, u2 = stream.next_2d()

    for u in (u1, u2[..., 0], u2[..., 1]):
        u = np.asarray(u)
        assert u.shape == (n,)
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.02
        assert abs(u.var() - 1 / 12) < 0.01

    # Determinism: same seed → same values
    s2 = smp.make_stream(kind, px, py, 0)
    s2, v1 = s2.next_1d()
    assert np.array_equal(np.asarray(u1), np.asarray(v1))

    # Different sample index → different values
    s3 = smp.make_stream(kind, px, py, 1)
    s3, w1 = s3.next_1d()
    assert not np.array_equal(np.asarray(u1), np.asarray(w1))


def test_streams_work_under_scan():
    """Dim counter must advance inside lax.scan (traced)."""
    px = jnp.arange(8, dtype=jnp.uint32)
    py = jnp.zeros(8, dtype=jnp.uint32)
    stream = smp.make_stream("halton", px, py, 0)

    def body(s, _):
        s, u = s.next_1d()
        return s, u

    _, us = jax.lax.scan(body, stream, None, length=4)
    us = np.asarray(us)
    assert us.shape == (4, 8)
    # dims differ → draws differ
    assert not np.allclose(us[0], us[1])


def test_cosine_hemisphere_distribution():
    n = 1 << 14
    u = jnp.stack(
        [jnp.asarray(np.random.default_rng(1).uniform(size=(n,)), jnp.float32),
         jnp.asarray(np.random.default_rng(2).uniform(size=(n,)), jnp.float32)],
        axis=-1,
    )
    d = np.asarray(smp.sample_cosine_hemisphere(u))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 2] >= 0).all()
    # E[cos theta] under pdf cos/pi is 2/3
    assert abs(d[:, 2].mean() - 2 / 3) < 0.01


def test_disk_and_triangle_warps():
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(size=(8192, 2)), jnp.float32)

    d = np.asarray(smp.sample_disk(u))
    r = np.linalg.norm(d, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # Uniform disk → E[r] = 2/3
    assert abs(r.mean() - 2 / 3) < 0.01

    b = np.asarray(smp.sample_tri_uniform(u))
    assert (b >= 0).all()
    assert (b.sum(axis=-1) <= 1.0 + 1e-6).all()
    # Uniform barycentrics → E[b0] = E[b1] = 1/3
    assert abs(b[:, 0].mean() - 1 / 3) < 0.01
    assert abs(b[:, 1].mean() - 1 / 3) < 0.01


def test_zsampler_stratification_and_determinism():
    from platinum_tpu.ops.zsampler import ZStream

    w = h = 16
    spp = 16
    px = jnp.arange(w * h, dtype=jnp.uint32) % w
    py = jnp.arange(w * h, dtype=jnp.uint32) // w

    # Accumulate first-dim samples over all spp for pixel 0
    us = []
    for s in range(spp):
        st = ZStream.create(px, py, s, w, h, spp)
        st, u = st.next_2d()
        us.append(np.asarray(u))
    u0 = np.stack([u[0] for u in us])  # (spp, 2) for pixel 0
    assert (u0 >= 0).all() and (u0 < 1).all()
    # Sobol stratification: spp=16 points should cover all 4 quarters in x
    counts, _ = np.histogram(u0[:, 0], bins=4, range=(0, 1))
    assert (counts == 4).all(), counts

    # Determinism
    st2 = ZStream.create(px, py, 3, w, h, spp)
    st2, v = st2.next_2d()
    st3 = ZStream.create(px, py, 3, w, h, spp)
    st3, v2 = st3.next_2d()
    assert np.array_equal(np.asarray(v), np.asarray(v2))

    # Different dims decorrelate
    st4, va = ZStream.create(px, py, 0, w, h, spp).next_1d()
    st4, vb = st4.next_1d()
    assert not np.array_equal(np.asarray(va), np.asarray(vb))


def test_zsampler_under_scan():
    from platinum_tpu.ops.zsampler import ZStream

    px = jnp.arange(8, dtype=jnp.uint32)
    py = jnp.zeros(8, dtype=jnp.uint32)
    st = ZStream.create(px, py, 0, 8, 8, 4)

    def body(s, _):
        s, u = s.next_1d()
        return s, u

    _, us = jax.lax.scan(body, st, None, length=3)
    us = np.asarray(us)
    assert us.shape == (3, 8)
    assert not np.allclose(us[0], us[1])


@pytest.mark.parametrize("spp", [16, 64])
def test_zsampler_index_permutation_invariants(spp):
    """VERDICT r3 #7 / SURVEY §4: the base-4 digit permutations must be a
    BIJECTION on the per-pixel sample-index space — for any pixel the spp
    points of a dimension are then exactly one per 1/spp stratum of the
    Sobol sequence (a permutation cannot create collisions or gaps)."""
    from platinum_tpu.ops.zsampler import ZStream

    w = h = 8
    px = jnp.arange(w * h, dtype=jnp.uint32) % w
    py = jnp.arange(w * h, dtype=jnp.uint32) // w

    xs, ys = [], []
    for s in range(spp):
        st = ZStream.create(px, py, s, w, h, spp)
        st, u = st.next_2d()
        u = np.asarray(u)
        xs.append(u[:, 0])
        ys.append(u[:, 1])
    xs = np.stack(xs)   # (spp, n_pixels)
    ys = np.stack(ys)

    for vals in (xs, ys):
        # one point per 1/spp stratum, every stratum hit, for EVERY pixel
        strata = np.floor(vals * spp).astype(np.int64)
        for pix in range(0, w * h, 7):
            got = np.sort(strata[:, pix])
            assert np.array_equal(got, np.arange(spp)), (pix, got)

    # neighbouring pixels get DIFFERENT orderings (the hash-seeded digit
    # permutation decorrelates pixels; identical orderings would alias)
    assert not np.array_equal(xs[:, 0], xs[:, 1])
    assert not np.array_equal(ys[:, 0], ys[:, 9])
