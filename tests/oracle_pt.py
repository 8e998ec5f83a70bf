"""Standalone float64 NumPy path tracer — an INDEPENDENT fidelity oracle.

This module intentionally imports nothing from platinum_tpu.models or
platinum_tpu.render: the production integrator, BSDF library and packet
tracer share code between the brute and packet paths, so golden images
cannot catch estimator bugs common to both (VERDICT r3 missing #4). This
file re-derives everything from first principles in scalar-style vectorized
float64 numpy:

- Möller–Trumbore brute-force intersection over the whole triangle soup
- pinhole camera built from the same physical spec (sensor/focal/crop),
  reimplemented from the definition (reference renderer_pt.cpp:978-1019)
- Lambertian BRDF via cosine-hemisphere sampling (f·cosθ/pdf = albedo)
- smooth-conductor mirror with Schlick Fresnel (reference
  bsdf.metal:49-95, 339-369: metallic lobe, F0 = base color)
- emission added on hit, constant environment on miss, fixed-depth
  termination, pure BSDF sampling (no NEE/MIS — a deliberately different
  estimator with the same expectation)

Materials are restricted to configurations where the production principled
BSDF reduces exactly to these models: Lambert = {metallic 0, roughness 1,
ior 1 (Fresnel 0 kills the specular lobe and the energy-compensation
factor)}; mirror = {metallic 1, roughness 0 (smooth-surface delta)}.
"""

from __future__ import annotations

import numpy as np


def camera_rays(pos, u, v, w, focal_mm, sensor_mm, focus_dist,
                width, height, jitter, px, py):
    """Pinhole rays, float64. (u, v, w) = camera basis columns (world),
    film plane at the focus distance like the production flattener."""
    aspect = width / height
    sensor_aspect = sensor_mm[0] / sensor_mm[1]
    cropped_h = sensor_mm[0] / max(sensor_aspect, aspect)
    vh = focus_dist * cropped_h / focal_mm
    vw = vh * aspect
    vu = u * vw
    vv = -v * vh
    top_left = pos - focus_dist * w - (vu + vv) * 0.5
    du = vu / width
    dv = vv / height
    film = (top_left
            + (px + jitter[:, 0])[:, None] * du
            + (py + jitter[:, 1])[:, None] * dv)
    d = film - pos
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(pos, d.shape).copy()
    return o, d


def intersect_brute(o, d, tri_v0, tri_e1, tri_e2, eps=1e-12):
    """Nearest-hit Möller–Trumbore of N rays against T triangles.
    Returns (t, tri_index) with t=inf on miss."""
    # (N, T, 3) broadcasting
    pvec = np.cross(d[:, None, :], tri_e2[None, :, :])
    det = np.einsum("te,nte->nt", tri_e1, pvec)
    inv_det = np.where(np.abs(det) > eps, 1.0 / det, 0.0)
    tvec = o[:, None, :] - tri_v0[None, :, :]
    bu = np.einsum("nte,nte->nt", tvec, pvec) * inv_det
    qvec = np.cross(tvec, tri_e1[None, :, :])
    bv = np.einsum("nte,nte->nt", d[:, None, :], qvec) * inv_det
    t = np.einsum("te,nte->nt", tri_e2, qvec) * inv_det
    valid = ((np.abs(det) > eps) & (bu >= 0) & (bv >= 0)
             & (bu + bv <= 1) & (t > 1e-7))
    t = np.where(valid, t, np.inf)
    idx = np.argmin(t, axis=1)
    tmin = t[np.arange(len(o)), idx]
    return tmin, idx


def _onb(n):
    """Orthonormal basis around n (branchless Frisvad-style)."""
    s = np.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t1 = np.stack([1.0 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], 1)
    t2 = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], 1)
    return t1, t2


def render_oracle(tris, mat_id, albedo, emission, is_mirror,
                  cam, width, height, spp, max_bounces,
                  env=(0.0, 0.0, 0.0), seed=7, chunk=1 << 16):
    """Render (height, width, 3) float64 radiance means.

    tris: (T, 3, 3) world-space vertices; mat_id: (T,) int; albedo /
    emission: (M, 3); is_mirror: (M,) bool; cam: dict for camera_rays.
    """
    tris = np.asarray(tris, np.float64)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    face_n = np.cross(e1, e2)
    face_n /= np.linalg.norm(face_n, axis=1, keepdims=True)
    albedo = np.asarray(albedo, np.float64)
    emission = np.asarray(emission, np.float64)
    env = np.asarray(env, np.float64)

    rng = np.random.default_rng(seed)
    n_pix = width * height
    accum = np.zeros((n_pix, 3))
    total = n_pix * spp
    pix_of = np.arange(total, dtype=np.int64) % n_pix

    for start in range(0, total, chunk):
        sel = np.arange(start, min(start + chunk, total))
        pix = pix_of[sel]
        px = (pix % width).astype(np.float64)
        py = (pix // width).astype(np.float64)
        o, d = camera_rays(jitter=rng.random((len(sel), 2)), px=px, py=py,
                           width=width, height=height, **cam)
        tput = np.ones((len(sel), 3))
        L = np.zeros((len(sel), 3))
        alive = np.ones(len(sel), bool)
        for _bounce in range(max_bounces):
            if not alive.any():
                break
            oa, da = o[alive], d[alive]
            t, ti = intersect_brute(oa, da, v0, e1, e2)
            hit = np.isfinite(t)

            # environment on miss
            L[np.flatnonzero(alive)[~hit]] += \
                tput[np.flatnonzero(alive)[~hit]] * env

            h_rows = np.flatnonzero(alive)[hit]
            ti_h = ti[hit]
            m = mat_id[ti_h]
            # emission on hit (two-sided, like the production integrator)
            L[h_rows] += tput[h_rows] * emission[m]

            p = oa[hit] + t[hit, None] * da[hit]
            n = face_n[ti_h].copy()
            flip = np.einsum("ne,ne->n", n, da[hit]) > 0
            n[flip] = -n[flip]

            mirror = is_mirror[m]
            new_d = np.empty_like(da[hit])
            w_mul = np.empty_like(tput[h_rows])

            if mirror.any():
                dm = da[hit][mirror]
                nm = n[mirror]
                cos_i = -np.einsum("ne,ne->n", dm, nm)
                new_d[mirror] = dm + 2.0 * cos_i[:, None] * nm
                f0 = albedo[m[mirror]]
                w_mul[mirror] = f0 + (1.0 - f0) * np.power(
                    np.clip(1.0 - cos_i, 0.0, 1.0), 5.0)[:, None]
            lam = ~mirror
            if lam.any():
                nl = n[lam]
                t1, t2 = _onb(nl)
                u1 = rng.random(lam.sum())
                u2 = rng.random(lam.sum())
                r = np.sqrt(u1)
                phi = 2.0 * np.pi * u2
                local = np.stack([r * np.cos(phi), r * np.sin(phi),
                                  np.sqrt(np.maximum(1.0 - u1, 0.0))], 1)
                new_d[lam] = (local[:, 0:1] * t1 + local[:, 1:2] * t2
                              + local[:, 2:3] * nl)
                w_mul[lam] = albedo[m[lam]]

            tput[h_rows] *= w_mul
            o_new = p + 1e-6 * n
            o[h_rows] = o_new
            d[h_rows] = new_d
            new_alive = np.zeros_like(alive)
            new_alive[h_rows] = True
            alive = new_alive

        np.add.at(accum, pix, L)

    return (accum / spp).reshape(height, width, 3)
