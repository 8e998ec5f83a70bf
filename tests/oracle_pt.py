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

Round-5 extension (VERDICT r4 #3) — the glossy/transmissive lobes and a
textured environment:

- ROUGH GGX CONDUCTOR = {metallic 1, roughness r, multiscatter OFF}:
  Heitz VNDF sampling of the Trowbridge-Reitz distribution, estimator
  weight F(wo·wm)·G2/G1. The Smith lambda replicates the REFERENCE'S
  isotropic definition (bsdf.metal:174-183: alpha²/cos²θ under the root,
  i.e. without the textbook sin²θ factor) — the fidelity target is the
  reference's transport, so the oracle estimates the same integral the
  production estimator does, in an independent implementation.
- SMOOTH DIELECTRIC = {transmission 1, metallic 0, roughness 0}: real
  dielectric Fresnel (bsdf.metal:70-84), reflect with probability F else
  refract (weight = albedo tint), relative IOR flipped when hitting the
  back face (bsdf.metal:553-554). No radiance eta² scaling, matching the
  reference's symmetric transport.
- EQUIRECT HDR ENVIRONMENT: pass env as an (H, W, 3) array; misses
  evaluate it with the reference's direction mapping (kernel.metal:20-34:
  phi = atan2(-z, -x), theta = acos(y)) and bilinear wrap-x/clamp-y
  filtering, re-derived here in float64. Because the oracle estimates via
  BSDF sampling only, agreement with the production MIS integrator
  validates the production's alias-table env importance sampling + MIS
  weights end-to-end.
"""

from __future__ import annotations

import numpy as np

KIND_LAMBERT = 0
KIND_MIRROR = 1
KIND_GGX = 2
KIND_DIELECTRIC = 3


def env_eval(env_pixels, d):
    """Bilinear equirect lookup (wrap-x, clamp-y), float64.

    Mapping per kernel.metal:20-25: u = atan2(-z, -x)/2pi, v = acos(y)/pi;
    texel centers at (i + 0.5)."""
    px = np.asarray(env_pixels, np.float64)
    h, w = px.shape[:2]
    phi = np.arctan2(-d[:, 2], -d[:, 0])
    theta = np.arccos(np.clip(d[:, 1], -1.0, 1.0))
    u = phi / (2.0 * np.pi)
    v = theta / np.pi
    x = u * w - 0.5
    y = np.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = np.mod(x0.astype(np.int64), w)
    x1i = np.mod(x0i + 1, w)
    y0i = np.clip(y0.astype(np.int64), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    return ((px[y0i, x0i] * (1 - fx) + px[y0i, x1i] * fx) * (1 - fy)
            + (px[y1i, x0i] * (1 - fx) + px[y1i, x1i] * fx) * fy)


def _smith_lambda_v(alpha, w):
    """Reference bsdf.metal:174-183 isotropic form (alpha²/cos²θ);
    `alpha` is per-row."""
    cos2 = np.maximum(w[:, 2] * w[:, 2], 1e-20)
    return (np.sqrt(1.0 + alpha * alpha / cos2) - 1.0) * 0.5


def _fresnel_dielectric(cos_i, ior):
    """Real dielectric Fresnel, bsdf.metal:70-84. ior is relative
    (entered/exited), cos_i >= 0."""
    c = np.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - c * c) / (ior * ior)
    tir = sin2_t >= 1.0
    cos_t = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
    par = (ior * c - cos_t) / (ior * c + cos_t)
    per = (c - ior * cos_t) / (c + ior * cos_t)
    return np.where(tir, 1.0, 0.5 * (par * par + per * per))


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
                  env=(0.0, 0.0, 0.0), seed=7, chunk=1 << 16,
                  kind=None, roughness=None, ior=None):
    """Render (height, width, 3) float64 radiance means.

    tris: (T, 3, 3) world-space vertices; mat_id: (T,) int; albedo /
    emission: (M, 3); is_mirror: (M,) bool; cam: dict for camera_rays.
    `env` is a constant (3,) color or an (H, W, >=3) equirect HDR map.
    `kind` ((M,) KIND_* codes) supersedes is_mirror when given;
    `roughness`/`ior` are per-material arrays for KIND_GGX / DIELECTRIC.
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
    env_is_map = env.ndim == 3
    if kind is None:
        kind = np.where(np.asarray(is_mirror, bool), KIND_MIRROR,
                        KIND_LAMBERT)
    kind = np.asarray(kind, np.int64)
    roughness = (np.zeros(len(albedo)) if roughness is None
                 else np.asarray(roughness, np.float64))
    ior = (np.full(len(albedo), 1.5) if ior is None
           else np.asarray(ior, np.float64))

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
            miss_rows = np.flatnonzero(alive)[~hit]
            if env_is_map:
                L[miss_rows] += tput[miss_rows] * env_eval(env,
                                                           da[~hit])
            else:
                L[miss_rows] += tput[miss_rows] * env

            h_rows = np.flatnonzero(alive)[hit]
            ti_h = ti[hit]
            m = mat_id[ti_h]
            # emission on hit (two-sided, like the production integrator)
            L[h_rows] += tput[h_rows] * emission[m]

            p = oa[hit] + t[hit, None] * da[hit]
            n = face_n[ti_h].copy()
            flip = np.einsum("ne,ne->n", n, da[hit]) > 0
            n[flip] = -n[flip]

            k = kind[m]
            mirror = k == KIND_MIRROR
            ggx = k == KIND_GGX
            diel = k == KIND_DIELECTRIC
            lam = k == KIND_LAMBERT
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
            if ggx.any():
                dg = da[hit][ggx]
                ng = n[ggx]
                t1, t2 = _onb(ng)
                # tangent-space outgoing direction (z up = n, facing)
                wo = np.stack([
                    -np.einsum("ne,ne->n", dg, t1),
                    -np.einsum("ne,ne->n", dg, t2),
                    -np.einsum("ne,ne->n", dg, ng)], 1)
                a = roughness[m[ggx]] ** 2          # alpha = roughness^2
                u1 = rng.random(ggx.sum())
                u2 = rng.random(ggx.sum())
                # per-material alpha: the VNDF sampler is vectorized over
                # rays with their own alpha
                wh = wo * np.stack([a, a, np.ones_like(a)], 1)
                wh /= np.linalg.norm(wh, axis=1, keepdims=True)
                wh[wh[:, 2] < 0] *= -1.0
                b = np.cross(np.broadcast_to([0.0, 0.0, 1.0], wh.shape), wh)
                bl = np.linalg.norm(b, axis=1, keepdims=True)
                degen = (wh[:, 2] >= 0.9999)[:, None]
                b = np.where(degen, [1.0, 0.0, 0.0],
                             b / np.maximum(bl, 1e-20))
                tt = np.cross(wh, b)
                r_ = np.sqrt(u1)
                phi = 2.0 * np.pi * u2
                p1 = r_ * np.cos(phi)
                p2 = r_ * np.sin(phi)
                hh = np.sqrt(1.0 - p1 * p1)
                p2 = hh + (p2 - hh) * (0.5 * wh[:, 2] + 0.5)
                pz = np.sqrt(np.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
                nh = p1[:, None] * b + p2[:, None] * tt + pz[:, None] * wh
                wm = np.stack([a * nh[:, 0], a * nh[:, 1],
                               np.maximum(1e-6, nh[:, 2])], 1)
                wm /= np.linalg.norm(wm, axis=1, keepdims=True)
                dot_om = np.einsum("ne,ne->n", wo, wm)
                wi = 2.0 * dot_om[:, None] * wm - wo
                valid = (wi[:, 2] * wo[:, 2]) > 0.0
                lam_o = _smith_lambda_v(a, wo)
                lam_i = _smith_lambda_v(a, wi)
                g_ratio = (1.0 + lam_o) / (1.0 + lam_o + lam_i)  # G2/G1
                f0 = albedo[m[ggx]]
                kk = np.clip(1.0 - np.abs(dot_om), 0.0, 1.0)[:, None]
                fres = f0 + (1.0 - f0) * kk ** 5
                w_mul[ggx] = np.where(valid[:, None],
                                      fres * g_ratio[:, None], 0.0)
                new_d[ggx] = (wi[:, 0:1] * t1 + wi[:, 1:2] * t2
                              + wi[:, 2:3] * ng)
            if diel.any():
                dd = da[hit][diel]
                nd = n[diel]
                flipped = flip[diel]           # hit the back face => inside
                ior_m = ior[m[diel]]
                ior_rel = np.where(flipped, 1.0 / ior_m, ior_m)
                cos_i = -np.einsum("ne,ne->n", dd, nd)
                F = _fresnel_dielectric(cos_i, ior_rel)
                u = rng.random(diel.sum())
                refl = u < F
                # reflect
                d_refl = dd + 2.0 * cos_i[:, None] * nd
                # refract: eta = 1/ior_rel (bsdf.metal:568)
                eta = 1.0 / ior_rel
                sin2_t = eta * eta * (1.0 - cos_i * cos_i)
                cos_t = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
                d_refr = (eta[:, None] * dd
                          + (eta * cos_i - cos_t)[:, None] * nd)
                d_refr /= np.maximum(
                    np.linalg.norm(d_refr, axis=1, keepdims=True), 1e-20)
                new_d[diel] = np.where(refl[:, None], d_refl, d_refr)
                # reflect weight 1; transmit weight = albedo tint
                w_mul[diel] = np.where(refl[:, None], 1.0,
                                       albedo[m[diel]])
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
            # offset along the face normal, INTO the surface for
            # transmitted rays
            side = np.sign(np.einsum("ne,ne->n", new_d, n))[:, None]
            o_new = p + 1e-6 * side * n
            o[h_rows] = o_new
            d[h_rows] = new_d
            new_alive = np.zeros_like(alive)
            new_alive[h_rows] = True
            alive = new_alive

        np.add.at(accum, pix, L)

    return (accum / spp).reshape(height, width, 3)
