"""Host-side packet-union simulator for the wide-BVH traversal.

Answers the sizing question for the shared-stack mega-packet kernel: when
P consecutive sorted 128-ray subpackets share ONE traversal stack (paying
the union of their node visits), how do node-visit and leaf-block counts
grow with packet size? The walk is exact: per-ray best-t is updated from
the real MT coefficient blocks, so best-t culling behaves like the kernel.

Usage: JAX_PLATFORM_NAME=cpu python perf/sim_union.py [n_packets_sampled]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _part1by2(x):
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def sort_key(o, d, lo, inv_extent):
    q = np.clip((o - lo) * inv_extent, 0.0, 1.0)
    qi = (q * 127.0).astype(np.int32)
    morton = (_part1by2(qi[:, 0]) | (_part1by2(qi[:, 1]) << 1)
              | (_part1by2(qi[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(np.int32)
              + 2 * (d[:, 1] < 0).astype(np.int32)
              + 4 * (d[:, 2] < 0).astype(np.int32))
    return (octant << 21) | morton


def feat_rows(o, d):
    r = len(o)
    f = np.ones((r, 10), np.float32)
    f[:, 0:3] = d
    f[:, 3:6] = np.cross(o, d)
    f[:, 6:9] = o
    return f


def walk_packet(nodes, meta, blocks, o, d, tmax):
    """Shared-stack walk of one packet; returns (node_visits, leaf_blocks)."""
    R = len(o)
    best = np.full(R, tmax, np.float32)
    tmin = np.float32(1e-3)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    F = feat_rows(o, d)
    stack = [0]
    visits = 0
    nblocks = 0
    while stack:
        n = stack.pop()
        visits += 1
        rec = nodes[n].reshape(16, 8)
        m = meta[n * 16: n * 16 + 16]
        # slab test: (16 children) x (R rays)
        lo = rec[:, None, 0:3]
        hi = rec[:, None, 3:6]
        t0 = (lo - o[None]) * inv[None]
        t1 = (hi - o[None]) * inv[None]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= tmin) & (tn <= best[None, :])
        chit = hit.any(1) & (m != -1)
        for c in np.nonzero(chit)[0]:
            mc = m[c]
            if mc >= 0:
                stack.append(mc)
            else:
                val = -mc - 2
                b0, nb = val >> 5, val & 31
                nblocks += nb
                for b in range(b0, b0 + nb):
                    out = F @ blocks[b]          # (R, 256)
                    det = out[:, 0:64]
                    s = np.where(det >= 0, 1.0, -1.0).astype(np.float32)
                    ad = det * s
                    us, vs, ts = out[:, 64:128] * s, out[:, 128:192] * s, \
                        out[:, 192:256] * s
                    ok = ((ad > 1e-12) & (us >= 0) & (vs >= 0)
                          & (us + vs <= ad) & (ts > tmin * ad)
                          & (ts < best[:, None] * ad))
                    t = np.where(ok, ts / np.maximum(ad, 1e-37), np.inf)
                    best = np.minimum(best, t.min(1)).astype(np.float32)
    return visits, nblocks


def main():
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    import jax.numpy as jnp  # noqa: F401  (forces cpu backend init early)
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)
    n = size * size
    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    import jax.numpy as jnp
    o, d = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    o, d = np.asarray(o), np.asarray(d)

    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    oi = o[perm]
    di = d[perm] + rng.normal(0, 0.35, (n, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=-1, keepdims=True)

    for label, (ro, rd) in [("primary", (o, d)), ("incoher", (oi, di))]:
        key = sort_key(ro, rd, lo, inv_extent)
        order = np.argsort(key, kind="stable")
        so, sd = ro[order], rd[order]
        print(f"## {label} (sorted)")
        for psize in (128, 256, 512, 1024, 2048):
            npk = n // psize
            take = rng.choice(npk, size=min(n_sample, npk), replace=False)
            vs, bs = [], []
            t0 = time.time()
            for pi in take:
                v, b = walk_packet(nodes, meta, blocks,
                                   so[pi * psize:(pi + 1) * psize],
                                   sd[pi * psize:(pi + 1) * psize], 1e30)
                vs.append(v)
                bs.append(b)
            print({"psize": psize, "visits_mean": round(np.mean(vs), 1),
                   "blocks_mean": round(np.mean(bs), 1),
                   "visits_p90": int(np.percentile(vs, 90)),
                   "blocks_p90": int(np.percentile(bs, 90)),
                   "per_ray_visits": round(np.mean(vs) / psize, 3),
                   "per_ray_blocks": round(np.mean(bs) / psize, 3),
                   "sim_s": round(time.time() - t0, 1)}, flush=True)


def sim_multispp():
    """Variant: does sorting S jittered copies of the incoherent wave
    together (= batching S spp into one wave) tighten 128-ray packet
    unions?"""
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)
    n = size * size
    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    o, d = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    o, d = np.asarray(o), np.asarray(d)
    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    rng = np.random.default_rng(0)
    for S in (1, 2, 4, 8):
        # S jittered copies of the same incoherent bounce wave: same
        # origins (hit points), directions re-drawn per sample
        os_, ds_ = [], []
        for s in range(S):
            perm = rng.permutation(n) if s == 0 else perm  # same hits
            oi = o[perm]
            di = d[perm] + rng.normal(0, 0.35, (n, 3)).astype(np.float32)
            di /= np.linalg.norm(di, axis=-1, keepdims=True)
            os_.append(oi)
            ds_.append(di)
        ro = np.concatenate(os_)
        rd = np.concatenate(ds_)
        key = sort_key(ro, rd, lo, inv_extent)
        order = np.argsort(key, kind="stable")
        so, sd = ro[order], rd[order]
        npk = len(so) // 128
        take = rng.choice(npk, size=48, replace=False)
        vs, bs = [], []
        for pi in take:
            v, b = walk_packet(nodes, meta, blocks,
                               so[pi * 128:(pi + 1) * 128],
                               sd[pi * 128:(pi + 1) * 128], 1e30)
            vs.append(v)
            bs.append(b)
        print({"spp_batch": S, "per_ray_visits": round(np.mean(vs) / 128, 3),
               "per_ray_blocks": round(np.mean(bs) / 128, 3),
               "visits_mean": round(np.mean(vs), 1),
               "blocks_mean": round(np.mean(bs), 1)}, flush=True)





def sim_leafcap():
    """Sweep wide_leaf_cap: fewer inner-node visits (fat leaves) vs more MT
    blocks. Reports per-packet visit/block counts for primary + incoherent
    128-ray packets at each cap, to pick candidates for on-chip A/B."""
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    scene, cam = make_colonnade_scene()
    rng = np.random.default_rng(0)
    n = size * size
    for cap in (32, 64, 128, 256):
        settings = RenderSettings(width=size, height=size, spp=1,
                                  instancing="off", wide_leaf_cap=cap)
        flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
        nodes = np.asarray(flat.wbvh_nodes)
        meta = np.asarray(flat.wbvh_meta)
        blocks = np.asarray(flat.wbvh_tris)
        px = np.arange(n, dtype=np.uint32) % size
        py = np.arange(n, dtype=np.uint32) // size
        o, d = spawn_camera_rays(flat.camera, jnp.asarray(px),
                                 jnp.asarray(py),
                                 jnp.zeros((n, 2)) + 0.5,
                                 jnp.zeros((n, 2)) + 0.5)
        o, d = np.asarray(o), np.asarray(d)
        root = nodes[0].reshape(16, 8)
        valid = root[:, 6] != -1.0
        lo = root[valid, 0:3].min(0)
        hi = root[valid, 3:6].max(0)
        inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)
        perm = rng.permutation(n)
        oi = o[perm]
        di = d[perm] + rng.normal(0, 0.35, (n, 3)).astype(np.float32)
        di /= np.linalg.norm(di, axis=-1, keepdims=True)
        out = {"cap": cap, "nodes": len(nodes), "blocks_total": len(blocks)}
        for label, (ro, rd) in [("pri", (o, d)), ("inc", (oi, di))]:
            key = sort_key(ro, rd, lo, inv_extent)
            order = np.argsort(key, kind="stable")
            so, sd = ro[order], rd[order]
            take = rng.choice(n // 128, size=48, replace=False)
            vs, bs = [], []
            for pi in take:
                v, b = walk_packet(nodes, meta, blocks,
                                   so[pi * 128:(pi + 1) * 128],
                                   sd[pi * 128:(pi + 1) * 128], 1e30)
                vs.append(v)
                bs.append(b)
            out[label + "_visits"] = round(np.mean(vs), 1)
            out[label + "_blocks"] = round(np.mean(bs), 1)
        print(out, flush=True)




def _part1by1(x):
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def sim_sortkeys():
    """Compare ray-sort keys by the packet union cost they produce on the
    synthetic incoherent wave: more direction bits vs more origin-Morton
    bits, and a position+direction interleave."""
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)
    n = size * size
    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    o, d = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    o, d = np.asarray(o), np.asarray(d)
    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    oi = o[perm]
    di = d[perm] + rng.normal(0, 0.35, (n, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=-1, keepdims=True)

    q = np.clip((oi - lo) * inv_extent, 0.0, 1.0)

    def morton(bits):
        qi = (q * ((1 << bits) - 1)).astype(np.int32)
        return (_part1by2(qi[:, 0]) | (_part1by2(qi[:, 1]) << 1)
                | (_part1by2(qi[:, 2]) << 2))

    octant = ((di[:, 0] < 0).astype(np.int32)
              + 2 * (di[:, 1] < 0).astype(np.int32)
              + 4 * (di[:, 2] < 0).astype(np.int32))
    # octahedral direction bucket at b bits per axis
    ad = np.abs(di)
    den = ad.sum(-1) + 1e-20
    u = di[:, 0] / den
    v = di[:, 1] / den
    # fold lower hemisphere
    neg = di[:, 2] < 0
    u2 = np.where(neg, (1 - np.abs(v)) * np.sign(u), u)
    v2 = np.where(neg, (1 - np.abs(u)) * np.sign(v), v)

    def dirbits(b):
        du = np.clip(((u2 + 1) * 0.5 * ((1 << b) - 1)).astype(np.int32), 0,
                     (1 << b) - 1)
        dv = np.clip(((v2 + 1) * 0.5 * ((1 << b) - 1)).astype(np.int32), 0,
                     (1 << b) - 1)
        return (_part1by1(du) | (_part1by1(dv) << 1))  # 2b bits, interleaved

    keys = {
        "oct3+mor21": (octant.astype(np.int64) << 21) | morton(7),
        "oct3+mor30": (octant.astype(np.int64) << 30) | morton(10),
        "dir6+mor24": (dirbits(3).astype(np.int64) << 24) | morton(8),
        "dir10+mor21": (dirbits(5).astype(np.int64) << 21) | morton(7),
        "mor15+dir10": (morton(5).astype(np.int64) << 10) | dirbits(5),
        "mor9+dir16": (morton(3).astype(np.int64) << 16) | dirbits(8),
    }
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        so, sd = oi[order], di[order]
        take = rng.choice(n // 128, size=48, replace=False)
        vs, bs = [], []
        for pi in take:
            vv, bb = walk_packet(nodes, meta, blocks,
                                 so[pi * 128:(pi + 1) * 128],
                                 sd[pi * 128:(pi + 1) * 128], 1e30)
            vs.append(vv)
            bs.append(bb)
        print({"key": name, "visits": round(np.mean(vs), 1),
               "blocks": round(np.mean(bs), 1)}, flush=True)


def sim_sortkeys2():
    """Sort-key sweep on REALISTIC waves: a diffuse bounce wave (origins on
    scene surfaces, cosine-hemisphere directions) and a shadow wave
    (surface origins, directions converging on an area light)."""
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)
    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    n = size * size

    rng = np.random.default_rng(1)
    tsel = rng.integers(0, len(idx), n)
    v0 = geo[idx[tsel, 0]]
    e1 = geo[idx[tsel, 1]] - v0
    e2 = geo[idx[tsel, 2]] - v0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    flip = r1 + r2 > 1
    r1 = np.where(flip, 1 - r1, r1)
    r2 = np.where(flip, 1 - r2, r2)
    org = (v0 + r1[:, None] * e1 + r2[:, None] * e2).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20
    # cosine hemisphere around nrm
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0 = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, t0)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-20
    ty = np.cross(nrm, tx)
    dirs = (tx * (rad * np.cos(phi))[:, None]
            + ty * (rad * np.sin(phi))[:, None]
            + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(
                np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-20
    org = org + nrm * 1e-3

    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)
    # shadow wave: same origins, directions to random points on a quad
    # "light" near the top of the scene
    lp = np.stack([rng.uniform(lo[0] + 0.3 * (hi[0] - lo[0]),
                               lo[0] + 0.7 * (hi[0] - lo[0]), n),
                   np.full(n, hi[1] - 0.05 * (hi[1] - lo[1])),
                   rng.uniform(lo[2] + 0.3 * (hi[2] - lo[2]),
                               lo[2] + 0.7 * (hi[2] - lo[2]), n)],
                  -1).astype(np.float32)
    sd_ = lp - org
    sdist = np.linalg.norm(sd_, axis=-1, keepdims=True)
    sd_ = sd_ / (sdist + 1e-20)

    def keyset(o_, d_):
        q = np.clip((o_ - lo) * inv_extent, 0.0, 1.0)

        def morton(bits):
            qi = (q * ((1 << bits) - 1)).astype(np.int32)
            return (_part1by2(qi[:, 0]) | (_part1by2(qi[:, 1]) << 1)
                    | (_part1by2(qi[:, 2]) << 2))

        octant = ((d_[:, 0] < 0).astype(np.int32)
                  + 2 * (d_[:, 1] < 0).astype(np.int32)
                  + 4 * (d_[:, 2] < 0).astype(np.int32))
        ad = np.abs(d_)
        den = ad.sum(-1) + 1e-20
        u = d_[:, 0] / den
        v = d_[:, 1] / den
        neg = d_[:, 2] < 0
        u2 = np.where(neg, (1 - np.abs(v)) * np.sign(u), u)
        v2 = np.where(neg, (1 - np.abs(u)) * np.sign(v), v)

        def dirbits(b):
            du = np.clip(((u2 + 1) * 0.5 * ((1 << b) - 1)).astype(np.int32),
                         0, (1 << b) - 1)
            dv = np.clip(((v2 + 1) * 0.5 * ((1 << b) - 1)).astype(np.int32),
                         0, (1 << b) - 1)
            return (_part1by1(du) | (_part1by1(dv) << 1))

        return {
            "oct3+mor21": (octant.astype(np.int64) << 21) | morton(7),
            "dir10+mor21": (dirbits(5).astype(np.int64) << 21) | morton(7),
            "mor15+dir10": (morton(5).astype(np.int64) << 10) | dirbits(5),
            "mor12+dir12": (morton(4).astype(np.int64) << 12) | dirbits(6),
            "mor9+dir16": (morton(3).astype(np.int64) << 16) | dirbits(8),
            "dir16+mor9": (dirbits(8).astype(np.int64) << 9) | morton(3),
        }

    for label, (o_, d_) in [("diffuse_bounce", (org, dirs)),
                            ("shadow", (org, sd_))]:
        print(f"## {label}")
        for name, key in keyset(o_, d_).items():
            order = np.argsort(key, kind="stable")
            so, sdd = o_[order], d_[order]
            take = rng.choice(n // 128, size=48, replace=False)
            vs, bs = [], []
            for pi in take:
                vv, bb = walk_packet(nodes, meta, blocks,
                                     so[pi * 128:(pi + 1) * 128],
                                     sdd[pi * 128:(pi + 1) * 128], 1e30)
                vs.append(vv)
                bs.append(bb)
            print({"key": name, "visits": round(np.mean(vs), 1),
                   "blocks": round(np.mean(bs), 1)}, flush=True)


def sim_imbalance():
    """A grid step's superstep count is max over its PACKETS packets. How
    much do wasted supersteps drop if packets are grouped by similar cost
    (vs the current adjacent grouping)? Uses the realistic diffuse-bounce
    wave; cost proxy candidates: oracle visits, Morton key span."""
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)
    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    n = size * size

    rng = np.random.default_rng(1)
    tsel = rng.integers(0, len(idx), n)
    v0 = geo[idx[tsel, 0]]
    e1 = geo[idx[tsel, 1]] - v0
    e2 = geo[idx[tsel, 2]] - v0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    flip = r1 + r2 > 1
    r1 = np.where(flip, 1 - r1, r1)
    r2 = np.where(flip, 1 - r2, r2)
    org = (v0 + r1[:, None] * e1 + r2[:, None] * e2).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0 = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, t0)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-20
    ty = np.cross(nrm, tx)
    dirs = (tx * (rad * np.cos(phi))[:, None]
            + ty * (rad * np.sin(phi))[:, None]
            + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(
                np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-20
    org = org + nrm * 1e-3

    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)
    key = sort_key(org, dirs, lo, inv_extent)
    order = np.argsort(key, kind="stable")
    so, sd, sk = org[order], dirs[order], key[order]

    npk = n // 128
    print(f"# walking {npk} packets ...", flush=True)
    vs = np.zeros(npk)
    bs = np.zeros(npk)
    for pi in range(npk):
        v, b = walk_packet(nodes, meta, blocks,
                           so[pi * 128:(pi + 1) * 128],
                           sd[pi * 128:(pi + 1) * 128], 1e30)
        vs[pi] = v
        bs[pi] = b
    span = (sk.reshape(npk, 128)[:, -1] - sk.reshape(npk, 128)[:, 0])
    # cost of a schedule = sum over groups of 4 of max(visits)+... use
    # supersteps proxy: visits/2 + blocks/4 (POPS=2, MT_DRAIN=4 per packet
    # drain loops run sequentially, so drains add per-packet... the max is
    # on visits; drains serialize across packets). Report both components.
    cost = vs / 2.0 + bs / 4.0

    def sched(perm):
        g = cost[perm][: (npk // 4) * 4].reshape(-1, 4)
        return g.max(1).sum()

    ident = np.arange(npk)
    rnd = rng.permutation(npk)
    by_cost = np.argsort(cost)         # oracle
    by_span = np.argsort(span)         # cheap runtime proxy
    base = cost.sum() / 4 * 4 / 4      # perfect balance lower bound: mean*groups
    print({"mean_visits": round(vs.mean(), 1),
           "visits_std": round(vs.std(), 1),
           "sum_cost_ideal": int(cost.sum() / 4),
           "adjacent": int(sched(ident)),
           "random": int(sched(rnd)),
           "oracle_cost_sorted": int(sched(by_cost)),
           "span_sorted": int(sched(by_span)),
           "span_corr": round(float(np.corrcoef(span, cost)[0, 1]), 3)},
          flush=True)




def sim_width():
    """Packet WIDTH sweep (the campaign varied packet COUNT per grid step,
    never width): per-ray visits/blocks at 128/64/32/16-ray packets on the
    primary wave and the realistic diffuse-bounce wave. If narrow packets
    cut bounce-wave unions by a lot, a sub-packet kernel (multiple
    independent stacks per 128-lane block) could pay for its extra scalar
    walks; if not, the 128-lane design is vindicated at the union level."""
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)
    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    n = size * size

    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    po, pd = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                               jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    po, pd = np.asarray(po), np.asarray(pd)

    rng = np.random.default_rng(1)
    tsel = rng.integers(0, len(idx), n)
    v0 = geo[idx[tsel, 0]]
    e1 = geo[idx[tsel, 1]] - v0
    e2 = geo[idx[tsel, 2]] - v0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    flip = r1 + r2 > 1
    r1 = np.where(flip, 1 - r1, r1)
    r2 = np.where(flip, 1 - r2, r2)
    org = (v0 + r1[:, None] * e1 + r2[:, None] * e2).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0 = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, t0)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-20
    ty = np.cross(nrm, tx)
    dirs = (tx * (rad * np.cos(phi))[:, None]
            + ty * (rad * np.sin(phi))[:, None]
            + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-20
    org = org + nrm * 1e-3

    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    for label, (o_, d_) in [("primary", (po, pd)),
                            ("diffuse_bounce", (org, dirs))]:
        key = sort_key(o_, d_, lo, inv_extent)
        order = np.argsort(key, kind="stable")
        so, sd = o_[order], d_[order]
        print(f"## {label}")
        for w in (128, 64, 32, 16):
            npk = n // w
            take = rng.choice(npk, size=min(96, npk), replace=False)
            vs, bs = [], []
            for pi in take:
                v, b = walk_packet(nodes, meta, blocks,
                                   so[pi * w:(pi + 1) * w],
                                   sd[pi * w:(pi + 1) * w], 1e30)
                vs.append(v)
                bs.append(b)
            print({"width": w,
                   "per_ray_visits": round(np.mean(vs) / w, 3),
                   "per_ray_blocks": round(np.mean(bs) / w, 3),
                   "visits_per_packet": round(float(np.mean(vs)), 1),
                   "blocks_per_packet": round(float(np.mean(bs)), 1)},
                  flush=True)


if __name__ == "__main__":
    if "width" in sys.argv:
        sim_width()
    elif "multispp" in sys.argv:
        sim_multispp()
    elif "leafcap" in sys.argv:
        sim_leafcap()
    elif "sortkeys" in sys.argv:
        sim_sortkeys()
    elif "sortkeys2" in sys.argv:
        sim_sortkeys2()
    elif "imbalance" in sys.argv:
        sim_imbalance()
    else:
        main()
