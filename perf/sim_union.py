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


if __name__ == "__main__":
    if "multispp" in sys.argv:
        sim_multispp()
    else:
        main()
