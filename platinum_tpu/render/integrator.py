"""Progressive path-tracing integrator (pure JAX, wavefront over bounces).

TPU-native rework of the reference megakernels (kernel.metal:256-372 simple,
:473-686 MIS): instead of one divergent thread per pixel, all rays advance in
lockstep through a masked bounce loop — trace → shade → NEE shadow trace —
with per-lane active masks. Dead lanes are masked, not compacted, in this
integrator; the compacting wavefront variant builds on the same bounce body.

Estimator notes vs. the reference (documented deviations, all mean-preserving):
  * emission on hit is added deterministically with the lobe-probability
    weight instead of stochastically from the diffuse sub-lobe (lower var);
  * the hit-side MIS light pdf includes the light-selection probability
    (1 - pInfinite) — the reference omits it (kernel.metal:560-576), which
    slightly misweights MIS when both env and area lights exist;
  * env-miss MIS likewise includes pInfinite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.models import bsdf as bsdf_mod
from platinum_tpu.models import lights as lights_mod
from platinum_tpu.models.camera_rays import spawn_camera_rays
from platinum_tpu.ops import samplers as smp
from platinum_tpu.ops.hitdata import interpolate_hit
from platinum_tpu.ops.intersect import make_brute_tracer
from platinum_tpu.render.types import FlatScene, RenderSettings
from platinum_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

RAY_EPS = 1e-3
# Max alpha-cutout layers crossed per segment without consuming a bounce
# (parity with the reference's bounded any-hit loop, intersections.metal:8-39).
# Layer budget: path segments re-test at most ALPHA_HOPS stacked cutout
# surfaces (deeper stacks shade the last hit as opaque); shadow segments
# resolve ALPHA_HOPS+1 layers and conservatively treat anything still
# unresolved as occluded — scenes with more stacked cutouts along a light
# path darken slightly (raise ALPHA_HOPS if authoring such content).
ALPHA_HOPS = 2


def _alpha_value(flat: FlatScene, mat_idx, uv):
    """Opacity at a hit: material base alpha x base-color texture alpha;
    1.0 for materials without the USES_ALPHA flag."""
    from platinum_tpu.render.types import MAT_USES_ALPHA

    packed = flat.materials.packed[mat_idx]
    base_a = packed[:, 3]
    flags = packed[:, 15].astype(jnp.int32)
    if flat.atlas is not None:
        from platinum_tpu.ops.texturing import sample_base_alpha

        tex_rows = flat.materials.textures[mat_idx]
        base_a = base_a * sample_base_alpha(
            flat.atlas, flat.atlas_table, tex_rows, uv)
    return jnp.where((flags & MAT_USES_ALPHA) != 0, base_a, 1.0)


def make_tracers(flat: FlatScene, settings: RenderSettings):
    if settings.tracer == "bf" and flat.wbvh_nodes is not None:
        # all-Pallas breadth-first pipeline (ops/bfstream.py): closest
        # waves ride BF; any-hit (occlusion) waves keep the packet kernel
        # (BF has no early-exit, the packet any-hit walk does)
        from platinum_tpu.ops.bfstream import make_bf_tracer
        from platinum_tpu.ops.pallas_trace import make_packet_tracer

        if flat.instances is not None or flat.wbvh_parts is not None:
            raise ValueError("tracer='bf' requires a plain resident tree: "
                             "instancing='off', no partitioning")
        bf_c, _ = make_bf_tracer(
            flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot,
            mt_precision=settings.mt_precision,
            depth=(settings.bf_depth or None))
        _, pk_a = make_packet_tracer(
            flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot,
            mt_precision=("highest"
                          if settings.mt_precision == "two_phase"
                          else settings.mt_precision))
        return bf_c, pk_a
    if settings.tracer in ("packet", "auto") and flat.wbvh_parts is not None:
        from platinum_tpu.accel.partition import make_partitioned_tracer

        return make_partitioned_tracer(flat.wbvh_parts,
                                       oct_order=settings.oct_order,
                                       mt_precision=settings.mt_precision)
    if settings.tracer in ("packet", "auto") and flat.wbvh_nodes is not None:
        from platinum_tpu.ops.pallas_trace import make_packet_tracer

        return make_packet_tracer(
            flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot,
            inst_feat=(flat.instances.feat
                       if flat.instances is not None else None),
            worder=(flat.wbvh_order if settings.oct_order else None),
            stream=flat.wbvh_stream,
            mt_precision=settings.mt_precision)
    if flat.instances is not None:
        raise ValueError(
            "instanced FlatScene requires the packet tracer "
            "(settings.tracer='packet'/'auto'); rebuild with "
            "instancing='off' for the brute/bvh tracers")
    if settings.tracer in ("bvh", "auto") and flat.bvh_skip is not None:
        from platinum_tpu.ops.traverse import make_bvh_tracer

        return make_bvh_tracer(flat, max_leaf=settings.accel_max_leaf)
    return make_brute_tracer(flat.geometry)


def _fuse_shadow_active(settings: RenderSettings, features: frozenset) -> bool:
    return (settings.fuse_shadow and settings.kernel == "mis"
            and "alpha" not in features
            and ("env" in features or "area_lights" in features))


def init_path_state(flat: FlatScene, settings: RenderSettings,
                    sample_idx: jnp.ndarray, pixel_ids=None,
                    with_shadow_state: bool = False):
    """Camera rays + fresh path state for one sample of every pixel."""
    pix = (jnp.arange(settings.num_pixels, dtype=jnp.uint32)
           if pixel_ids is None else pixel_ids.astype(jnp.uint32))
    n = pix.shape[0]
    px = pix % settings.width
    py = pix // settings.width

    stream = smp.make_stream(settings.sampler, px, py, sample_idx,
                             settings.width, settings.height, settings.spp)
    stream, pixel_jitter = stream.next_2d()
    stream, lens_u = stream.next_2d()
    o, d = spawn_camera_rays(flat.camera, px, py, pixel_jitter, lens_u)

    return dict(
        o=o,
        d=d,
        L=jnp.zeros((n, 3)),
        atten=jnp.ones((n, 3)),
        active=jnp.ones((n,), bool),
        prev_pdf=jnp.zeros((n,)),
        prev_spec=jnp.ones((n,), bool),  # bounce 0 counts as "specular"
        stream=stream,
        bounce=jnp.int32(0),
        rays=jnp.float32(0.0),
        slot=jnp.arange(n, dtype=jnp.int32),  # lane -> output slot
        **(_empty_shadow(n) if with_shadow_state else {}),
    )


def make_bounce_body(flat: FlatScene, settings: RenderSettings,
                     features: frozenset, tracers=None):
    """Returns body(state) → state implementing ONE bounce of the wavefront
    loop (trace → env/emission → BSDF sample → NEE shadow trace → update)."""
    trace_closest, trace_any = tracers or make_tracers(flat, settings)
    geom, mats, lights, env = flat.geometry, flat.materials, flat.lights, flat.env

    use_mis = settings.kernel == "mis"
    env_on = "env" in features
    lights_on = "area_lights" in features
    has_env = env.count > 0 if env_on else False
    has_lights = lights.count > 0 if lights_on else False
    p_inf = (lights_mod.p_infinite(lights, env)
             if (env_on and lights_on)
             else (1.0 if env_on else 0.0))

    alpha_on = "alpha" in features
    # Deferred shadow rays: bounce k's NEE occlusion rides bounce k+1's
    # closest wave as extra lanes (one sorted launch per bounce instead of
    # two); the residual pending shadow is resolved by resolve_pending
    # after the loop. Not combined with the alpha any-hit path (cutout
    # shadows need their own multi-hop loop).
    fuse_shadow = _fuse_shadow_active(settings, features)
    tex_slots = frozenset(
        int(f[len("texslot"):]) for f in features if f.startswith("texslot"))
    from platinum_tpu.ops.intersect import HitRecord as _HR

    def body(s):
        o, d, atten, L, active = s["o"], s["d"], s["atten"], s["L"], s["active"]
        stream = s["stream"]
        bounce = s["bounce"]
        n = o.shape[0]

        if fuse_shadow:
            o2 = jnp.concatenate([o, s["sh_org"]])
            d2 = jnp.concatenate([d, s["sh_dir"]])
            tmax2 = jnp.concatenate([jnp.full((n,), jnp.inf),
                                     s["sh_dist"] - RAY_EPS])
            act2 = jnp.concatenate([active, s["sh_do"]])
            rec2 = trace_closest(o2, d2, RAY_EPS, tmax2, active=act2)
            rec = _HR(t=rec2.t[:n], tri=rec2.tri[:n], bary=rec2.bary[:n],
                      hit=rec2.hit[:n],
                      inst=(rec2.inst[:n] if rec2.inst is not None else None))
            sh_clear = s["sh_do"] & ~rec2.hit[n:]
            L = L + jnp.where(sh_clear[:, None], s["sh_ld"], 0.0)
        else:
            rec = trace_closest(o, d, RAY_EPS, jnp.inf, active=active)
        o_eff = o
        if alpha_on:
            # Any-hit alpha loop (kernel.metal:621-639 semantics): a hit on
            # a cutout surface passes through stochastically WITHOUT
            # consuming a bounce — re-trace from the hit point, bounded to
            # ALPHA_HOPS layers per segment. Each intersection is alpha-
            # tested exactly ONCE: a hit that fails its draw is `settled`
            # (shades as opaque) and never re-drawn — re-testing the same
            # hit every hop would compound opacity to alpha^ALPHA_HOPS.
            settled = jnp.zeros_like(rec.hit)
            for _ in range(ALPHA_HOPS):
                stream, u_a = stream.next_1d()
                cand = rec.hit & active & ~settled
                hd_l = interpolate_hit(geom, rec, o_eff, d,
                                       instances=flat.instances)
                a_val = _alpha_value(flat, hd_l.mat_idx, hd_l.uv)
                pas = cand & (u_a >= a_val)
                settled = settled | (cand & ~pas)
                o_eff = jnp.where(pas[:, None], hd_l.pos, o_eff)
                rec2 = trace_closest(o_eff, d, RAY_EPS, jnp.inf, active=pas)
                rec = _HR(
                    t=jnp.where(pas, rec2.t, rec.t),
                    tri=jnp.where(pas, rec2.tri, rec.tri),
                    bary=jnp.where(pas[:, None], rec2.bary, rec.bary),
                    hit=jnp.where(pas, rec2.hit, rec.hit),
                    inst=(jnp.where(pas, rec2.inst, rec.inst)
                          if rec.inst is not None else None),
                )
        hit = rec.hit & active
        miss = active & ~rec.hit

        # --- Environment + background on miss -------------------------------
        if env_on:
            env_le = lights_mod.env_radiance(env, d)
            if use_mis:
                env_pdf_full = lights_mod.env_pdf_of_dir(env, d) * p_inf
                w_env = jnp.where(
                    s["prev_spec"], 1.0,
                    s["prev_pdf"] / jnp.maximum(s["prev_pdf"] + env_pdf_full, 1e-20),
                )
            else:
                w_env = jnp.ones((n,))
            L = L + jnp.where((miss & has_env)[:, None],
                              atten * env_le * w_env[:, None], 0.0)

        rays_new = s["rays"] + jnp.sum(active.astype(jnp.float32)) * (
            2.0 if use_mis else 1.0)

        lane_state = dict(
            o=o, d=d, atten=atten, L=L, hit=hit, o_eff=o_eff,
            prev_pdf=s["prev_pdf"], prev_spec=s["prev_spec"],
            stream=stream, slot=s["slot"], bounce=bounce,
            rec_t=rec.t, rec_tri=rec.tri, rec_bary=rec.bary,
            **({"rec_inst": rec.inst} if rec.inst is not None else {}),
        )

        if (settings.chunk_shade and not alpha_on
                and n > settings.chunk_shade
                and n % settings.chunk_shade == 0):
            upd = _chunked_shade(lane_state, _shade_lanes,
                                 settings.chunk_shade)
        else:
            upd = _shade_lanes(lane_state)

        # NEE occlusion: immediate dense any-hit unless deferred to the
        # next bounce's combined wave (fuse_shadow) or resolved inside the
        # alpha multi-hop loop (which sets sh_do=False).
        if use_mis and (env_on or lights_on) and not fuse_shadow:
            if alpha_on:
                pass  # occlusion resolved inside _shade_lanes
            else:
                occ = trace_any(upd["sh_org"], upd["sh_dir"], RAY_EPS,
                                upd["sh_dist"] - RAY_EPS, active=upd["sh_do"])
                upd["L"] = upd["L"] + jnp.where(
                    (upd["sh_do"] & ~occ)[:, None], upd["sh_ld"], 0.0)

        out = dict(
            o=upd["o"],
            d=upd["d"],
            L=upd["L"],
            atten=upd["atten"],
            active=upd["active"],
            prev_pdf=upd["prev_pdf"],
            prev_spec=upd["prev_spec"],
            stream=upd["stream"],
            bounce=bounce + 1,
            rays=rays_new,
            slot=upd["slot"],
        )
        if fuse_shadow:
            out.update({k: upd[k] for k in
                        ("sh_org", "sh_dir", "sh_dist", "sh_ld", "sh_do")})
        return out

    def _shade_lanes(ls):
        """Per-lane hit shading: interpolation, shading context, normal
        mapping, emission w/ MIS, BSDF sampling, NEE light sampling (shadow
        ray emitted as sh_* state), RR, next-ray update. Pure per-lane map —
        runs full-width (dense) or on sorted fixed-size chunks (chunked)."""
        o, d, atten, L = ls["o"], ls["d"], ls["atten"], ls["L"]
        hit, o_eff, stream = ls["hit"], ls["o_eff"], ls["stream"]
        bounce = ls["bounce"]
        n = o.shape[0]
        from platinum_tpu.ops.intersect import HitRecord as _HR2
        rec = _HR2(t=ls["rec_t"], tri=ls["rec_tri"], bary=ls["rec_bary"],
                   hit=hit, inst=ls.get("rec_inst"))

        hd = interpolate_hit(geom, rec, o_eff, d, instances=flat.instances)
        ctx = bsdf_mod.make_shading_context(
            mats, hd.mat_idx, hd.uv, flat.atlas, flat.atlas_table,
            slots=tex_slots,
        )

        # --- Normal mapping (kernel.metal:168-177) ---------------------------
        from platinum_tpu.core.material import TextureSlot as _TS
        if flat.atlas is not None and int(_TS.NORMAL) in tex_slots:
            from platinum_tpu.ops import frame as frame_ops
            from platinum_tpu.ops.texturing import sample_normal_map

            has_nm, nm = sample_normal_map(
                flat.atlas, flat.atlas_table, ctx.tex_rows, hd.uv
            )
            mapped = (hd.frame_t * nm[..., 0:1] + hd.frame_b * nm[..., 1:2]
                      + hd.normal * nm[..., 2:3])
            mapped = mapped / jnp.maximum(
                jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-20
            )
            nt, nb, nn = frame_ops.from_normal(mapped)
            sel = has_nm[:, None]
            hd = type(hd)(
                pos=hd.pos,
                normal=jnp.where(sel, nn, hd.normal),
                gnormal=hd.gnormal,
                uv=hd.uv,
                wo=jnp.where(sel, frame_ops.world_to_local((nt, nb, nn), -d), hd.wo),
                frame_t=jnp.where(sel, nt, hd.frame_t),
                frame_b=jnp.where(sel, nb, hd.frame_b),
                mat_idx=hd.mat_idx,
            )

        # Residual cutout hits beyond ALPHA_HOPS layers shade as opaque
        # (the pass-through loop above runs before shading data is built).

        # --- Emission on hit (MIS against NEE) ------------------------------
        le = bsdf_mod.emitted_radiance(ctx, hd.wo, luts=flat.luts,
                                       features=features)
        if use_mis and lights_on:
            cos_hit = jnp.abs(jnp.sum(d * hd.gnormal, axis=-1))
            # distance from the previous path vertex (NOT the last alpha
            # hop origin) — the pdf the NEE strategy would have used
            dist2_hit = jnp.sum((hd.pos - o) ** 2, axis=-1)
            light_pdf_hit = (
                (1.0 - p_inf)
                * (ctx.emission[:, 1] * np.pi / jnp.maximum(lights.total_power, 1e-20))
                * dist2_hit / jnp.maximum(cos_hit, 1e-20)
            )
            w_emit = jnp.where(
                ls["prev_spec"] | ~has_lights, 1.0,
                ls["prev_pdf"] / jnp.maximum(ls["prev_pdf"] + light_pdf_hit, 1e-20),
            )
        else:
            w_emit = jnp.ones((n,))
        L = L + jnp.where(hit[:, None], atten * le * w_emit[:, None], 0.0)

        # --- BSDF sampling ---------------------------------------------------
        stream, r2 = stream.next_2d()
        stream, r3 = stream.next_1d()
        stream, r4 = stream.next_1d()
        stream, rc = stream.next_2d()
        r4 = jnp.concatenate([r2, r3[:, None], r4[:, None]], axis=-1)
        samp = bsdf_mod.sample(
            ctx, hd.wo, r4, rc, luts=flat.luts,
            multiscatter=bool(settings.flags & 1), features=features,
            mixture_pdf=settings.mixture_pdf,
        )

        # --- Next-event estimation -------------------------------------------
        if use_mis and (env_on or lights_on):
            stream, u_nee2 = stream.next_2d()
            stream, u_sel = stream.next_1d()

            if env_on and lights_on:
                use_env_light = (u_sel < p_inf) & has_env
                u_area = jnp.where(
                    p_inf < 1.0,
                    (u_sel - p_inf) / jnp.maximum(1.0 - p_inf, 1e-20), 0.0,
                )
                ls_env = lights_mod.sample_env_light(env, u_nee2)
                ls_area = lights_mod.sample_area_light(
                    geom, lights, hd.pos, u_area, u_nee2
                )
                sel = use_env_light[:, None]
                li = jnp.where(sel, ls_env.li, ls_area.li)
                wi_world = jnp.where(sel, ls_env.wi, ls_area.wi)
                dist = jnp.where(use_env_light, ls_env.dist, ls_area.dist)
                l_pdf = jnp.where(use_env_light, ls_env.pdf, ls_area.pdf)
                p_light = jnp.where(
                    use_env_light,
                    p_inf,  # env count is 1 when present
                    (1.0 - p_inf) * ls_area.p_light,
                )
            elif env_on:
                lsmp = lights_mod.sample_env_light(env, u_nee2)
                li, wi_world, dist, l_pdf = lsmp.li, lsmp.wi, lsmp.dist, lsmp.pdf
                p_light = jnp.ones((n,))
            else:
                lsmp = lights_mod.sample_area_light(
                    geom, lights, hd.pos, u_sel, u_nee2
                )
                li, wi_world, dist, l_pdf = lsmp.li, lsmp.wi, lsmp.dist, lsmp.pdf
                p_light = lsmp.p_light

            wi_local = jnp.stack(
                [jnp.sum(wi_world * hd.frame_t, -1),
                 jnp.sum(wi_world * hd.frame_b, -1),
                 jnp.sum(wi_world * hd.normal, -1)], axis=-1,
            )
            ev = bsdf_mod.evaluate(ctx, hd.wo, wi_local, luts=flat.luts,
                                   multiscatter=bool(settings.flags & 1),
                                   features=features)
            f_nonzero = jnp.sum(ev.f * ev.f, axis=-1) > 0.0
            do_nee = hit & bsdf_mod.wants_nee(ctx) & f_nonzero
            if env_on and lights_on:
                do_nee = do_nee & (has_lights | has_env)
            ld = (
                li * ev.f * jnp.abs(wi_local[..., 2:3])
                / jnp.maximum(p_light * l_pdf + ev.pdf, 1e-20)[..., None]
            )
            if alpha_on:
                # Shadow rays run the alpha loop too (kernel.metal:621-639):
                # cutout surfaces block stochastically instead of fully.
                # Traces stay in here (dense-only path; chunking requires
                # "alpha" not in features).
                occluded = jnp.zeros((n,), bool)
                clear = jnp.zeros((n,), bool)
                org = hd.pos
                rem = dist - RAY_EPS
                for _ in range(ALPHA_HOPS + 1):
                    qry = do_nee & ~occluded & ~clear
                    srec = trace_closest(org, wi_world, RAY_EPS, rem,
                                         active=qry)
                    shit = srec.hit & qry
                    clear = clear | (qry & ~srec.hit)
                    hd_s = interpolate_hit(geom, srec, org, wi_world,
                                           instances=flat.instances)
                    a_s = _alpha_value(flat, hd_s.mat_idx, hd_s.uv)
                    stream, u_s = stream.next_1d()
                    blocked = shit & (u_s < a_s)
                    occluded = occluded | blocked
                    pas_s = shit & ~blocked
                    org = jnp.where(pas_s[:, None], hd_s.pos, org)
                    rem = jnp.where(pas_s, rem - srec.t, rem)
                # unresolved after the hop budget: conservative (occluded)
                occluded = occluded | (do_nee & ~clear & ~occluded)
                L = L + jnp.where((do_nee & ~occluded)[:, None],
                                  atten * ld, 0.0)
                sh_next = _empty_shadow(n)
            else:
                # Shadow ray emitted as state; the caller traces it (dense
                # any-hit right after shading, or deferred onto the next
                # bounce's combined closest wave under fuse_shadow).
                sh_next = dict(
                    sh_org=hd.pos, sh_dir=wi_world,
                    sh_dist=jnp.where(do_nee, dist, 0.0),
                    sh_ld=jnp.where(do_nee[:, None], atten * ld, 0.0),
                    sh_do=do_nee,
                )
        else:
            sh_next = _empty_shadow(n)

        # --- Continue the path ------------------------------------------------
        cont = (samp.flags & (bsdf_mod.SAMPLE_REFLECTED | bsdf_mod.SAMPLE_TRANSMITTED)) != 0
        pdf_ok = samp.pdf > 0.0
        atten_new = atten * samp.f * jnp.abs(samp.wi[..., 2:3]) / jnp.maximum(
            samp.pdf, 1e-20
        )[..., None]

        # Russian roulette after the first bounce (kernel.metal:655-663)
        stream, u_rr = stream.next_1d()
        q = jnp.maximum(0.0, 1.0 - jnp.max(atten_new, axis=-1))
        q = jnp.where(bounce > 0, q, 0.0)
        killed = u_rr < q
        atten_new = atten_new / jnp.maximum(1.0 - q, 1e-20)[..., None]

        active_new = hit & cont & pdf_ok & ~killed

        wi_world_next = (
            hd.frame_t * samp.wi[..., 0:1]
            + hd.frame_b * samp.wi[..., 1:2]
            + hd.normal * samp.wi[..., 2:3]
        )
        wi_world_next = wi_world_next / jnp.maximum(
            jnp.linalg.norm(wi_world_next, axis=-1, keepdims=True), 1e-20
        )

        return dict(
            o=jnp.where(hit[:, None], hd.pos, o),
            d=jnp.where(hit[:, None], wi_world_next, d),
            L=L,
            atten=jnp.where(active_new[:, None], atten_new, atten),
            active=active_new,
            prev_pdf=jnp.where(hit, samp.pdf, ls["prev_pdf"]),
            # Weight-1 MIS for every segment the LIGHT strategy has zero
            # yield on — otherwise the standard p_b/(p_b+p_l) silently
            # discards the light strategy's share (the reference
            # underweights the same way). That is: TRANSMITTED segments
            # (evaluate() is zero below the horizon, bsdf.metal:200-201)
            # and segments sampled at a genuinely INTERIOR vertex of a
            # TRANSMISSIVE material (shading wo.z <= -MIN_COS, where
            # evaluate() — and so NEE — is identically zero; e.g. an
            # emissive filament inside a rough-glass bulb). The
            # transmission>0 scope matters: on opaque geometry the only
            # wo.z<0 lanes are shading-normal silhouette flips and
            # epsilon self-intersections whose grazing pdfs make f/pdf
            # ill-conditioned — weight-1 un-damps those fireflies
            # (measured: +6e-3 furnace shift), so they keep the
            # reference's standard weight.
            prev_spec=jnp.where(
                hit, ((samp.flags & (bsdf_mod.SAMPLE_SPECULAR
                                     | bsdf_mod.SAMPLE_TRANSMITTED)) != 0)
                | ((hd.wo[..., 2] <= -bsdf_mod.MIN_COS)
                   & (ctx.transmission > 0.0)),
                ls["prev_spec"]
            ),
            stream=stream,
            slot=ls["slot"],
            **sh_next,
        )

    def resolve_pending(s):
        """Settle any still-pending deferred shadow rays (end of loop /
        before compaction drops lanes)."""
        if not fuse_shadow:
            return s
        occ = trace_any(s["sh_org"], s["sh_dir"], RAY_EPS,
                        s["sh_dist"] - RAY_EPS, active=s["sh_do"])
        s = dict(s)
        s["L"] = s["L"] + jnp.where((s["sh_do"] & ~occ)[:, None],
                                    s["sh_ld"], 0.0)
        s.update(_empty_shadow(s["o"].shape[0]))
        return s

    body.resolve_pending = resolve_pending
    return body


def _chunked_shade(ls, shade_fn, chunk: int):
    """Shade only live-hit lanes, in fixed-size chunks.

    Lanes are sorted hits-first (stable), then `ceil(hits/chunk)` chunks are
    shaded by `shade_fn` inside a dynamic-trip-count `while_loop`; unshaded
    lanes (misses/dead) pass through untouched with `active=False`. Shading
    cost thus scales with the live-hit population each bounce instead of the
    full wavefront width — the exact (zero-variance) counterpart of
    `_compact_state`'s stochastic population control, and the hook for
    material-class-specialized shading (chunks are contiguous after a sort).

    Per-lane sampler streams are self-contained counters, so permuting +
    chunking draws the identical per-lane sequence as the dense path; only
    dead lanes' streams go stale (they never draw again). Scalar stream
    leaves (e.g. Halton's shared `dim`) advance by the same static amount in
    every chunk, so the merged stream stays consistent."""
    n = ls["o"].shape[0]

    def is_lane(leaf):
        return (hasattr(leaf, "shape") and leaf.ndim >= 1
                and leaf.shape[0] == n)

    key = jnp.where(ls["hit"], jnp.uint8(0), jnp.uint8(1))
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    srt = jax.tree.map(lambda a: a[perm] if is_lane(a) else a, ls)

    nlive = jnp.sum(key == 0)
    nch = (nlive + (chunk - 1)) // chunk

    init_out = dict(
        o=srt["o"], d=srt["d"], L=srt["L"], atten=srt["atten"],
        active=jnp.zeros((n,), bool),
        prev_pdf=srt["prev_pdf"], prev_spec=srt["prev_spec"],
        stream=srt["stream"], slot=srt["slot"],
        **_empty_shadow(n),
    )

    def chunk_body(carry):
        i, out = carry
        off = i * chunk
        cls = jax.tree.map(
            lambda a: (jax.lax.dynamic_slice_in_dim(a, off, chunk, 0)
                       if is_lane(a) else a), srt)
        cupd = shade_fn(cls)

        def put(dst, src):
            if is_lane(dst):
                return jax.lax.dynamic_update_slice_in_dim(dst, src, off, 0)
            return src  # scalar stream leaves: same value every chunk
        out = jax.tree.map(put, out, cupd)
        return i + 1, out

    _, out = jax.lax.while_loop(lambda c: c[0] < nch, chunk_body,
                                (jnp.int32(0), init_out))
    return jax.tree.map(lambda a: a[inv] if is_lane(a) else a, out)


def _empty_shadow(n):
    return dict(sh_org=jnp.zeros((n, 3)), sh_dir=jnp.zeros((n, 3)),
                sh_dist=jnp.zeros((n,)), sh_ld=jnp.zeros((n, 3)),
                sh_do=jnp.zeros((n,), bool))


def _compact_state(state, cap: int, sel_key):
    """Shrink the wavefront to `cap` lanes (unbiased population control).

    Live lanes are kept with equal probability via a random-key sort; when
    more than `cap` are live, a uniform random subset of size `cap`
    survives with Horvitz-Thompson weight live/cap on its throughput —
    the estimator stays unbiased, trading a little variance for a
    smaller wavefront. This is the TPU-native (static-shape) counterpart
    of the wavefront compaction queues in GPU path tracers (BASELINE
    config 4; SURVEY §7 step 6): dead lanes are dropped, live lanes are
    densely packed so every later trace/shade pass runs at `cap` lanes.
    Banked radiance (state["L"], indexed by state["slot"]) must be
    scattered out by the caller BEFORE compaction."""
    n = state["o"].shape[0]
    active = state["active"]
    live = jnp.sum(active.astype(jnp.float32))
    u = jax.random.uniform(sel_key, (n,))
    order = jnp.argsort(jnp.where(active, u, 2.0))
    sel = order[:cap]
    w = jnp.maximum(1.0, live / float(cap))

    def take(x):
        return x[sel] if hasattr(x, "shape") and x.shape[:1] == (n,) else x

    new = jax.tree.map(take, state)
    new["atten"] = new["atten"] * w
    new["L"] = jnp.zeros((cap, 3))
    # lanes beyond `live` are dead padding; lanes dropped when live > cap
    # are terminated (their future is carried by the survivors' weight)
    return new


def _compaction_plan(n: int, settings: RenderSettings):
    """[(cap, bounce_limit)] segments: full size for the first bounces,
    then halve every two bounces down to n/8 (multiples of 512 lanes).

    settings.compact_plan overrides the static default with an explicit
    or measured schedule (render/autoplan.py); caps are clamped to the
    actual lane count (tiled/sharded calls see fewer lanes than the plan
    was built for) and equal-cap segments merged."""
    if isinstance(settings.compact_plan, str):
        raise ValueError(
            "compact_plan='auto' must be resolved on the host before any "
            "jitted render path — call autoplan.resolve_auto_plan(flat, "
            "settings) (Renderer.start_render and integrator.render do)")
    if settings.compact_plan is not None and not settings.compact:
        raise ValueError("compact_plan requires settings.compact=True")
    if (not settings.compact or n < 8192
            or settings.max_bounces <= 3):
        return [(n, settings.max_bounces)]
    if settings.compact_plan is not None:
        from platinum_tpu.render import autoplan

        # Plan caps are FULL-WAVE lane counts (num_pixels x spp_batch).
        # Sharded/tiled calls see n < that; rescale caps to this wave's
        # share (ceil to the 512-lane compaction grain) — clamping to n
        # instead would leave most caps at full shard width and silently
        # disable the schedule on sharded renders.
        n_full = settings.num_pixels * max(1, settings.spp_batch)
        scale = n / n_full if n_full > n else 1.0

        def _cap(c):
            c = int(c)
            if scale < 1.0:
                c = -(-int(c * scale) // 512) * 512
            return min(max(c, 512), n)

        clamped = tuple((_cap(c), int(b))
                        for c, b in settings.compact_plan)
        autoplan.validate_plan(clamped, n, settings.max_bounces)
        merged = []
        for cap, b in clamped:
            if merged and merged[-1][0] == cap:
                merged[-1] = (cap, b)
            else:
                merged.append((cap, b))
        return merged
    plan = []
    cap, b = n, 2
    plan.append((n, 2))
    while b < settings.max_bounces:
        cap = max((cap // 2 + 511) // 512 * 512, 512)
        nb = min(b + 2, settings.max_bounces) if cap > 512 else settings.max_bounces
        plan.append((cap, nb))
        b = nb
        if cap == 512:
            break
    if plan[-1][1] < settings.max_bounces:
        plan.append((plan[-1][0], settings.max_bounces))
    return plan


def render_sample(flat: FlatScene, settings: RenderSettings,
                  sample_idx: jnp.ndarray, pixel_ids=None, tracers=None,
                  return_stats: bool = False,
                  features: frozenset = bsdf_mod.ALL_FEATURES):
    """Trace one sample per pixel; returns (R, 3) radiance (R = len(pixel_ids),
    default all pixels). With return_stats, also returns the number of rays
    traced (closest + shadow), for honest Mrays/sec accounting.

    With settings.compact, the wavefront shrinks on a fixed schedule as
    paths die (see _compact_state) — later bounces trace and shade far
    fewer lanes.

    With settings.spp_batch = B > 1 (and default pixel_ids), B samples of
    every pixel ride ONE wavefront: B-times wider waves, 1/B as many wave
    launches per spp, amortising per-wave fixed costs (sort, pack/unsort,
    launch plumbing). Per-lane sampler streams draw the identical
    per-(pixel, sample) sequences as B separate calls, so the result is
    their sum; the returned radiance is the per-pixel SUM of the B
    samples (callers divide by their spp count as usual)."""
    fused = _fuse_shadow_active(settings, features)
    B = settings.spp_batch if pixel_ids is None else 1
    if B > 1:
        npx = settings.num_pixels
        pixel_ids = jnp.tile(jnp.arange(npx, dtype=jnp.uint32), B)
        lane_idx = (jnp.asarray(sample_idx, jnp.int32)
                    + jnp.repeat(jnp.arange(B, dtype=jnp.int32), npx))
        state = init_path_state(flat, settings, lane_idx, pixel_ids,
                                with_shadow_state=fused)
        state["slot"] = pixel_ids.astype(jnp.int32)
    else:
        state = init_path_state(flat, settings, sample_idx, pixel_ids,
                                with_shadow_state=fused)
    body = make_bounce_body(flat, settings, features, tracers)
    n = state["o"].shape[0]
    plan = _compaction_plan(n, settings)

    if len(plan) == 1 and B == 1:
        def cond(s):
            return (s["bounce"] < settings.max_bounces) & jnp.any(s["active"])

        final = body.resolve_pending(jax.lax.while_loop(cond, body, state))
        if return_stats:
            return final["L"], final["rays"]
        return final["L"]

    if len(plan) == 1:
        def cond(s):
            return (s["bounce"] < settings.max_bounces) & jnp.any(s["active"])

        final = body.resolve_pending(jax.lax.while_loop(cond, body, state))
        out = jnp.zeros((settings.num_pixels, 3)).at[final["slot"]].add(
            final["L"])
        if return_stats:
            return out, final["rays"]
        return out

    out = jnp.zeros((settings.num_pixels if B > 1 else n, 3))
    base_key = jax.random.PRNGKey(0)
    base_key = jax.random.fold_in(base_key, sample_idx)
    for si, (cap, blimit) in enumerate(plan):
        if cap < state["o"].shape[0]:
            # pending deferred shadows must settle before lanes drop
            state = body.resolve_pending(state)
            out = out.at[state["slot"]].add(state["L"])
            state = _compact_state(state, cap,
                                   jax.random.fold_in(base_key, si))

        def cond(s, blimit=blimit):
            return (s["bounce"] < blimit) & jnp.any(s["active"])

        state = jax.lax.while_loop(cond, body, state)
    state = body.resolve_pending(state)
    out = out.at[state["slot"]].add(state["L"])
    if return_stats:
        return out, state["rays"]
    return out


@partial(jax.jit, static_argnames=("settings", "features"),
         donate_argnames=("state",))
def bounce_step_jit(flat: FlatScene, settings: RenderSettings, state,
                    features: frozenset = bsdf_mod.ALL_FEATURES):
    """One bounce as its own XLA program (see render_sample_stepped)."""
    return make_bounce_body(flat, settings, features)(state)


@partial(jax.jit, static_argnames=("settings",))
def _init_state_jit(flat, settings, sample_idx):
    return init_path_state(flat, settings, sample_idx)


def render_sample_stepped(flat: FlatScene, settings: RenderSettings,
                          sample_idx, features: frozenset = bsdf_mod.ALL_FEATURES,
                          return_stats: bool = False):
    from dataclasses import replace as _replace

    if settings.fuse_shadow:
        settings = _replace(settings, fuse_shadow=False)
    """Host-driven bounce loop: each bounce is a separate device program.
    Needed for very large scenes where a fused multi-bounce program exceeds
    the device watchdog (big-BVH lockstep traversal is seconds per bounce);
    also allows early exit once all paths die. State stays on device."""
    state = _init_state_jit(flat, settings, jnp.int32(sample_idx))
    for _ in range(settings.max_bounces):
        state = bounce_step_jit(flat, settings, state, features)
        if not bool(jax.device_get(jnp.any(state["active"]))):
            break
    if return_stats:
        return state["L"], state["rays"]
    return state["L"]


@partial(jax.jit, static_argnames=("settings", "features"),
         donate_argnames=("accum",))
def render_step(flat: FlatScene, settings: RenderSettings, accum: jnp.ndarray,
                accum_count: jnp.ndarray,
                sample_seed: jnp.ndarray | None = None,
                features: frozenset = bsdf_mod.ALL_FEATURES) -> jnp.ndarray:
    """One progressive spp step: running mean into the (H*W, 3) accumulator
    (parity with the accumulate tail of the kernels, kernel.metal:675-684).
    `accum_count` is how many samples the accumulator already holds;
    `sample_seed` is the global sample index for the RNG (defaults to
    accum_count; differs under GMoN bucketing)."""
    if settings.spp_batch > 1:
        # render_sample would sum spp_batch samples while this step's
        # running mean assumes exactly one — a silent brightness bias
        raise ValueError("render_step is a 1-spp step; use render_step_n "
                         "(or spp_batch=1) with sample-batched wavefronts")
    if sample_seed is None:
        sample_seed = accum_count
    radiance = render_sample(flat, settings, sample_seed, features=features)
    k = accum_count.astype(jnp.float32)
    return (accum * k + radiance) / (k + 1.0)


@partial(jax.jit, static_argnames=("settings", "features", "count"),
         donate_argnames=("accum",))
def render_step_n(flat: FlatScene, settings: RenderSettings,
                  accum: jnp.ndarray, accum_count: jnp.ndarray,
                  count: int,
                  features: frozenset = bsdf_mod.ALL_FEATURES) -> jnp.ndarray:
    """`count` progressive spp steps fused into ONE device program.

    Amortises per-call dispatch overhead (the remote-TPU tunnel costs up
    to ~28 ms per call) and keeps the accumulator resident. Numerically
    identical to `count` calls of render_step. With settings.spp_batch=B,
    each render_sample already sums B samples, so the loop runs count/B
    times (count must be a multiple of B)."""
    B = max(1, settings.spp_batch)
    if count % B != 0:
        raise ValueError(f"count={count} not a multiple of spp_batch={B}")

    def body(i, acc):
        idx = accum_count + i * B
        return acc + render_sample(flat, settings, idx, features=features)

    total = jax.lax.fori_loop(0, count // B, body,
                              jnp.zeros((settings.num_pixels, 3)))
    k = accum_count.astype(jnp.float32)
    return (accum * k + total) / (k + float(count))


def render(flat: FlatScene, settings: RenderSettings,
           features: frozenset = bsdf_mod.ALL_FEATURES,
           spp_per_call: int = 8) -> jnp.ndarray:
    """Render settings.spp samples; returns (H, W, 3) linear radiance in the
    working colorspace."""
    if settings.compact_plan == "auto":
        from platinum_tpu.render import autoplan

        settings = autoplan.resolve_auto_plan(flat, settings)
    accum = jnp.zeros((settings.num_pixels, 3))
    done = 0
    while done < settings.spp:
        n = min(spp_per_call, settings.spp - done)
        accum = render_step_n(flat, settings, accum, jnp.int32(done), n,
                              features=features)
        done += n
    return accum.reshape(settings.height, settings.width, 3)
