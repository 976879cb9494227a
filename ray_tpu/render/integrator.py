"""The wavefront path-tracing integrator.

One call renders one sample (one "iteration") of one tile: primary rays →
[trace → shade(NEE + BSDF sample) → shadow-trace] × bounces → per-pixel
radiance + AUX.  This is the reference's RenderScene pipeline
(internal/RendererCPU.h:374-571 / RendererVK.cpp:368-740) with the bounce
loop expressed as a ``lax.scan`` under one jit: the loop body (trace, shade,
NEE, shadow, sample) compiles exactly once regardless of path depth, every
stage is full-wavefront vectorized with active-lane masks, and dead lanes
idle (the TPU trade; coherence work — ray sorting — slots in between bounces
later without changing this structure).

Differentiability: BVH hits are detached; everything downstream (surface
interpolation, BSDF math, light math, env lookups) is attached, so
``jax.grad`` w.r.t. scene arrays (materials, textures, lights, vertices,
env) flows through radiance.  Stochastic decisions (lobe pick, light pick,
RR) use detached comparisons — the standard "detached sampling" estimator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ray_tpu.ops import rng
from ray_tpu.ops.linalg import (
    HIT_BIAS,
    MAX_DIST,
    dot,
    offset_ray,
    power_heuristic,
    safe_div_pos,
)
from ray_tpu.ops.traverse import (
    trace_closest_soa,
    trace_closest_tlas,
    trace_occlusion_soa,
    trace_occlusion_tlas,
)
from ray_tpu.render import light_sampling, radcache, surface as surface_mod, uber
from ray_tpu.render.bsdf.microfacet import PI
from ray_tpu.render.raygen import generate_primary_rays
from ray_tpu.scene.visibility import (
    RAY_CAMERA,
    RAY_DIFFUSE,
    RAY_REFR,
    RAY_SHADOW,
    RAY_SPECULAR,
)


@dataclasses.dataclass(frozen=True)
class PassSettings:
    """Static per-render settings (reference ``pass_settings_t``,
    Types.h:92 / camera_desc_t depth limits, SceneBase.h:280-292)."""

    max_total_depth: int = 6
    max_diff_depth: int = 4
    max_spec_depth: int = 8
    max_refr_depth: int = 8
    max_transp_depth: int = 8
    min_total_depth: int = 2
    min_transp_depth: int = 2  # RR start for transparency (CoreRef.cpp:3131)
    clamp_direct: float = 0.0    # 0 = unclamped
    clamp_indirect: float = 0.0
    regularize_alpha: float = 0.03
    use_nee: bool = True
    use_path_termination: bool = True
    # debug: force uniform-area rect sampling (disable the spherical-
    # rectangle branch) for bias-isolation experiments — was a module
    # env-flag, now per-render like force_xla (no process-global toggles)
    no_sphrect: bool = False
    # rematerialize the bounce body in backward: this *is* path-replay
    # backprop — the detached RNG makes recomputation exact, trading HBM
    # residency of per-bounce residuals for re-running the bounce math
    remat: bool = False
    # with remat, still save the (detached, expensive) traversal outputs so
    # the backward replay recomputes only shade math and never re-walks the
    # BVH — hit records are ~5 small (R,) arrays per bounce
    remat_save_trace: bool = True
    # with remat, additionally save matmul outputs inside the bounce body
    # (jax dots_saveable).  On gather-bound scenes the one-hot-matmul table
    # lookups (instance transforms, material records, light records —
    # ROADMAP perf #1) dominate shade cost, so saving them skips their
    # replay in backward at modest HBM cost (lanes x row-width per bounce)
    remat_save_dots: bool = False
    # occupancy compaction (the TPU answer to the reference's ray-compaction
    # counters + indirect dispatch, prepare_indir_args.comp.glsl): after
    # ``compact_after`` full-width bounce iterations, if the surviving lanes
    # fit in R // compact_factor, gather them to the front (one stable
    # argsort) and run the remaining bounces on the dense head — with an
    # exact full-width fallback branch (lax.cond) when they don't fit.
    # Semantically a no-op; 0 disables.  Default OFF: at the flagship's
    # depth-5 budget the ~20 state-column gathers/scatters (plus their AD
    # transposes) cost more than the two near-empty tail bounces they save
    # (measured 16.3 → 13.8 Mray/s fwd+bwd at 1080p) — enable for deep
    # path budgets (max_total_depth ≳ 10) where the tail dominates.
    compact_after: int = 0
    compact_factor: int = 4
    # ePassFlags (reference Types.h:85-91).  The reference parses these into
    # camera_t (SceneCommon.cpp:94-98) but its v0.4.0 cores leave them inert
    # (the consuming pass_info_t is commented out, Core.h:453-474); here they
    # are fully implemented.  "Direct" = light paths with ≤1 non-light
    # surface vertex (NEE at the first vertex / emission reached with
    # total_depth ≤ 1).
    skip_direct: bool = False    # SkipDirectLight
    skip_indirect: bool = False  # SkipIndirectLight
    lighting_only: bool = False  # LightingOnly: white albedo at primary hit
    no_background: bool = False  # NoBackground: env invisible to camera rays
    output_sh: bool = False      # OutputSH: accumulate SH-L1 radiance AUX
    # per-renderer Pallas opt-out (RendererType.REF): scoped to this render,
    # unlike the process-global ops.traverse.set_force_xla escape hatch — a
    # TPU renderer created after a REF one keeps its Pallas fast path
    force_xla: bool = False
    # texture filtering: "bilinear" (4-tap), "stochastic" (single jittered
    # tap, the reference's default — CoreRef.cpp:19), "stochastic_aniso"
    # (plus a jitter along the ray-cone footprint's major axis — the
    # anisotropic capability of CoreRef.h:465-474, expressed stochastically)
    tex_filter: str = "stochastic"
    # NaN-trap render mode: count non-finite live-lane state per bounce and
    # report it as out["nonfinite"] (the analogue of the reference's
    # FP-exception-unmasked test runs, tests/main.cpp:199-206 — a hard trap
    # is impossible here because the wavefront uses NaN padding by design)
    nan_check: bool = False


def _sh_l1_basis(w):
    """SH L1 basis evaluated at unit directions w (R,3) → (R,4) in the
    {L0, L1_y, L1_z, L1_x} order of the reference's shl1_data_t
    (Types.h:51-54, 4 coefficients × RGB)."""
    ones = jnp.ones(w.shape[:-1], w.dtype)
    return jnp.stack(
        [0.282095 * ones, 0.488603 * w[..., 1], 0.488603 * w[..., 2],
         0.488603 * w[..., 0]],
        axis=-1,
    )


def _clamp_contribution(col, limit):
    """Per-contribution energy clamp; ``limit`` may be traced (<=0 → off)."""
    s = jnp.sum(col, axis=-1, keepdims=True)
    scale = jnp.where(
        (limit > 0.0) & (s > limit), limit / jnp.maximum(s, 1e-12), 1.0
    )
    return col * scale


def _slot_mask(slot, n=4):
    """(R,) slot index → (R, n) one-hot bool — elementwise (fuses), unlike
    a per-row dynamic-update-slice which compiles to a scatter (profiled at
    ~7.6 ms per call at 262k lanes)."""
    return slot[:, None] == jnp.arange(n, dtype=slot.dtype)[None, :]


def _push_ior(stack, val, mask):
    """Vectorized push into the 4-deep IOR stack (ShadeRef.cpp:355-362)."""
    neg = stack < 0.0
    has_slot = jnp.any(neg, axis=-1)
    first_neg = jnp.argmax(neg, axis=-1)
    slot = jnp.where(has_slot, first_neg, 3)
    take = _slot_mask(slot) & mask[:, None]
    return jnp.where(take, val[:, None], stack)


def _pop_ior(stack, mask):
    """Pop the topmost (highest-index) positive entry (ShadeRef.cpp:364-371)."""
    pos = stack > 0.0
    has = jnp.any(pos, axis=-1)
    top = 3 - jnp.argmax(pos[:, ::-1], axis=-1)
    take = _slot_mask(top) & (mask & has)[:, None]
    return jnp.where(take, -1.0, stack)


def _peek_ior(stack, skip_first, default=1.0):
    """Current outside IOR: topmost positive entry, optionally skipping one
    (when exiting a medium) — ShadeRef.cpp:373-380."""
    out = jnp.full(stack.shape[:1], default, stack.dtype)
    skipped = jnp.zeros(stack.shape[:1], jnp.bool_)
    found = jnp.zeros(stack.shape[:1], jnp.bool_)
    for i in range(3, -1, -1):
        v = stack[:, i]
        pos = v > 0.0
        skip_now = pos & skip_first & (~skipped) & (~found)
        take = pos & (~skip_now) & (~found)
        out = jnp.where(take, v, out)
        found = found | take
        skipped = skipped | skip_now
    return out


def render_tile(
    scene,
    cam,
    filter_table,
    x0,
    y0,
    iteration,
    rand_seed,
    *,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    settings: PassSettings,
    use_filter_table: bool,
    pixel_mask=None,
    cache=None,
    cache_mode: str = "off",
    rays=None,
):
    """Render one sample of a (tile_h, tile_w) tile.

    ``pixel_mask``: optional (R,) bool — False lanes trace nothing (the
    adaptive-sampling analogue of the reference's ``required_samples`` skip,
    CoreRef.cpp:1472).  Returns dict with 'color' (R,3) radiance,
    'base_color' (R,3), 'depth_normal' (R,4) — the AUX set of Types.h:49.

    ``cache``/``cache_mode``: spatial radiance cache plumbing (the
    reference's eSpatialCacheMode, internal/CoreRef.h).  'query' lets
    shade early-exit paths whose cone footprint exceeds the cache voxel
    (ShadeRef.cpp:1370-1392); 'update' records per-bounce contribution/
    throughput/vertex columns and back-propagates them into the cache
    after the scan (result key 'cache' holds the new state).

    ``rays``: optional pre-built :class:`PrimaryRays` batch — used by the
    Geo-camera / lightmap baker (render/lightmap.py) to replace the pinhole
    ray source; ``cam`` may be None in that case.
    """
    if rays is None:
        rays = generate_primary_rays(
            cam, filter_table, x0, y0, iteration, rand_seed,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            use_filter_table=use_filter_table,
        )
    R = tile_w * tile_h
    seed = rng.pixel_seed(rays.px, rays.py, rand_seed)
    sample_i = jnp.asarray(iteration, jnp.uint32) - 1

    have_lights = scene.num_lights > 0
    is_tlas = scene.mode == "tlas"
    # static shading features: node types the scene actually contains
    # (traces away whole lobe families + the IOR stack — the XLA analogue
    # of the reference's per-feature shader variants)
    feats = uber.mat_features(getattr(scene, "mat_types", None))

    def _save(x):
        """Tag a (detached) traversal output as a saved residual so the
        remat backward replay skips the BVH walk (policy in render_tile)."""
        if settings.remat and settings.remat_save_trace:
            from jax.ad_checkpoint import checkpoint_name

            return checkpoint_name(x, "trace")
        return x

    def _trace_closest(ro, rd, t_min, t_max, active, mask):
        """Mode dispatch: flattened single-BVH vs two-level TLAS/BLAS.
        Returns (hit, inst) — inst is None in flatten mode."""
        # named scopes = the profiler-visible analogue of the reference's
        # per-stage stats_t timers (RendererBase.h:230-242)
        with jax.named_scope("trace_closest"):
            if is_tlas:
                h = trace_closest_tlas(
                    scene.bvh_soa, scene.tri_soa, scene.inst,
                    ro, rd, t_min, t_max, active,
                    ray_mask=mask if scene.has_visibility else None,
                    max_leaf=scene.max_leaf, stack_size=scene.stack_size,
                    force_xla=settings.force_xla,
                )
                h = jax.tree_util.tree_map(_save, h)
                return h, h.inst
            h = trace_closest_soa(
                scene.bvh_soa, scene.tri_soa, ro, rd, t_min, t_max, active,
                max_leaf=scene.max_leaf, stack_size=scene.stack_size,
                tri_vis=scene.tri_vis if scene.has_visibility else None,
                ray_mask=mask if scene.has_visibility else None,
                force_xla=settings.force_xla,
            )
            return jax.tree_util.tree_map(_save, h), None

    def _trace_occlusion(ro, rd, t_min, t_max, active):
        mask = jnp.full(ro.shape[:1], RAY_SHADOW, jnp.int32)
        with jax.named_scope("trace_shadow"):
            if is_tlas:
                return _save(trace_occlusion_tlas(
                    scene.bvh_soa, scene.tri_soa, scene.inst,
                    ro, rd, t_min, t_max, active,
                    ray_mask=mask if scene.has_visibility else None,
                    max_leaf=scene.max_leaf, stack_size=scene.stack_size,
                    force_xla=settings.force_xla,
                ))
            return _save(trace_occlusion_soa(
                scene.bvh_soa, scene.tri_soa, ro, rd, t_min, t_max, active,
                max_leaf=scene.max_leaf, stack_size=scene.stack_size,
                tri_vis=scene.tri_vis if scene.has_visibility else None,
                ray_mask=mask if scene.has_visibility else None,
                force_xla=settings.force_xla,
            ))

    def _trace_transmittance(ro, rd, dist, active):
        """Shadow-ray transparency loop (reference IntersectScene shadow,
        CoreRef.cpp:3160-3262): march through transparent surfaces
        multiplying their Mix-weighted colors; a solid-side hit zeroes the
        factor.  Returns (R, 3) transmittance."""
        Rl = ro.shape[0]
        rc0 = jnp.ones((Rl, 3), jnp.float32)

        def cond(s):
            it, _ro, _dist, _rc, act = s
            return jnp.any(act) & (it <= settings.max_transp_depth)

        def body(s):
            it, ro_, dist_, rc_, act = s
            hit, _ = _trace_closest(
                ro_, rd, jnp.zeros((Rl,), jnp.float32), dist_, act,
                jnp.full((Rl,), RAY_SHADOW, jnp.int32),
            )
            miss = hit.prim < 0
            row = surface_mod.fetch_tri_row(
                scene, hit.prim,
                keys=("solid_f", "solid_b", "uv0", "uv1", "uv2",
                      "mat_f", "mat_b"),
            )
            side_solid = jnp.where(
                hit.backface, row["solid_b"] > 0.5, row["solid_f"] > 0.5
            )
            blocked = act & (~miss) & side_solid
            rc_ = jnp.where(blocked[:, None], 0.0, rc_)
            cont = act & (~miss) & (~side_solid)

            w = (1.0 - hit.u - hit.v)[:, None]
            uv = (
                w * row["uv0"]
                + hit.u[:, None] * row["uv1"]
                + hit.v[:, None] * row["uv2"]
            )
            mat_id = surface_mod.pick_hit_material(
                scene, hit.prim, hit.backface, row=row
            )
            tcol = surface_mod.shadow_transmittance(scene, mat_id, uv)
            rc_ = jnp.where(cont[:, None], rc_ * tcol, rc_)

            adv = hit.t + HIT_BIAS
            ro_ = jnp.where(cont[:, None], ro_ + rd * adv[:, None], ro_)
            dist_ = jnp.where(cont, dist_ - adv, dist_)
            cont = cont & (jnp.max(rc_, axis=-1) > 1e-6) & (dist_ > HIT_BIAS)
            return it + 1, ro_, dist_, rc_, cont

        it, _ro, _dist, rc, act = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ro, dist, rc0, active)
        )
        # lanes that exhausted the transparency budget block fully
        # (depth > max_transp_depth → rc = 0, CoreRef.cpp:3189-3191);
        # lanes that never traced pass 1.0 (caller masks them anyway)
        rc = jnp.where(act[:, None], 0.0, rc)
        return jnp.where(active[:, None], rc, 1.0)

    def _transp_classify(hit, rd, live, transp_d, total_d, seed):
        """Resolve a hit's material the way the reference's *trace stage*
        does (CoreRef.cpp:3076-3126: Mix chains WITHOUT the Fresnel factor)
        and decide continuation: returns (is_transparent_hit, term_rand,
        transparent base_color)."""
        Rl = rd.shape[0]
        miss = hit.prim < 0
        row = surface_mod.fetch_tri_row(
            scene, hit.prim,
            keys=("solid_f", "solid_b", "uv0", "uv1", "uv2",
                  "mat_f", "mat_b"),
        )
        side_solid = jnp.where(
            hit.backface, row["solid_b"] > 0.5, row["solid_f"] > 0.5
        )
        w = (1.0 - hit.u - hit.v)[:, None]
        uv = (w * row["uv0"] + hit.u[:, None] * row["uv1"]
              + hit.v[:, None] * row["uv2"])
        mat_id = surface_mod.pick_hit_material(
            scene, hit.prim, hit.backface, row=row
        )
        rand_dim = jnp.uint32(rng.RAND_DIM_BASE_COUNT) + (
            (total_d + transp_d).astype(jnp.uint32)
            * jnp.uint32(rng.RAND_DIM_BOUNCE_COUNT)
        )
        trans_r, term_r = rng.scrambled_2d_rand(
            rand_dim + jnp.uint32(rng.RAND_DIM_BSDF_PICK), seed, sample_i
        )
        tex_rx, tex_ry = rng.scrambled_2d_rand(
            rand_dim + jnp.uint32(rng.RAND_DIM_TEX), seed, sample_i
        )
        ones = jnp.ones((Rl,), jnp.float32)
        mat_id, _, _ = surface_mod.resolve_mix(
            scene, mat_id, uv, trans_r, rd, rd, ones, hit.backface,
            jnp.stack([tex_rx, tex_ry], axis=-1), use_fresnel=False,
        )
        from ray_tpu.ops.gather import read_packed
        from ray_tpu.scene.materials import ShadingNode

        mtype, bcol = read_packed(
            [scene.materials["type"], scene.materials["base_color"]],
            jnp.maximum(mat_id, 0),
        )
        is_transp = (
            live & (~miss) & (~side_solid) & (mat_id >= 0)
            & (mtype == ShadingNode.TRANSPARENT)
        )
        return is_transp, term_r, bcol

    def _trace_closest_through(ro, rd, t_max, active, mask, throughput,
                               transp_d, total_d, seed):
        """Closest-hit trace that marches THROUGH Transparent surfaces
        inside the trace stage — the reference's IntersectScene loop
        (CoreRef.cpp:3041-3158).  A transparent continuation consumes
        transparency depth + RNG dims but NOT a bounce iteration, so real
        scatter-depth semantics match the reference at identical caps
        (previously each transparent hit burned one of the
        max_total_depth+1 scan iterations, losing real tail bounces on
        alpha/transparent scenes).

        The march runs detached (lax.while_loop is not reverse-
        differentiable); the transparency color factor is folded into
        ``throughput`` via stop_gradient, so gradients w.r.t. Transparent
        node colors flow only through the NEE shadow-transmittance path.

        Returns (hit with t = total distance from ``ro``, inst,
        updated throughput, updated transparency depth).
        """
        zeros = jnp.zeros_like(t_max)
        hit, inst = _trace_closest(ro, rd, zeros, t_max, active, mask)
        if not scene.has_transparency:
            return hit, inst, throughput, transp_d
        sg = jax.lax.stop_gradient
        rd_d = sg(rd)
        thr_lum0 = jnp.max(sg(throughput), axis=-1)

        def classify_step(hit, live, transp_d, thr_lum):
            is_transp, term_r, bcol = _transp_classify(
                hit, rd_d, live, transp_d, total_d, seed
            )
            # RR + budget (CoreRef.cpp:3131-3141): q kicks in past
            # min_transp_depth; budget kills at max_transp_depth-1 marches
            can_term = transp_d > settings.min_transp_depth
            q = jnp.where(
                settings.use_path_termination & can_term,
                jnp.maximum(0.05, 1.0 - thr_lum), 0.0,
            )
            exhausted = (transp_d + 1) >= settings.max_transp_depth
            kill = is_transp & (
                (term_r < q) | (thr_lum <= 0.0) | exhausted
            )
            cont = is_transp & (~kill)
            step_mult = sg(bcol) * safe_div_pos(1.0, 1.0 - q)[:, None]
            return cont, kill, step_mult

        cont0, kill0, mult0 = classify_step(hit, active, transp_d, thr_lum0)

        def cond(s):
            return jnp.any(s[0])

        def body(s):
            (cont, kill, step_mult, hit_c, inst_c, ro_c, t_base, t_mult,
             transp_c, lum_c) = s
            adv = sg(hit_c.t) + HIT_BIAS
            ro_c = jnp.where(cont[:, None], ro_c + rd_d * adv[:, None], ro_c)
            t_base = jnp.where(cont, t_base + adv, t_base)
            t_mult = jnp.where(cont[:, None], t_mult * step_mult, t_mult)
            lum_c = jnp.where(
                cont, lum_c * jnp.max(step_mult, axis=-1), lum_c
            )
            transp_c = transp_c + cont.astype(jnp.int32)
            new_hit, new_inst = _trace_closest(
                ro_c, rd_d, jnp.zeros_like(t_base),
                jnp.maximum(t_max - t_base, 0.0), cont, mask,
            )
            hit_c = jax.tree_util.tree_map(
                lambda old, new: jnp.where(
                    cont.reshape(cont.shape + (1,) * (old.ndim - 1)),
                    new, old),
                hit_c, new_hit,
            )
            if new_inst is not None:
                inst_c = jnp.where(cont, new_inst, inst_c)
            ncont, nkill, nmult = classify_step(hit_c, cont, transp_c, lum_c)
            kill = kill | nkill
            return (ncont, kill, nmult, hit_c, inst_c, ro_c, t_base, t_mult,
                    transp_c, lum_c)

        inst0 = inst if inst is not None else jnp.zeros(
            ro.shape[:1], jnp.int32)
        state = (cont0, kill0, mult0, sg(hit), inst0, sg(ro),
                 jnp.zeros_like(t_max), jnp.ones((ro.shape[0], 3),
                                                 jnp.float32),
                 transp_d, thr_lum0)
        (_c, killed, _m, hit, inst_out, _roc, t_base, t_mult, transp_d,
         _lum) = jax.lax.while_loop(cond, body, state)
        hit = hit._replace(t=hit.t + t_base)
        throughput = throughput * jnp.where(
            killed[:, None], 0.0, t_mult
        )
        return (hit, inst_out if inst is not None else None, throughput,
                transp_d)

    def bounce_step(state, bounce):
        (ro, rd, t_max, throughput, bsdf_pdf, active, depth, ior_stack,
         accum, aux_base, aux_dn, ray_mask, cone_width, cone_spread,
         vertex_count, seed, *sh_state) = state
        Rl = ro.shape[0]  # may be < R after occupancy compaction
        if settings.output_sh:
            # sh_open: lane has not yet shaded its first real (non-
            # transparent) vertex; sh_dir: the BSDF direction sampled there
            sh_dir, sh_open, aux_sh = sh_state
        accum_in = accum
        throughput_in = throughput
        is_first = bounce == 0
        limit0 = jnp.where(
            is_first, settings.clamp_direct, settings.clamp_indirect
        )

        def _add(acc, contrib, mask, w_dir=None):
            """Masked radiance add; with OutputSH also projects the
            contribution onto the SH-L1 basis of its source direction at
            the pixel's first real vertex — pointing TOWARD the radiance
            source (probe convention): ls.L for NEE, the ray direction for
            direct light/env hits, the sampled BSDF direction for
            everything deeper."""
            c = jnp.where(mask[:, None], contrib, 0.0)
            if settings.output_sh:
                nonlocal aux_sh
                local = rd if w_dir is None else w_dir
                w = jnp.where(sh_open[:, None], local, sh_dir)
                aux_sh = aux_sh + _sh_l1_basis(w)[:, :, None] * c[:, None, :]
            return acc + c

        total_depth = depth[:, 0] + depth[:, 1] + depth[:, 2]
        # closest-hit trace, marching through Transparent surfaces inside
        # the trace stage (CoreRef.cpp:3041-3158) — updates throughput and
        # the transparency depth counter without consuming this bounce
        hit, hit_inst, throughput, transp_d = _trace_closest_through(
            ro, rd, t_max, active, ray_mask, throughput, depth[:, 3],
            total_depth, seed,
        )
        depth = depth.at[:, 3].set(transp_d)
        miss = hit.prim < 0
        indirect = total_depth > 0

        # SkipDirect/SkipIndirect gates: a light reached with ≤1 surface
        # vertex on the path is "direct" (hit-type contributions: the light
        # is the hit itself, so total_depth ≤ 1; NEE: the vertex being
        # shaded is the 1 surface vertex, so total_depth == 0)
        hit_keep = jnp.ones((Rl,), jnp.bool_)
        nee_keep = jnp.ones((Rl,), jnp.bool_)
        if settings.skip_direct:
            hit_keep = hit_keep & (total_depth > 1)
            nee_keep = nee_keep & (total_depth > 0)
        if settings.skip_indirect:
            hit_keep = hit_keep & (total_depth <= 1)
            nee_keep = nee_keep & (total_depth == 0)
        rand_dim = jnp.uint32(rng.RAND_DIM_BASE_COUNT) + (
            (total_depth + depth[:, 3]).astype(jnp.uint32)
            * jnp.uint32(rng.RAND_DIM_BOUNCE_COUNT)
        )

        # ---------- visible analytic lights (IntersectAreaLights,
        # CoreRef.cpp:3616): a light hit in front of geometry terminates the
        # path with MIS-weighted emission ----------
        light_first = jnp.zeros_like(active)
        any_visible_analytic = any(
            vis and k not in (1, 5, 6)  # DIR/TRI/ENV handled elsewhere
            for (k, vis, _d, _p) in scene.light_kinds
        )
        if any_visible_analytic:
            seg_end = jnp.where(miss, t_max, hit.t)
            al_t, al_i, al_pdf, al_spot = light_sampling.intersect_area_lights(
                scene, ro, rd, seg_end, no_sphrect=settings.no_sphrect
            )
            light_first = active & (al_i >= 0) & (al_t < seg_end)
            # one-hot matmul reads (ops/gather.py): a plain [] gather costs
            # ~2-3 ms per instruction inside the bounce scan (r5 profile)
            from ray_tpu.ops.gather import read_rows as _rr
            al_safe = jnp.maximum(al_i, 0)
            lcol = _rr(scene.lights["col"], al_safe) * al_spot[:, None]
            if any(p for (_k, _v, _d, p) in scene.light_kinds):
                # sky-portal hit shows the environment through the window
                # (Evaluate_LightColor sky_portal branch, ShadeRef.cpp:1077)
                hit_portal = _rr(scene.lights["portal"], al_safe)
                lcol = jnp.where(
                    hit_portal[:, None],
                    lcol * light_sampling.env_color(scene, rd),
                    lcol,
                )
            if settings.use_nee:
                # MIS unconditionally at ANY depth (Evaluate_LightColor,
                # ShadeRef.cpp:1080-1170, has no depth-cap condition): the
                # parent vertex's NEE already took its MIS share even when
                # this ray sits at total_depth == max_total_depth — a
                # weight of 1 here double-counted lights hit by the
                # deepest rays (measured +33/255 at max_total_depth=1)
                lw = jnp.where(
                    indirect, power_heuristic(bsdf_pdf, al_pdf), 1.0
                )
                lcol = lcol * lw[:, None]
            l_contrib = _clamp_contribution(throughput * lcol, limit0)
            accum = _add(accum, l_contrib, light_first & hit_keep)

        # ---------- environment on miss (ShadeRef.cpp:1192-1216) ----------
        env_col = light_sampling.env_color(scene, rd)
        if settings.use_nee and scene.env_light_index >= 0:
            # pick probability of the env light as seen from the previous
            # path vertex (hierarchical when the light tree is on)
            env_light_pick_pdf = light_sampling.light_pick_pdf(
                scene, ro, jnp.full((Rl,), scene.env_light_index, jnp.int32)
            )
            if scene.env_tab_h > 0:
                light_pdf = light_sampling.env_hit_pdf(scene, rd) * env_light_pick_pdf
            else:
                light_pdf = (0.5 / PI) * env_light_pick_pdf
            can_mis = indirect & (total_depth < settings.max_total_depth)
            mis_w = jnp.where(
                can_mis, power_heuristic(bsdf_pdf, light_pdf), 1.0
            )
            env_col = env_col * mis_w[:, None]
        env_contrib = _clamp_contribution(throughput * env_col, limit0)
        env_keep = hit_keep
        if settings.no_background:
            env_keep = env_keep & indirect
        accum = _add(accum, env_contrib, active & miss & (~light_first) & env_keep)

        alive = active & (~miss) & (~light_first)

        # ---------- surface attributes (one packed row gather per hit) ----
        tri_row = surface_mod.fetch_tri_row(scene, hit.prim)
        surf = surface_mod.compute_surface(
            scene, hit.prim, hit.u, hit.v, hit.backface, ro, rd, hit.t,
            inst=hit_inst, row=tri_row,
        )
        mat_id = surface_mod.pick_hit_material(
            scene, hit.prim, hit.backface, row=tri_row
        )
        alive = alive & (mat_id >= 0)

        # ray-cone texture LOD λ (ShadeRef.cpp:1279-1283)
        cw_at_hit = cone_width + cone_spread * jax.lax.stop_gradient(hit.t)
        lam = surf.lod_base + jnp.log2(jnp.maximum(cw_at_hit, 1e-30))

        tex_rx, tex_ry = rng.scrambled_2d_rand(
            rand_dim + jnp.uint32(rng.RAND_DIM_TEX), seed, sample_i
        )
        tex_rand = jnp.stack([tex_rx, tex_ry], axis=-1)
        mix_rx, term_r = rng.scrambled_2d_rand(
            rand_dim + jnp.uint32(rng.RAND_DIM_BSDF_PICK), seed, sample_i
        )
        # texture filter mode (reference default = stochastic single-tap,
        # CoreRef.cpp:19 USE_STOCH_TEXTURE_FILTERING; "stochastic_aniso"
        # adds a jitter along the ray-cone footprint's major axis)
        fetch_kw = None
        if scene.has_textures and settings.tex_filter != "bilinear":
            fetch_kw = {"rand": tex_rand}
            if settings.tex_filter == "stochastic_aniso":
                ar, _ = rng.scrambled_2d_rand(
                    rand_dim + jnp.uint32(rng.RAND_DIM_TEX_ANISO),
                    seed, sample_i,
                )
                fetch_kw.update(
                    aniso_duv=surf.duv_major_unit
                    * (cw_at_hit * surf.aniso_elong)[:, None],
                    aniso_rand=ar,
                )

        ext_ior = (
            _peek_ior(ior_stack, hit.backface) if feats.any_refr
            else jnp.ones((Rl,), jnp.float32)
        )
        mat_id, mix_rand, mix_weight = surface_mod.resolve_mix(
            scene, mat_id, surf.uv, mix_rx, rd, surf.N, ext_ior, hit.backface,
            tex_rand, lam=lam, fetch_kw=fetch_kw,
        )
        surf = surface_mod.apply_normal_map(
            scene, mat_id, surf, rd, tex_rand, lam=lam, fetch_kw=fetch_kw
        )
        surf = surface_mod.apply_tangent_rotation(scene, mat_id, surf)

        # path regularization applies only once a DIFFUSE bounce is on the
        # path (ShadeRef.cpp:1468: diff_depth > 0) — NOT after specular
        # chains: a mirror box scene with regularize_alpha=0.1 must keep
        # its reflections of reflections sharp (ray_flags golden)
        reg_alpha = jnp.where(
            depth[:, 0] > 0, jnp.float32(settings.regularize_alpha), 0.0
        )
        params = uber.gather_uber_params(
            scene, mat_id, surf.uv, rd, surf.N, hit.backface, ext_ior,
            tex_rand, regularize_alpha=reg_alpha, lam=lam, fetch_kw=fetch_kw,
            # update pass caches diffuse-ish radiance only: view-dependent
            # sharp lobes are roughened (ShadeRef.cpp:1450-1452)
            min_roughness=(
                radcache.RAD_CACHE_MIN_ROUGHNESS if cache_mode == "update"
                else 0.0
            ),
            feats=feats,
        )
        if settings.lighting_only:
            # lightmap mode: ignore albedo at the primary vertex (reference
            # pass_info_t::should_consider_albedo, Core.h:464-467)
            params = params._replace(
                base_color=jnp.where(
                    is_first, jnp.ones_like(params.base_color),
                    params.base_color,
                )
            )

        # ---------- emissive hit (ShadeRef.cpp:1502-1539) ----------
        # any emitting surface contributes: Emissive nodes AND principled
        # materials with emission (the reference splits the latter into an
        # additive-mix emissive node, SceneCPU.cpp:285-305 — adding both
        # deterministically is the same expectation with less variance;
        # principled lanes keep shading below, Emissive lanes terminate)
        emis_mask = alive & (jnp.max(params.emission, axis=-1) > 0.0)
        mis_w = jnp.ones((Rl,), jnp.float32)
        if settings.use_nee and have_lights:
            lid = surface_mod.hit_light_id(scene, hit.prim, hit_inst, row=tri_row)
            lpick = light_sampling.light_pick_pdf(scene, ro, lid)
            light_pdf = light_sampling.tri_light_hit_pdf(
                scene, hit.prim, hit.t, rd, lpick, light_id=lid, ro=ro
            )
            # MIS only where NEE could actually have sampled this hit: the
            # light's front side, or any side if doublesided
            from ray_tpu.ops.gather import read_rows as _rr2
            nee_covers = (~hit.backface) | _rr2(
                scene.lights["doublesided"], jnp.maximum(lid, 0)
            )
            needs_mis = indirect & params.imp_sample & (lid >= 0) & nee_covers
            mis_w = jnp.where(
                needs_mis, power_heuristic(bsdf_pdf, light_pdf), 1.0
            )
        emis_contrib = _clamp_contribution(
            throughput * params.emission * (mix_weight * mis_w)[:, None], limit0
        )
        accum = _add(accum, emis_contrib, emis_mask & hit_keep)

        # AUX from primary hit
        take_aux = (is_first & alive)[:, None]
        aux_base = jnp.where(take_aux, params.base_color, aux_base)
        aux_dn = jnp.where(
            take_aux, jnp.concatenate([surf.N, hit.t[:, None]], axis=-1), aux_dn
        )

        can_shade = alive & (~params.is_emissive) & (~params.is_transparent)

        # ---------- spatial cache query exit (ShadeRef.cpp:1370-1392) ----
        if cache_mode == "query":
            c_r1, c_r2 = rng.scrambled_2d_rand(
                rand_dim + jnp.uint32(rng.RAND_DIM_CACHE), seed, sample_i
            )
            vs = radcache.voxel_size(
                radcache.grid_level(surf.P, cache.cam_pos)
            )
            use_cache = (
                can_shade
                & (cw_at_hit > (1.0 + 0.5 * c_r1) * vs)
                & (hit.t > (1.0 + c_r2) * vs)
            )
            c_rad, c_good = radcache.query(
                cache, jax.lax.stop_gradient(surf.P),
                jax.lax.stop_gradient(surf.plane_N), use_cache,
            )
            accum = _add(accum, throughput * c_rad, c_good)
            can_shade = can_shade & (~c_good)

        # ---------- NEE (SampleLightSource + eval + shadow ray) ----------
        if settings.use_nee and have_lights:
            pick_r, _ = rng.scrambled_2d_rand(
                rand_dim + jnp.uint32(rng.RAND_DIM_LIGHT_PICK), seed, sample_i
            )
            luv_x, luv_y = rng.scrambled_2d_rand(
                rand_dim + jnp.uint32(rng.RAND_DIM_LIGHT), seed, sample_i
            )
            ls = light_sampling.sample_light_source(
                scene, surf.P, surf.T, surf.B, surf.N, pick_r,
                jnp.stack([luv_x, luv_y], axis=-1),
                no_sphrect=settings.no_sphrect,
            )
            f_cos, pdf_b = uber.eval_uber(
                params, surf.T, surf.B, surf.N, rd, ls.L, feats=feats
            )
            can_mis = total_depth < settings.max_total_depth
            nee_mis = jnp.where(
                (ls.area > 0.0) & can_mis, power_heuristic(ls.pdf, pdf_b), 1.0
            )
            nee_col = ls.col * f_cos * (
                mix_weight * nee_mis * safe_div_pos(1.0, ls.pdf)
            )[:, None]
            nee_valid = can_shade & nee_keep & (ls.pdf > 0.0) & (
                jnp.max(nee_col, axis=-1) > 0.0
            )
            n_dot_l = dot(surf.N, ls.L, False)
            sh_o = offset_ray(
                surf.P,
                jnp.where((n_dot_l < 0.0)[:, None], -surf.plane_N, surf.plane_N),
            )
            to_lp = ls.lp - sh_o
            sh_dist = jnp.sqrt(jnp.maximum(dot(to_lp, to_lp, False), 1e-30))
            sh_d = to_lp / sh_dist[:, None]
            sh_dist = sh_dist * ls.dist_mul
            # sky portals block ENV shadow rays one-sidedly (the blocker
            # pass, CoreRef.cpp:4866-4870 + :4533-4590): env light enters
            # the interior only through portal windows
            pblock = jnp.zeros((Rl,), jnp.bool_)
            if any(p for (_k, _v, _d, p) in scene.light_kinds):
                pblock = ls.from_env & light_sampling.portal_shadow_block(
                    scene, sh_o, sh_d, sh_dist * 0.999
                )
            if scene.has_transparency:
                rc = _trace_transmittance(
                    sh_o, sh_d, sh_dist * 0.999, nee_valid & ls.cast_shadow
                )
                factor = jnp.where(ls.cast_shadow[:, None], rc, 1.0)
                factor = jnp.where(pblock[:, None], 0.0, factor)
                sh_contrib = _clamp_contribution(
                    throughput * nee_col * factor, limit0
                )
                accum = _add(accum, sh_contrib, nee_valid, w_dir=ls.L)
            else:
                occluded = _trace_occlusion(
                    sh_o, sh_d, jnp.zeros((Rl,), jnp.float32), sh_dist * 0.999,
                    nee_valid & ls.cast_shadow,
                )
                visible = nee_valid & ((~ls.cast_shadow) | (~occluded)) & (
                    ~pblock
                )
                sh_contrib = _clamp_contribution(throughput * nee_col, limit0)
                accum = _add(accum, sh_contrib, visible, w_dir=ls.L)

        # ---------- BSDF sampling / next bounce ----------
        brx, bry = rng.scrambled_2d_rand(
            rand_dim + jnp.uint32(rng.RAND_DIM_BSDF), seed, sample_i
        )
        bs = uber.sample_uber(
            params, surf.T, surf.B, surf.N, rd,
            jnp.stack([brx, bry], axis=-1), mix_rand, feats=feats,
        )

        is_diff = bs.ray_type == uber.RAY_TYPE_DIFFUSE
        is_spec = bs.ray_type == uber.RAY_TYPE_SPECULAR
        is_refr = bs.ray_type == uber.RAY_TYPE_REFR
        depth_ok = (
            (is_diff & (depth[:, 0] < settings.max_diff_depth))
            | (is_spec & (depth[:, 1] < settings.max_spec_depth))
            | (is_refr & (depth[:, 2] < settings.max_refr_depth))
        ) & (total_depth < settings.max_total_depth)
        if settings.skip_indirect:
            # nothing beyond the first bounce can contribute — stop early
            depth_ok = depth_ok & (total_depth < 1)

        new_throughput = throughput * bs.weight * mix_weight[:, None]
        tlum = jnp.max(new_throughput, axis=-1)

        # Russian roulette (ShadeRef.cpp:1604-1618): real scatters gate on
        # total depth (diff+spec+refr, transparency excluded — the
        # reference RRs transparency separately inside the trace loop,
        # CoreRef.cpp:3131-3140, as does _trace_closest_through)
        can_rr = total_depth > settings.min_total_depth
        rr_q = jnp.where(
            settings.use_path_termination & can_rr,
            jnp.maximum(0.05, 1.0 - tlum),
            0.0,
        )
        rr_pass = term_r >= rr_q
        new_throughput = new_throughput * safe_div_pos(1.0, 1.0 - rr_q)[:, None]

        # Transparent-resolved lanes never continue from the shade stage
        # (the trace loop marched through transparency already; a lane
        # landing here on a Transparent material is either RR/budget-killed
        # or a Fresnel-divergent Mix resolve — the reference kills both,
        # ShadeRef.cpp:1611-1618 via new_ray.pdf == 0)
        next_active = (
            can_shade & depth_ok & rr_pass & (tlum > 0.0) & (bs.pdf > 0.0)
        )

        if feats.any_refr:
            entering = next_active & is_refr & (~hit.backface)
            exiting = next_active & is_refr & hit.backface
            ior_stack = _push_ior(ior_stack, params.int_ior, entering)
            ior_stack = _pop_ior(ior_stack, exiting)

        new_o = offset_ray(
            surf.P,
            jnp.where(bs.flip_origin[:, None], -surf.plane_N, surf.plane_N),
        )
        ro = jnp.where(next_active[:, None], new_o, ro)
        rd = jnp.where(next_active[:, None], bs.dir, rd)
        throughput = jnp.where(
            next_active[:, None], new_throughput, throughput
        )
        # transparency no longer reaches the sampler (it is resolved inside
        # the trace stage, preserving the last real vertex's pdf for MIS
        # through glass automatically — CoreRef.cpp:3104-3158)
        bsdf_pdf = jnp.where(
            next_active, jnp.minimum(bs.pdf, 1e6), bsdf_pdf
        )
        t_max = jnp.full((Rl,), MAX_DIST, jnp.float32)
        depth_inc = jnp.stack(
            [is_diff, is_spec, is_refr, jnp.zeros_like(is_diff)], axis=-1
        ).astype(jnp.int32)
        depth = depth + jnp.where(next_active[:, None], depth_inc, 0)

        # ray type for the per-instance visibility test on the next segment
        # (reference packs it in depth bits 28..31, CoreRef.h:253-280)
        new_mask = jnp.where(
            is_diff, RAY_DIFFUSE,
            jnp.where(is_spec, RAY_SPECULAR,
                      jnp.where(is_refr, RAY_REFR, ray_mask)),
        ).astype(jnp.int32)
        ray_mask = jnp.where(next_active, new_mask, ray_mask)

        # cone advances to the hit and spreads by the sampled lobe's alpha
        # (ShadeRef.cpp:1458-1459 + per-lobe increments)
        cone_width = jnp.where(next_active, cw_at_hit, cone_width)
        cone_spread = jnp.where(
            next_active, cone_spread + bs.cone_spread_inc, cone_spread
        )

        # cacheable path vertices: first PROPAGATION_DEPTH real hits
        # (SpatialCacheUpdate path_len cap, RadCacheRef.cpp:201)
        vtx_valid = alive & (
            vertex_count < radcache.RAD_CACHE_PROPAGATION_DEPTH
        )
        vertex_count = vertex_count + vtx_valid.astype(jnp.int32)

        new_state = (ro, rd, t_max, throughput, bsdf_pdf, next_active, depth,
                     ior_stack, accum, aux_base, aux_dn, ray_mask,
                     cone_width, cone_spread, vertex_count, seed)
        if settings.output_sh:
            # the first real (non-transparent) shaded vertex closes sh_open
            # and pins the arrival direction for deeper contributions
            real_vtx = can_shade & sh_open
            sh_dir = jnp.where(real_vtx[:, None], bs.dir, sh_dir)
            sh_open = sh_open & (~real_vtx)
            new_state = new_state + (sh_dir, sh_open, aux_sh)
        # per-bounce ray counts for the Mrays/s stat (closest + shadow)
        n_traced = jnp.sum(active.astype(jnp.int32))
        if settings.use_nee and have_lights:
            n_traced = n_traced + jnp.sum((nee_valid & ls.cast_shadow).astype(jnp.int32))
        ys = {"n_traced": n_traced}
        if settings.nan_check:
            # NaN-trap render mode (the reference unmasks FP exceptions in
            # its tests, tests/main.cpp:199-206; the wavefront uses NaN
            # padding by design, so trap at the *state* level instead:
            # every live-lane quantity the next bounce consumes must be
            # finite).  Cheap enough to leave on in CI renders.
            bad = jnp.int32(0)
            live = next_active
            for arr in (ro, rd, throughput, bsdf_pdf,
                        cone_width, cone_spread):
                nf = ~jnp.isfinite(arr)
                if nf.ndim == 2:
                    nf = jnp.any(nf, axis=-1)
                bad = bad + jnp.sum((nf & live).astype(jnp.int32))
            for arr in (accum, aux_base, aux_dn):
                bad = bad + jnp.sum(
                    jnp.any(~jnp.isfinite(arr), axis=-1).astype(jnp.int32)
                )
            ys["nonfinite"] = bad
        if cache_mode == "update":
            ys.update(
                delta=jax.lax.stop_gradient(accum - accum_in),
                t_in=jax.lax.stop_gradient(throughput_in),
                vtx_p=jax.lax.stop_gradient(surf.P),
                vtx_n=jax.lax.stop_gradient(surf.plane_N),
                vtx_valid=vtx_valid,
            )
        return new_state, ys

    active0 = (
        jnp.ones((R,), jnp.bool_) if pixel_mask is None else pixel_mask
    )
    state0 = (
        rays.ro,
        rays.rd,
        rays.t_max,
        jnp.ones((R, 3), jnp.float32),              # throughput
        jnp.full((R,), 1e6, jnp.float32),           # camera rays: delta pdf
        active0,                                    # active
        jnp.zeros((R, 4), jnp.int32),               # depth counters
        jnp.full((R, 4), -1.0, jnp.float32),        # ior stack
        jnp.zeros((R, 3), jnp.float32),             # accum
        jnp.zeros((R, 3), jnp.float32),             # aux base color
        jnp.zeros((R, 4), jnp.float32),             # aux depth-normal
        jnp.full((R,), RAY_CAMERA, jnp.int32),      # ray-type visibility mask
        jnp.zeros((R,), jnp.float32),               # cone width (CoreRef.cpp:1538)
        jnp.broadcast_to(rays.cone_spread, (R,)).astype(jnp.float32),
        jnp.zeros((R,), jnp.int32),                 # cache vertex count
        seed,                                       # per-lane RNG seed
    )
    if settings.output_sh:
        state0 = state0 + (
            rays.rd,                                # sh_dir
            jnp.ones((R,), jnp.bool_),              # sh_open
            jnp.zeros((R, 4, 3), jnp.float32),      # SH-L1 accumulator
        )
    n_iters = settings.max_total_depth + 1
    if settings.remat:
        # path-replay backprop: recompute the bounce in the backward pass —
        # except the tagged traversal outputs (detached, expensive), which
        # are saved so the replay never re-walks the BVH
        policy = (
            jax.checkpoint_policies.save_only_these_names("trace")
            if settings.remat_save_trace else None
        )
        if settings.remat_save_dots:
            dots = jax.checkpoint_policies.dots_saveable
            policy = (
                jax.checkpoint_policies.save_from_both_policies(policy, dots)
                if policy is not None else dots
            )
        body = jax.checkpoint(bounce_step, policy=policy)
    else:
        body = bounce_step
    # occupancy compaction applies when the tail exists and no per-bounce
    # full-width ys are consumed downstream (cache update stacks (n, R, …))
    c = settings.compact_after
    do_compact = (
        0 < c < n_iters
        and settings.compact_factor > 1
        and cache_mode != "update"
        and not settings.output_sh
        and R >= 1024
    )
    nonfinite_total = None
    if not do_compact:
        state, ys = jax.lax.scan(
            body, state0, jnp.arange(n_iters, dtype=jnp.int32)
        )
        n_traced_total = jnp.sum(ys["n_traced"])
        if settings.nan_check:
            nonfinite_total = jnp.sum(ys["nonfinite"])
    else:
        K = max(R // settings.compact_factor, 512)
        state, ys1 = jax.lax.scan(
            body, state0, jnp.arange(c, dtype=jnp.int32)
        )
        xs_tail = jnp.arange(c, n_iters, dtype=jnp.int32)

        def _sums(ys2):
            return (jnp.sum(ys2["n_traced"]),
                    jnp.sum(ys2["nonfinite"]) if settings.nan_check
                    else jnp.int32(0))

        def full_tail(st):
            st, ys2 = jax.lax.scan(body, st, xs_tail)
            return st, _sums(ys2)

        def compact_tail(st):
            act = st[5]
            # stable sort: active lanes first, original order preserved —
            # contributions scatter back to their own pixels afterwards
            perm = jnp.argsort(~act, stable=True)
            idx = jax.lax.stop_gradient(perm[:K])
            head = jax.tree_util.tree_map(lambda a: a[idx], st)
            head, ys2 = jax.lax.scan(body, head, xs_tail)
            st = jax.tree_util.tree_map(
                lambda full, h: full.at[idx].set(h, unique_indices=True),
                st, head,
            )
            return st, _sums(ys2)

        n_act = jnp.sum(state[5].astype(jnp.int32))
        state, (n2, nf2) = jax.lax.cond(
            n_act <= K, compact_tail, full_tail, state
        )
        n_traced_total = jnp.sum(ys1["n_traced"]) + n2
        if settings.nan_check:
            nonfinite_total = jnp.sum(ys1["nonfinite"]) + nf2

    accum, aux_base, aux_dn = state[8], state[9], state[10]
    out = {
        "color": accum,
        "base_color": aux_base,
        "depth_normal": aux_dn,
        "rays_traced": n_traced_total,
    }
    if nonfinite_total is not None:
        out["nonfinite"] = nonfinite_total
    if settings.output_sh:
        # shl1_data_t analogue (Types.h:51): 4 SH-L1 coefficients × RGB
        out["shl1"] = state[-1]
    if cache_mode == "update":
        out["cache"] = radcache.propagate_and_accumulate(
            cache, ys["delta"], ys["t_in"], ys["vtx_p"], ys["vtx_n"],
            ys["vtx_valid"],
        )
    return out
