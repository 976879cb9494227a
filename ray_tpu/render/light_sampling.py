"""Next-event estimation: light picking + per-type position sampling.

Vectorized equivalent of the reference's ``SampleLightSource``
(internal/CoreRef.cpp:3264-3614): pick one light per hit from the
power-weighted CDF (the flux-proportional limit of the reference's
hierarchical light-BVH descent), then sample a point/direction on it with
the same per-type strategies — sphere via solid-angle cone, dir via cone,
rect via spherical rectangle (Ureña), triangle via spherical triangle
(Arvo) — both with uniform-area fallback below SPHERICAL_AREA_THRESHOLD,
mirroring USE_SPHERICAL_AREA_LIGHT_SAMPLING — disk/line via area sampling,
env via the latlong luminance CDF.  All light types are evaluated
compute-all-select.

Output pdf convention: ``ls.pdf`` is the solid-angle pdf multiplied by the
light pick probability, so an NEE contribution is ``ls.col·f_cos/ls.pdf``
— matching the reference's ``ls.pdf /= factor`` (CoreRef.cpp:3613).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tpu.ops.gather import one_hot_f32, read_packed, read_rows
from ray_tpu.ops.linalg import (
    HIT_BIAS,
    MAX_DIST,
    cross,
    dot,
    normalize,
    offset_ray,
    safe_div_pos,
    safe_normalize,
    saturate,
    world_from_tangent,
)
from ray_tpu.render.bsdf.microfacet import PI
from ray_tpu.scene.lights import LightType



class LightSample(NamedTuple):
    """Analogue of ``light_sample_t`` (internal/CoreRef.h:123)."""

    col: jnp.ndarray       # (R, 3)
    L: jnp.ndarray         # (R, 3) direction to light
    lp: jnp.ndarray        # (R, 3) point on light (biased off surface)
    area: jnp.ndarray      # (R,) 0 → skip MIS (invisible/delta light)
    dist_mul: jnp.ndarray  # (R,) shadow-ray length multiplier (env/dir = MAX)
    pdf: jnp.ndarray       # (R,) solid-angle pdf × pick probability
    cast_shadow: jnp.ndarray  # (R,) bool
    from_env: jnp.ndarray     # (R,) bool


def _sincos(x):
    return jnp.sin(x), jnp.cos(x)


# Minimum solid angle to use the spherical parametrizations; below this the
# math loses precision and the caller falls back to uniform area sampling
# (reference internal/Constants.inl:12-13 SPHERICAL_AREA_THRESHOLD).
SPHERICAL_AREA_THRESHOLD = 5e-5


def _safe_div_signed(a, b, eps=1e-9):
    """a/b with |b| clamped away from zero, preserving b's sign."""
    mag = jnp.maximum(jnp.abs(b), eps)
    return a / jnp.where(b < 0.0, -mag, mag)


def _orthogonalize(a, b):
    """Component of b orthogonal to unit a, normalized."""
    return safe_normalize(b - dot(a, b) * a)


def _angle_between(u, v):
    return jnp.arccos(jnp.clip(dot(u, v, False), -1.0, 1.0))


def _slerp(a, b, t):
    """Spherical lerp between unit vectors, safe at θ→0."""
    cos_th = jnp.clip(dot(a, b, False), -1.0, 1.0)
    th = jnp.arccos(cos_th)
    sin_th = jnp.sin(th)
    ok = sin_th > 1e-6
    inv = safe_div_pos(1.0, jnp.where(ok, sin_th, 1.0))
    w0 = jnp.where(ok, jnp.sin((1.0 - t) * th) * inv, 1.0 - t)
    w1 = jnp.where(ok, jnp.sin(t * th) * inv, t)
    return w0[..., None] * a + w1[..., None] * b


def sample_spherical_rectangle(P, light_pos, axis_u, axis_v, r1, r2):
    """Ureña et al. area-preserving spherical-rectangle parametrization —
    uniform solid-angle sampling of a rect light (reference
    internal/CoreRef.cpp:1288-1354 ``SampleSphericalRectangle``).

    ``axis_u``/``axis_v`` are the full (unnormalized) edge vectors.  Returns
    ``(pdf, point, valid)``: pdf = 1/solid-angle, world-space sample point,
    and valid=False where the subtended solid angle is below
    SPHERICAL_AREA_THRESHOLD (caller falls back to area sampling).
    """
    corner = light_pos - 0.5 * axis_u - 0.5 * axis_v
    ulen2 = jnp.maximum(dot(axis_u, axis_u, False), 1e-30)
    vlen2 = jnp.maximum(dot(axis_v, axis_v, False), 1e-30)
    ulen = jnp.sqrt(ulen2)
    vlen = jnp.sqrt(vlen2)
    x_ax = axis_u / ulen[..., None]
    y_ax = axis_v / vlen[..., None]
    z_ax = cross(x_ax, y_ax)

    d0 = corner - P
    z0 = dot(d0, z_ax, False)
    # flip z to point against the shading point
    flip = z0 > 0.0
    z_ax = jnp.where(flip[..., None], -z_ax, z_ax)
    z0 = jnp.where(flip, -z0, z0)
    x0 = dot(d0, x_ax, False)
    y0 = dot(d0, y_ax, False)
    x1 = x0 + ulen
    y1 = y0 + vlen

    # internal angles (gamma_i) from the plane normals of the 4 edges
    diff0, diff1, diff2, diff3 = x0 - x1, y1 - y0, x1 - x0, y0 - y1
    nz0, nz1, nz2, nz3 = y0 * diff0, x1 * diff1, y1 * diff2, x0 * diff3
    z0sq = z0 * z0

    def _nrm(nz, df):
        return nz * jax.lax.rsqrt(jnp.maximum(z0sq * df * df + nz * nz, 1e-30))

    nz0 = _nrm(nz0, diff0)
    nz1 = _nrm(nz1, diff1)
    nz2 = _nrm(nz2, diff2)
    nz3 = _nrm(nz3, diff3)
    g0 = jnp.arccos(jnp.clip(-nz0 * nz1, -1.0, 1.0))
    g1 = jnp.arccos(jnp.clip(-nz1 * nz2, -1.0, 1.0))
    g2 = jnp.arccos(jnp.clip(-nz2 * nz3, -1.0, 1.0))
    g3 = jnp.arccos(jnp.clip(-nz3 * nz0, -1.0, 1.0))

    b0, b1 = nz0, nz2
    k = 2.0 * PI - g2 - g3
    area = g0 + g1 - k
    valid = area > SPHERICAL_AREA_THRESHOLD
    pdf = safe_div_pos(1.0, jnp.maximum(area, 1e-12))

    # sample: cu → xu, then hv → yv (Ureña's marginal/conditional inversion)
    au = r1 * area + k
    sau, cau = _sincos(au)
    fu = _safe_div_signed(cau * b0 - b1, sau)
    cu = jnp.where(fu > 0.0, 1.0, -1.0) * jax.lax.rsqrt(
        jnp.maximum(fu * fu + b0 * b0, 1e-30)
    )
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * z0) / jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - cu * cu, 0.0)), 1e-7)
    xu = jnp.clip(xu, x0, x1)
    d_ = jnp.sqrt(jnp.maximum(xu * xu + z0sq, 1e-30))
    h0 = y0 * jax.lax.rsqrt(jnp.maximum(d_ * d_ + y0 * y0, 1e-30))
    h1 = y1 * jax.lax.rsqrt(jnp.maximum(d_ * d_ + y1 * y1, 1e-30))
    hv = h0 + r2 * (h1 - h0)
    hv2 = hv * hv
    yv = jnp.where(
        hv2 < 1.0 - 1e-6,
        (hv * d_) * jax.lax.rsqrt(jnp.maximum(1.0 - hv2, 1e-12)),
        y1,
    )
    p = (
        P
        + xu[..., None] * x_ax
        + yv[..., None] * y_ax
        + z0[..., None] * z_ax
    )
    return pdf, p, valid


def sample_spherical_triangle(P, p1, p2, p3, r1, r2):
    """Arvo's stratified spherical-triangle sampling — uniform solid-angle
    sampling of a triangle light (reference internal/CoreRef.cpp:1356-1427
    ``SampleSphericalTriangle``).

    Returns ``(pdf, direction, valid)``: pdf = 1/solid-angle, unit direction
    from P, valid=False below SPHERICAL_AREA_THRESHOLD.
    """
    A = safe_normalize(p1 - P)
    B = safe_normalize(p2 - P)
    C = safe_normalize(p3 - P)

    BA = _orthogonalize(A, B - A)
    CA = _orthogonalize(A, C - A)
    AB = _orthogonalize(B, A - B)
    CB = _orthogonalize(B, C - B)
    BC = _orthogonalize(C, B - C)
    AC = _orthogonalize(C, A - C)

    alpha = _angle_between(BA, CA)
    beta = _angle_between(AB, CB)
    gamma = _angle_between(BC, AC)
    area = alpha + beta + gamma - PI
    valid = area > SPHERICAL_AREA_THRESHOLD
    pdf = safe_div_pos(1.0, jnp.maximum(area, 1e-12))

    b_arc = jnp.arccos(jnp.clip(dot(C, A, False), -1.0, 1.0))
    c_arc = jnp.arccos(jnp.clip(dot(A, B, False), -1.0, 1.0))

    area_s = r1 * area
    p_s, q_s = _sincos(area_s - alpha)
    s_alpha, c_alpha = _sincos(alpha)
    u_ = q_s - c_alpha
    v_ = p_s + s_alpha * jnp.cos(c_arc)
    denom = (v_ * p_s + u_ * q_s) * s_alpha
    ratio = _safe_div_signed((v_ * q_s - u_ * p_s) * c_alpha - v_, denom, 1e-12)
    s = safe_div_pos(1.0, jnp.maximum(b_arc, 1e-9)) * jnp.arccos(
        jnp.clip(ratio, -1.0, 1.0)
    )
    C_s = _slerp(A, C, s)
    cs_b = dot(C_s, B, False)
    denom2 = jnp.arccos(jnp.clip(cs_b, -1.0, 1.0))
    t = safe_div_pos(
        jnp.arccos(jnp.clip(1.0 - r2 * (1.0 - cs_b), -1.0, 1.0)),
        jnp.maximum(denom2, 1e-9),
    )
    direction = safe_normalize(_slerp(B, C_s, t))
    return pdf, direction, valid


def _map_to_cone(r1, r2, axis, radius):
    """Concentric disk point on the plane through ``axis``'s endpoint
    (reference CoreRef.cpp map_to_cone)."""
    ox = 2.0 * r1 - 1.0
    oy = 2.0 * r2 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    # SIGNED ratio divisions (ox/oy span [-1,1]) — see the disk-light note
    theta = jnp.where(
        use_x,
        0.25 * PI * _safe_div_signed(oy, jnp.where(use_x, ox, 1.0)),
        0.5 * PI
        - 0.25 * PI * _safe_div_signed(ox, jnp.where(use_x, 1.0, oy)),
    )
    st, ct = _sincos(theta)
    du = jnp.where(zero, 0.0, r * ct)
    dv = jnp.where(zero, 0.0, r * st)
    # orthonormal basis around axis
    from ray_tpu.ops.linalg import orthonormal_basis

    n = safe_normalize(axis)
    t, b = orthonormal_basis(n)
    return axis + radius[..., None] * (du[..., None] * t + dv[..., None] * b)


def _lnode_importance(lt, node, P, oh=None):
    """Importance of light-tree node rows seen from P — vectorized analogue
    of the reference's scalar ``calc_lnode_importance``
    (internal/CoreRef.cpp:870-893): flux attenuated by the node's emission
    cone (axis/ω_n/ω_e) and 1/d², or plain flux for infinite lights.

    Node rows are read with ONE one-hot matmul (``oh`` shareable between
    the two children of a level) — per-ray row gathers from the tiny node
    table were the dominant cost of the tree path (measured 2.7x on the
    flagship bench), and their AD transposes are scatters."""
    from ray_tpu.ops.gather import ONEHOT_MAX, one_hot_f32, read_packed

    if lt["flux"].shape[0] <= ONEHOT_MAX:
        if oh is None:
            oh = one_hot_f32(node, lt["flux"].shape[0])
        lo, hi, axis, flux, omega_n, omega_e = read_packed(
            [lt["lo"], lt["hi"], lt["axis"], lt["flux"],
             lt["omega_n"], lt["omega_e"]], node, oh=oh)
    else:
        lo = lt["lo"][node]
        hi = lt["hi"][node]
        axis = lt["axis"][node]
        flux = lt["flux"][node]
        omega_n = lt["omega_n"][node]
        omega_e = lt["omega_e"][node]

    # The reference has TWO importance formulas: a scalar one
    # (CoreRef.cpp:870-893, with an atan2 cone test and a +0.057 bias) and
    # the 8-wide wbvh/cwbvh one its runtime actually descends
    # (CoreRef.cpp:958-1002): distance^2 clamped to max(dist^2, extent),
    # an exact clamped cos-subtraction chain cos((omega_w - omega_n) -
    # omega_b), and a cos_omega > cos(omega_e) gate.  Matching the wbvh
    # math matters: the pick probability feeds ls.pdf and hence the NEE
    # MIS weight, and the weight difference is visible near lights at
    # depth-capped path ends (measured -0.5/255 whole-image bias on the
    # golden battery's Standard scene with the scalar formula).
    local = lo[..., 0] > -MAX_DIST
    v = P - 0.5 * (lo + hi)
    ext = hi - lo
    extent = 0.5 * jnp.sqrt(jnp.maximum(dot(ext, ext, False), 0.0))
    dist2 = jnp.maximum(dot(v, v, False), 1e-12)
    dist = jnp.sqrt(dist2)
    v_len2 = jnp.where(local, jnp.maximum(dist2, extent), 1.0)
    cos_w = dot(axis, v, False) / dist
    sin_w = jnp.sqrt(jnp.maximum(1.0 - cos_w * cos_w, 0.0))
    inside = dist2 < extent * extent
    cos_b = jnp.where(
        inside, -1.0,
        jnp.sqrt(jnp.maximum(1.0 - (extent * extent) / dist2, 0.0)),
    )
    sin_b = jnp.sqrt(jnp.maximum(1.0 - cos_b * cos_b, 0.0))
    cos_n = jnp.cos(omega_n)
    sin_n = jnp.sqrt(jnp.maximum(1.0 - cos_n * cos_n, 0.0))
    cos_e = jnp.cos(omega_e)

    def _cos_sub(sa, ca, sb, cb):
        # cos(max(a - b, 0)) — CoreRef.cpp:900-905
        return jnp.where(ca > cb, 1.0, ca * cb + sa * sb)

    def _sin_sub(sa, ca, sb, cb):
        return jnp.where(ca > cb, 0.0, sa * cb - ca * sb)

    cos_x = _cos_sub(sin_w, cos_w, sin_n, cos_n)
    sin_x = _sin_sub(sin_w, cos_w, sin_n, cos_n)
    cos_omega = _cos_sub(sin_x, cos_x, sin_b, cos_b)
    mul = jnp.where(cos_omega > cos_e, cos_omega, 0.0)
    return jnp.where(local, flux * mul / v_len2, flux)


def pick_light_tree(scene, P, u):
    """Stochastic top-down descent through the binary light tree — the
    binary-tree analogue of the reference's 8-wide descent in
    ``SampleLightSource`` (internal/CoreRef.cpp:3271-3309).

    Returns (light_idx i32, pick_pdf f32, rescaled u).  pick_pdf == 0 marks
    a failed descent (zero importance subtree)."""
    from ray_tpu.ops.gather import ONEHOT_MAX, one_hot_f32, read_packed

    # the descent is SAMPLING: detached by design (like every other
    # discrete decision) — a detached importance-sampling pdf keeps
    # E[∇(f/p_detached)] = ∇∫f unbiased, and attaching it would drag the
    # whole per-level walk (and its scatter transposes) into the backward
    lt = jax.tree_util.tree_map(jax.lax.stop_gradient, scene.light_tree)
    P = jax.lax.stop_gradient(P)
    node = jnp.zeros(P.shape[:-1], jnp.int32)
    pdf = jnp.ones(P.shape[:-1], jnp.float32)
    failed = jnp.zeros(P.shape[:-1], jnp.bool_)
    small = lt["flux"].shape[0] <= ONEHOT_MAX
    for _ in range(scene.light_tree_depth):
        if small:
            oh = one_hot_f32(node, lt["left"].shape[0])
            li, ri = read_packed([lt["left"], lt["right"]], node, oh=oh)
        else:
            li = lt["left"][node]
            ri = lt["right"][node]
        internal = li >= 0
        imp_l = _lnode_importance(lt, jnp.maximum(li, 0), P)
        imp_r = _lnode_importance(lt, jnp.maximum(ri, 0), P)
        total = imp_l + imp_r
        failed = failed | (internal & (total <= 0.0))
        p_l = safe_div_pos(imp_l, total)
        go_left = u < p_l
        p_take = jnp.where(go_left, p_l, 1.0 - p_l)
        u_new = jnp.where(
            go_left,
            safe_div_pos(u, p_l),
            safe_div_pos(u - p_l, 1.0 - p_l),
        )
        u = jnp.where(internal, jnp.clip(u_new, 0.0, 0.9999999), u)
        node = jnp.where(internal, jnp.where(go_left, li, ri), node)
        pdf = jnp.where(internal, pdf * p_take, pdf)
    if small:
        light = ~read_packed([lt["left"]], node)[0]
    else:
        light = ~lt["left"][node]  # leaf rows encode ~light_index
    pdf = jnp.where(failed, 0.0, pdf)
    return light, pdf, u


def light_pick_pdf(scene, P, light_idx):
    """Probability that NEE light picking selects ``light_idx`` from a
    shading point P: leaf→root re-walk of the tree when hierarchical NEE is
    on (the MIS factor the reference recomputes in ``EvalTriLightFactor``,
    internal/CoreRef.cpp:4594-4692), else the static CDF pick pdf."""
    from ray_tpu.ops.gather import ONEHOT_MAX, one_hot_f32, read_packed, read_rows

    safe_idx = jnp.clip(light_idx, 0, scene.lights["type"].shape[0] - 1)
    if scene.light_tree_depth <= 0:
        return read_rows(scene.lights["pick_pdf"], safe_idx)
    # detached like pick_light_tree (see its note)
    lt = jax.tree_util.tree_map(jax.lax.stop_gradient, scene.light_tree)
    P = jax.lax.stop_gradient(P)
    node = read_rows(lt["leaf_node"], safe_idx)
    pdf = jnp.ones(node.shape, jnp.float32)
    small = lt["flux"].shape[0] <= ONEHOT_MAX
    for _ in range(scene.light_tree_depth):
        if small:
            oh = one_hot_f32(node, lt["parent"].shape[0])
            par, side = read_packed([lt["parent"], lt["side"]], node, oh=oh)
        else:
            par = lt["parent"][node]
            side = lt["side"][node]
        has = par >= 0
        pn = jnp.maximum(par, 0)
        if small:
            ohp = one_hot_f32(pn, lt["left"].shape[0])
            li, ri = read_packed([lt["left"], lt["right"]], pn, oh=ohp)
        else:
            li = lt["left"][pn]
            ri = lt["right"][pn]
        imp_l = _lnode_importance(lt, li, P)
        imp_r = _lnode_importance(lt, ri, P)
        total = imp_l + imp_r
        mine = jnp.where(side == 1, imp_r, imp_l)
        pdf = jnp.where(has, pdf * safe_div_pos(mine, total), pdf)
        node = jnp.where(has, pn, node)
    return pdf


def sample_light_source(scene, P, T, B, N, rand_pick, rand_uv,
                        no_sphrect: bool = False):
    """Sample one light for each of R shading points.

    Returns a :class:`LightSample`; ``pdf == 0`` marks a failed/absent sample.
    ``no_sphrect`` (a PassSettings debug toggle) forces uniform-area rect
    sampling — a bias-isolation tool, off in production.
    """
    lights = scene.lights
    R = P.shape[0]
    nl = lights["type"].shape[0]

    # static per-scene light-type set: absent types trace away entirely
    # (the analogue of the reference's per-feature shader specialization)
    kinds = {k for (k, _v, _d, _p) in scene.light_kinds}
    has_sphere = LightType.SPHERE in kinds
    has_dir = LightType.DIR in kinds
    has_rect = LightType.RECT in kinds
    has_disk = LightType.DISK in kinds
    has_line = LightType.LINE in kinds
    has_tri = LightType.TRI in kinds
    has_env = LightType.ENV in kinds
    has_portal = any(p for (_k, _v, _d, p) in scene.light_kinds)

    if scene.light_tree_depth > 0:
        # hierarchical pick (reference USE_HIERARCHICAL_NEE path)
        idx, pick_pdf, u1 = pick_light_tree(scene, P, rand_pick)
        idx = jnp.clip(idx, 0, nl - 1)
    else:
        # pick by CDF (flux-proportional limit of the tree)
        idx = jnp.searchsorted(lights["pick_cdf"], rand_pick, side="right").astype(jnp.int32)
        idx = jnp.clip(idx, 0, nl - 1)
        from ray_tpu.ops.gather import read_packed as _rp
        pick_pdf, cdf_lo_raw = _rp(
            [lights["pick_pdf"], lights["pick_cdf"]], idx)
        # rescale the pick random for reuse inside the light
        # (cdf at idx-1: shift read via a second packed read would cost
        # another matmul; derive it from cdf[idx] - pdf[idx] instead)
        cdf_lo = jnp.where(idx > 0, cdf_lo_raw - pick_pdf, 0.0)
        u1 = saturate(safe_div_pos(rand_pick - cdf_lo, pick_pdf))

    # single one-hot-matmul read of the whole light row (ops/gather.py) —
    # replaces 15 serializing row gathers; columns no present light type
    # needs are dropped statically
    oh = one_hot_f32(idx, nl) if nl <= 128 else None
    zero = jnp.zeros((R,), jnp.float32)
    cols = ["type", "col", "cast_shadow"]
    if has_sphere or has_dir or has_rect or has_disk or has_line or has_tri:
        cols.append("visible")
    if has_sphere or has_rect or has_disk or has_line:
        cols.append("pos")
    if has_sphere or has_dir:
        cols.append("dir")
    if has_rect or has_disk or has_line:
        cols += ["v", "height"]
    if has_rect or has_disk:
        cols += ["u", "width"]
    if has_sphere or has_line:
        cols.append("radius")
    if has_sphere:
        cols += ["spot_cos", "spot_blend"]
    if has_dir:
        cols.append("angle")
    if has_rect or has_disk or has_tri:
        cols.append("doublesided")
    if has_portal:
        cols.append("portal")
    vals = dict(zip(cols, read_packed([lights[c] for c in cols], idx, oh=oh)))
    ltype = vals["type"]
    lcol = vals["col"]
    cast_shadow = vals["cast_shadow"]
    visible = vals.get("visible", jnp.zeros((R,), jnp.bool_))
    lpos = vals.get("pos")
    ldir = vals.get("dir")
    lu = vals.get("u")
    lv = vals.get("v")
    radius = vals.get("radius", zero)
    width = vals.get("width", zero)
    height = vals.get("height", zero)
    angle = vals.get("angle", zero)
    spot_cos = vals.get("spot_cos", zero)
    spot_blend = vals.get("spot_blend", zero)
    doublesided = vals.get("doublesided", jnp.zeros((R,), jnp.bool_))
    portal = vals.get("portal", jnp.zeros((R,), jnp.bool_))

    r1 = rand_uv[..., 0]
    r2 = rand_uv[..., 1]

    out_col = jnp.broadcast_to(lcol, (R, 3)) * 1.0
    out_L = jnp.zeros((R, 3), jnp.float32)
    out_lp = jnp.zeros((R, 3), jnp.float32)
    out_area = jnp.zeros((R,), jnp.float32)
    out_pdf = jnp.zeros((R,), jnp.float32)
    out_distmul = jnp.ones((R,), jnp.float32)
    out_fromenv = jnp.zeros((R,), jnp.bool_)

    if has_sphere:
        # ---- sphere (incl. spot) — CoreRef.cpp:3322-3368 ----
        to_c = lpos - P
        d = jnp.sqrt(jnp.maximum(dot(to_c, to_c, False), 1e-30))
        light_normal = to_c / d[:, None]
        outside = d > radius
        temp = jnp.sqrt(jnp.maximum(d * d - radius * radius, 0.0))
        disk_radius = safe_div_pos(temp * radius, d)
        disk_dist = jnp.where(radius > 0.0, safe_div_pos(temp * disk_radius, radius), d)
        cone_pt = _map_to_cone(r1, r2, disk_dist[:, None] * light_normal, disk_radius)
        cone_len = jnp.sqrt(jnp.maximum(dot(cone_pt, cone_pt, False), 1e-30))
        sph_L = cone_pt / cone_len[:, None]
        # project sampled dir onto the sphere surface
        b_q = dot(sph_L, -to_c, False)
        c_q = dot(to_c, to_c, False) - radius * radius
        disc = jnp.maximum(b_q * b_q - c_q, 0.0)
        ls_dist = -b_q - jnp.sqrt(disc)
        sph_surf = P + sph_L * ls_dist[:, None]
        sph_fwd = safe_normalize(sph_surf - lpos)
        sampled_area = PI * disk_radius * disk_radius
        cos_theta_s = dot(sph_L, light_normal, False)
        sph_pdf = jnp.where(
            radius > 0.0,
            safe_div_pos(cone_len * cone_len, sampled_area * jnp.maximum(cos_theta_s, 1e-7)),
            safe_div_pos(cone_len * cone_len, PI),
        )
        sph_lp = jnp.where(
            (radius > 0.0)[:, None], offset_ray(sph_surf, sph_fwd), lpos
        )
        # spot factor
        spot_dot = -dot(sph_L, ldir, False)
        spot_angle = jnp.arccos(saturate(spot_dot))
        spot_limit = jnp.arccos(jnp.clip(spot_cos, -1.0, 1.0))
        spot_factor = jnp.where(
            spot_cos > -1.5,
            jnp.where(
                spot_dot > 0.0,
                saturate(safe_div_pos(spot_limit - spot_angle, jnp.maximum(spot_blend, 1e-6))),
                0.0,
            ),
            1.0,
        )
        is_sph = ltype == LightType.SPHERE
        sph_ok = is_sph & outside
        out_L = jnp.where(sph_ok[:, None], sph_L, out_L)
        out_lp = jnp.where(sph_ok[:, None], sph_lp, out_lp)
        out_pdf = jnp.where(sph_ok, sph_pdf, out_pdf)
        out_area = jnp.where(sph_ok & visible, sampled_area, out_area)
        out_col = jnp.where(is_sph[:, None], out_col * spot_factor[:, None], out_col)

    if has_dir:
        # ---- directional — CoreRef.cpp:3369-3391 ----
        tan_angle = jnp.tan(jnp.radians(angle) * 0.5)
        has_spread = tan_angle != 0.0
        cone = _map_to_cone(r1, r2, ldir, tan_angle)
        dir_L = jnp.where(has_spread[:, None], safe_normalize(cone), ldir)
        dir_area = jnp.where(has_spread, PI * tan_angle * tan_angle, 0.0)
        dir_cos = dot(dir_L, ldir, False)
        dir_pdf = jnp.where(
            has_spread, safe_div_pos(1.0, dir_area * jnp.maximum(dir_cos, 1e-7)), 1.0
        )
        is_dir = ltype == LightType.DIR
        out_L = jnp.where(is_dir[:, None], dir_L, out_L)
        out_lp = jnp.where(is_dir[:, None], P + dir_L, out_lp)
        out_pdf = jnp.where(is_dir, dir_pdf, out_pdf)
        out_area = jnp.where(is_dir & visible, dir_area, out_area)
        out_distmul = jnp.where(is_dir, MAX_DIST, out_distmul)

    if has_rect:
        # ---- rect — CoreRef.cpp:3392-3422: spherical-rectangle (Ureña)
        # solid-angle sampling, falling back to uniform area sampling when
        # the subtended solid angle is tiny
        # (USE_SPHERICAL_AREA_LIGHT_SAMPLING) ----
        rect_u = lu * width[:, None]
        rect_v = lv * height[:, None]
        rect_fwd = safe_normalize(cross(rect_u, rect_v))
        sr_pdf, sr_p, sr_ok = sample_spherical_rectangle(
            P, lpos, rect_u, rect_v, r1, r2
        )
        if no_sphrect:
            sr_ok = sr_ok & False
        rp_area = lpos + rect_u * (r1 - 0.5)[:, None] + rect_v * (r2 - 0.5)[:, None]
        rp = jnp.where(sr_ok[:, None], sr_p, rp_area)
        rvec = rp - P
        rdist = jnp.sqrt(jnp.maximum(dot(rvec, rvec, False), 1e-30))
        rect_L = rvec / rdist[:, None]
        rect_area = width * height
        rcos = dot(-rect_L, rect_fwd, False)
        rcos_eff = jnp.where(doublesided, jnp.abs(rcos), rcos)
        rect_ok = (ltype == LightType.RECT) & (rcos_eff > 0.0)
        rect_pdf = jnp.where(
            sr_ok,
            sr_pdf,
            safe_div_pos(rdist * rdist, rect_area * jnp.maximum(rcos_eff, 1e-9)),
        )
        rect_side = jnp.where((rcos > 0.0)[:, None], rect_fwd, -rect_fwd)
        out_L = jnp.where(rect_ok[:, None], rect_L, out_L)
        out_lp = jnp.where(rect_ok[:, None], offset_ray(rp, rect_side), out_lp)
        out_pdf = jnp.where(rect_ok, rect_pdf, out_pdf)
        out_area = jnp.where(rect_ok & visible, rect_area, out_area)

    if has_disk:
        # ---- disk — CoreRef.cpp:3423-3466 ----
        ox = 2.0 * r1 - 1.0
        oy = 2.0 * r2 - 1.0
        use_x = jnp.abs(ox) > jnp.abs(oy)
        rr = jnp.where(use_x, ox, oy)
        # concentric-map ratio divisions are SIGNED (ox/oy span [-1,1]):
        # a positive-clamped division flattened theta to +-pi*huge for the
        # negative half of the square, skewing the placement while the pdf
        # stayed uniform — measured -0.9/255 whole-image bias from the
        # Standard scene's disk light alone
        th = jnp.where(
            use_x,
            0.25 * PI * _safe_div_signed(oy, jnp.where(use_x, ox, 1.0)),
            0.5 * PI
            - 0.25 * PI * _safe_div_signed(ox, jnp.where(use_x, 1.0, oy)),
        )
        sth, cth = _sincos(th)
        zero_off = (ox == 0.0) & (oy == 0.0)
        du = jnp.where(zero_off, 0.0, 0.5 * rr * cth)
        dv = jnp.where(zero_off, 0.0, 0.5 * rr * sth)
        dp = lpos + lu * (du * width)[:, None] + lv * (dv * height)[:, None]
        disk_fwd = safe_normalize(cross(lu, lv))
        dvec = dp - P
        ddist = jnp.sqrt(jnp.maximum(dot(dvec, dvec, False), 1e-30))
        dL = dvec / ddist[:, None]
        disk_area = 0.25 * PI * width * height
        dcos = dot(-dL, disk_fwd, False)
        dcos_eff = jnp.where(doublesided, jnp.abs(dcos), dcos)
        disk_ok = (ltype == LightType.DISK) & (dcos_eff > 0.0)
        disk_pdf = safe_div_pos(ddist * ddist, disk_area * jnp.maximum(dcos_eff, 1e-9))
        disk_side = jnp.where((dcos > 0.0)[:, None], disk_fwd, -disk_fwd)
        out_L = jnp.where(disk_ok[:, None], dL, out_L)
        out_lp = jnp.where(disk_ok[:, None], offset_ray(dp, disk_side), out_lp)
        out_pdf = jnp.where(disk_ok, disk_pdf, out_pdf)
        out_area = jnp.where(disk_ok & visible, disk_area, out_area)

    if has_line:
        # ---- line — CoreRef.cpp:3467-3506 ----
        c2s = P - lpos
        line_u = safe_normalize(cross(c2s, lv))
        line_v2 = cross(line_u, lv)
        phi = PI * r1
        sphl, cphl = _sincos(phi)
        line_n = cphl[:, None] * line_u + sphl[:, None] * line_v2
        lp_line = lpos + line_n * radius[:, None] + (r2 - 0.5)[:, None] * lv * height[:, None]
        lvec = lp_line - P
        ldist = jnp.sqrt(jnp.maximum(dot(lvec, lvec, False), 1e-30))
        lL = lvec / ldist[:, None]
        line_area = 2.0 * PI * radius * height
        lcos = 1.0 - jnp.abs(dot(lL, lv, False))
        line_ok = (ltype == LightType.LINE) & (lcos != 0.0)
        line_pdf = safe_div_pos(ldist * ldist, line_area * jnp.maximum(lcos, 1e-9))
        out_L = jnp.where(line_ok[:, None], lL, out_L)
        out_lp = jnp.where(line_ok[:, None], lp_line, out_lp)
        out_pdf = jnp.where(line_ok, line_pdf, out_pdf)
        out_area = jnp.where(line_ok & visible, line_area, out_area)

    if has_tri:
        # ---- triangle — CoreRef.cpp:3507-3577 (uniform area sampling) ----
        if getattr(scene, "mode", "flatten") == "tlas":
            # scene.vertices are object-space under instancing; the light
            # table carries the world-space triangle
            tp0, tp1, tp2 = read_packed(
                [lights["tp0"], lights["tp1"], lights["tp2"]], idx, oh=oh
            )
        else:
            from ray_tpu.render.surface import fetch_tri_pieces

            tri = jnp.maximum(read_rows(lights["tri_index"], idx, oh=oh), 0)
            trow = fetch_tri_pieces(scene.tri_surf, tri, ("p0", "p1", "p2"))
            tp0, tp1, tp2 = trow["p0"], trow["p1"], trow["p2"]
        tfwd = cross(tp1 - tp0, tp2 - tp0)
        tfwd_len = jnp.sqrt(jnp.maximum(dot(tfwd, tfwd, False), 1e-30))
        tri_fwd = tfwd / tfwd_len[:, None]
        tri_area = 0.5 * tfwd_len
        # spherical-triangle (Arvo) solid-angle sampling with uniform-area
        # fallback (CoreRef.cpp:3530-3556)
        st_pdf, st_L, st_ok = sample_spherical_triangle(P, tp0, tp1, tp2, r1, r2)
        te1 = tp1 - tp0
        te2 = tp2 - tp0
        st_pvec = cross(st_L, te2)
        st_tvec = P - tp0
        st_qvec = cross(st_tvec, te1)
        st_det = dot(te1, st_pvec, False)
        st_inv = _safe_div_signed(1.0, st_det, 1e-12)
        st_u = dot(st_tvec, st_pvec, False) * st_inv
        st_v = dot(st_L, st_qvec, False) * st_inv
        st_lp = (
            (1.0 - st_u - st_v)[:, None] * tp0
            + st_u[:, None] * tp1
            + st_v[:, None] * tp2
        )
        sr1 = jnp.sqrt(jnp.maximum(r1, 0.0))
        tlp_area = (
            tp0 * (1.0 - sr1)[:, None]
            + sr1[:, None] * (tp1 * (1.0 - r2)[:, None] + tp2 * r2[:, None])
        )
        tlp = jnp.where(st_ok[:, None], st_lp, tlp_area)
        tvec = tlp - P
        tdist = jnp.sqrt(jnp.maximum(dot(tvec, tvec, False), 1e-30))
        tL = jnp.where(st_ok[:, None], st_L, tvec / tdist[:, None])
        tcos = -dot(tL, tri_fwd, False)
        tcos_eff = jnp.where(doublesided, jnp.abs(tcos), tcos)
        tri_ok = (ltype == LightType.TRI) & (tcos_eff > 0.0)
        tri_pdf = jnp.where(
            st_ok,
            st_pdf,
            safe_div_pos(tdist * tdist, tri_area * jnp.maximum(tcos_eff, 1e-9)),
        )
        tri_side = jnp.where((tcos >= 0.0)[:, None], tri_fwd, -tri_fwd)
        out_L = jnp.where(tri_ok[:, None], tL, out_L)
        out_lp = jnp.where(tri_ok[:, None], offset_ray(tlp, tri_side), out_lp)
        out_pdf = jnp.where(tri_ok, tri_pdf, out_pdf)
        out_area = jnp.where(tri_ok, tri_area, out_area)

    if has_env:
        # ---- env — CoreRef.cpp:3578-3611: importance-sampled from the
        # latlong CDF tables when a map exists, uniform hemisphere
        # otherwise ----
        if scene.env_tab_h > 0:
            env_L, env_pdf_sa = sample_env_importance(scene, r1, r2)
        else:
            phi_e = 2.0 * PI * r2
            spe, cpe = _sincos(phi_e)
            de = jnp.sqrt(jnp.maximum(1.0 - r1 * r1, 0.0))
            env_ts = jnp.stack([de * cpe, de * spe, r1], axis=-1)
            env_L = world_from_tangent(T, B, N, env_ts)
            env_pdf_sa = jnp.full(r1.shape, 0.5 / PI)
        is_env = ltype == LightType.ENV
        # the ENV light's table color is only used for pick-CDF weighting;
        # actual radiance comes from env_color (constant × map) to avoid
        # double counting
        env_col_mult = env_color(scene, env_L)
        out_col = jnp.where(is_env[:, None], env_col_mult, out_col)
        out_L = jnp.where(is_env[:, None], env_L, out_L)
        out_lp = jnp.where(is_env[:, None], P + env_L, out_lp)
        out_pdf = jnp.where(is_env, env_pdf_sa, out_pdf)
        out_area = jnp.where(is_env, 1.0, out_area)
        out_distmul = jnp.where(is_env, MAX_DIST, out_distmul)
        out_fromenv = out_fromenv | is_env

    # sky portals: a rect/disk "window" light that emits the environment
    # seen through it (reference CoreRef.cpp:3406-3419: ls.col *= env,
    # ls.from_env = 1) — only when any portal exists in the scene (static)
    if has_portal:
        is_portal = portal & (
            (ltype == LightType.RECT) | (ltype == LightType.DISK)
        )
        env_mult = env_color(scene, out_L)
        out_col = jnp.where(is_portal[:, None], out_col * env_mult, out_col)
        out_fromenv = out_fromenv | is_portal

    # fold in pick probability (reference: ls.pdf /= factor)
    out_pdf = out_pdf * pick_pdf

    return LightSample(
        col=out_col,
        L=out_L,
        lp=out_lp,
        area=out_area,
        dist_mul=out_distmul,
        pdf=out_pdf,
        cast_shadow=cast_shadow,
        from_env=out_fromenv,
    )


def env_color(scene, L):
    """Environment radiance along L: constant color × optional latlong map
    (reference Evaluate_EnvColor, ShadeRef.cpp:1038-1076)."""
    col = jnp.broadcast_to(scene.env_col, L.shape)
    if scene.env_tab_h <= 0:  # static: no env map in this scene
        return col
    has_map = scene.env_map >= 0

    # latlong lookup
    rot = scene.env_rotation
    x = L[..., 0] * jnp.cos(rot) - L[..., 2] * jnp.sin(rot)
    z = L[..., 0] * jnp.sin(rot) + L[..., 2] * jnp.cos(rot)
    theta = jnp.arccos(jnp.clip(L[..., 1], -1.0, 1.0)) / PI
    phi = jnp.arctan2(z, x)
    u = jnp.where(phi < 0.0, phi + 2.0 * PI, phi) / (2.0 * PI)
    uv = jnp.stack([u, theta], axis=-1)
    from ray_tpu.scene.textures import sample_bilinear

    tex_id = jnp.where(has_map, scene.env_map, 0)
    tex = sample_bilinear(
        scene.textures, jnp.broadcast_to(tex_id, L.shape[:-1]), uv
    )
    return jnp.where(has_map, col * tex[..., :3], col)


def _bits(n):
    b = 0
    while (1 << b) < n:
        b += 1
    return b


def _search_cdf(gather, length, r):
    """Vectorized binary search: smallest i with cdf[i] > r.

    ``gather(i)`` returns cdf values for an (R,) index array; ``length`` is
    static.  O(log N) gathers — no (R, N) materialization."""
    lo = jnp.zeros_like(r, dtype=jnp.int32)
    hi = jnp.full_like(lo, length)
    for _ in range(_bits(length)):
        mid = (lo + hi) >> 1
        v = gather(jnp.clip(mid, 0, length - 1))
        go_right = v <= r
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.clip(lo, 0, length - 1)


def sample_env_importance(scene, r1, r2):
    """Inverse-transform sample of the latlong env luminance CDF.

    Returns (L, pdf_solid_angle).  Counterpart of the reference's
    ``Sample_EnvQTree`` (internal/CoreRef.cpp); tables from scene/env.py.
    """
    H, W = scene.env_tab_h, scene.env_tab_w
    marg = scene.env_marginal_cdf
    cond = scene.env_cond_cdf

    y = _search_cdf(lambda i: marg[i], H, r1)
    y_lo = jnp.where(y > 0, marg[jnp.maximum(y - 1, 0)], 0.0)
    y_w = jnp.maximum(marg[y] - y_lo, 1e-12)
    fy = saturate((r1 - y_lo) / y_w)

    x = _search_cdf(lambda i: cond[y * W + i], W, r2)
    x_lo = jnp.where(x > 0, cond[y * W + jnp.maximum(x - 1, 0)], 0.0)
    x_w = jnp.maximum(cond[y * W + x] - x_lo, 1e-12)
    fx = saturate((r2 - x_lo) / x_w)

    u = (x.astype(jnp.float32) + fx) / W
    v = (y.astype(jnp.float32) + fy) / H
    theta = v * PI
    phi = u * 2.0 * PI
    st = jnp.sin(theta)
    xp = st * jnp.cos(phi)
    zp = st * jnp.sin(phi)
    rot = scene.env_rotation
    L = jnp.stack(
        [
            jnp.cos(rot) * xp + jnp.sin(rot) * zp,
            jnp.cos(theta),
            -jnp.sin(rot) * xp + jnp.cos(rot) * zp,
        ],
        axis=-1,
    )
    pdf = scene.env_pdf[y * W + x]
    return L, pdf


def env_hit_pdf(scene, L):
    """Solid-angle pdf that :func:`sample_env_importance` would have produced
    direction ``L`` — the miss-side MIS counterpart (reference
    Evaluate_EnvQTree, ShadeRef.cpp:1056-1066)."""
    H, W = scene.env_tab_h, scene.env_tab_w
    rot = scene.env_rotation
    x_r = L[..., 0] * jnp.cos(rot) - L[..., 2] * jnp.sin(rot)
    z_r = L[..., 0] * jnp.sin(rot) + L[..., 2] * jnp.cos(rot)
    theta = jnp.arccos(jnp.clip(L[..., 1], -1.0, 1.0)) / PI
    phi = jnp.arctan2(z_r, x_r)
    u = jnp.where(phi < 0.0, phi + 2.0 * PI, phi) / (2.0 * PI)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((theta * H).astype(jnp.int32), 0, H - 1)
    return scene.env_pdf[y * W + x]


def intersect_area_lights(scene, ro, rd, t_max, no_sphrect: bool = False):
    """Closest visible analytic light along each ray.

    Vectorized equivalent of the reference's ``IntersectAreaLights``
    (internal/CoreRef.cpp:3616): tests every sphere/rect/disk/line light
    with ``visible`` set against all rays (compute-all over the small light
    table; a light BVH takes over for many-light scenes).  Returns
    ``(t, light_idx, pdf)``: hit distance (inf if none), light id (-1), and
    the solid-angle NEE pdf of that hit × pick probability — the quantity
    the MIS weight needs (reference Evaluate_LightColor,
    ShadeRef.cpp:1080-1170).
    """
    L = scene.lights
    R = ro.shape[0]
    best_t = jnp.full((R,), jnp.inf, jnp.float32)
    best_i = jnp.full((R,), -1, jnp.int32)
    best_pdf = jnp.zeros((R,), jnp.float32)
    best_spot = jnp.ones((R,), jnp.float32)

    for i, (ltype, visible, dsd, _portal) in enumerate(scene.light_kinds):
        if not visible or ltype in (LightType.TRI, LightType.ENV, LightType.DIR):
            continue
        col_pos = L["pos"][i]

        if ltype == LightType.SPHERE:
            radius = L["radius"][i]
            oc = ro - col_pos[None, :]
            b = dot(rd, oc, False)
            c = dot(oc, oc, False) - radius * radius
            disc = b * b - c
            t_hit = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            ok = (disc >= 0.0) & (t_hit > 0.0) & (t_hit < t_max)
            # NEE pdf of this direction (solid-angle disk approximation,
            # matching the sampler's pdf so MIS weights cancel correctly)
            d2 = dot(oc, oc, False)
            d = jnp.sqrt(jnp.maximum(d2, 1e-12))
            temp = jnp.sqrt(jnp.maximum(d2 - radius * radius, 0.0))
            disk_r = safe_div_pos(temp * radius, d)
            disk_dist = safe_div_pos(temp * disk_r, jnp.maximum(radius, 1e-9))
            area = PI * disk_r * disk_r
            ln = -oc / d[:, None]
            cos_theta = dot(rd, ln, False)
            pdf = safe_div_pos(disk_dist * disk_dist, area * jnp.maximum(cos_theta, 1e-9))
            # spot falloff (reference ShadeRef.cpp:1152-1163)
            spot_cos = L["spot_cos"][i]
            sdot = -dot(rd, L["dir"][i][None, :], False)
            sangle = jnp.arccos(saturate(sdot))
            slimit = jnp.arccos(jnp.clip(spot_cos, -1.0, 1.0))
            spot = jnp.where(
                spot_cos > -1.5,
                jnp.where(
                    sdot > 0.0,
                    saturate(safe_div_pos(slimit - sangle,
                                          jnp.maximum(L["spot_blend"][i], 1e-6))),
                    0.0,
                ),
                1.0,
            )
        elif ltype in (LightType.RECT, LightType.DISK):
            u_ax = L["u"][i] * L["width"][i]
            v_ax = L["v"][i] * L["height"][i]
            fwd = jnp.cross(u_ax, v_ax)
            fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
            denom = dot(rd, fwd[None, :], False)
            # single-sided lights emit along +fwd: visible only to rays
            # traveling against it (rd·fwd < 0), like the sampler's
            # cos(-L, fwd) > 0 test
            facing = jnp.abs(denom) > 1e-7 if dsd else (denom < -1e-7)
            t_hit = dot(col_pos[None, :] - ro, fwd[None, :], False) / jnp.where(
                jnp.abs(denom) > 1e-9, denom, 1e-9
            )
            p = ro + rd * t_hit[:, None] - col_pos[None, :]
            pu = dot(p, u_ax[None, :], False) / jnp.maximum(
                jnp.sum(u_ax * u_ax), 1e-12
            )
            pv = dot(p, v_ax[None, :], False) / jnp.maximum(
                jnp.sum(v_ax * v_ax), 1e-12
            )
            if ltype == LightType.RECT:
                inside = (jnp.abs(pu) <= 0.5) & (jnp.abs(pv) <= 0.5)
                area = L["width"][i] * L["height"][i]
            else:
                inside = (pu * pu + pv * pv) <= 0.25
                area = 0.25 * PI * L["width"][i] * L["height"][i]
            ok = facing & (t_hit > 0.0) & (t_hit < t_max) & inside
            cos_theta = jnp.abs(denom)
            pdf = safe_div_pos(t_hit * t_hit, area * jnp.maximum(cos_theta, 1e-9))
            if ltype == LightType.RECT:
                # spherical-rect pdf where the sampler would have used it
                # (reference ShadeRef.cpp:1128-1141)
                zero = jnp.zeros((R,), jnp.float32)
                sr_pdf, _, sr_ok = sample_spherical_rectangle(
                    ro, jnp.broadcast_to(col_pos, (R, 3)),
                    jnp.broadcast_to(u_ax, (R, 3)),
                    jnp.broadcast_to(v_ax, (R, 3)), zero, zero,
                )
                if no_sphrect:
                    sr_ok = sr_ok & False
                pdf = jnp.where(sr_ok, sr_pdf, pdf)
            spot = jnp.ones((R,), jnp.float32)
        elif ltype == LightType.LINE:
            # finite cylinder of radius r around axis v through pos
            axis = L["v"][i]
            r_cyl = L["radius"][i]
            h = L["height"][i]
            oc = ro - col_pos[None, :]
            d_perp = rd - dot(rd, axis[None, :]) * axis[None, :]
            o_perp = oc - dot(oc, axis[None, :]) * axis[None, :]
            a_q = dot(d_perp, d_perp, False)
            b_q = dot(d_perp, o_perp, False)
            c_q = dot(o_perp, o_perp, False) - r_cyl * r_cyl
            disc = b_q * b_q - a_q * c_q
            t_hit = safe_div_pos(-b_q - jnp.sqrt(jnp.maximum(disc, 0.0)),
                                 jnp.maximum(a_q, 1e-12))
            z = dot(oc + rd * t_hit[:, None], axis[None, :], False)
            ok = (disc >= 0.0) & (t_hit > 0.0) & (t_hit < t_max) & (
                jnp.abs(z) <= 0.5 * h
            )
            area = 2.0 * PI * r_cyl * h
            cos_theta = 1.0 - jnp.abs(dot(rd, axis[None, :], False))
            pdf = safe_div_pos(t_hit * t_hit, area * jnp.maximum(cos_theta, 1e-9))
            spot = jnp.ones((R,), jnp.float32)
        else:
            continue

        closer = ok & (t_hit < best_t)
        best_t = jnp.where(closer, t_hit, best_t)
        best_i = jnp.where(closer, i, best_i)
        best_pdf = jnp.where(closer, pdf, best_pdf)
        best_spot = jnp.where(closer, spot, best_spot)

    # fold in the pick probability from the ray origin (hierarchical when the
    # light tree is on) — the reference does the same inside
    # Evaluate_LightColor via EvalTriLightFactor-style re-descent
    best_pdf = best_pdf * light_pick_pdf(scene, ro, best_i)
    return best_t, best_i, best_pdf, best_spot


def tri_light_hit_pdf(scene, prim, t, I, pick_pdf_of_light, light_id=None,
                      ro=None):
    """Solid-angle pdf of having NEE-sampled the emissive triangle that a
    BSDF ray just hit — for the MIS weight at emissive hits (reference
    ShadeRef.cpp:1502-1537): spherical-triangle solid angle from the ray
    origin when it is above threshold, uniform-area form otherwise.

    ``light_id``: required under TLAS instancing, where the world triangle
    lives in the light table rather than the (object-space) scene arrays.
    ``ro``: ray origins — enables the spherical-pdf branch.
    """
    if getattr(scene, "mode", "flatten") == "tlas":
        lid = jnp.maximum(light_id, 0)
        loh = (one_hot_f32(lid, scene.lights["tp0"].shape[0])
               if scene.lights["tp0"].shape[0] <= 128 else None)
        p0, p1, p2 = read_packed(
            [scene.lights["tp0"], scene.lights["tp1"], scene.lights["tp2"]],
            lid, oh=loh,
        )
    else:
        from ray_tpu.render.surface import fetch_tri_pieces

        trow = fetch_tri_pieces(
            scene.tri_surf, jnp.maximum(prim, 0), ("p0", "p1", "p2")
        )
        p0, p1, p2 = trow["p0"], trow["p1"], trow["p2"]
    fwd = cross(p1 - p0, p2 - p0)
    fwd_len = jnp.sqrt(jnp.maximum(dot(fwd, fwd, False), 1e-30))
    tri_fwd = fwd / fwd_len[:, None]
    area = 0.5 * fwd_len
    cos_theta = jnp.abs(dot(I, tri_fwd, False))
    pdf = safe_div_pos(t * t, area * jnp.maximum(cos_theta, 1e-9))
    if ro is not None:
        zero = jnp.zeros(t.shape, jnp.float32)
        st_pdf, _, st_ok = sample_spherical_triangle(ro, p0, p1, p2, zero, zero)
        pdf = jnp.where(st_ok, st_pdf, pdf)
    return pdf * pick_pdf_of_light


def portal_shadow_block(scene, ro, rd, dist):
    """Sky-portal shadow blocking — the reference's blocker-light pass
    (TraceShadowRays → IntersectAreaLights shadow variant,
    CoreRef.cpp:4866-4870, leaf test :4533-4590): only lights with SHADOW
    ray visibility block, which the scene build grants exclusively to sky
    portals (SceneCPU.cpp:676-678), and a portal only blocks shadow rays
    flagged as ENV rays (``l.sky_portal && ray.dist >= 0 → skip``) — so
    environment light reaches the interior only THROUGH portal windows.

    Returns (R,) bool: True where the env shadow ray crosses a portal
    one-sidedly (cosθ < 0) within ``dist``.  The caller applies it only
    to ``ls.from_env`` rays.  Static no-op unless the scene has portals.
    """
    L = scene.lights
    R = ro.shape[0]
    blocked = jnp.zeros((R,), jnp.bool_)
    for i, (ltype, _vis, _dsd, is_portal) in enumerate(scene.light_kinds):
        if not is_portal or ltype not in (LightType.RECT, LightType.DISK):
            continue
        pos = L["pos"][i]
        u_ax = L["u"][i] * L["width"][i]
        v_ax = L["v"][i] * L["height"][i]
        fwd = jnp.cross(u_ax, v_ax)
        fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
        cos_theta = dot(rd, fwd[None, :], False)
        t = (jnp.sum(fwd * pos) - dot(ro, fwd[None, :], False)) / jnp.minimum(
            cos_theta, -1e-12
        )
        hit = (cos_theta < 0.0) & (t > HIT_BIAS) & (t < dist)
        vi = ro + rd * t[:, None] - pos[None, :]
        a1 = dot(vi, u_ax[None, :], False) / jnp.maximum(
            jnp.sum(u_ax * u_ax), 1e-12
        )
        a2 = dot(vi, v_ax[None, :], False) / jnp.maximum(
            jnp.sum(v_ax * v_ax), 1e-12
        )
        if ltype == LightType.RECT:
            inside = (jnp.abs(a1) <= 0.5) & (jnp.abs(a2) <= 0.5)
        else:
            inside = jnp.sqrt(a1 * a1 + a2 * a2) <= 0.5
        blocked = blocked | (hit & inside)
    return blocked
