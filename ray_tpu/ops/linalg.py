"""Vector math helpers shared by every stage.

Vectors are plain ``jnp`` arrays with a trailing dimension of 3 (SoA-friendly:
all ops broadcast over leading wavefront dimensions).  The ``safe_*`` helpers
mirror the reference's numerically defensive math (internal/CoreRef.h:161-206)
and ``offset_ray`` reproduces its self-intersection avoidance bit trick
(internal/CoreRef.h:447, from Wächter & Binder, "A Fast and Robust Method for
Avoiding Self-Intersection", Ray Tracing Gems).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FLT_EPS = 1e-7
HIT_BIAS = 1e-5
MAX_DIST = 3.402823466e30


def dot(a, b, keepdims=True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims=True):
    # 1e-30 floor keeps the sqrt derivative finite at exactly-zero vectors
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 1e-30))


def normalize(v):
    return v / length(v)


def safe_normalize(v):
    l = length(v)
    return jnp.where(l > 0.0, v / jnp.where(l > 0.0, l, 1.0), v)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 1e-30))


def safe_div(a, b):
    return jnp.where(b != 0.0, a / jnp.where(b != 0.0, b, 1.0), jnp.float32(3.4e38))


def safe_div_pos(a, b):
    return a / jnp.maximum(b, FLT_EPS)


def safe_div_neg(a, b):
    return a / jnp.minimum(b, -FLT_EPS)


def safe_invert(v):
    """Per-component 1/v with ±FLT_EPS clamping away from zero, for slab tests."""
    tiny = jnp.where(v >= 0.0, jnp.float32(FLT_EPS), jnp.float32(-FLT_EPS))
    denom = jnp.where(jnp.abs(v) > FLT_EPS, v, tiny)
    return 1.0 / denom


def sqr(x):
    return x * x


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def lum(c):
    """Rec.709 luminance (reference internal/CoreRef.h:399-405)."""
    return (
        0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]
    )


def power_heuristic(a, b):
    """MIS power heuristic β=2 (reference internal/CoreRef.h:423)."""
    t = a * a
    return t / (b * b + t)


def world_from_tangent(T, B, N, v):
    return v[..., 0:1] * T + v[..., 1:2] * B + v[..., 2:3] * N


def tangent_from_world(T, B, N, v):
    return jnp.stack(
        [dot(v, T, False), dot(v, B, False), dot(v, N, False)], axis=-1
    )


def orthonormal_basis(n):
    """Branchless tangent frame from a unit normal (Duff et al., JCGT 2017)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    bt = jnp.stack(
        [b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]],
        axis=-1,
    )
    return t, bt


def offset_ray(p, n):
    """Offset ray origin ``p`` off a surface with normal ``n`` robustly in
    floating point: integer ULP nudging far from the origin, small float
    offset near it (reference internal/CoreRef.h:447-466)."""
    origin = 1.0 / 32.0
    float_scale = 1.0 / 65536.0
    int_scale = 128.0

    of_i = (int_scale * n).astype(jnp.int32)
    p_i_bits = jax.lax.bitcast_convert_type(p, jnp.int32) + jnp.where(
        p < 0.0, -of_i, of_i
    )
    p_i = jax.lax.bitcast_convert_type(p_i_bits, jnp.float32)
    return jnp.where(jnp.abs(p) < origin, p + float_scale * n, p_i)


def srgb_to_linear(c):
    return jnp.where(
        c > 0.04045, jnp.power((jnp.maximum(c, 0.04045) + 0.055) / 1.055, 2.4), c / 12.92
    )


def linear_to_srgb(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c > 0.0031308,
        1.055 * jnp.power(jnp.maximum(c, 0.0031308), 1.0 / 2.4) - 0.055,
        12.92 * c,
    )
