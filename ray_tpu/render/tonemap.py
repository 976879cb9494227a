"""Tonemapping / view transforms.

Reference set (Types.h:70 ``eViewTransform``): Standard (sRGB), AgX and
Filmic curve families via baked 48³ LUTs (internal/TonemapRef.cpp).  Here the
curves are implemented analytically (public formulas) instead of LUT baking —
cheaper on TPU (pure VPU math beats 3-D gather) and exactly differentiable.
Also provides the reversible tonemap used for variance estimation / denoising
space (internal/TonemapRef.h:7-13).
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tpu.ops.linalg import linear_to_srgb


class ViewTransform:
    STANDARD = 0
    AGX = 1
    FILMIC_MED_CONTRAST = 2


def reversible_tonemap(c):
    """Range-compress for variance/denoise space: c / (1 + max(c))
    (reference TonemapRef.h:7)."""
    m = jnp.max(c[..., :3], axis=-1, keepdims=True)
    return c / (1.0 + m)


def reversible_tonemap_invert(c):
    m = jnp.max(c[..., :3], axis=-1, keepdims=True)
    return c / jnp.maximum(1.0 - m, 1e-6)


def _agx_default_contrast(x):
    """AgX sigmoid polynomial approximation (Benjamin Wrensch / Troy
    Sobotka's AgX, as used in Blender & three.js)."""
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


_AGX_IN = jnp.array(
    [
        [0.842479062253094, 0.0784335999999992, 0.0792237451477643],
        [0.0423282422610123, 0.878468636469772, 0.0791661274605434],
        [0.0423756549057051, 0.0784336, 0.879142973793104],
    ],
    jnp.float32,
)
_AGX_OUT = jnp.array(
    [
        [1.19687900512017, -0.0980208811401368, -0.0990297440797205],
        [-0.0528968517574562, 1.15190312990417, -0.0989611768448433],
        [-0.0529716355144438, -0.0980434501171241, 1.15107367264116],
    ],
    jnp.float32,
)


def tonemap_agx(c):
    """AgX 'base' look (log2 encoding + inset matrix + sigmoid)."""
    min_ev = -12.47393
    max_ev = 4.026069
    v = jnp.einsum("ij,...j->...i", _AGX_IN, jnp.maximum(c, 1e-10))
    v = jnp.clip((jnp.log2(v) - min_ev) / (max_ev - min_ev), 0.0, 1.0)
    v = _agx_default_contrast(v)
    v = jnp.einsum("ij,...j->...i", _AGX_OUT, v)
    return jnp.clip(v, 0.0, 1.0)


def tonemap_filmic(c):
    """Uncharted-2-style filmic curve (Hable), a close analytic stand-in for
    the reference's Filmic/Med-Contrast LUT."""
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    def curve(x):
        return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F
    w = 11.2
    out = curve(jnp.maximum(c, 0.0) * 2.0) / curve(jnp.float32(w))
    return linear_to_srgb(jnp.clip(out, 0.0, 1.0))


def apply_view_transform(c, view_transform: int, exposure=0.0):
    c = c * jnp.exp2(exposure)
    if view_transform == ViewTransform.AGX:
        return tonemap_agx(c)
    if view_transform == ViewTransform.FILMIC_MED_CONTRAST:
        return tonemap_filmic(c)
    return linear_to_srgb(jnp.clip(c, 0.0, 1.0))
