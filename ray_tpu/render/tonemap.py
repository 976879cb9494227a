"""Tonemapping / view transforms.

Reference set (Types.h:70 ``eViewTransform``): Standard (sRGB), AgX and
Filmic curve families via baked 48³ LUTs (internal/TonemapRef.cpp).  Here the
curves are implemented analytically (public formulas) instead of LUT baking —
cheaper on TPU (pure VPU math beats 3-D gather) and exactly differentiable.
Also provides the reversible tonemap used for variance estimation / denoising
space (internal/TonemapRef.h:7-13).
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.linalg import linear_to_srgb


class ViewTransform:
    """Full eViewTransform set (reference Types.h:70-83).  The reference
    bakes each curve to a 48³ OCIO LUT (internal/TonemapRef.cpp, LUTs from
    scripts/gen_tonemap_luts.py); here AgX is the published analytic AgX
    pipeline and the Filmic contrast family is the filmic-blender log
    encoding + a per-look contrast S-curve — analytic equivalents, cheaper
    on TPU (pure VPU math, no 3-D gather) and exactly differentiable."""

    STANDARD = 0
    AGX = 1
    AGX_PUNCHY = 2
    FILMIC_VERY_LOW_CONTRAST = 3
    FILMIC_LOW_CONTRAST = 4
    FILMIC_MED_LOW_CONTRAST = 5
    FILMIC_MED_CONTRAST = 6
    FILMIC_MED_HIGH_CONTRAST = 7
    FILMIC_HIGH_CONTRAST = 8
    FILMIC_VERY_HIGH_CONTRAST = 9


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


def tonemap_agx_punchy(c):
    """AgX + the 'punchy' look: ASC-CDL power 1.35 and saturation 1.4
    applied in the AgX output space (Blender's AgX Punchy look)."""
    v = tonemap_agx(c)
    v = jnp.power(jnp.maximum(v, 0.0), 1.35)
    luma = jnp.sum(
        v * jnp.array([0.2126, 0.7152, 0.0722], v.dtype), axis=-1,
        keepdims=True,
    )
    return jnp.clip(luma + 1.4 * (v - luma), 0.0, 1.0)


# filmic-blender dynamic range: 16.5 stops, middle grey 0.18 at log 0.7558
_FILMIC_LOG_MIN = -12.473931188
_FILMIC_LOG_MAX = 4.026068812


def _filmic_log_encode(c):
    """Troy Sobotka's filmic-blender 'Log' base encoding: log2 of scene
    exposure normalized over the 16.5-stop window, with a slight desaturate
    toward the top to mimic film's highlight bleach."""
    x = jnp.maximum(c, 1e-10)
    lg = (jnp.log2(x / 0.18) - _FILMIC_LOG_MIN) / (
        _FILMIC_LOG_MAX - _FILMIC_LOG_MIN
    )
    lg = jnp.clip(lg, 0.0, 1.0)
    # highlight desaturation: blend toward the max channel above knee
    m = jnp.max(lg, axis=-1, keepdims=True)
    t = jnp.clip((m - 0.8) / 0.2, 0.0, 1.0) ** 2
    return lg + t * (m - lg) * 0.6


# per-look contrast strengths for the 7 Filmic looks (Very Low → Very High),
# applied as an S-curve around the filmic-log middle grey pivot
_FILMIC_CONTRAST = {
    3: 0.6, 4: 0.75, 5: 0.9, 6: 1.0, 7: 1.2, 8: 1.45, 9: 1.8,
}


def _contrast_s_curve(x, strength):
    """Smooth S-curve around the middle-grey pivot: identity at
    strength = 1, flatter below, steeper above."""
    pivot = 0.7558  # filmic-log value of 0.18 middle grey
    lo = x / pivot
    hi = (x - pivot) / (1.0 - pivot)
    below = pivot * jnp.power(jnp.maximum(lo, 1e-8), strength)
    above = pivot + (1.0 - pivot) * (
        1.0 - jnp.power(jnp.maximum(1.0 - hi, 1e-8), strength)
    )
    return jnp.where(x < pivot, below, above)


def tonemap_filmic(c, contrast: float = 1.0):
    """Filmic view transform: filmic-log encode + per-look contrast curve,
    output sRGB-encoded (analytic stand-in for the reference's 7 baked
    Filmic_*Contrast LUTs, internal/precomputed/__filmic_*.inl)."""
    lg = _filmic_log_encode(c)
    out = _contrast_s_curve(jnp.clip(lg, 0.0, 1.0), contrast)
    return jnp.clip(out, 0.0, 1.0)


# --- baked 48^3 view-transform LUTs (reference parity path) ---------------
#
# The reference applies AgX/Filmic via OCIO-baked 48^3 LUTs with trilinear
# interpolation over a c/(c+1) encoding (internal/TonemapRef.cpp
# TonemapFilmic; entries packed 10/10/10/2-bit).  The packed words are
# extracted verbatim by tools/golden/parse_tonemap_luts.py — that is the
# exact transform the golden images were rendered with, so the LUT path is
# the default for parity.  The analytic curves above remain available
# (use_lut=False) as a data-free, unbounded-domain differentiable fallback.

_LUT_DIMS = 48
_LUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "tonemap_luts.npz",
)
_LUT_KEYS = {
    ViewTransform.AGX: "agx",
    ViewTransform.AGX_PUNCHY: "agx_punchy",
    ViewTransform.FILMIC_VERY_LOW_CONTRAST: "filmic_very_low_contrast",
    ViewTransform.FILMIC_LOW_CONTRAST: "filmic_low_contrast",
    ViewTransform.FILMIC_MED_LOW_CONTRAST: "filmic_med_low_contrast",
    ViewTransform.FILMIC_MED_CONTRAST: "filmic_med_contrast",
    ViewTransform.FILMIC_MED_HIGH_CONTRAST: "filmic_med_high_contrast",
    ViewTransform.FILMIC_HIGH_CONTRAST: "filmic_high_contrast",
    ViewTransform.FILMIC_VERY_HIGH_CONTRAST: "filmic_very_high_contrast",
}


@functools.lru_cache(maxsize=None)
def _load_lut(view_transform: int):
    """Unpack one LUT to a (48, 48, 48, 3) float32 [z][y][x] table (x <- R),
    matching the reference's 10-bit/channel FetchLUT unpacking.  Returns
    None when the data file is absent (analytic fallback)."""
    if not os.path.exists(_LUT_PATH):
        return None
    key = _LUT_KEYS.get(view_transform)
    if key is None:
        return None
    with np.load(_LUT_PATH) as z:
        packed = z[key].astype(np.uint32)
    rgb = np.stack(
        [(packed >> s) & np.uint32(0x3FF) for s in (0, 10, 20)], axis=-1
    ).astype(np.float32) / 1023.0
    return rgb.reshape(_LUT_DIMS, _LUT_DIMS, _LUT_DIMS, 3)


def tonemap_lut(c, lut):
    """Trilinear 3-D LUT lookup over the c/(c+1) encoding (reference
    TonemapRef.cpp TonemapFilmic).  Differentiable in ``c`` (piecewise
    trilinear).  ``c``: (..., 3) linear RGB; ``lut``: (48,48,48,3)."""
    lut = jnp.asarray(lut)
    enc = c / (c + 1.0)
    uv = jnp.clip(enc, 0.0, 1.0) * (_LUT_DIMS - 1)
    i0 = jnp.clip(uv.astype(jnp.int32), 0, _LUT_DIMS - 1)
    f = uv - i0
    i1 = jnp.minimum(i0 + 1, _LUT_DIMS - 1)
    ix0, iy0, iz0 = i0[..., 0], i0[..., 1], i0[..., 2]
    ix1, iy1, iz1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx = f[..., 0:1]
    fy = f[..., 1:2]
    fz = f[..., 2:3]

    def fetch(iz, iy, ix):
        return lut[iz, iy, ix]

    c00 = fetch(iz0, iy0, ix0) * (1 - fx) + fetch(iz0, iy0, ix1) * fx
    c01 = fetch(iz0, iy1, ix0) * (1 - fx) + fetch(iz0, iy1, ix1) * fx
    c10 = fetch(iz1, iy0, ix0) * (1 - fx) + fetch(iz1, iy0, ix1) * fx
    c11 = fetch(iz1, iy1, ix0) * (1 - fx) + fetch(iz1, iy1, ix1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def apply_view_transform(c, view_transform: int, exposure=0.0, gamma=1.0,
                         use_lut: bool = True):
    c = c * jnp.exp2(exposure)
    lut = _load_lut(view_transform) if use_lut else None
    if lut is not None:
        out = tonemap_lut(c, lut)
    elif view_transform == ViewTransform.AGX:
        out = tonemap_agx(c)
    elif view_transform == ViewTransform.AGX_PUNCHY:
        out = tonemap_agx_punchy(c)
    elif view_transform in _FILMIC_CONTRAST:
        out = tonemap_filmic(c, _FILMIC_CONTRAST[view_transform])
    else:
        out = linear_to_srgb(jnp.clip(c, 0.0, 1.0))
    # camera_desc_t.gamma: pow(c, 1/gamma) after the view transform, then
    # saturate (reference Tonemap, TonemapRef.h:40-46)
    out = jnp.where(
        jnp.asarray(gamma) != 1.0,
        jnp.power(jnp.clip(out, 0.0, 1.0),
                  1.0 / jnp.maximum(jnp.asarray(gamma), 1e-6)),
        out,
    )
    return jnp.clip(out, 0.0, 1.0)
