"""Joint non-local-means denoiser.

Equivalent of the reference's NLM filter (internal/DenoiseRef.h:6-10,
DenoiseRef.cpp: 7×7 search window, 3×3 patches, variance-weighted distance,
guided by base-color and depth-normal feature buffers; driver pre-pass
RendererCPU.h:661-787).  TPU formulation: the 49 window offsets unroll into
shifted-array arithmetic — each offset costs one shift, a 3×3 box-filtered
patch distance and a weighted accumulate, all dense VPU work (no gathers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift2d(img, dy, dx):
    """Shift with edge clamp (img: (H, W, C))."""
    H, W = img.shape[:2]
    ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return img[ys][:, xs]


def _box3(img):
    """3×3 box sum via two separable passes."""
    s = _shift2d(img, -1, 0) + img + _shift2d(img, 1, 0)
    return _shift2d(s, 0, -1) + s + _shift2d(s, 0, 1)


@partial(jax.jit, static_argnames=("window", "alpha", "damping"))
def nlm_denoise(
    color,
    variance,
    base_color=None,
    depth_normal=None,
    window: int = 3,
    alpha: float = 0.0,
    damping: float = 0.45,
):
    """Filter ``color`` (H, W, 3) with per-pixel ``variance`` (H, W, 3).

    ``window``: search radius (3 → 7×7 like the reference).
    ``base_color``/``depth_normal``: optional AUX guides; pixels whose
    features differ get their weights suppressed (cross-bilateral factor).
    """
    eps = 1e-5
    k2 = damping * damping

    accum = jnp.zeros_like(color)
    wsum = jnp.zeros(color.shape[:2] + (1,), color.dtype)

    for dy in range(-window, window + 1):
        for dx in range(-window, window + 1):
            c_s = _shift2d(color, dy, dx)
            v_s = _shift2d(variance, dy, dx)
            # symmetric variance-normalized patch distance (Rousselle et al.)
            d2 = (color - c_s) ** 2 - alpha * (variance + jnp.minimum(variance, v_s))
            d2 = d2 / (eps + k2 * (variance + v_s))
            dist = jnp.mean(_box3(d2) / 9.0, axis=-1, keepdims=True)
            w = jnp.exp(-jnp.maximum(0.0, dist))

            if base_color is not None:
                b_s = _shift2d(base_color, dy, dx)
                db = jnp.sum((base_color - b_s) ** 2, axis=-1, keepdims=True)
                w = w * jnp.exp(-db / 0.02)
            if depth_normal is not None:
                n_s = _shift2d(depth_normal, dy, dx)
                dn = jnp.sum(
                    (depth_normal[..., :3] - n_s[..., :3]) ** 2,
                    axis=-1, keepdims=True,
                )
                dz = (depth_normal[..., 3:4] - n_s[..., 3:4]) ** 2
                denom = jnp.maximum(depth_normal[..., 3:4] ** 2, 1e-4)
                w = w * jnp.exp(-dn / 0.2 - dz / denom)

            accum = accum + w * c_s
            wsum = wsum + w

    return accum / jnp.maximum(wsum, 1e-12)
