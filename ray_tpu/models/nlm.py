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


GAUSS_WEIGHTS = (0.2270270270, 0.1945945946, 0.1216216216, 0.0540540541,
                 0.0162162162)


def filter_variance(variance):
    """The driver's variance pre-pass (RendererCPU.h:688-735): 9-tap Gauss
    blur run horizontally then vertically, each pass floored by the center
    value (max-blur, so hot pixels never lose variance)."""
    def pass_1d(v, axis):
        res = v * GAUSS_WEIGHTS[0]
        for i in range(1, 5):
            off = [0, 0]
            off[axis] = i
            res = res + _shift2d(v, *off) * GAUSS_WEIGHTS[i]
            off[axis] = -i
            res = res + _shift2d(v, *off) * GAUSS_WEIGHTS[i]
        return jnp.maximum(res, v)

    return pass_1d(pass_1d(variance, 1), 0)


@partial(jax.jit, static_argnames=("window", "alpha", "damping",
                                   "feature0_weight", "feature1_weight"))
def nlm_denoise(
    color,
    variance,
    base_color=None,
    depth_normal=None,
    window: int = 3,
    alpha: float = 1.0,
    damping: float = 0.45,
    feature0_weight: float = 64.0,
    feature1_weight: float = 32.0,
):
    """Filter ``color`` (H, W, 3) with per-pixel ``variance`` (H, W, 3).

    Reference-exact JointNLMFilter (internal/DenoiseRef.cpp:10-90,
    driver parameters RendererCPU.h:766: 7×7 window, 3×3 patches,
    alpha=1.0, damping=0.45, feature weights 64/32):
      patch distance = 0.25·N²·Σ_patch Σ_ch ((Δc)² − α(v_i + min(v_i,v_j)))
                       / (1e-4 + damping²(v_i + v_j)),
      w = exp(−max(0, pd)),
      feature distance = 0.25·Σ_ch max(w0·Δbase², w1·Δdn²),
      w = min(w, exp(−max(0, min(1e4, fd)))).
    """
    k2 = damping * damping

    accum = jnp.zeros_like(color)
    wsum = jnp.zeros(color.shape[:2] + (1,), color.dtype)
    n_patch = 9.0  # 3×3

    if base_color is not None and depth_normal is not None:
        # channel-align the two 4-vec features (reference color_rgba_t):
        # base color rgb + constant alpha (Δ = 0), depth-normal xyz + depth
        f0 = jnp.concatenate(
            [base_color, jnp.zeros_like(base_color[..., :1])], axis=-1)
        f1 = depth_normal
    else:
        f0 = f1 = None

    for dy in range(-window, window + 1):
        for dx in range(-window, window + 1):
            c_s = _shift2d(color, dy, dx)
            v_s = _shift2d(variance, dy, dx)
            d2 = (color - c_s) ** 2 - alpha * (
                variance + jnp.minimum(variance, v_s))
            d2 = d2 / (1e-4 + k2 * (variance + v_s))
            pd = 0.25 * n_patch * jnp.sum(
                _box3(d2), axis=-1, keepdims=True)
            w = jnp.exp(-jnp.maximum(0.0, pd))

            if f0 is not None:
                fd = jnp.maximum(
                    feature0_weight * (f0 - _shift2d(f0, dy, dx)) ** 2,
                    feature1_weight * (f1 - _shift2d(f1, dy, dx)) ** 2,
                )
                fpd = 0.25 * jnp.sum(fd, axis=-1, keepdims=True)
                fw = jnp.exp(-jnp.maximum(0.0, jnp.minimum(1e4, fpd)))
                w = jnp.minimum(w, fw)

            accum = accum + w * c_s
            wsum = wsum + w

    return accum / jnp.maximum(wsum, 1e-12)
