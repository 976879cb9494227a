"""Texture subsystem: host-side packing + device-side sampling.

The reference maintains paged atlases with BC-compressed storage and
Morton-swizzled CPU storages (internal/TextureStorageCPU.h, SceneGPU.h:77).
On TPU the idiomatic equivalent is far simpler: all textures live in one flat
texel buffer in HBM with per-texture (offset, width, height) records, and
sampling is a vectorized gather of the four bilinear taps.  Mip chains are
concatenated in the same buffer (offset per level), built host-side with a
2×2 box filter like the reference's mip generation (internal/TextureUtils.cpp).

Texels are stored as float32 RGBA so texture contents are first-class
differentiable parameters (a core goal — texture gradients are one of the
BASELINE configs).  sRGB inputs are linearized at pack time.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

NUM_MIP_LEVELS = 12  # reference internal/Constants.inl:92


def _srgb_to_linear_np(c):
    return np.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _downsample2x(img: np.ndarray) -> np.ndarray:
    h, w, c = img.shape
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    img = img[: nh * 2, : nw * 2]
    if h >= 2 and w >= 2:
        return 0.25 * (
            img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
        )
    if h >= 2:
        return 0.5 * (img[0::2] + img[1::2])
    if w >= 2:
        return 0.5 * (img[:, 0::2] + img[:, 1::2])
    return img


@dataclasses.dataclass
class TexturePacker:
    """Accumulates textures; ``pack()`` emits the flat buffer + records."""

    texels: list = dataclasses.field(default_factory=list)
    records: list = dataclasses.field(default_factory=list)  # (offset, w, h) per (tex, mip)
    num_mips: list = dataclasses.field(default_factory=list)
    _offset: int = 0

    def add(self, image: np.ndarray, srgb: bool = False, generate_mips: bool = True) -> int:
        """Add an image (H, W, C float in [0,1] or uint8); returns texture id."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] < 4:
            pad = np.ones(img.shape[:2] + (4 - img.shape[2],), np.float32)
            img = np.concatenate([img, pad], axis=2)
        if srgb:
            img = np.concatenate(
                [_srgb_to_linear_np(img[..., :3]), img[..., 3:4]], axis=2
            )
        tex_id = len(self.num_mips)
        mips = [img]
        if generate_mips:
            while mips[-1].shape[0] > 1 or mips[-1].shape[1] > 1:
                if len(mips) >= NUM_MIP_LEVELS:
                    break
                mips.append(_downsample2x(mips[-1]))
        for m in mips:
            h, w = m.shape[:2]
            self.records.append((self._offset, w, h))
            self.texels.append(m.reshape(-1, 4))
            self._offset += w * h
        self.num_mips.append(len(mips))
        return tex_id

    def get_image(self, tex_id: int, mip: int = 0) -> "np.ndarray":
        """Reconstruct a mip level as (H, W, 4) — used by finalize to build
        env importance tables before device upload."""
        rec = int(np.cumsum([0] + self.num_mips[:-1])[tex_id]) + mip
        off, w, h = self.records[rec]
        # records store (offset, w, h); texels list is per-record
        return self.texels[rec].reshape(h, w, 4)

    def pack(self) -> dict:
        """Returns numpy dict: ``texels`` (N,4), ``tex_offset``/``tex_w``/
        ``tex_h`` indexed by mip-record id, ``tex_mip0``/``tex_mips`` indexed
        by texture id."""
        if not self.texels:
            texels = np.zeros((1, 4), np.float32)
            records = [(0, 1, 1)]
            mip0, nmips = [0], [1]
        else:
            texels = np.concatenate(self.texels, axis=0).astype(np.float32)
            records = self.records
            mip0 = np.cumsum([0] + self.num_mips[:-1]).tolist()
            nmips = self.num_mips
        rec = np.asarray(records, np.int64)
        return {
            "texels": texels,
            "tex_offset": rec[:, 0].astype(np.int32),
            "tex_w": rec[:, 1].astype(np.int32),
            "tex_h": rec[:, 2].astype(np.int32),
            "tex_mip0": np.asarray(mip0, np.int32),
            "tex_mips": np.asarray(nmips, np.int32),
        }


def texture_lod(tex, tex_id, lam):
    """Per-texture mip level from the ray-cone LOD λ (reference
    get_texture_lod, internal/CoreRef.cpp:2838): the cone footprint term λ
    plus 0.5·log2(w·h) for this texture's resolution, minus 1 so bilinear
    interpolation always has 4 texels."""
    import jax

    safe_id = jnp.maximum(tex_id, 0)
    mip0 = tex["tex_mip0"][safe_id]
    w = tex["tex_w"][mip0].astype(jnp.float32)
    h = tex["tex_h"][mip0].astype(jnp.float32)
    lod = lam + 0.5 * jnp.log2(jnp.maximum(w * h, 1.0)) - 1.0
    lod = jnp.clip(lod, 0.0, (tex["tex_mips"][safe_id] - 1).astype(jnp.float32))
    return jax.lax.stop_gradient(lod)


def sample_bilinear(tex, tex_id, uv, lod=None):
    """Bilinear texture fetch, vectorized over rays.

    Args:
      tex: the packed texture dict (jnp arrays).
      tex_id: (R,) i32 texture ids (values < 0 return white).
      uv: (R, 2) f32, wrap-around addressing like the reference's default
          sampler (internal/TextureStorageCPU.h fetch with repeat).
      lod: (R,) f32 mip level or None for level 0.

    Returns (R, 4) f32 RGBA.  Differentiable w.r.t. ``tex['texels']``.
    """
    safe_id = jnp.maximum(tex_id, 0)
    mip0 = tex["tex_mip0"][safe_id]
    if lod is None:
        rec = mip0
    else:
        nmips = tex["tex_mips"][safe_id]
        lvl = jnp.clip(lod.astype(jnp.int32), 0, nmips - 1)
        rec = mip0 + lvl
    off = tex["tex_offset"][rec]
    w = tex["tex_w"][rec]
    h = tex["tex_h"][rec]

    u = uv[..., 0] * w.astype(jnp.float32) - 0.5
    v = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fu = (u - x0)[..., None]
    fv = (v - y0)[..., None]

    def texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), w)
        yi = jnp.mod(yi.astype(jnp.int32), h)
        return tex["texels"][off + yi * w + xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    out = (
        c00 * (1 - fu) * (1 - fv)
        + c10 * fu * (1 - fv)
        + c01 * (1 - fu) * fv
        + c11 * fu * fv
    )
    return jnp.where((tex_id >= 0)[..., None], out, jnp.ones_like(out))
