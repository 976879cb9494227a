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

Storage layouts are transposed — texels (4, N), block table (7, B) — so
fetches gather along the minor axis: a (R, 4) row gather pads its minor
dim to 128 lanes (32× traffic); ``take(..., axis=1)`` produces unpadded
(4, R) taps.

``add(..., compress=True)`` stores BC1-style 4×4 blocks — per block two
RGB endpoints + 16 × 2-bit indices along the endpoint diagonal (7 f32
per 16 texels ≈ 9× smaller than raw RGBA f32) — the analogue of the
reference's automatic BC compression (internal/TextureUtils.h:86,
use_tex_compression).  Decode is three fused ALU ops per tap; compressed
textures are not differentiable (gradients need the raw path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NUM_MIP_LEVELS = 12  # reference internal/Constants.inl:92
ANISO_TAPS = 4       # taps along the footprint's major axis (aniso filter)


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
    records: list = dataclasses.field(default_factory=list)  # (offset, w, h, fmt, boff, bw) per (tex, mip)
    num_mips: list = dataclasses.field(default_factory=list)
    blocks: list = dataclasses.field(default_factory=list)
    _offset: int = 0
    _boffset: int = 0

    def add(self, image: np.ndarray, srgb: bool = False,
            generate_mips: bool = True, compress: bool = False) -> int:
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
            if compress:
                blk, bw, bh = _encode_blocks(m)
                self.records.append((self._offset, w, h, 1, self._boffset, bw))
                self.blocks.append(blk)
                self._boffset += bw * bh
                # 1-texel raw placeholder keeps the raw offsets valid
                self.texels.append(np.zeros((1, 4), np.float32))
                self._offset += 1
            else:
                self.records.append((self._offset, w, h, 0, 0, 0))
                self.blocks.append(None)
                self.texels.append(m.reshape(-1, 4))
                self._offset += w * h
        self.num_mips.append(len(mips))
        return tex_id

    def get_image(self, tex_id: int, mip: int = 0) -> "np.ndarray":
        """Reconstruct a mip level as (H, W, 4) — used by finalize to build
        env importance tables before device upload."""
        rec = int(np.cumsum([0] + self.num_mips[:-1])[tex_id]) + mip
        off, w, h, fmt, boff, bw = self.records[rec]
        if fmt == 1:
            return _decode_blocks_np(self.blocks[rec], w, h)
        return self.texels[rec].reshape(h, w, 4)

    def pack(self) -> dict:
        """Returns numpy dict: transposed texel table ``texels_t`` (4, N),
        ``tex_offset``/``tex_w``/``tex_h``/``tex_fmt``/``tex_boff``/
        ``tex_bw`` indexed by mip-record id, ``tex_mip0``/``tex_mips``
        indexed by texture id, and — only when any texture is compressed —
        ``blocks_t`` (7, B) (key presence is the static dispatch flag)."""
        if not self.texels:
            texels = np.zeros((1, 4), np.float32)
            records = [(0, 1, 1, 0, 0, 0)]
            mip0, nmips = [0], [1]
        else:
            texels = np.concatenate(self.texels, axis=0).astype(np.float32)
            records = self.records
            mip0 = np.cumsum([0] + self.num_mips[:-1]).tolist()
            nmips = self.num_mips
        rec = np.asarray(records, np.int64)
        out = {
            "texels_t": np.ascontiguousarray(texels.T),
            "tex_offset": rec[:, 0].astype(np.int32),
            "tex_w": rec[:, 1].astype(np.int32),
            "tex_h": rec[:, 2].astype(np.int32),
            "tex_fmt": rec[:, 3].astype(np.int32),
            "tex_boff": rec[:, 4].astype(np.int32),
            "tex_bw": rec[:, 5].astype(np.int32),
            "tex_mip0": np.asarray(mip0, np.int32),
            "tex_mips": np.asarray(nmips, np.int32),
        }
        used = [b for b in self.blocks if b is not None]
        if used:
            blocks = np.concatenate(used, axis=0)
            out["blocks_t"] = np.ascontiguousarray(blocks.T)
        return out


def _encode_blocks(img: np.ndarray):
    """BC1-style encode of (H, W, 4) → (bw*bh, 7) f32 block rows:
    [min_rgb(3) | max_rgb(3) | idx_word bitcast].  Each texel stores a
    2-bit position along the min→max diagonal (vectorized numpy)."""
    h, w = img.shape[:2]
    bw, bh = (w + 3) // 4, (h + 3) // 4
    padded = np.zeros((bh * 4, bw * 4, 3), np.float32)
    padded[:h, :w] = img[..., :3]
    # replicate edges into the padding so they don't skew endpoints
    if h < bh * 4:
        padded[h:, :w] = padded[h - 1:h, :w]
    if w < bw * 4:
        padded[:, w:] = padded[:, w - 1:w]
    blocks = padded.reshape(bh, 4, bw, 4, 3).transpose(0, 2, 1, 3, 4)
    blocks = blocks.reshape(bh * bw, 16, 3)
    cmin = blocks.min(axis=1)
    cmax = blocks.max(axis=1)
    axis = cmax - cmin
    denom = np.maximum((axis * axis).sum(axis=1, keepdims=True), 1e-12)
    t = ((blocks - cmin[:, None]) * axis[:, None]).sum(axis=2) / denom
    q = np.clip(np.round(t * 3.0), 0, 3).astype(np.uint32)       # (B, 16)
    word = np.zeros(blocks.shape[0], np.uint32)
    for k in range(16):
        word |= q[:, k] << np.uint32(2 * k)
    return (
        np.concatenate(
            [cmin, cmax, word[:, None].view(np.float32)], axis=1
        ).astype(np.float32),
        bw, bh,
    )


def _decode_blocks_np(blk: np.ndarray, w: int, h: int) -> np.ndarray:
    """Inverse of _encode_blocks (host-side, for get_image/tests)."""
    bw = (w + 3) // 4
    cmin, cmax = blk[:, 0:3], blk[:, 3:6]
    word = blk[:, 6:7].view(np.uint32)[:, 0]
    out = np.ones((h, w, 4), np.float32)
    for y in range(h):
        for x in range(w):
            b = (y // 4) * bw + (x // 4)
            sub = (y % 4) * 4 + (x % 4)
            t = ((word[b] >> np.uint32(2 * sub)) & 3) / 3.0
            out[y, x, :3] = cmin[b] + (cmax[b] - cmin[b]) * t
    return out


def texture_lod(tex, tex_id, lam):
    """Per-texture mip level from the ray-cone LOD λ (reference
    get_texture_lod, internal/CoreRef.cpp:2838): the cone footprint term λ
    plus 0.5·log2(w·h) for this texture's resolution, minus 1 so bilinear
    interpolation always has 4 texels."""

    safe_id = jnp.maximum(tex_id, 0)
    mip0 = tex["tex_mip0"][safe_id]
    w = tex["tex_w"][mip0].astype(jnp.float32)
    h = tex["tex_h"][mip0].astype(jnp.float32)
    lod = lam + 0.5 * jnp.log2(jnp.maximum(w * h, 1.0)) - 1.0
    lod = jnp.clip(lod, 0.0, (tex["tex_mips"][safe_id] - 1).astype(jnp.float32))
    return jax.lax.stop_gradient(lod)


def sample_bilinear(tex, tex_id, uv, lod=None, rand=None, aniso_duv=None,
                    aniso_rand=None):
    """Texture fetch, vectorized over rays.

    Args:
      tex: the packed texture dict (jnp arrays).
      tex_id: (R,) i32 texture ids (values < 0 return white).
      uv: (R, 2) f32, wrap-around addressing like the reference's default
          sampler (internal/TextureStorageCPU.h fetch with repeat).
      lod: (R,) f32 mip level or None for level 0.
      rand: optional (R, 2) — STOCHASTIC filtering (the reference's
          default, USE_STOCH_TEXTURE_FILTERING, CoreRef.cpp:2870-2875):
          jitter the UV by rand and take ONE nearest tap; expectation
          equals the bilinear filter at a quarter of the gathers.
      aniso_duv: optional (R, 2) UV-space extent of the footprint's major
          axis beyond the isotropic cone width; ANISOTROPIC filtering
          keyed off the ray-cone ellipse (CoreRef.h:465-474's
          SampleAnisotropic): ``ANISO_TAPS`` stratified taps along the
          axis (jitter-offset by ``aniso_rand`` (R,)), each a stochastic
          single-texel fetch — per-sample variance drops ~1/taps, which
          is what makes it beat the isotropic filter at equal spp.

    Returns (R, 4) f32 RGBA.  Differentiable w.r.t. ``tex['texels']``.
    """
    if aniso_duv is not None and aniso_rand is not None:
        outs = []
        for k in range(ANISO_TAPS):
            frac = (k + aniso_rand) / ANISO_TAPS - 0.5
            outs.append(sample_bilinear(
                tex, tex_id, uv + aniso_duv * frac[..., None], lod,
                rand=rand))
        return sum(outs) / ANISO_TAPS
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
    compressed = "blocks_t" in tex  # static: any compressed texture packed
    if compressed:
        fmt = tex["tex_fmt"][rec]
        boff = tex["tex_boff"][rec]
        bw = tex["tex_bw"][rec]

    u = uv[..., 0] * w.astype(jnp.float32) - 0.5
    v = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fu = u - x0
    fv = v - y0

    def texel(xi, yi):
        """One tap as (4, R) — minor-axis take avoids the 32× lane padding
        a (R, 4) row gather would pay (module docstring)."""
        xi = jnp.mod(xi.astype(jnp.int32), w)
        yi = jnp.mod(yi.astype(jnp.int32), h)
        raw = jnp.take(tex["texels_t"], off + yi * w + xi, axis=1)
        if not compressed:
            return raw
        # BC1-style decode: block row → lerp endpoints by the 2-bit index
        blk = jnp.take(
            tex["blocks_t"], boff + (yi >> 2) * bw + (xi >> 2), axis=1
        )
        sub = (yi & 3) * 4 + (xi & 3)
        word = jax.lax.bitcast_convert_type(blk[6], jnp.int32)
        t = ((word >> (2 * sub)) & 3).astype(jnp.float32) * (1.0 / 3.0)
        rgb = blk[0:3] + (blk[3:6] - blk[0:3]) * t[None, :]
        dec = jnp.concatenate([rgb, jnp.ones_like(t)[None, :]], axis=0)
        return jnp.where(fmt[None, :] == 1, dec, raw)

    if rand is not None:
        # stochastic single tap (expectation == the 4-tap filter below)
        out = texel(jnp.floor(u + rand[..., 0]), jnp.floor(v + rand[..., 1]))
    else:
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
    out = jnp.where(tex_id[None, :] >= 0, out, jnp.ones_like(out))
    return out.T
