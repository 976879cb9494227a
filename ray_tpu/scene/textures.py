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

``add(..., compress=...)`` stores compressed 4×4 blocks — the analogue
of the reference's automatic BC compression + RGBE conversion family
(internal/TextureUtils.h:86-92, use_tex_compression):

* ``"bc1"`` (or ``True``): two RGB endpoints + 16 × 2-bit diagonal
  indices (8 f32 per 16 texels, 8× smaller than raw RGBA f32);
* ``"bc4"``: single-channel, two scalar endpoints + 16 × 3-bit indices
  (roughness/metallic maps);
* ``"bc5"``: dual-channel (two BC4 payloads in one row — normal-map XY,
  z reconstructed by apply_normal_map like TEX_RECONSTRUCT_Z_BIT);
* ``"rgbe"``: shared-exponent HDR, one packed RGBE word per texel
  (4× smaller than RGBA f32) with the reference's rgb_to_rgbe
  quantization (SceneCommon.cpp:7-17) — env-map storage.

Decode is a few fused ALU ops per tap; compressed textures are not
differentiable (gradients need the raw path).
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
    rgbe: list = dataclasses.field(default_factory=list)
    _offset: int = 0
    _boffset: int = 0
    _roffset: int = 0

    def add(self, image: np.ndarray, srgb: bool = False,
            generate_mips: bool = True, compress=False) -> int:
        """Add an image (H, W, C float in [0,1] or uint8); returns texture
        id.  ``compress``: False | "bc1"/True | "bc4" | "bc5" | "rgbe"
        (module docstring)."""
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
        fmt_code = {False: 0, True: 1, "bc1": 1, "bc4": 2, "bc5": 3,
                    "rgbe": 4}[compress]
        for m in mips:
            h, w = m.shape[:2]
            if fmt_code == 4:
                words = _encode_rgbe(m)  # (h*w,) f32-bitcast words
                self.records.append(
                    (self._offset, w, h, 4, self._roffset, 0))
                self.rgbe.append(words)
                self._roffset += w * h
                self.blocks.append(None)
                self.texels.append(np.zeros((1, 4), np.float32))
                self._offset += 1
            elif fmt_code:
                if fmt_code == 1:
                    blk, bw, bh = _encode_blocks(m)
                elif fmt_code == 2:
                    blk, bw, bh = _encode_blocks_bc4(m[..., 0])
                else:
                    blk, bw, bh = _encode_blocks_bc5(m)
                self.records.append(
                    (self._offset, w, h, fmt_code, self._boffset, bw))
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
        if fmt in (1, 2, 3):
            return _decode_blocks_np(self.blocks[rec], w, h, fmt)
        if fmt == 4:
            # rgbe blobs are stored in add() order; find this record's blob
            k = sum(1 for r in self.records[:rec] if r[3] == 4)
            return _decode_rgbe_np(self.rgbe[k], w, h)
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
        if self.rgbe:
            out["rgbe_t"] = np.concatenate(self.rgbe)[None, :]
        return out


BLOCK_COLS = 8  # uniform block-row width across BC1/BC4/BC5


def _block_tiles(img2d: np.ndarray):
    """(H, W) or (H, W, C) → (bh*bw, 16[, C]) 4×4 tiles with edge-replicated
    padding so partial blocks don't skew endpoints."""
    h, w = img2d.shape[:2]
    bw, bh = (w + 3) // 4, (h + 3) // 4
    shape = (bh * 4, bw * 4) + img2d.shape[2:]
    padded = np.zeros(shape, np.float32)
    padded[:h, :w] = img2d
    if h < bh * 4:
        padded[h:, :w] = padded[h - 1:h, :w]
    if w < bw * 4:
        padded[:, w:] = padded[:, w - 1:w]
    if img2d.ndim == 2:
        tiles = padded.reshape(bh, 4, bw, 4).transpose(0, 2, 1, 3)
        return tiles.reshape(bh * bw, 16), bw, bh
    c = img2d.shape[2]
    tiles = padded.reshape(bh, 4, bw, 4, c).transpose(0, 2, 1, 3, 4)
    return tiles.reshape(bh * bw, 16, c), bw, bh


def _encode_blocks(img: np.ndarray):
    """BC1-style encode of (H, W, 4) → (bw*bh, 8) f32 block rows:
    [min_rgb(3) | max_rgb(3) | idx_word bitcast | 0].  Each texel stores a
    2-bit position along the min→max diagonal (vectorized numpy)."""
    blocks, bw, bh = _block_tiles(img[..., :3])
    cmin = blocks.min(axis=1)
    cmax = blocks.max(axis=1)
    axis = cmax - cmin
    denom = np.maximum((axis * axis).sum(axis=1, keepdims=True), 1e-12)
    t = ((blocks - cmin[:, None]) * axis[:, None]).sum(axis=2) / denom
    q = np.clip(np.round(t * 3.0), 0, 3).astype(np.uint32)       # (B, 16)
    word = np.zeros(blocks.shape[0], np.uint32)
    for k in range(16):
        word |= q[:, k] << np.uint32(2 * k)
    pad = np.zeros((blocks.shape[0], 1), np.float32)
    return (
        np.concatenate(
            [cmin, cmax, word[:, None].view(np.float32), pad], axis=1
        ).astype(np.float32),
        bw, bh,
    )


def _bc4_payload(chan_tiles: np.ndarray):
    """(B, 16) channel tiles → (e0, e1, word_lo, word_hi): two scalar
    endpoints + 16 × 3-bit indices split over two u32 words (texels 0-9 /
    10-15), the BC4 scheme (TextureUtils.h:89) in f32 block rows."""
    e0 = chan_tiles.min(axis=1)
    e1 = chan_tiles.max(axis=1)
    denom = np.maximum(e1 - e0, 1e-12)
    q = np.clip(
        np.round((chan_tiles - e0[:, None]) / denom[:, None] * 7.0), 0, 7
    ).astype(np.uint32)
    lo = np.zeros(chan_tiles.shape[0], np.uint32)
    hi = np.zeros(chan_tiles.shape[0], np.uint32)
    for k in range(10):
        lo |= q[:, k] << np.uint32(3 * k)
    for k in range(10, 16):
        hi |= q[:, k] << np.uint32(3 * (k - 10))
    return e0, e1, lo.view(np.float32), hi.view(np.float32)


def _encode_blocks_bc4(chan: np.ndarray):
    """Single-channel BC4: rows [e0, e1, w_lo, w_hi, 0, 0, 0, 0]."""
    tiles, bw, bh = _block_tiles(chan)
    e0, e1, lo, hi = _bc4_payload(tiles)
    z = np.zeros_like(e0)
    return (
        np.stack([e0, e1, lo, hi, z, z, z, z], axis=1).astype(np.float32),
        bw, bh,
    )


def _encode_blocks_bc5(img: np.ndarray):
    """Dual-channel BC5 (two BC4 payloads — normal-map XY):
    rows [e0x, e1x, wx_lo, wx_hi, e0y, e1y, wy_lo, wy_hi]."""
    tx, bw, bh = _block_tiles(img[..., 0])
    ty, _, _ = _block_tiles(img[..., 1])
    e0x, e1x, lx, hx = _bc4_payload(tx)
    e0y, e1y, ly, hy = _bc4_payload(ty)
    return (
        np.stack([e0x, e1x, lx, hx, e0y, e1y, ly, hy], axis=1).astype(
            np.float32),
        bw, bh,
    )


def _encode_rgbe(img: np.ndarray) -> np.ndarray:
    """(H, W, 4) → (H*W,) f32-bitcast packed RGBE words using the
    reference's quantization (rgb_to_rgbe, SceneCommon.cpp:7-17):
    mantissas = rgb * frexp(max)/max * 256, exponent biased by 128."""
    rgb = np.maximum(img[..., :3].reshape(-1, 3), 0.0)
    mx = rgb.max(axis=1)
    m, e = np.frexp(mx)
    factor = np.where(mx >= 1e-32, m * 256.0 / np.maximum(mx, 1e-32), 0.0)
    q = np.clip(rgb * factor[:, None], 0.0, 255.0).astype(np.uint32)
    eq = np.where(mx >= 1e-32, e + 128, 0).astype(np.uint32)
    word = q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16) | (eq << 24)
    return word.view(np.float32)


def _decode_rgbe_np(words: np.ndarray, w: int, h: int) -> np.ndarray:
    u = words.view(np.uint32)
    r = (u & 255).astype(np.float32)
    g = ((u >> 8) & 255).astype(np.float32)
    b = ((u >> 16) & 255).astype(np.float32)
    e = ((u >> 24) & 255).astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 128 - 8), 0.0).astype(
        np.float32)
    out = np.ones((h * w, 4), np.float32)
    out[:, 0] = r * scale
    out[:, 1] = g * scale
    out[:, 2] = b * scale
    return out.reshape(h, w, 4)


def _decode_blocks_np(blk: np.ndarray, w: int, h: int,
                      fmt: int = 1) -> np.ndarray:
    """Inverse of the block encoders (host-side, for get_image/tests)."""
    bw = (w + 3) // 4
    out = np.ones((h, w, 4), np.float32)
    if fmt == 1:
        cmin, cmax = blk[:, 0:3], blk[:, 3:6]
        word = np.ascontiguousarray(blk[:, 6]).view(np.uint32)
        for y in range(h):
            for x in range(w):
                b = (y // 4) * bw + (x // 4)
                sub = (y % 4) * 4 + (x % 4)
                t = ((word[b] >> np.uint32(2 * sub)) & 3) / 3.0
                out[y, x, :3] = cmin[b] + (cmax[b] - cmin[b]) * t
        return out

    def bc4_at(cols, b, sub):
        e0, e1 = blk[b, cols], blk[b, cols + 1]
        lo = np.ascontiguousarray(blk[:, cols + 2]).view(np.uint32)[b]
        hi = np.ascontiguousarray(blk[:, cols + 3]).view(np.uint32)[b]
        q = (lo >> np.uint32(3 * sub)) & 7 if sub < 10 else (
            (hi >> np.uint32(3 * (sub - 10))) & 7)
        return e0 + (e1 - e0) * (q / 7.0)

    for y in range(h):
        for x in range(w):
            b = (y // 4) * bw + (x // 4)
            sub = (y % 4) * 4 + (x % 4)
            v = bc4_at(0, b, sub)
            if fmt == 2:
                out[y, x, :3] = v
            else:
                out[y, x, 0] = v
                out[y, x, 1] = bc4_at(4, b, sub)
                out[y, x, 2] = 0.5
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
    from ray_tpu.ops.gather import read_packed as _rp

    safe_id = jnp.maximum(tex_id, 0)
    compressed = "blocks_t" in tex  # static: any compressed texture packed
    has_rgbe = "rgbe_t" in tex      # static: any RGBE texture packed
    # record-table reads batched into single packed reads (one-hot matmul
    # for <=128 records): separate [] gathers cost ~2-3 ms per instruction
    # inside the bounce scan (r5 profile)
    if lod is None:
        rec = _rp([tex["tex_mip0"]], safe_id)[0]
    else:
        mip0, nmips = _rp([tex["tex_mip0"], tex["tex_mips"]], safe_id)
        lvl = jnp.clip(lod.astype(jnp.int32), 0, nmips - 1)
        rec = mip0 + lvl
    # tex_offset/tex_boff are texel-linear offsets that can exceed 2^24,
    # where the f32 packing of read_packed loses exactness — keep them as
    # direct integer gathers; the small-valued columns share one packed read
    off = jnp.take(tex["tex_offset"], rec)
    if compressed or has_rgbe:
        boff = jnp.take(tex["tex_boff"], rec)
        w, h, fmt, bw = _rp(
            [tex["tex_w"], tex["tex_h"], tex["tex_fmt"], tex["tex_bw"]], rec)
    else:
        w, h = _rp([tex["tex_w"], tex["tex_h"]], rec)

    u = uv[..., 0] * w.astype(jnp.float32) - 0.5
    v = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fu = u - x0
    fv = v - y0

    P1 = {"w": w, "h": h, "off": off}
    if compressed or has_rgbe:
        P1.update(fmt=fmt, boff=boff, bw=bw)

    def texel(xi, yi, P=P1):
        """One tap as (4, L) — minor-axis take keeps the texel table in its
        (4, N) transposed layout.  ``P``: per-lane address arrays, tiled
        when several taps are batched into one call — on TPU the gather
        *instruction* cost (per index list, ~2-3 ms at 518k lanes inside
        the bounce scan) dominates over byte volume, so the bilinear
        quad is fetched by ONE take of 4R indices, not four takes (r5
        profile: each extra take fusion cost ~20 ms per bounce)."""
        w, h, off = P["w"], P["h"], P["off"]
        if compressed or has_rgbe:
            fmt, boff, bw = P["fmt"], P["boff"], P["bw"]
        xi = jnp.mod(xi.astype(jnp.int32), w)
        yi = jnp.mod(yi.astype(jnp.int32), h)
        raw = jnp.take(tex["texels_t"], off + yi * w + xi, axis=1)
        if not (compressed or has_rgbe):
            return raw
        out = raw
        if compressed:
            blk = jnp.take(
                tex["blocks_t"], boff + (yi >> 2) * bw + (xi >> 2), axis=1
            )
            sub = (yi & 3) * 4 + (xi & 3)
            ones = jnp.ones_like(blk[0])[None, :]
            # BC1: block row → lerp RGB endpoints by the 2-bit index
            word = jax.lax.bitcast_convert_type(blk[6], jnp.int32)
            t = ((word >> (2 * sub)) & 3).astype(jnp.float32) * (1.0 / 3.0)
            rgb = blk[0:3] + (blk[3:6] - blk[0:3]) * t[None, :]
            bc1 = jnp.concatenate([rgb, ones], axis=0)
            out = jnp.where(fmt[None, :] == 1, bc1, out)

            # BC4/BC5: 3-bit indices over two words per channel
            def bc4(cols):
                lo = jax.lax.bitcast_convert_type(blk[cols + 2], jnp.int32)
                hi = jax.lax.bitcast_convert_type(blk[cols + 3], jnp.int32)
                q = jnp.where(
                    sub < 10,
                    (lo >> (3 * sub)) & 7,
                    (hi >> (3 * (sub - 10))) & 7,
                ).astype(jnp.float32) * (1.0 / 7.0)
                return blk[cols] + (blk[cols + 1] - blk[cols]) * q

            v0 = bc4(0)[None, :]
            bc4_dec = jnp.concatenate([v0, v0, v0, ones], axis=0)
            out = jnp.where(fmt[None, :] == 2, bc4_dec, out)
            v1 = bc4(4)[None, :]
            bc5_dec = jnp.concatenate(
                [v0, v1, 0.5 * ones, ones], axis=0)
            out = jnp.where(fmt[None, :] == 3, bc5_dec, out)
        if has_rgbe:
            # shared-exponent HDR decode (rgbe_to_rgb: rgb · 2^(e-136))
            word = jax.lax.bitcast_convert_type(
                jnp.take(tex["rgbe_t"][0], boff + yi * w + xi), jnp.int32
            )
            e = (word >> 24) & 255
            scale = jnp.where(
                e > 0,
                jnp.exp2((e - 136).astype(jnp.float32)),
                0.0,
            )
            rgbe = jnp.stack([
                ((word >> 0) & 255).astype(jnp.float32) * scale,
                ((word >> 8) & 255).astype(jnp.float32) * scale,
                ((word >> 16) & 255).astype(jnp.float32) * scale,
                jnp.ones_like(scale),
            ], axis=0)
            out = jnp.where(fmt[None, :] == 4, rgbe, out)
        return out

    if rand is not None:
        # stochastic single tap (expectation == the 4-tap filter below)
        out = texel(jnp.floor(u + rand[..., 0]), jnp.floor(v + rand[..., 1]))
    else:
        R0 = u.shape[0]
        P4 = {k: jnp.tile(v, 4) for k, v in P1.items()}
        xs = jnp.concatenate([x0, x0 + 1, x0, x0 + 1])
        ys = jnp.concatenate([y0, y0, y0 + 1, y0 + 1])
        quad = texel(xs, ys, P4).reshape(4, 4, R0)
        c00, c10, c01, c11 = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
        out = (
            c00 * (1 - fu) * (1 - fv)
            + c10 * fu * (1 - fv)
            + c01 * (1 - fu) * fv
            + c11 * fu * fv
        )
    out = jnp.where(tex_id[None, :] >= 0, out, jnp.ones_like(out))
    return out.T
