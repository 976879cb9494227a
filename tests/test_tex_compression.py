"""BC1-style block texture compression (reference automatic BC compression,
internal/TextureUtils.h:86-92 + settings_t.use_tex_compression): encode
quality, device decode parity, and render equivalence."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ray_tpu.scene.textures import (
    TexturePacker,
    _decode_blocks_np,
    _encode_blocks,
    sample_bilinear,
)


def _test_image(h=64, w=64):
    rng = np.random.default_rng(2)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([
        0.5 + 0.5 * np.sin(x / 7.0),
        (y / h).astype(np.float64),
        0.3 + 0.2 * rng.random((h, w)),
    ], axis=-1).astype(np.float32)
    return np.concatenate([img, np.ones((h, w, 1), np.float32)], axis=-1)


def test_encode_decode_quality():
    img = _test_image()
    blk, bw, bh = _encode_blocks(img)
    assert blk.shape == (bw * bh, 8)
    dec = _decode_blocks_np(blk, 64, 64)
    err = (dec[..., :3] - img[..., :3]) ** 2
    psnr = 10 * np.log10(1.0 / max(err.mean(), 1e-12))
    assert psnr > 27.0, psnr  # noisy content; BC1-class ≈ 29 dB
    # compression ratio: 8 floats per 16 texels vs 64 floats
    assert blk.size <= img.size / 8  # 8 floats per 16 RGBA-f32 texels


def test_device_decode_matches_host():
    img = _test_image(32, 32)
    p = TexturePacker()
    tid = p.add(img, generate_mips=False, compress=True)
    tex = {k: jnp.asarray(v) for k, v in p.pack().items()}
    assert "blocks_t" in tex

    # fetch each texel center: bilinear at centers = the texel itself
    ys, xs = np.mgrid[0:32, 0:32]
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 32, (ys + 0.5) / 32], -1).reshape(-1, 2),
        jnp.float32,
    )
    ids = jnp.full((uv.shape[0],), tid, jnp.int32)
    out = np.asarray(sample_bilinear(tex, ids, uv)).reshape(32, 32, 4)
    ref = _decode_blocks_np(p.blocks[0], 32, 32)
    np.testing.assert_allclose(out[..., :3], ref[..., :3], atol=1e-6)


def test_mixed_raw_and_compressed():
    imgA = _test_image(16, 16)
    imgB = _test_image(16, 16) * 0.5
    p = TexturePacker()
    ta = p.add(imgA, generate_mips=False, compress=False)
    tb = p.add(imgB, generate_mips=False, compress=True)
    tex = {k: jnp.asarray(v) for k, v in p.pack().items()}
    uv = jnp.asarray([[0.53, 0.47]], jnp.float32)
    a = np.asarray(sample_bilinear(tex, jnp.asarray([ta]), uv))[0]
    b = np.asarray(sample_bilinear(tex, jnp.asarray([tb]), uv))[0]
    # raw texture exact; compressed close to its (halved) source
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert abs(b[:3].mean() - a[:3].mean() * 0.5) < 0.1


def test_render_with_compressed_texture():
    from ray_tpu.render.integrator import PassSettings, render_tile
    from ray_tpu.scene.camera import build_filter_table, make_camera
    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene
    from ray_tpu.utils.geometry import make_uv_sphere

    imgs = {}
    for compress in (False, True):
        sc = Scene()
        tex = sc.add_texture(_test_image(), generate_mips=True,
                             compress=compress)
        mat = sc.add_material(MaterialDesc(
            type=ShadingNode.DIFFUSE, base_color=(1, 1, 1),
            base_texture=tex,
        ))
        v, idx, n, uv = make_uv_sphere()
        sc.add_mesh(v, idx, normals=n, uvs=uv, material=mat)
        sc.set_environment((1.0, 1.0, 1.0))
        scene = sc.finalize()
        cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
        table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
        out = render_tile(
            scene, cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1),
            jnp.uint32(0), width=32, height=32, tile_w=32, tile_h=32,
            settings=PassSettings(max_total_depth=2, min_total_depth=2),
            use_filter_table=False,
        )
        imgs[compress] = np.asarray(out["color"])
    d = np.abs(imgs[True] - imgs[False])
    assert d.mean() < 0.02           # compression error only
    assert np.median(d) < 0.01


def test_bc4_single_channel():
    """BC4 (TextureUtils.h:89): single-channel blocks, 3-bit indices."""
    from ray_tpu.scene.textures import _decode_blocks_np, _encode_blocks_bc4

    img = _test_image()
    blk, bw, bh = _encode_blocks_bc4(img[..., 0])
    assert blk.shape == (bw * bh, 8)
    dec = _decode_blocks_np(blk, 64, 64, fmt=2)
    err = (dec[..., 0] - img[..., 0]) ** 2
    psnr = 10 * np.log10(1.0 / max(err.mean(), 1e-12))
    assert psnr > 32.0, psnr  # 3-bit gradient indices beat BC1's 2-bit

    p = TexturePacker()
    tid = p.add(img, generate_mips=False, compress="bc4")
    tex = {k: jnp.asarray(v) for k, v in p.pack().items()}
    ys, xs = np.mgrid[0:64, 0:64]
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 64, (ys + 0.5) / 64], -1).reshape(-1, 2),
        jnp.float32,
    )
    out = np.asarray(
        sample_bilinear(tex, jnp.full((uv.shape[0],), tid, jnp.int32), uv)
    ).reshape(64, 64, 4)
    np.testing.assert_allclose(out[..., 0], dec[..., 0], atol=1e-6)
    # single-channel decode replicates to RGB (roughness-map consumers
    # read channel 0; greyscale keeps any channel choice consistent)
    np.testing.assert_allclose(out[..., 1], dec[..., 0], atol=1e-6)


def test_bc5_normal_xy():
    """BC5 (TextureUtils.h:90): two BC4 payloads, normal-map XY; Z is
    reconstructed downstream (apply_normal_map, TEX_RECONSTRUCT_Z_BIT)."""
    from ray_tpu.scene.textures import _decode_blocks_np, _encode_blocks_bc5

    img = _test_image()
    blk, bw, bh = _encode_blocks_bc5(img)
    dec = _decode_blocks_np(blk, 64, 64, fmt=3)
    for c in range(2):
        err = (dec[..., c] - img[..., c]) ** 2
        psnr = 10 * np.log10(1.0 / max(err.mean(), 1e-12))
        assert psnr > 32.0, (c, psnr)

    p = TexturePacker()
    tid = p.add(img, generate_mips=False, compress="bc5")
    tex = {k: jnp.asarray(v) for k, v in p.pack().items()}
    uv = jnp.asarray([[0.26, 0.74], [0.51, 0.12]], jnp.float32)
    out = np.asarray(sample_bilinear(
        tex, jnp.full((2,), tid, jnp.int32), uv))
    # bilinear of the decoded planes at the same UVs
    for k, (u, v) in enumerate([(0.26, 0.74), (0.51, 0.12)]):
        x = u * 64 - 0.5
        y = v * 64 - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        for c in range(2):
            d = dec[..., c]
            expect = (d[y0 % 64, x0 % 64] * (1 - fx) * (1 - fy)
                      + d[y0 % 64, (x0 + 1) % 64] * fx * (1 - fy)
                      + d[(y0 + 1) % 64, x0 % 64] * (1 - fx) * fy
                      + d[(y0 + 1) % 64, (x0 + 1) % 64] * fx * fy)
            np.testing.assert_allclose(out[k, c], expect, atol=1e-5)


def test_rgbe_hdr_roundtrip():
    """RGBE shared-exponent HDR storage (rgb_to_rgbe quantization,
    SceneCommon.cpp:7-17): 4x smaller than RGBA f32, relative error
    bounded by the 8-bit mantissa."""
    rng = np.random.default_rng(7)
    hdr = (rng.random((32, 32, 3)) * np.exp(
        rng.uniform(-8, 8, (32, 32, 1)))).astype(np.float32)
    img = np.concatenate([hdr, np.ones((32, 32, 1), np.float32)], -1)

    p = TexturePacker()
    tid = p.add(img, generate_mips=False, compress="rgbe")
    packed = p.pack()
    assert "rgbe_t" in packed
    # memory: 1 word per texel vs 4 — plus the 1-texel raw placeholder
    assert packed["rgbe_t"].size == 32 * 32

    # host decode: max-channel relative error within 8-bit quantization
    dec = p.get_image(tid)[..., :3]
    mx = hdr.max(-1)
    rel = np.abs(dec - hdr).max(-1) / np.maximum(mx, 1e-20)
    assert rel.max() < 1.0 / 128.0, rel.max()

    # device decode bit-matches the host decode
    tex = {k: jnp.asarray(v) for k, v in packed.items()}
    ys, xs = np.mgrid[0:32, 0:32]
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 32, (ys + 0.5) / 32], -1).reshape(-1, 2),
        jnp.float32,
    )
    out = np.asarray(sample_bilinear(
        tex, jnp.full((uv.shape[0],), tid, jnp.int32), uv)
    ).reshape(32, 32, 4)
    np.testing.assert_allclose(out[..., :3], dec, rtol=1e-6, atol=0)
