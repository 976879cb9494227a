"""Geo-camera / lightmap-baking ray source.

TPU-native counterpart of the reference's ``SampleMeshInTextureSpace``
(internal/CoreRef.cpp:1555-1653, eCamType::Geo, SceneCommon.cpp:124-141):
the "camera" is a mesh's UV unwrap — every lightmap texel covered by a
triangle gets one ray.  The reference rasterizes UV triangles per tile on
the CPU and hands pre-filled intersections to ShadePrimary; here the
rasterization happens once host-side (numpy) and produces a
:class:`PrimaryRays` batch whose rays start a hair above each texel's
surface point looking down its inverted normal, so the standard wavefront
integrator traces and shades them with zero special-casing — the first hit
*is* the texel's surface (one cheap, perfectly coherent traversal).

Typical use: bake with ``PassSettings(lighting_only=True, output_sh=True)``
for SH lightmaps, or plain radiance for flat lightmaps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ray_tpu.render.raygen import PrimaryRays

_BIAS = 1e-3


def rasterize_uv_rays(vertices, normals, uvs, tri_vidx, width, height,
                      prim_lo=0, prim_hi=None):
    """Rasterize UV-space triangles onto a (height, width) texel grid.

    Arguments are host numpy arrays (pass ``np.asarray(scene.xxx)`` for a
    finalized scene).  ``prim_lo``/``prim_hi`` restrict to one mesh's
    triangle range (the reference bakes one mesh at a time,
    CoreRef.cpp:1579).  Returns ``(rays, mask, prim)``: a PrimaryRays
    batch of height*width rays (uncovered texels get dead rays), the
    (R,) coverage mask and the (R,) covering triangle index.

    First-covering-triangle-wins, matching the reference's
    ``out_inter.v >= 0 → skip`` rule (CoreRef.cpp:1625).
    """
    vertices = np.asarray(vertices, np.float32)
    normals = np.asarray(normals, np.float32)
    uvs = np.asarray(uvs, np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)
    if prim_hi is None:
        prim_hi = tri_vidx.shape[0]

    R = width * height
    ro = np.zeros((R, 3), np.float32)
    rd = np.zeros((R, 3), np.float32)
    rd[:, 1] = 1.0
    covered = np.zeros((R,), bool)
    prim_out = np.full((R,), -1, np.int32)

    size = np.array([width, height], np.float32)
    for tri in range(prim_lo, prim_hi):
        i0, i1, i2 = tri_vidx[tri]
        # v flip matches the reference (t[1] → 1 - t[1], CoreRef.cpp:1585)
        t0 = np.array([uvs[i0, 0], 1.0 - uvs[i0, 1]]) * size
        t1 = np.array([uvs[i1, 0], 1.0 - uvs[i1, 1]]) * size
        t2 = np.array([uvs[i2, 0], 1.0 - uvs[i2, 1]]) * size

        bb_min = np.floor(np.minimum(np.minimum(t0, t1), t2)).astype(int)
        bb_max = np.round(np.maximum(np.maximum(t0, t1), t2)).astype(int)
        bb_min = np.maximum(bb_min, 0)
        bb_max = np.minimum(bb_max, [width - 1, height - 1])
        if (bb_max < bb_min).any():
            continue

        d01 = t0 - t1
        d12 = t1 - t2
        d20 = t2 - t0
        area = d01[0] * d20[1] - d20[0] * d01[1]
        if area < 1e-7:
            continue
        inv_area = 1.0 / area

        xs = np.arange(bb_min[0], bb_max[0] + 1)
        ys = np.arange(bb_min[1], bb_max[1] + 1)
        gx, gy = np.meshgrid(xs, ys)
        fx = gx.astype(np.float32)
        fy = gy.astype(np.float32)
        # edge functions (CoreRef.cpp:1633-1637)
        u = d01[0] * (fy - t0[1]) - d01[1] * (fx - t0[0])
        v = d12[0] * (fy - t1[1]) - d12[1] * (fx - t1[0])
        w = d20[0] * (fy - t2[1]) - d20[1] * (fx - t2[0])
        inside = (u >= -1e-7) & (v >= -1e-7) & (w >= -1e-7)
        if not inside.any():
            continue

        lin = (gy * width + gx)[inside]
        fresh = ~covered[lin]
        lin = lin[fresh]
        if lin.size == 0:
            continue
        bu = (u[inside][fresh] * inv_area).astype(np.float32)
        bv = (v[inside][fresh] * inv_area).astype(np.float32)
        bw = 1.0 - bu - bv
        # barycentric convention: u at v2's corner, v at v0's, w at v1's
        p = (
            bv[:, None] * vertices[i0]
            + bw[:, None] * vertices[i1]
            + bu[:, None] * vertices[i2]
        )
        n = (
            bv[:, None] * normals[i0]
            + bw[:, None] * normals[i1]
            + bu[:, None] * normals[i2]
        )
        n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        ro[lin] = p + n * _BIAS
        rd[lin] = -n
        covered[lin] = True
        prim_out[lin] = tri

    px = np.tile(np.arange(width, dtype=np.int32), height)
    py = np.repeat(np.arange(height, dtype=np.int32), width)
    rays = PrimaryRays(
        ro=jnp.asarray(ro),
        rd=jnp.asarray(rd),
        t_max=jnp.full((R,), 8.0 * _BIAS, jnp.float32),
        px=jnp.asarray(px),
        py=jnp.asarray(py),
        cone_spread=jnp.float32(0.0),
    )
    return rays, jnp.asarray(covered), jnp.asarray(prim_out)


def bake_lightmap(scene, width, height, settings, iterations=16,
                  rand_seed=0, prim_lo=0, prim_hi=None):
    """Render ``iterations`` samples of a lightmap for the (flatten-mode)
    scene's UV unwrap.  Returns dict with 'color' (H,W,3), 'mask' (H,W)
    and — when ``settings.output_sh`` — 'shl1' (H,W,4,3)."""
    from ray_tpu.render.integrator import render_tile

    rays, mask, _prim = rasterize_uv_rays(
        np.asarray(scene.vertices), np.asarray(scene.normals),
        np.asarray(scene.uvs), np.asarray(scene.tri_vidx),
        width, height, prim_lo, prim_hi,
    )
    table = jnp.linspace(0.0, 1.0, 16, dtype=jnp.float32)
    acc = jnp.zeros((height * width, 3), jnp.float32)
    sh = jnp.zeros((height * width, 4, 3), jnp.float32)
    for it in range(1, iterations + 1):
        out = render_tile(
            scene, None, table, jnp.int32(0), jnp.int32(0),
            jnp.uint32(it), jnp.uint32(rand_seed),
            width=width, height=height, tile_w=width, tile_h=height,
            settings=settings, use_filter_table=False,
            pixel_mask=mask, rays=rays,
        )
        acc = acc + out["color"]
        if settings.output_sh:
            sh = sh + out["shl1"]
    result = {
        "color": np.asarray(acc / iterations).reshape(height, width, 3),
        "mask": np.asarray(mask).reshape(height, width),
    }
    if settings.output_sh:
        result["shl1"] = np.asarray(sh / iterations).reshape(
            height, width, 4, 3
        )
    return result
