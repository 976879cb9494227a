#!/usr/bin/env python3
"""Generate substitute backdrop meshes for the material-test scene.

The reference's standard test scene (tests/test_scene.cpp:589-627) loads
``env.bin`` (enclosed studio room, 5 material groups) and
``env_floor.bin`` (open floor, 3 groups) — both stripped from this
checkout (/root/reference/.MISSING_LARGE_BLOBS).  Parity testing needs
*identical* geometry on both sides, not the original geometry: these
fresh, simple rooms are loaded by BOTH the reference-renderer golden
generator and the ray_tpu test harness, so golden comparisons are exact
even though the backdrop differs visually from the shipped ref.tga.

Output format = the reference's raw .bin mesh blob (tests/utils.cpp:72):
  u32 num_attrs, u32 num_indices, u32 num_groups,
  f32 attrs[num_attrs]   (pos3 | normal3 | uv2 per vertex, stride 8),
  u32 indices[num_indices], u32 groups[num_groups] ((offset,count) pairs).
"""

from __future__ import annotations

import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "..", "tests", "goldens", "meshes")


class MeshBuilder:
    def __init__(self):
        self.attrs = []
        self.indices = []
        self.groups = []  # (offset, count) pairs
        self._group_start = 0

    def quad(self, p0, p1, p2, p3, normal):
        """Two triangles for the (p0,p1,p2,p3) quad.  Winding is auto-
        oriented so the geometric normal agrees with ``normal`` (one-sided
        materials shade the front face only)."""
        base = len(self.attrs)
        for p, uv in zip((p0, p1, p2, p3),
                         ((0, 0), (1, 0), (1, 1), (0, 1))):
            self.attrs.append(tuple(p) + tuple(normal) + uv)
        e1 = np.subtract(p1, p0)
        e2 = np.subtract(p2, p0)
        geom_n = np.cross(e1, e2)
        if np.dot(geom_n, normal) >= 0.0:
            self.indices += [base, base + 1, base + 2, base, base + 2, base + 3]
        else:
            self.indices += [base, base + 2, base + 1, base, base + 3, base + 2]

    def end_group(self):
        n = len(self.indices) - self._group_start
        self.groups.append((self._group_start, n))
        self._group_start = len(self.indices)

    def write(self, path):
        attrs = np.asarray(self.attrs, np.float32).reshape(-1)
        idx = np.asarray(self.indices, np.uint32)
        grp = np.asarray(self.groups, np.uint32).reshape(-1)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", attrs.size, idx.size, grp.size))
            f.write(attrs.tobytes())
            f.write(idx.tobytes())
            f.write(grp.tobytes())
        print(f"{path}: {attrs.size // 8} verts, {idx.size // 3} tris, "
              f"{grp.size // 2} groups")


def make_env_standard():
    """Enclosed room: floor, walls(+ceiling), and three grey trim bands.
    Group order matches tests/test_scene.cpp:614-618:
    floor, walls, dark_grey, light_grey, mid_grey."""
    m = MeshBuilder()
    S = 1.0      # half-extent of the room
    H = 1.2      # ceiling height
    B0, B1, B2, B3 = 0.0, 0.10, 0.20, 0.30   # trim band heights

    # group 0: floor (normal up)
    m.quad((-S, 0, -S), (S, 0, -S), (S, 0, S), (-S, 0, S), (0, 1, 0))
    m.end_group()

    def wall_band(y0, y1):
        m.quad((-S, y0, -S), (S, y0, -S), (S, y1, -S), (-S, y1, -S),
               (0, 0, 1))     # -z wall, faces +z
        m.quad((S, y0, S), (-S, y0, S), (-S, y1, S), (S, y1, S),
               (0, 0, -1))    # +z wall, faces -z
        m.quad((-S, y0, S), (-S, y0, -S), (-S, y1, -S), (-S, y1, S),
               (1, 0, 0))     # -x wall, faces +x
        m.quad((S, y0, -S), (S, y0, S), (S, y1, S), (S, y1, -S),
               (-1, 0, 0))    # +x wall, faces -x

    # group 1: upper walls + ceiling
    wall_band(B3, H)
    m.quad((-S, H, S), (S, H, S), (S, H, -S), (-S, H, -S), (0, -1, 0))
    m.end_group()

    # groups 2/3/4: dark / light / mid grey trim bands
    wall_band(B0, B1)
    m.end_group()
    wall_band(B1, B2)
    m.end_group()
    wall_band(B2, B3)
    m.end_group()
    return m


def make_env_floor():
    """Open floor for dir/sun/moon/HDRI scenes.  Group order matches
    tests/test_scene.cpp:610-612: floor, dark_grey, mid_grey."""
    m = MeshBuilder()
    S = 1.0
    m.quad((-S, 0, -S), (S, 0, -S), (S, 0, S), (-S, 0, S), (0, 1, 0))
    m.end_group()
    # small trim strips at the floor edges (out of the hero framing)
    m.quad((-S, 0.001, -S), (-0.9 * S, 0.001, -S),
           (-0.9 * S, 0.001, S), (-S, 0.001, S), (0, 1, 0))
    m.end_group()
    m.quad((0.9 * S, 0.001, -S), (S, 0.001, -S),
           (S, 0.001, S), (0.9 * S, 0.001, S), (0, 1, 0))
    m.end_group()
    return m


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    make_env_standard().write(os.path.join(OUT_DIR, "env_sub.bin"))
    make_env_floor().write(os.path.join(OUT_DIR, "env_floor_sub.bin"))


if __name__ == "__main__":
    main()
