"""TGA/PFM round trips (reference WriteTGA in samples, WritePFM debug dump
RendererCPU.h:26)."""

import numpy as np

from ray_tpu.utils.image_io import read_pfm, read_tga, write_pfm, write_tga


def test_tga_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "t.tga")
    write_tga(p, img)
    back = read_tga(p)
    np.testing.assert_array_equal(back, img)


def test_tga_float_and_alpha(tmp_path):
    img = np.zeros((4, 4, 4), np.float32)
    img[..., 0] = 1.0
    img[..., 3] = 0.5
    p = str(tmp_path / "t4.tga")
    write_tga(p, img)
    back = read_tga(p)
    assert back.shape == (4, 4, 4)
    assert (back[..., 0] == 255).all()
    assert (np.abs(back[..., 3].astype(int) - 127) <= 1).all()


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((9, 7, 3)).astype(np.float32) * 100
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)
    mono = rng.random((5, 6)).astype(np.float32)
    write_pfm(p, mono)
    np.testing.assert_array_equal(read_pfm(p), mono)
