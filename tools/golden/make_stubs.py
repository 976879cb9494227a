#!/usr/bin/env python3
"""Generate stub .inl files for the reference blobs stripped from this
checkout (see /root/reference/.MISSING_LARGE_BLOBS): the 3-D cloud-noise
texture, the cirrus texture, and the OIDN UNet weights.  The stubs only
need to compile and link — every golden scene that would consume them
(volumetric clouds, moon, UNet filter) is excluded from the battery by
the manifest's `runnable` flag.

Usage: python tools/golden/make_stubs.py build/ref/internal/precomputed
"""
import os
import sys


def arr(name, n, ctype="uint8_t", fill="0"):
    # keep the file tiny: value-initialized tail ("= {0}") is all-zeros
    return f"extern const {ctype} {name}[{n}] = {{{fill}}};\n"


def main(outdir):
    os.makedirs(outdir, exist_ok=True)

    # AtmosphereRef.cpp samples these with & (RES-1) → power-of-two sizes.
    # Mid-gray noise keeps cloud math finite without the real tables.
    with open(os.path.join(outdir, "__3d_noise_tex.inl"), "w") as f:
        f.write("extern const int NOISE_3D_RES = 32;\n")
        f.write(arr("__3d_noise_tex", 32 * 32 * 32, fill="128"))
    with open(os.path.join(outdir, "__cirrus_tex.inl"), "w") as f:
        f.write("extern const int CIRRUS_TEX_RES = 64;\n")
        f.write(arr("__cirrus_tex", 2 * 64 * 64))

    # OIDN hdr_alb_nrm layer shapes (UNetFilter.cpp:296-340): weights are
    # out*in*3*3 fp16 values, biases out.  Real shapes so that the size
    # arithmetic in SetupUNetWeights stays well-defined if ever called.
    layers = [
        ("enc_conv0", 9, 32), ("enc_conv1", 32, 32), ("enc_conv2", 32, 48),
        ("enc_conv3", 48, 64), ("enc_conv4", 64, 80), ("enc_conv5a", 80, 96),
        ("enc_conv5b", 96, 96), ("dec_conv4a", 176, 112),
        ("dec_conv4b", 112, 112), ("dec_conv3a", 176, 96),
        ("dec_conv3b", 96, 96), ("dec_conv2a", 144, 64),
        ("dec_conv2b", 64, 64), ("dec_conv1a", 73, 64),
        ("dec_conv1b", 64, 32), ("dec_conv0", 32, 3),
    ]
    with open(os.path.join(outdir, "__oidn_weights_hdr_alb_nrm.inl"), "w") as f:
        for name, cin, cout in layers:
            f.write(arr(f"{name}_weight", cout * cin * 9, "uint16_t"))
            f.write(arr(f"{name}_bias", cout, "uint16_t"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "build/ref/internal/precomputed")
