"""Extract the reference's baked tonemap LUTs into a committed .npz.

The reference ships 9 OCIO-baked 48^3 view-transform LUTs as C arrays of
packed 10/10/10/2-bit uint32 (``/root/reference/internal/precomputed/
__agx.inl`` etc., declared ``const uint32_t __agx[48*48*48]``; lookup in
``internal/TonemapRef.cpp``).  This is *data*, not code — we store the
packed words verbatim so the TPU lookup can bit-match the reference's
FetchLUT unpacking.

Output: ray_tpu/data/tonemap_luts.npz with one (48*48*48,) uint32 array
per eViewTransform name, laid out [z*48*48 + y*48 + x] with x ← R.
"""

import os
import re
import sys

import numpy as np

REF = "/root/reference/internal/precomputed"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "ray_tpu", "data", "tonemap_luts.npz",
)

# eViewTransform order (reference Types.h:70, TonemapRef.cpp transform_luts)
LUTS = {
    "agx": "__agx.inl",
    "agx_punchy": "__agx_punchy.inl",
    "filmic_very_low_contrast": "__filmic_very_low_contrast.inl",
    "filmic_low_contrast": "__filmic_low_contrast.inl",
    "filmic_med_low_contrast": "__filmic_med_low_contrast.inl",
    "filmic_med_contrast": "__filmic_med_contrast.inl",
    "filmic_med_high_contrast": "__filmic_med_high_contrast.inl",
    "filmic_high_contrast": "__filmic_high_contrast.inl",
    "filmic_very_high_contrast": "__filmic_very_high_contrast.inl",
}


def parse_inl(path):
    text = open(path).read()
    # grab everything between the array's '{' and '}'
    body = text[text.index("{") + 1:text.rindex("}")]
    vals = np.array(
        [int(t) for t in re.findall(r"\d+", body)], dtype=np.uint64
    ).astype(np.uint32)
    assert vals.size == 48 * 48 * 48, (path, vals.size)
    return vals


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    arrays = {}
    for name, fn in LUTS.items():
        arrays[name] = parse_inl(os.path.join(REF, fn))
        print(f"{name}: {arrays[name].size} words, "
              f"first={arrays[name][0]:#010x}")
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    sys.exit(main())
