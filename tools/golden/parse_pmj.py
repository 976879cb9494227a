"""Extract the reference's precomputed PMJ02 sample table into a .npz.

``/root/reference/internal/precomputed/__pmj02_samples.inl`` ships
32 dims x 4096 progressive multi-jittered (0,2) samples as packed uint32
pairs (Core.h:363-368).  PMJ02 prefixes are stratified at EVERY sample
count — the computed Owen-Sobol fallback is only power-of-2-prefix
stratified, which measurably raises low-spp variance at non-power-of-2
test sample counts (e.g. 5x at N=9, the refr_mis0 gate spp).  This is
data, not code, like the tonemap LUTs.
"""

import os
import re
import sys

import numpy as np

SRC = "/root/reference/internal/precomputed/__pmj02_samples.inl"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "ray_tpu", "data", "pmj02_samples.npz",
)


def main():
    text = open(SRC).read()
    m_cnt = re.search(r"__pmj02_sample_count = (\d+)", text)
    m_dims = re.search(r"__pmj02_dims_count = (\d+)", text)
    count, dims = int(m_cnt.group(1)), int(m_dims.group(1))
    body = text[text.index("{"):]
    vals = np.array([int(t) for t in re.findall(r"(\d+)u", body)],
                    dtype=np.uint64).astype(np.uint32)
    assert vals.size == dims * 2 * count, (vals.size, dims, count)
    np.savez_compressed(OUT, samples=vals,
                        sample_count=np.int32(count), dims_count=np.int32(dims))
    print(f"wrote {OUT}: {dims} dims x {count} samples "
          f"({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    sys.exit(main())
