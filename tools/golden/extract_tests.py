#!/usr/bin/env python3
"""Extract the reference's material-test battery into a JSON manifest.

Parses ``/root/reference/tests/test_shading.cpp`` (the golden-image test
functions, reference test_shading.cpp:361-1919): per test the material
descriptor values, sample count, PSNR floor, firefly pixel budget, scene
variant and texture list.  The manifest drives BOTH sides of the parity
harness:

  * ``tools/golden/golden_gen.cpp`` — renders each scene with the
    *reference renderer itself* (built from /root/reference, CPU backends)
    at high spp to produce converged goldens in ``tests/goldens/``;
  * ``tests/test_golden.py`` — reconstructs the same scene with ray_tpu
    and gates PSNR/firefly counts against those goldens, at the
    reference's own per-test sample counts and thresholds
    (test_shading.cpp:142-186, 351-353).

The scene-setup constants themselves (camera, lights, transforms) live in
``mat_test_scene``-equivalents on both sides, mirroring
reference tests/test_scene.cpp:228-1009.
"""

from __future__ import annotations

import json
import os
import re
import sys

REF = "/root/reference/tests/test_shading.cpp"
OUT = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "goldens",
                   "manifest.json")

PSNR_SYMS = {"DefaultMinPSNR": 30.0, "FastMinPSNR": 28.0,
             "VeryFastMinPSNR": 25.0}

NODE_TYPES = {"Diffuse": "diffuse", "Glossy": "glossy",
              "Refractive": "refractive", "Emissive": "emissive",
              "Mix": "mix", "Transparent": "transparent"}


def parse_fn(name: str, body: str):
    t = {"name": None, "mat": {}, "mat_kind": None}
    # consts
    for m in re.finditer(r"const (?:int|double|float) (\w+) = ([0-9.]+)f?;",
                         body):
        t[m.group(1)] = float(m.group(2))
    # material desc declaration
    m = re.search(r"Ray::(shading_node_desc_t|principled_mat_desc_t) (\w+);",
                  body)
    if not m:
        return None  # ray_flags/complex_mat7 style (handled manually)
    t["mat_kind"] = ("node" if m.group(1) == "shading_node_desc_t"
                     else "principled")
    var = m.group(2)
    mat = t["mat"]
    for m2 in re.finditer(
            re.escape(var) + r"\.(\w+)(?:\[(\d)\])? = ([^;]+);", body):
        field, idx, val = m2.group(1), m2.group(2), m2.group(3).strip()
        if field == "type":
            mat["type"] = NODE_TYPES[val.split("::")[-1]]
            continue
        if val.startswith("Ray::TextureHandle"):
            mat[field] = int(re.search(r"\{(\d+)\}", val).group(1))
            continue
        v = float(val.rstrip("f"))
        if idx is not None:
            cur = mat.setdefault(field, [0.0, 0.0, 0.0])
            cur[int(idx)] = v
        else:
            mat[field] = v
    # textures array
    texm = re.search(r"const char \*textures\[\] = \{([^}]*)\}", body, re.S)
    if texm:
        t["textures"] = re.findall(r'"([^"]+)"', texm.group(1))
    # run_material_test call args
    call = re.search(r"run_material_test\((.*?)\);", body, re.S)
    if not call:
        return None
    args = [a.strip() for a in re.split(r",(?![^{(]*[})])", call.group(1))]
    t["name"] = args[2].strip('"')
    # args: arch_list, preferred_device, name, desc, <counts...>, psnr, thres,
    #       [denoise, partial, [caching,] textures, scene]
    rest = args[4:]
    nums = []
    i = 0
    while i < len(rest) and re.fullmatch(r"[A-Za-z0-9_.]+", rest[i]) and \
            not rest[i].startswith("eDenoise"):
        nums.append(rest[i])
        i += 1
    # resolve numeric/symbolic prefix: sample counts then psnr then thres
    def resolve(sym):
        if sym in PSNR_SYMS:
            return PSNR_SYMS[sym]
        if sym in t:
            return t[sym]
        return float(sym.rstrip("f"))
    vals = [resolve(s) for s in nums]
    if len(vals) == 3:          # spp, psnr, thres
        t["spp"] = int(vals[0])
        t["min_spp"] = int(vals[0])
        t["variance_threshold"] = 0.0
        t["min_psnr"], t["pix_thres"] = vals[1], int(vals[2])
    elif len(vals) == 5:        # min_spp, max_spp, var_thres, psnr, thres
        t["min_spp"], t["spp"] = int(vals[0]), int(vals[1])
        t["variance_threshold"] = vals[2]
        t["min_psnr"], t["pix_thres"] = vals[3], int(vals[4])
    else:
        return None
    t["denoise"] = "none"
    t["partial"] = False
    t["caching"] = False
    t["scene"] = "Standard"
    for a in rest[i:]:
        if a.startswith("eDenoiseMethod::"):
            t["denoise"] = a.split("::")[-1].lower()
        elif a.startswith("eTestScene::"):
            t["scene"] = a.split("::")[-1]
        elif a in ("true", "false"):
            # partial comes before caching in the long overload; the short
            # overload has only partial.  Track in order.
            if "partial_set" not in t:
                t["partial"] = a == "true"
                t["partial_set"] = True
            else:
                t["caching"] = a == "true"
    t.pop("partial_set", None)
    # drop parse temps
    for k in ("SampleCount", "MinSampleCount", "MaxSampleCount", "MinPSNR",
              "PixThres", "VarianceThreshold"):
        t.pop(k, None)
    return t


def main():
    src = open(REF).read()
    tests = []
    for m in re.finditer(
            r"void (test_\w+)\(const char \*arch_list\[\][^)]*\) \{(.*?)\n\}",
            src, re.S):
        fn, body = m.group(1), m.group(2)
        t = parse_fn(fn, body)
        if t is None:
            print(f"skip (manual): {fn}", file=sys.stderr)
            continue
        tests.append(t)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"source": "tests/test_shading.cpp (reference v0.4.0)",
                   "tests": tests}, f, indent=1)
    print(f"wrote {len(tests)} tests -> {OUT}")


if __name__ == "__main__":
    main()
