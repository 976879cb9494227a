"""Capture a jax.profiler device trace of one colonnade render_tile and
print the top ops by self time (xprof raw trace -> op aggregation)."""

import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from ray_tpu.render.integrator import PassSettings, render_tile
    from ray_tpu.scene.camera import build_filter_table
    from ray_tpu.utils.test_scenes import colonnade_scene

    W, H, tw, th = 1920, 1080, 960, 540
    sc, cam = colonnade_scene()
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=5, min_total_depth=2, remat=True)

    @jax.jit
    def f(it):
        return render_tile(
            scene, cam, table, jnp.int32(0), jnp.int32(0), it, jnp.uint32(0),
            width=W, height=H, tile_w=tw, tile_h=th,
            settings=settings, use_filter_table=False,
        )["color"]

    out = f(jnp.uint32(1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(jnp.uint32(2))
    jax.block_until_ready(out)
    print(f"steady-state tile: {time.perf_counter()-t0:.3f}s")

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = f(jnp.uint32(3))
        jax.block_until_ready(out)

    # parse the trace proto directly
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("trace files:", paths, xs)
    if paths:
        import json
        from collections import defaultdict

        with gzip.open(paths[0], "rt") as fh:
            tr = json.load(fh)
        events = tr.get("traceEvents", [])
        # find device-side lanes (TensorFlow Op / XLA Ops lines)
        pid_names = {}
        tid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"]["name"]
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
        agg = defaultdict(float)
        total = 0.0
        for e in events:
            if e.get("ph") != "X":
                continue
            tname = tid_names.get((e.get("pid"), e.get("tid")), "")
            pname = pid_names.get(e.get("pid"), "")
            if "TPU" not in pname and "tpu" not in pname.lower():
                continue
            if "XLA Ops" not in tname:
                continue
            dur = e.get("dur", 0) / 1e3  # ms
            name = e.get("name", "?")
            agg[name] += dur
            total += dur
        print(f"\ndevice XLA-op self time total: {total:.1f} ms")
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {ms:9.2f} ms  {name[:110]}")
    else:
        print("no trace.json.gz found; dirs:",
              glob.glob(f"{logdir}/**", recursive=True)[:20])


if __name__ == "__main__":
    main()
