"""Probe: does Mosaic/TPU support per-lane vector gather from VMEM?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

N = 1024


def k_take(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


def k_index(table_ref, idx_ref, out_ref):
    out_ref[:] = table_ref[idx_ref[:]]


def k_take_along(table_ref, idx_ref, out_ref):
    # table (1, N) broadcast rows, idx (8, 128)
    t = jnp.broadcast_to(table_ref[:], (8, N))
    out_ref[:] = jnp.take_along_axis(t, idx_ref[:], axis=1)


def try_kernel(name, kernel, table_shape):
    table = jnp.arange(np.prod(table_shape), dtype=jnp.float32).reshape(table_shape)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, N, (8, 128)), jnp.int32
    )
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)
        expect = table.reshape(-1)[idx]
        ok = bool(jnp.allclose(out, expect))
        print(f"{name}: COMPILED, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED — {msg}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    try_kernel("take axis0 (N,)", k_take, (N,))
    try_kernel("index (N,)", k_index, (N,))
    try_kernel("take_along_axis rows (1,N)", k_take_along, (1, N))
