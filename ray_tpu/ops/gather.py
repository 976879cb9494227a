"""Small-table reads as MXU matmuls.

TPU row gathers are the integrator's hottest non-compute cost: profiling the
Cornell forward pass shows ~45% of device time in gather fusions — every
``table[idx]`` with per-ray indices materializes a fusion boundary and the
gather itself runs near-serially.  Their backward (scatter-add) is worse.

For the *small* tables of a scene (materials, lights: tens of rows), the
read is better expressed as a one-hot matmul:

    one_hot(idx, M) @ table        # (R, M) @ (M, C) on the MXU

whose JAX-automatic VJP ``one_hotᵀ @ g`` is also a single MXU matmul —
no scatter anywhere.  The reference has no analogue (CPU gathers are
cheap); this is a TPU-first design choice.

``read_rows`` dispatches: one-hot matmul for ≤ ONEHOT_MAX rows, plain
gather beyond (big tables: vertices, texels — where (R, M) one-hots would
not fit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# One-hot selection is a single-term sum per output, but the TPU default
# matmul precision rounds the *table* operand to bf16 (~8-bit mantissa);
# HIGHEST keeps f32 table values (positions, normals, ids) exact.
_EXACT = jax.lax.Precision.HIGHEST

# (R, M) one-hot operands stay small: at 2 Mrays and M = 128 the operand is
# 1 GB in f32 — XLA fuses the iota-compare into the matmul so the practical
# footprint is the matmul tiles, but keep M bounded anyway.
ONEHOT_MAX = 128


def one_hot_f32(idx, m):
    """(R,) int → (R, m) f32 one-hot (iota-compare, fuses into the matmul)."""
    cols = jnp.arange(m, dtype=idx.dtype)
    return (idx[:, None] == cols[None, :]).astype(jnp.float32)


def read_rows(table, idx, oh=None):
    """``table[idx]`` for a (M,) or (M, C) table, as a one-hot matmul when
    M ≤ ONEHOT_MAX.  ``oh``: precomputed one-hot from :func:`one_hot_f32`
    to share across several reads of the same index vector."""
    m = table.shape[0]
    if m > ONEHOT_MAX and oh is None:
        return table[idx]
    if oh is None:
        oh = one_hot_f32(idx, m)
    t2 = table[:, None] if table.ndim == 1 else table
    out = jnp.dot(oh, t2.astype(jnp.float32),
                  preferred_element_type=jnp.float32, precision=_EXACT)
    if table.ndim == 1:
        out = out[:, 0]
    if jnp.issubdtype(table.dtype, jnp.integer) or table.dtype == jnp.bool_:
        # exact for integer magnitudes < 2^24 (texture ids, types, flags)
        out = jnp.round(out).astype(table.dtype)
    return out


def read_packed(columns, idx, oh=None):
    """Read many columns of one table with a single matmul.

    ``columns``: list of (M,) or (M, K) arrays sharing leading dim M.
    Returns a list of (R,)/(R, K) reads.  Integer/bool columns are packed
    through f32 (exact below 2^24) so one matmul serves the whole table.
    """
    m = columns[0].shape[0]
    parts = []
    splits = []
    for c in columns:
        c2 = c[:, None] if c.ndim == 1 else c
        parts.append(c2.astype(jnp.float32))
        splits.append(c2.shape[1])
    packed = jnp.concatenate(parts, axis=1)  # (M, ΣK)
    if m <= ONEHOT_MAX:
        if oh is None:
            oh = one_hot_f32(idx, m)
        vals = jnp.dot(oh, packed, preferred_element_type=jnp.float32,
                       precision=_EXACT)
    else:
        vals = packed[idx]
    out = []
    off = 0
    for c, k in zip(columns, splits):
        v = vals[:, off:off + k]
        off += k
        if c.ndim == 1:
            v = v[:, 0]
        if jnp.issubdtype(c.dtype, jnp.integer) or c.dtype == jnp.bool_:
            v = jnp.round(v).astype(c.dtype)
        out.append(v)
    return out
