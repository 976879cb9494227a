"""Low-discrepancy sampling: hash-based Owen-scrambled Sobol (0,2) sequence.

The reference renderer draws every stochastic decision from a precomputed
PMJ02 table addressed by ``(dim, pixel_hash, sample_index)`` with
Laine-Karras Owen scrambling on both the index and the value
(reference: internal/CoreRef.cpp:1068-1103, 1418-1426; table constants
internal/Core.h:363-368).  Two interchangeable sources, same addressing:

* computed Owen-Sobol (0,2) (Burley, "Practical Hash-based Owen
  Scrambling", JCGT 2020) — the DEFAULT: pure VPU bit math, no gathers
  (a gather instruction inside the bounce scan costs ~2-3 ms per
  518k-lane index list — see ops/gather.py);
* the reference's own precomputed PMJ02 table
  (``ray_tpu/data/pmj02_samples.npz``, extracted verbatim by
  tools/golden/parse_pmj.py — data, like the tonemap LUTs), via
  ``table=True`` — reference-exact addressing incl. the dim shuffle.

Measured (tests/test_rng.py): the two have EQUAL prefix stratification —
the reference's index shuffle maps any sample prefix to an aligned block,
so the table's progressive property is not exercised beyond (0,2)-block
stratification, which the computed sequence shares.  Either way a sample
is a pure function of (pixel, iteration, dimension, seed) — what makes
path-replay backprop deterministic.

Dimension layout mirrors internal/Constants.inl:31-43 so call sites
line up one-to-one with the reference.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

# Random-sequence dimension map (reference: internal/Constants.inl:31-43).
RAND_DIM_FILTER = 0
RAND_DIM_LENS = 1
RAND_DIM_BASE_COUNT = 2  # independent from bounce count

# Per-bounce dimensions, offset by RAND_DIM_BASE_COUNT + bounce * RAND_DIM_BOUNCE_COUNT.
RAND_DIM_BSDF_PICK = 0
RAND_DIM_BSDF = 1
RAND_DIM_LIGHT_PICK = 2
RAND_DIM_LIGHT = 3
RAND_DIM_TEX = 4
RAND_DIM_CACHE = 5
RAND_DIM_TEX_ANISO = 6  # major-axis jitter of the anisotropic tex filter
RAND_DIM_BOUNCE_COUNT = 8

RAND_SAMPLES_COUNT = 1 << 16  # fallback index domain for the Owen shuffle

# --- reference PMJ02 table (data; loaded lazily, traced as a constant) ---
_PMJ_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "pmj02_samples.npz",
)
_PMJ_CACHE = []  # [ (samples u32 (dims*2*count,), count, dims) ] or [None]


def _pmj_table():
    if not _PMJ_CACHE:
        if os.path.exists(_PMJ_PATH):
            with np.load(_PMJ_PATH) as z:
                _PMJ_CACHE.append((
                    z["samples"], int(z["sample_count"]),
                    int(z["dims_count"]),
                ))
        else:
            _PMJ_CACHE.append(None)
    return _PMJ_CACHE[0]

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def hash_u32(x):
    """MurmurHash3 finalizer; used to derive per-pixel seeds.

    Same finalizer as reference internal/CoreRef.h:133 (public constants).
    """
    x = _u32(x)
    x = x ^ (x >> 16)
    x = x * _u32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * _u32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_combine(seed, v):
    """Boost-style seed combiner (reference internal/CoreRef.h:143)."""
    seed = _u32(seed)
    v = _u32(v)
    return seed ^ (v + (seed << 6) + (seed >> 2))


def reverse_bits32(x):
    x = _u32(x)
    x = ((x >> 1) & _u32(0x55555555)) | ((x & _u32(0x55555555)) << 1)
    x = ((x >> 2) & _u32(0x33333333)) | ((x & _u32(0x33333333)) << 2)
    x = ((x >> 4) & _u32(0x0F0F0F0F)) | ((x & _u32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & _u32(0x00FF00FF)) | ((x & _u32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def laine_karras_permutation(x, seed):
    """Low-bit-mixing permutation (Laine & Karras 2011 / Burley 2020)."""
    x = _u32(x)
    seed = _u32(seed)
    x = x + seed
    x = x ^ (x * _u32(0x6C50B47C))
    x = x ^ (x * _u32(0xB82F1E52))
    x = x ^ (x * _u32(0xC7AFE638))
    x = x ^ (x * _u32(0x8D22F6E6))
    return x


def nested_uniform_scramble(x, seed):
    """Owen scramble of a 32-bit value: reverse, permute low bits, reverse."""
    return reverse_bits32(laine_karras_permutation(reverse_bits32(x), seed))


# Direction "vectors" of the second Sobol' dimension.  v starts at 1<<31 and
# evolves as v ^= v >> 1 each bit — a fixed, index-independent sequence, so we
# precompute the 32 constants host-side.
def _sobol2_directions():
    dirs = []
    v = 1 << 31
    for _ in range(32):
        dirs.append(v)
        v ^= v >> 1
    return dirs


_SOBOL2_DIRS = tuple(_sobol2_directions())


def sobol02(index):
    """First two dimensions of the Sobol' sequence for ``index`` (uint32 pair).

    dim 0 is the van der Corput radical inverse (bit reversal); dim 1 uses the
    classic direction-number recurrence, evaluated as an unrolled XOR-select
    chain (no data-dependent loops — everything vectorizes on the VPU).
    """
    index = _u32(index)
    x = reverse_bits32(index)
    y = jnp.zeros_like(index)
    for bit in range(16):  # RAND_SAMPLES_COUNT = 2^16 → higher bits never set
        take = ((index >> bit) & _u32(1)).astype(jnp.bool_)
        y = jnp.where(take, y ^ _u32(_SOBOL2_DIRS[bit]), y)
    return x, y


def _u32_to_unit_float(x):
    """Map uint32 → [0, 1) float32 keeping 24 bits of precision."""
    return (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _sobol_2d_rand(dim, seed, sample):
    """Computed Owen-Sobol (0,2) fallback (data-free); reference addressing."""
    shuffled_i = nested_uniform_scramble(sample, hash_combine(seed, dim)) & _u32(
        RAND_SAMPLES_COUNT - 1
    )
    sx, sy = sobol02(shuffled_i)
    rx = nested_uniform_scramble(sx, hash_combine(seed, dim * _u32(2) + _u32(0)))
    ry = nested_uniform_scramble(sy, hash_combine(seed, dim * _u32(2) + _u32(1)))
    return _u32_to_unit_float(rx), _u32_to_unit_float(ry)


def _pmj_indices(dim, seed, sample, count, dims):
    """Reference table addressing (CoreRef.cpp:1418-1426): shuffled dim row
    + Owen-shuffled sample index -> flat u32 index of the x word."""
    shuffled_dim = nested_uniform_scramble(dim, seed) & _u32(dims - 1)
    shuffled_i = nested_uniform_scramble(sample, hash_combine(seed, dim)) & _u32(
        count - 1
    )
    return shuffled_dim * _u32(2 * count) + _u32(2) * shuffled_i


def scrambled_2d_rand(dim, seed, sample, /, table=False):
    """2-D low-discrepancy sample for (dimension, per-pixel seed, sample index).

    Computed Owen-Sobol by default; ``table=True`` switches to the
    reference-exact PMJ02 table lookup (internal/CoreRef.cpp:1418-1426
    addressing + scramble_unorm value scramble) when the data file is
    present.  Returns two float32 arrays in [0, 1).  ``dim``/``seed``/
    ``sample`` broadcast against each other.
    """
    tab = _pmj_table() if table else None
    dim = _u32(dim)
    seed = _u32(seed)
    sample = _u32(sample)
    if tab is None:
        return _sobol_2d_rand(dim, seed, sample)
    samples, count, dims = tab
    idx = _pmj_indices(dim, seed, sample, count, dims)
    table = jnp.asarray(samples)
    vx = jnp.take(table, idx)
    vy = jnp.take(table, idx + _u32(1))
    rx = nested_uniform_scramble(vx, hash_combine(seed, dim * _u32(2) + _u32(0)))
    ry = nested_uniform_scramble(vy, hash_combine(seed, dim * _u32(2) + _u32(1)))
    return _u32_to_unit_float(rx), _u32_to_unit_float(ry)


def scrambled_2d_rand_many(dim_list, seed, sample, /, table=False):
    """K 2-D samples for K dimension vectors with ONE table gather.

    ``dim_list``: list of K uint32 arrays/scalars (broadcastable against
    ``seed``/``sample``).  Returns a list of K (rx, ry) pairs, identical to
    K :func:`scrambled_2d_rand` calls — in table mode the x and y words of
    all K dims are fetched by a single concatenated take (2K·R indices),
    so a scan body pays ONE gather instruction per bounce instead of 2K.
    """
    tab = _pmj_table() if table else None
    seed = _u32(seed)
    sample = _u32(sample)
    dims_u = [jnp.broadcast_to(_u32(d), jnp.broadcast_shapes(
        jnp.shape(d), jnp.shape(seed), jnp.shape(sample))) for d in dim_list]
    if tab is None:
        return [_sobol_2d_rand(d, seed, sample) for d in dims_u]
    samples, count, dims = tab
    table = jnp.asarray(samples)
    k = len(dims_u)
    idx = jnp.concatenate(
        [_pmj_indices(d, seed, sample, count, dims).ravel() for d in dims_u]
        + [(_pmj_indices(d, seed, sample, count, dims) + _u32(1)).ravel()
           for d in dims_u]
    )
    vals = jnp.take(table, idx)
    shp = dims_u[0].shape
    n = int(np.prod(shp)) if shp else 1
    out = []
    for i, d in enumerate(dims_u):
        vx = vals[i * n:(i + 1) * n].reshape(shp)
        vy = vals[(k + i) * n:(k + i + 1) * n].reshape(shp)
        rx = nested_uniform_scramble(
            vx, hash_combine(seed, d * _u32(2) + _u32(0)))
        ry = nested_uniform_scramble(
            vy, hash_combine(seed, d * _u32(2) + _u32(1)))
        out.append((_u32_to_unit_float(rx), _u32_to_unit_float(ry)))
    return out


def pixel_seed(px, py, rand_seed):
    """Per-pixel RNG seed: hash of packed pixel coords combined with the frame
    seed (reference internal/CoreRef.cpp:1477-1478)."""
    packed = (_u32(px) << 16) | _u32(py)
    return hash_combine(hash_u32(packed), _u32(rand_seed))
