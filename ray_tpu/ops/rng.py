"""Low-discrepancy sampling: hash-based Owen-scrambled Sobol (0,2) sequence.

The reference renderer draws every stochastic decision from a precomputed
PMJ02 table addressed by ``(dim, pixel_hash, sample_index)`` with
Laine-Karras Owen scrambling on both the index and the value
(reference: internal/CoreRef.cpp:1068-1103, 1418-1426; table constants
internal/Core.h:363-368).  We keep the exact same *addressing scheme* —
which is what makes path-replay backprop deterministic: a sample is a pure
function of (pixel, iteration, dimension, seed) — but generate the points
on the fly from the first two Sobol' dimensions with full Owen scrambling
(Burley, "Practical Hash-based Owen Scrambling", JCGT 2020).  An
Owen-scrambled Sobol (0,2) pair has the same stratification guarantees as a
PMJ02 point set, and on-the-fly generation avoids a random table gather on
TPU (bit ops are cheap on the VPU, gathers are not).

Dimension layout mirrors internal/Constants.inl:31-43 so call sites
line up one-to-one with the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

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

RAND_SAMPLES_COUNT = 1 << 16  # index domain for the Owen shuffle of sample ids

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


def scrambled_2d_rand(dim, seed, sample, /):
    """2-D low-discrepancy sample for (dimension, per-pixel seed, sample index).

    The addressing scheme matches reference internal/CoreRef.cpp:1418-1426:
    the sample index is Owen-shuffled with a per-(seed, dim) key to
    decorrelate dimensions, and each of the two output components gets an
    independent Owen value scramble.  Returns two float32 arrays in [0, 1).
    ``dim``/``seed``/``sample`` broadcast against each other.
    """
    dim = _u32(dim)
    seed = _u32(seed)
    sample = _u32(sample)
    shuffled_i = nested_uniform_scramble(sample, hash_combine(seed, dim)) & _u32(
        RAND_SAMPLES_COUNT - 1
    )
    sx, sy = sobol02(shuffled_i)
    rx = nested_uniform_scramble(sx, hash_combine(seed, dim * _u32(2) + _u32(0)))
    ry = nested_uniform_scramble(sy, hash_combine(seed, dim * _u32(2) + _u32(1)))
    return _u32_to_unit_float(rx), _u32_to_unit_float(ry)


def pixel_seed(px, py, rand_seed):
    """Per-pixel RNG seed: hash of packed pixel coords combined with the frame
    seed (reference internal/CoreRef.cpp:1477-1478)."""
    packed = (_u32(px) << 16) | _u32(py)
    return hash_combine(hash_u32(packed), _u32(rand_seed))
