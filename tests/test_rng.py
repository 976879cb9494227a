"""Sampler unit tests: bit-level helpers, stratification, determinism."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.ops import rng


def test_hash_matches_murmur3_finalizer():
    # independently computed murmur3 fmix32 values
    def fmix32(h):
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h

    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.hash_u32(jnp.asarray(xs)))
    want = np.array([fmix32(int(x)) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_reverse_bits():
    xs = jnp.asarray(np.array([1, 0x80000000, 0xF0F0F0F0, 0x12345678], np.uint32))
    got = np.asarray(rng.reverse_bits32(xs))
    want = np.array(
        [int(f"{x:032b}"[::-1], 2) for x in np.asarray(xs)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_owen_scramble_is_permutation_preserving_prefix():
    """Owen scrambling preserves elementary intervals: the top k bits of the
    output depend only on the top k bits of the input."""
    seed = jnp.uint32(12345)
    xs = np.random.RandomState(0).randint(0, 2**32, 256, dtype=np.uint32)
    ys = np.asarray(rng.nested_uniform_scramble(jnp.asarray(xs), seed))
    for k in [1, 2, 4, 8]:
        shift = 32 - k
        groups = {}
        for x, y in zip(xs >> shift, ys >> shift):
            groups.setdefault(int(x), set()).add(int(y))
        for g in groups.values():
            assert len(g) == 1  # same prefix in → same prefix out


def test_sobol02_stratification():
    """The first 2^m points of a (0,2) sequence have exactly one point per
    stratum for every elementary interval partition."""
    m = 8
    n = 1 << m
    idx = jnp.arange(n, dtype=jnp.uint32)
    x, y = rng.sobol02(idx)
    xf = np.asarray(x).astype(np.float64) / 2**32
    yf = np.asarray(y).astype(np.float64) / 2**32
    for kx in range(m + 1):
        ky = m - kx
        cells = set()
        for px, py in zip(xf, yf):
            cells.add((int(px * (1 << kx)), int(py * (1 << ky))))
        assert len(cells) == n, f"partition {kx}/{ky} not stratified"


def test_scrambled_rand_deterministic_and_uniform():
    seed = rng.pixel_seed(jnp.uint32(10), jnp.uint32(20), jnp.uint32(7))
    samples = jnp.arange(1024, dtype=jnp.uint32)
    rx, ry = rng.scrambled_2d_rand(jnp.uint32(3), seed, samples)
    rx2, ry2 = rng.scrambled_2d_rand(jnp.uint32(3), seed, samples)
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rx2))
    assert 0.0 <= float(jnp.min(rx)) and float(jnp.max(rx)) < 1.0
    # mean of a scrambled LDS converges fast; 1024 samples → tight tolerance
    assert abs(float(jnp.mean(rx)) - 0.5) < 0.01
    assert abs(float(jnp.mean(ry)) - 0.5) < 0.01
    # different dims decorrelate
    qx, _ = rng.scrambled_2d_rand(jnp.uint32(4), seed, samples)
    corr = np.corrcoef(np.asarray(rx), np.asarray(qx))[0, 1]
    assert abs(corr) < 0.1


def test_pmj_table_mode():
    """Reference-exact PMJ02 table mode (data from tools/golden/parse_pmj.py)
    vs the computed Owen-Sobol default: same addressing, equal prefix
    stratification (the reference's index shuffle maps any prefix to an
    aligned block, CoreRef.cpp:1418-1426), uniform range."""
    import numpy as np

    from ray_tpu.ops import rng

    if rng._pmj_table() is None:
        import pytest

        pytest.skip("pmj02_samples.npz not present")

    seeds = (jnp.arange(4096, dtype=jnp.uint32) * jnp.uint32(2654435761)
             + jnp.uint32(12345))

    def cov_var(N, p, table):
        est = sum(
            (rng.scrambled_2d_rand(jnp.uint32(rng.RAND_DIM_FILTER), seeds,
                                   jnp.uint32(s), table=table)[0] < p
             ).astype(jnp.float32)
            for s in range(N)
        ) / N
        return float(jnp.var(est)), float(jnp.mean(est))

    for n in (8, 9, 16):
        v_t, m_t = cov_var(n, 0.37, True)
        v_c, m_c = cov_var(n, 0.37, False)
        # both strongly beat i.i.d. sampling and agree with each other
        rand_var = 0.37 * 0.63 / n
        assert v_t < 0.35 * rand_var, (n, v_t, rand_var)
        assert v_c < 0.35 * rand_var, (n, v_c, rand_var)
        assert abs(m_t - 0.37) < 0.02 and abs(m_c - 0.37) < 0.02
        assert 0.3 < v_t / max(v_c, 1e-12) < 3.0, (n, v_t, v_c)

    # batched fetch == single calls, bit-exact, in both modes
    for table in (False, True):
        many = rng.scrambled_2d_rand_many(
            [jnp.uint32(3), jnp.uint32(7)], seeds, jnp.uint32(5), table=table)
        for d, (rx, ry) in zip((3, 7), many):
            ex, ey = rng.scrambled_2d_rand(jnp.uint32(d), seeds, jnp.uint32(5),
                                           table=table)
            assert bool(jnp.all(rx == ex) & jnp.all(ry == ey))
    # range
    rx, ry = rng.scrambled_2d_rand(jnp.uint32(2), seeds, jnp.uint32(0),
                                   table=True)
    a = np.asarray(rx)
    assert a.min() >= 0.0 and a.max() < 1.0
