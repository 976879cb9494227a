"""SHARC-style spatial radiance cache — TPU-native re-design.

Reference: internal/RadCacheRef.{h,cpp} (NVIDIA SHARC derived), constants
internal/Constants.inl:112-146, query exit internal/ShadeRef.cpp:1370-1392,
update/resolve drivers internal/RendererCPU.h:1010-1212.

Design differences from the reference (same observable behavior):

* **Functional state.**  The cache is a pytree of dense arrays
  (:class:`CacheState`); update/resolve return new states instead of
  mutating buffers, so the whole thing jits and shards like any other
  JAX value.
* **Claim rounds instead of CAS.**  The reference claims hash slots with
  64-bit atomic compare-exchange in a 32-entry bucket.  Here a wavefront
  of insertions resolves claims with a bounded number of
  scatter-then-regather rounds over ``PROBE_LEN`` probe slots: every
  round, unclaimed lanes write their key to their first empty candidate
  ("latest wins"), re-read, and keep the slot iff their key actually
  landed.  Collisions surviving ``CLAIM_ROUNDS`` rounds drop the sample
  (the reference drops on full buckets the same way).
* **Suffix-sum back-propagation.**  The reference threads a per-pixel
  vertex stack (``cache_data_t``) through the bounce loop and multiplies
  segment weights incrementally (RadCacheRef.cpp:SpatialCacheUpdate).
  Mathematically the entry at vertex j accumulates
  ``Σ_{k≥j} delta_k / T_j`` — contributions discovered at later bounces
  divided by the path throughput at j.  On TPU we record per-bounce
  (delta, throughput, vertex) columns in the scan and evaluate that sum
  directly with a reversed cumulative sum — no stack, no shifting.

The 64-bit hash key is kept bit-compatible with the reference
(17+17+17 grid position, 10 level, 3 normal-octant bits) but stored as
two uint32 columns (tests run without x64).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Constants.inl:112-146 (same names/values)
HASH_GRID_POSITION_BIT_NUM = 17
HASH_GRID_POSITION_BIT_MASK = (1 << HASH_GRID_POSITION_BIT_NUM) - 1
HASH_GRID_LEVEL_BIT_NUM = 10
HASH_GRID_LEVEL_BIT_MASK = (1 << HASH_GRID_LEVEL_BIT_NUM) - 1
HASH_GRID_LEVEL_BIAS = 2
RAD_CACHE_SAMPLE_COUNT_MAX = 128
RAD_CACHE_SAMPLE_COUNT_MIN = 8
RAD_CACHE_STALE_FRAME_NUM_MAX = 128
RAD_CACHE_PROPAGATION_DEPTH = 4
RAD_CACHE_DOWNSAMPLING_FACTOR = 4
RAD_CACHE_GRID_SCALE = 50.0
RAD_CACHE_LOG_BASE = 2.0
RAD_CACHE_MIN_ROUGHNESS = 0.4

PROBE_LEN = 16     # reference bucket size is 32 (HASH_GRID_HASH_MAP_BUCKET_SIZE)
CLAIM_ROUNDS = 3

DEFAULT_ENTRIES = 1 << 20  # reference: 1<<22; configurable


class CacheState(NamedTuple):
    """The whole spatial cache as dense device arrays (+1 dump row at the
    end of every table so invalid scatters have somewhere harmless to go)."""

    key_lo: jnp.ndarray    # (N+1,) u32 — low half of the 64-bit hash key
    key_hi: jnp.ndarray    # (N+1,) u32 — high half (0,0 = empty slot)
    rad_curr: jnp.ndarray  # (N+1, 3) f32 accumulating radiance (this frame)
    cnt_curr: jnp.ndarray  # (N+1,) i32 accumulating sample count
    rad_prev: jnp.ndarray  # (N+1, 3) f32 resolved radiance sum
    cnt_prev: jnp.ndarray  # (N+1,) i32 resolved sample count
    frames: jnp.ndarray    # (N+1,) i32 frames since last touch (aging)
    cam_pos: jnp.ndarray   # (3,) f32 grid origin anchor (cache_grid_params_t)


def make_cache(entries: int = DEFAULT_ENTRIES,
               cam_pos=(0.0, 0.0, 0.0)) -> CacheState:
    n = entries + 1
    return CacheState(
        key_lo=jnp.zeros((n,), jnp.uint32),
        key_hi=jnp.zeros((n,), jnp.uint32),
        rad_curr=jnp.zeros((n, 3), jnp.float32),
        cnt_curr=jnp.zeros((n,), jnp.int32),
        rad_prev=jnp.zeros((n, 3), jnp.float32),
        cnt_prev=jnp.zeros((n,), jnp.int32),
        frames=jnp.zeros((n,), jnp.int32),
        cam_pos=jnp.asarray(cam_pos, jnp.float32),
    )


def _jenkins32(a):
    """Bob Jenkins' 32-bit integer hash (RadCacheRef.h:11-19)."""
    a = jnp.asarray(a, jnp.uint32)
    a = (a + jnp.uint32(0x7ED55D16)) + (a << 12)
    a = (a ^ jnp.uint32(0xC761C23C)) ^ (a >> 19)
    a = (a + jnp.uint32(0x165667B1)) + (a << 5)
    a = (a + jnp.uint32(0xD3A2646C)) ^ (a << 9)
    a = (a + jnp.uint32(0xFD7046C5)) + (a << 3)
    a = (a ^ jnp.uint32(0xB55A4F09)) ^ (a >> 16)
    return a


def grid_level(p, cam_pos):
    """Logarithmic grid level by camera distance (RadCacheRef.cpp:156-161)."""
    d = p - cam_pos[None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))
    lvl = jnp.floor(
        jnp.log2(dist) / jnp.log2(RAD_CACHE_LOG_BASE) + HASH_GRID_LEVEL_BIAS
    )
    return jnp.clip(lvl, 1.0, HASH_GRID_LEVEL_BIT_MASK).astype(jnp.int32)


def voxel_size(level):
    """Core.h:564-566."""
    return jnp.power(RAD_CACHE_LOG_BASE, level.astype(jnp.float32)) / (
        RAD_CACHE_GRID_SCALE * RAD_CACHE_LOG_BASE ** HASH_GRID_LEVEL_BIAS
    )


def compute_hash(p, n, cam_pos):
    """64-bit key (bit layout of RadCacheRef.cpp:22-37) as two u32 columns,
    plus the folded 32-bit slot hash (hash64, RadCacheRef.h:21-24)."""
    lvl = grid_level(p, cam_pos)
    vs = voxel_size(lvl)
    gp = jnp.floor(p / vs[:, None]).astype(jnp.int32).astype(jnp.uint32)
    x = gp[:, 0] & HASH_GRID_POSITION_BIT_MASK
    y = gp[:, 1] & HASH_GRID_POSITION_BIT_MASK
    z = gp[:, 2] & HASH_GRID_POSITION_BIT_MASK
    lv = lvl.astype(jnp.uint32) & HASH_GRID_LEVEL_BIT_MASK
    nb = (
        (n[:, 0] >= 0).astype(jnp.uint32)
        + 2 * (n[:, 1] >= 0).astype(jnp.uint32)
        + 4 * (n[:, 2] >= 0).astype(jnp.uint32)
    )
    # bits 0..16 = x, 17..33 = y, 34..50 = z, 51..60 = level, 61..63 = octant
    lo = x | ((y & jnp.uint32(0x7FFF)) << 17)
    hi = (
        (y >> 15)
        | (z << 2)
        | (lv << 19)
        | (nb << 29)
    )
    slot_hash = _jenkins32(lo) ^ _jenkins32(hi)
    return lo, hi, slot_hash


def _probe_candidates(slot_hash, n_entries):
    base = (slot_hash % jnp.uint32(n_entries)).astype(jnp.int32)
    offs = jnp.arange(PROBE_LEN, dtype=jnp.int32)[None, :]
    return (base[:, None] + offs) % n_entries  # (R, PROBE_LEN)


def _first_true(mask):
    """Index of the first True along axis -1, or -1."""
    any_ = jnp.any(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1)
    return jnp.where(any_, idx, -1), any_


def find_entries(state: CacheState, p, n):
    """Vectorized hash_map_find (RadCacheRef.cpp:108-123): returns
    (entry (R,) i32 index or dump row, found (R,) bool)."""
    n_entries = state.key_lo.shape[0] - 1
    lo, hi, h = compute_hash(p, n, state.cam_pos)
    cand = _probe_candidates(h, n_entries)
    s_lo = state.key_lo[cand]
    s_hi = state.key_hi[cand]
    match = (s_lo == lo[:, None]) & (s_hi == hi[:, None])
    idx, found = _first_true(match)
    entry = jnp.where(found, jnp.take_along_axis(
        cand, jnp.maximum(idx, 0)[:, None], axis=1)[:, 0], n_entries)
    return entry, found


def claim_entries(state: CacheState, p, n, active):
    """Vectorized hash_map_insert (RadCacheRef.cpp:92-106).

    Returns (new_state, entry (R,), ok (R,)).  Claims resolve over
    ``CLAIM_ROUNDS`` scatter/regather rounds; lanes that cannot claim a
    slot get the dump row and ok=False.
    """
    n_entries = state.key_lo.shape[0] - 1
    lo, hi, h = compute_hash(p, n, state.cam_pos)
    cand = _probe_candidates(h, n_entries)
    key_lo, key_hi = state.key_lo, state.key_hi

    entry = jnp.full(lo.shape, n_entries, jnp.int32)
    ok = jnp.zeros(lo.shape, jnp.bool_)
    for _ in range(CLAIM_ROUNDS):
        s_lo = key_lo[cand]
        s_hi = key_hi[cand]
        match = (s_lo == lo[:, None]) & (s_hi == hi[:, None])
        m_idx, m_found = _first_true(match)
        got = active & (~ok) & m_found
        entry = jnp.where(
            got,
            jnp.take_along_axis(cand, jnp.maximum(m_idx, 0)[:, None], 1)[:, 0],
            entry,
        )
        ok = ok | got

        # unclaimed lanes write their key to their first empty candidate
        empty = (s_lo == 0) & (s_hi == 0)
        e_idx, e_found = _first_true(empty)
        want = active & (~ok) & e_found
        tgt = jnp.where(
            want,
            jnp.take_along_axis(cand, jnp.maximum(e_idx, 0)[:, None], 1)[:, 0],
            n_entries,
        )
        key_lo = key_lo.at[tgt].set(jnp.where(want, lo, key_lo[tgt]))
        key_hi = key_hi.at[tgt].set(jnp.where(want, hi, key_hi[tgt]))
        key_lo = key_lo.at[n_entries].set(0)
        key_hi = key_hi.at[n_entries].set(0)

    # final regather for the last round's writers
    s_lo = key_lo[cand]
    s_hi = key_hi[cand]
    match = (s_lo == lo[:, None]) & (s_hi == hi[:, None])
    m_idx, m_found = _first_true(match)
    got = active & (~ok) & m_found
    entry = jnp.where(
        got,
        jnp.take_along_axis(cand, jnp.maximum(m_idx, 0)[:, None], 1)[:, 0],
        entry,
    )
    ok = ok | got
    return state._replace(key_lo=key_lo, key_hi=key_hi), entry, ok


def accumulate(state: CacheState, entry, rad, count_inc, valid):
    """accumulate_cache_voxel (RadCacheRef.cpp:138-152) over a wavefront:
    scatter-add radiance and sample counts into voxels_curr."""
    n_entries = state.key_lo.shape[0] - 1
    tgt = jnp.where(valid, entry, n_entries)
    rad = jnp.where(valid[:, None], rad, 0.0)
    cnt = jnp.where(valid, count_inc, 0).astype(jnp.int32)
    rad_curr = state.rad_curr.at[tgt].add(rad)
    cnt_curr = state.cnt_curr.at[tgt].add(cnt)
    return state._replace(rad_curr=rad_curr, cnt_curr=cnt_curr)


def query(state: CacheState, p, n, active):
    """Cache lookup for the shade-stage early exit (ShadeRef.cpp:1378-1390).
    Returns (radiance (R,3), hit (R,) bool) — radiance is already divided
    by the sample count."""
    entry, found = find_entries(state, p, n)
    cnt = state.cnt_prev[entry]
    good = active & found & (cnt >= RAD_CACHE_SAMPLE_COUNT_MIN)
    rad = state.rad_prev[entry] / jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
    return jnp.where(good[:, None], rad, 0.0), good


@jax.jit
def resolve(state: CacheState) -> CacheState:
    """SpatialCacheResolve (RadCacheRef.cpp:232-312) without compaction:
    merge curr into prev, cap the sample count with proportional radiance
    rescale, age untouched entries, free stale ones.

    The reference's adjacent-level filter (borrowing coarser/finer voxels
    while a moved camera warms up) and bucket compaction are intentionally
    dropped: the first is a moving-camera warm-up heuristic, the second
    only shortens CPU probe chains.
    """
    occupied = (state.key_lo != 0) | (state.key_hi != 0)

    rad = state.rad_prev + state.rad_curr
    cnt = state.cnt_prev + state.cnt_curr

    over = cnt > RAD_CACHE_SAMPLE_COUNT_MAX
    k = jnp.where(
        over, RAD_CACHE_SAMPLE_COUNT_MAX / jnp.maximum(cnt, 1).astype(jnp.float32), 1.0
    )
    rad = rad * k[:, None]
    cnt = jnp.minimum(cnt, RAD_CACHE_SAMPLE_COUNT_MAX)

    touched = state.cnt_curr > 0
    frames = jnp.where(touched, 0, state.frames + 1)

    stale = occupied & (frames > RAD_CACHE_STALE_FRAME_NUM_MAX)
    keep = occupied & (~stale)
    zero3 = jnp.zeros_like(rad)
    return CacheState(
        key_lo=jnp.where(keep, state.key_lo, 0),
        key_hi=jnp.where(keep, state.key_hi, 0),
        rad_curr=zero3,
        cnt_curr=jnp.zeros_like(cnt),
        rad_prev=jnp.where(keep[:, None], rad, zero3),
        cnt_prev=jnp.where(keep, cnt, 0),
        frames=jnp.where(keep, frames, 0),
        cam_pos=state.cam_pos,
    )


def propagate_and_accumulate(state: CacheState, deltas, throughputs,
                             positions, normals, vertex_valid):
    """The suffix-sum equivalent of SpatialCacheUpdate
    (RadCacheRef.cpp:179-230): entry at vertex j receives
    ``Σ_{k≥j} delta_k / T_j`` and one sample count at its own vertex.

    Args (B = bounce count, R = rays):
      deltas: (B, R, 3) radiance contribution discovered at bounce k.
      throughputs: (B, R, 3) path throughput at the start of bounce k.
      positions/normals: (B, R, 3) hit point / geometric normal at k.
      vertex_valid: (B, R) bool — a cacheable vertex exists at bounce k
        (first RAD_CACHE_PROPAGATION_DEPTH real hits only).
    """
    # L_from[k] = Σ_{j>=k} delta_j   (reverse cumulative sum over bounces)
    l_from = jnp.cumsum(deltas[::-1], axis=0)[::-1]
    t = jnp.maximum(throughputs, 1e-12)
    contrib = jnp.where(vertex_valid[..., None], l_from / t, 0.0)

    B, R = vertex_valid.shape
    flat_p = positions.reshape(B * R, 3)
    flat_n = normals.reshape(B * R, 3)
    flat_c = contrib.reshape(B * R, 3)
    flat_v = vertex_valid.reshape(B * R)

    state, entry, ok = claim_entries(state, flat_p, flat_n, flat_v)
    return accumulate(
        state, entry, flat_c, jnp.ones_like(entry), flat_v & ok
    )
