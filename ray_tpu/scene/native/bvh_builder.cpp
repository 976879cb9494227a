// Native binned-SAH BVH2 builder.
//
// The host-side scene compile is the one part of this framework where the
// reference's C++ runtime (internal/Core.cpp:492 PreprocessPrims_SAH,
// internal/BVHSplit.cpp) has no JAX analogue — BVH construction is
// irregular, pointer-chasing work that numpy does poorly at scale.  This
// builder emits bit-identical array layouts to the numpy builder in
// ../bvh.py (child-bounds-in-parent slots, packed leaf codes) so the two
// are interchangeable; scene/native/__init__.py compiles it on first use
// with g++ and falls back to numpy when no toolchain exists.
//
// Build: g++ -O3 -march=native -shared -fPIC bvh_builder.cpp -o libbvh.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumBins = 16;
constexpr int kLeafCountBits = 4;  // must match scene/bvh.py LEAF_COUNT_BITS

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float axis_of(const Vec3 &v, int a) {
  return a == 0 ? v.x : (a == 1 ? v.y : v.z);
}
inline float half_area(const Vec3 &lo, const Vec3 &hi) {
  const float ex = std::max(hi.x - lo.x, 0.f);
  const float ey = std::max(hi.y - lo.y, 0.f);
  const float ez = std::max(hi.z - lo.z, 0.f);
  return ex * ey + ey * ez + ez * ex;
}

struct Builder {
  const Vec3 *lo;
  const Vec3 *hi;
  std::vector<Vec3> centroid;
  std::vector<int32_t> order;
  int max_leaf;
  // stop splitting once a node fits max_leaf prims (TPU per-visit leaf cost
  // model — a wide-BVH leaf visit costs one gather regardless of count)
  bool fat_leaves;

  // output slots
  std::vector<float> child_lo;   // n_slots * 2 * 3
  std::vector<float> child_hi;
  std::vector<int32_t> child;    // n_slots * 2
  std::vector<int32_t> counts;   // n_slots * 2

  int make_slot() {
    const int s = static_cast<int>(child.size() / 2);
    child_lo.resize(child_lo.size() + 6, 0.f);
    child_hi.resize(child_hi.size() + 6, 0.f);
    child.resize(child.size() + 2, 0);
    counts.resize(counts.size() + 2, 0);
    return s;
  }

  void subset_bounds(int start, int end, Vec3 &blo, Vec3 &bhi) const {
    blo = {FLT_MAX, FLT_MAX, FLT_MAX};
    bhi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = start; i < end; ++i) {
      blo = vmin(blo, lo[order[i]]);
      bhi = vmax(bhi, hi[order[i]]);
    }
  }

  static int32_t leaf_code(int first, int count) {
    return -(((first << kLeafCountBits) | count) + 1);
  }

  // Returns split mid, or -1 for "make a leaf".
  int split(int start, int end) {
    const int count = end - start;
    Vec3 clo = {FLT_MAX, FLT_MAX, FLT_MAX};
    Vec3 chi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = start; i < end; ++i) {
      clo = vmin(clo, centroid[order[i]]);
      chi = vmax(chi, centroid[order[i]]);
    }

    Vec3 plo, phi;
    subset_bounds(start, end, plo, phi);
    const float parent_area = std::max(2.f * half_area(plo, phi), 1e-30f);
    const float leaf_cost = static_cast<float>(count);

    float best_cost = FLT_MAX;
    int best_axis = -1, best_bin = -1;
    float best_lo_a = 0.f, best_scale = 0.f;

    for (int axis = 0; axis < 3; ++axis) {
      const float ext = axis_of(chi, axis) - axis_of(clo, axis);
      if (ext < 1e-12f) continue;
      const float scale = kNumBins * (1.f - 1e-6f) / ext;
      const float lo_a = axis_of(clo, axis);

      int bcount[kNumBins] = {};
      Vec3 blo[kNumBins], bhi[kNumBins];
      for (int b = 0; b < kNumBins; ++b) {
        blo[b] = {FLT_MAX, FLT_MAX, FLT_MAX};
        bhi[b] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      }
      for (int i = start; i < end; ++i) {
        const int p = order[i];
        int b = static_cast<int>((axis_of(centroid[p], axis) - lo_a) * scale);
        b = std::min(b, kNumBins - 1);
        ++bcount[b];
        blo[b] = vmin(blo[b], lo[p]);
        bhi[b] = vmax(bhi[b], hi[p]);
      }

      // sweep
      int lcount[kNumBins - 1];
      float larea[kNumBins - 1];
      {
        int c = 0;
        Vec3 alo = {FLT_MAX, FLT_MAX, FLT_MAX};
        Vec3 ahi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        for (int b = 0; b < kNumBins - 1; ++b) {
          c += bcount[b];
          alo = vmin(alo, blo[b]);
          ahi = vmax(ahi, bhi[b]);
          lcount[b] = c;
          larea[b] = c > 0 ? 2.f * half_area(alo, ahi) : 0.f;
        }
      }
      {
        int c = 0;
        Vec3 alo = {FLT_MAX, FLT_MAX, FLT_MAX};
        Vec3 ahi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        for (int b = kNumBins - 1; b >= 1; --b) {
          c += bcount[b];
          alo = vmin(alo, blo[b]);
          ahi = vmax(ahi, bhi[b]);
          const int rcount = c;
          const float rarea = c > 0 ? 2.f * half_area(alo, ahi) : 0.f;
          const int k = b - 1;
          if (lcount[k] > 0 && rcount > 0) {
            const float cost =
                1.f + (larea[k] * lcount[k] + rarea * rcount) / parent_area;
            if (cost < best_cost) {
              best_cost = cost;
              best_axis = axis;
              best_bin = k;
              best_lo_a = lo_a;
              best_scale = scale;
            }
          }
        }
      }
    }

    if (best_axis >= 0 &&
        (count > max_leaf || (!fat_leaves && best_cost < leaf_cost))) {
      auto pred = [&](int32_t p) {
        int b = static_cast<int>(
            (axis_of(centroid[p], best_axis) - best_lo_a) * best_scale);
        b = std::min(b, kNumBins - 1);
        return b <= best_bin;
      };
      int32_t *first = order.data() + start;
      int32_t *last = order.data() + end;
      int32_t *mid = std::partition(first, last, pred);
      const int nleft = static_cast<int>(mid - first);
      if (nleft > 0 && nleft < count) return start + nleft;
    }

    if (count <= max_leaf) return -1;
    // median fallback
    const int axis =
        (axis_of(chi, 0) - axis_of(clo, 0) > axis_of(chi, 1) - axis_of(clo, 1))
            ? ((axis_of(chi, 0) - axis_of(clo, 0) >
                axis_of(chi, 2) - axis_of(clo, 2))
                   ? 0
                   : 2)
            : ((axis_of(chi, 1) - axis_of(clo, 1) >
                axis_of(chi, 2) - axis_of(clo, 2))
                   ? 1
                   : 2);
    std::nth_element(order.begin() + start, order.begin() + start + count / 2,
                     order.begin() + end, [&](int32_t a, int32_t b) {
                       return axis_of(centroid[a], axis) <
                              axis_of(centroid[b], axis);
                     });
    return start + count / 2;
  }

  void build(int n) {
    struct Item {
      int slot, side, start, end;
    };
    std::vector<Item> stack;
    make_slot();
    const int mid = split(0, n);
    if (mid < 0) {
      Vec3 blo, bhi;
      subset_bounds(0, n, blo, bhi);
      std::memcpy(&child_lo[0], &blo, 12);
      std::memcpy(&child_hi[0], &bhi, 12);
      child[0] = leaf_code(0, n);
      counts[0] = n;
      const Vec3 inf = {FLT_MAX, FLT_MAX, FLT_MAX};
      const Vec3 ninf = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      std::memcpy(&child_lo[3], &inf, 12);
      std::memcpy(&child_hi[3], &ninf, 12);
      child[1] = leaf_code(0, 0);
      counts[1] = 0;
      return;
    }
    stack.push_back({0, 0, 0, mid});
    stack.push_back({0, 1, mid, n});

    while (!stack.empty()) {
      const Item it = stack.back();
      stack.pop_back();
      Vec3 blo, bhi;
      subset_bounds(it.start, it.end, blo, bhi);
      std::memcpy(&child_lo[(it.slot * 2 + it.side) * 3], &blo, 12);
      std::memcpy(&child_hi[(it.slot * 2 + it.side) * 3], &bhi, 12);
      const int m = split(it.start, it.end);
      if (m < 0) {
        child[it.slot * 2 + it.side] = leaf_code(it.start, it.end - it.start);
        counts[it.slot * 2 + it.side] = it.end - it.start;
      } else {
        const int s = make_slot();
        child[it.slot * 2 + it.side] = s;
        stack.push_back({s, 0, it.start, m});
        stack.push_back({s, 1, m, it.end});
      }
    }
  }
};

}  // namespace

extern "C" {

// Returns the number of node slots written, or -1 if capacity is too small.
// Capacity arrays must hold at least n prim slots (a binary BVH over n prims
// has at most n internal slots in this representation).
int ray_tpu_build_bvh2(const float *tri_lo, const float *tri_hi, int n,
                       int max_leaf, float *out_child_lo, float *out_child_hi,
                       int32_t *out_child, int32_t *out_counts,
                       int32_t *out_prim_indices, float *out_root_lo,
                       float *out_root_hi, int capacity, int fat_leaves) {
  Builder b;
  b.lo = reinterpret_cast<const Vec3 *>(tri_lo);
  b.hi = reinterpret_cast<const Vec3 *>(tri_hi);
  b.max_leaf = max_leaf;
  b.fat_leaves = fat_leaves != 0;
  b.centroid.resize(n);
  b.order.resize(n);
  for (int i = 0; i < n; ++i) {
    b.centroid[i] = {0.5f * (b.lo[i].x + b.hi[i].x),
                     0.5f * (b.lo[i].y + b.hi[i].y),
                     0.5f * (b.lo[i].z + b.hi[i].z)};
    b.order[i] = i;
  }
  b.build(n);

  const int n_slots = static_cast<int>(b.child.size() / 2);
  if (n_slots > capacity) return -1;
  std::memcpy(out_child_lo, b.child_lo.data(), b.child_lo.size() * 4);
  std::memcpy(out_child_hi, b.child_hi.data(), b.child_hi.size() * 4);
  std::memcpy(out_child, b.child.data(), b.child.size() * 4);
  std::memcpy(out_counts, b.counts.data(), b.counts.size() * 4);
  std::memcpy(out_prim_indices, b.order.data(), n * 4);

  Vec3 rlo = vmin(*reinterpret_cast<Vec3 *>(&b.child_lo[0]),
                  *reinterpret_cast<Vec3 *>(&b.child_lo[3]));
  Vec3 rhi = vmax(*reinterpret_cast<Vec3 *>(&b.child_hi[0]),
                  *reinterpret_cast<Vec3 *>(&b.child_hi[3]));
  if (b.counts[1] == 0 && b.child[1] < 0) {  // single-leaf scene
    rlo = *reinterpret_cast<Vec3 *>(&b.child_lo[0]);
    rhi = *reinterpret_cast<Vec3 *>(&b.child_hi[0]);
  }
  std::memcpy(out_root_lo, &rlo, 12);
  std::memcpy(out_root_hi, &rhi, 12);
  return n_slots;
}

}  // extern "C"
