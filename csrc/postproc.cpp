// Native host core for volume postprocessing: connected-component labeling
// and region properties.
//
// Replaces the skimage.measure.label / regionprops C internals the reference
// leans on (/root/reference/lungmask/utils.py:293-298; SURVEY §2.3) with a
// single-pass union-find tuned for multi-class label volumes:
//
//  * same-value connectivity (two voxels join a component iff neighbors AND
//    equal value; 0 = background) — skimage semantics,
//  * connectivity 1 (6/4-neighborhood) or full (26/8),
//  * output labels renumbered 1..n in raster-scan first-occurrence order
//    (skimage's ordering, which downstream tie-breaking depends on),
//  * fused region properties (area, max intensity, bounding box) in the same
//    pass — no separate regionprops sweep.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {
// LM_POSTPROC_TIMING=1 → per-stage wall times of lm_postprocess to stderr.
inline bool pp_timing() {
  static int v = -1;
  if (v < 0) {
    const char* e = getenv("LM_POSTPROC_TIMING");
    v = (e && *e == '1') ? 1 : 0;
  }
  return v == 1;
}
inline double pp_now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
}  // namespace

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  int32_t make() {
    parent.push_back(static_cast<int32_t>(parent.size()));
    return static_cast<int32_t>(parent.size()) - 1;
  }
  int32_t find(int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];  // path halving
      a = parent[a];
    }
    return a;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

}  // namespace

// Multi-class connected components, run-length union-find.
//
// Label volumes are highly run-compressible (a lung field is one run per
// row), so rows compress into maximal same-value runs and all union work
// happens between overlapping runs of adjacent rows — typically 50-100×
// fewer union-find operations than the per-voxel formulation, with the
// remaining O(voxels) work being two sequential passes (run extraction and
// label fill).
//
//   img:  int32 volume (z*y*x), 0 = background
//   out:  int32 labels, 0 background, 1..n in raster first-occurrence order
// Returns n (number of components), or -1 on error.

namespace {

struct Run {
  int32_t x0, x1;  // half-open
  int32_t value;
  int32_t prov;  // union-find provisional id
};

// Union a row's runs against a previously-visited row's runs (two-pointer
// interval sweep). `slack` is 0 for axis connectivity, 1 for full
// (diagonal) connectivity: intervals [x0-slack, x1+slack) must intersect.
inline void unite_rows(UnionFind& uf, std::vector<Run>& runs,
                       int64_t a0, int64_t a1, int64_t b0, int64_t b1,
                       int32_t slack) {
  int64_t j = b0;
  for (int64_t i = a0; i < a1; ++i) {
    const int32_t lo = runs[i].x0 - slack, hi = runs[i].x1 + slack;
    while (j < b1 && runs[j].x1 <= lo) ++j;
    for (int64_t k = j; k < b1 && runs[k].x0 < hi; ++k)
      if (runs[k].value == runs[i].value) {
        const int32_t ra = uf.find(runs[i].prov), rb = uf.find(runs[k].prov);
        if (ra != rb) uf.unite(ra, rb);
      }
  }
}

// Per-component statistics accumulated from runs (the run sweep knows each
// run's value, length and extent, so a separate voxel-level regionprops pass
// over the volume is unnecessary).
struct CompStats {
  std::vector<int64_t> areas;
  std::vector<int32_t> value;    // the component's (single) image value
  std::vector<int32_t> bbox;     // n*6: z0,y0,x0,z1,y1,x1 half-open
};

// Run-length union-find CC labeling, templated over the input sample type,
// with fused per-component stats. Labels are 1..n in raster first-occurrence
// order (skimage ordering). Returns n.
template <typename T>
int32_t label_runs(const T* img, int64_t nz, int64_t ny, int64_t nx,
                   bool full, int32_t* out, CompStats* stats) {
  const int64_t sy = nx, sz = ny * nx;
  const int32_t slack = full ? 1 : 0;
  UnionFind uf;
  static thread_local std::vector<Run> runs;
  runs.clear();
  runs.reserve(1 << 16);
  static thread_local std::vector<int64_t> row_start;
  row_start.assign(nz * ny + 1, 0);

  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t row = z * sz + y * sy;
      row_start[z * ny + y] = static_cast<int64_t>(runs.size());
      for (int64_t x = 0; x < nx;) {
        const int32_t v = static_cast<int32_t>(img[row + x]);
        if (v == 0) { ++x; continue; }
        int64_t e = x + 1;
        while (e < nx && static_cast<int32_t>(img[row + e]) == v) ++e;
        // Provisional ids are int32; a billion-voxel worst-case (alternating)
        // volume could overflow them. Fail cleanly (callers fall back to the
        // Python/scipy path) instead of wrapping into UB.
        if (runs.size() >= static_cast<size_t>(INT32_MAX) - 1) return -1;
        runs.push_back({static_cast<int32_t>(x), static_cast<int32_t>(e), v,
                        uf.make()});
        x = e;
      }
      const int64_t a0 = row_start[z * ny + y];
      const int64_t a1 = static_cast<int64_t>(runs.size());
      if (a1 == a0) continue;
      if (y > 0) {
        const int64_t b0 = row_start[z * ny + y - 1];
        unite_rows(uf, runs, a0, a1, b0, row_start[z * ny + y], slack);
      }
      if (z > 0) {
        const int64_t ylo = full ? (y > 0 ? y - 1 : 0) : y;
        const int64_t yhi = full ? (y + 1 < ny ? y + 1 : ny - 1) : y;
        for (int64_t yy = ylo; yy <= yhi; ++yy) {
          const int64_t b0 = row_start[(z - 1) * ny + yy];
          const int64_t b1 = row_start[(z - 1) * ny + yy + 1];
          unite_rows(uf, runs, a0, a1, b0, b1, slack);
        }
      }
    }
  }
  row_start[nz * ny] = static_cast<int64_t>(runs.size());

  static thread_local std::vector<int32_t> remap;
  remap.assign(uf.parent.size(), 0);
  int32_t next = 0;
  for (auto& r : runs) {
    const int32_t root = uf.find(r.prov);
    if (remap[root] == 0) remap[root] = ++next;
    r.prov = remap[root];
  }
  if (stats) {
    stats->areas.assign(next, 0);
    stats->value.assign(next, 0);
    stats->bbox.assign(static_cast<size_t>(next) * 6, 0);
    for (int32_t l = 0; l < next; ++l) {
      int32_t* b = stats->bbox.data() + static_cast<size_t>(l) * 6;
      b[0] = static_cast<int32_t>(nz);
      b[1] = static_cast<int32_t>(ny);
      b[2] = static_cast<int32_t>(nx);
    }
    int64_t ri = 0;
    for (int64_t z = 0; z < nz; ++z)
      for (int64_t y = 0; y < ny; ++y) {
        const int64_t r1 = row_start[z * ny + y + 1];
        for (; ri < r1; ++ri) {
          const Run& r = runs[ri];
          const int32_t k = r.prov - 1;
          stats->areas[k] += r.x1 - r.x0;
          stats->value[k] = r.value;
          int32_t* b = stats->bbox.data() + static_cast<size_t>(k) * 6;
          if (z < b[0]) b[0] = static_cast<int32_t>(z);
          if (y < b[1]) b[1] = static_cast<int32_t>(y);
          if (r.x0 < b[2]) b[2] = r.x0;
          if (z + 1 > b[3]) b[3] = static_cast<int32_t>(z + 1);
          if (y + 1 > b[4]) b[4] = static_cast<int32_t>(y + 1);
          if (r.x1 > b[5]) b[5] = r.x1;
        }
      }
  }
  std::memset(out, 0, sizeof(int32_t) * nz * sz);
  int64_t ri = 0;
  for (int64_t z = 0; z < nz; ++z)
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t row = z * sz + y * sy;
      const int64_t r1 = row_start[z * ny + y + 1];
      for (; ri < r1; ++ri) {
        const Run& r = runs[ri];
        int32_t* dst = out + row + r.x0;
        const int32_t lbl = r.prov;
        for (int32_t x = r.x0; x < r.x1; ++x) *dst++ = lbl;
      }
    }
  return next;
}

}  // namespace

extern "C" {

int32_t lm_label(const int32_t* img, int64_t nz, int64_t ny, int64_t nx,
                 int32_t connectivity, int32_t* out) {
  return label_runs<int32_t>(img, nz, ny, nx, connectivity != 1, out, nullptr);
}

// Fused region properties over a labeled volume.
//   labels:     int32 from lm_label (1..n_labels)
//   intensity:  int32 original label image (may be NULL)
//   areas:      int64[n_labels]
//   max_int:    int32[n_labels] (untouched when intensity == NULL)
//   bbox:       int32[n_labels*6]  (z0,y0,x0,z1,y1,x1 half-open)
void lm_regionprops(const int32_t* labels, const int32_t* intensity,
                    int64_t nz, int64_t ny, int64_t nx, int32_t n_labels,
                    int64_t* areas, int32_t* max_int, int32_t* bbox) {
  for (int32_t l = 0; l < n_labels; ++l) {
    areas[l] = 0;
    if (intensity) max_int[l] = INT32_MIN;
    bbox[l * 6 + 0] = static_cast<int32_t>(nz);
    bbox[l * 6 + 1] = static_cast<int32_t>(ny);
    bbox[l * 6 + 2] = static_cast<int32_t>(nx);
    bbox[l * 6 + 3] = 0;
    bbox[l * 6 + 4] = 0;
    bbox[l * 6 + 5] = 0;
  }
  int64_t i = 0;
  for (int64_t z = 0; z < nz; ++z)
    for (int64_t y = 0; y < ny; ++y)
      for (int64_t x = 0; x < nx; ++x, ++i) {
        const int32_t l = labels[i];
        if (l == 0) continue;
        const int32_t k = l - 1;
        ++areas[k];
        if (intensity && intensity[i] > max_int[k]) max_int[k] = intensity[i];
        int32_t* b = bbox + k * 6;
        if (z < b[0]) b[0] = static_cast<int32_t>(z);
        if (y < b[1]) b[1] = static_cast<int32_t>(y);
        if (x < b[2]) b[2] = static_cast<int32_t>(x);
        if (z + 1 > b[3]) b[3] = static_cast<int32_t>(z + 1);
        if (y + 1 > b[4]) b[4] = static_cast<int32_t>(y + 1);
        if (x + 1 > b[5]) b[5] = static_cast<int32_t>(x + 1);
      }
}

// Border-seeded background flood fill (hole filling), cross connectivity.
//   mask: uint8 in/out — holes (background unreachable from the border) are
//   set to 1. Matches scipy.ndimage.binary_fill_holes' default structure /
//   fill_voids.fill (/root/reference/lungmask/utils.py:352).
//
// Scanline span flood: whole maximal background runs are marked and queued
// at once, so the queue holds O(runs) spans instead of O(voxels) positions.

namespace {

struct Span {
  int32_t z, y, x0, x1;  // x half-open
};

}  // namespace

void lm_fill_holes(uint8_t* mask, int64_t nz, int64_t ny, int64_t nx) {
  const int64_t sy = nx, sz = ny * nx, n = nz * sz;
  std::vector<uint8_t> reached(n, 0);
  std::vector<Span> stack;
  stack.reserve(1 << 12);

  // Expand position x in row (z, y) to its maximal unreached-background run,
  // mark it reached, and queue it.
  auto seed = [&](int64_t z, int64_t y, int64_t x) {
    const int64_t base = z * sz + y * sy;
    if (mask[base + x] || reached[base + x]) return;
    int64_t l = x, r = x + 1;
    while (l > 0 && !mask[base + l - 1] && !reached[base + l - 1]) --l;
    while (r < nx && !mask[base + r] && !reached[base + r]) ++r;
    std::memset(reached.data() + base + l, 1, (size_t)(r - l));
    stack.push_back({(int32_t)z, (int32_t)y, (int32_t)l, (int32_t)r});
  };

  for (int64_t y = 0; y < ny; ++y)
    for (int64_t x = 0; x < nx; ++x) {
      seed(0, y, x);
      seed(nz - 1, y, x);
    }
  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t x = 0; x < nx; ++x) {
      seed(z, 0, x);
      seed(z, ny - 1, x);
    }
    for (int64_t y = 0; y < ny; ++y) {
      seed(z, y, 0);
      seed(z, y, nx - 1);
    }
  }

  while (!stack.empty()) {
    const Span s = stack.back();
    stack.pop_back();
    const int64_t nbrs[4][2] = {
        {s.z, s.y - 1}, {s.z, s.y + 1}, {s.z - 1, s.y}, {s.z + 1, s.y}};
    for (const auto& nb : nbrs) {
      const int64_t z = nb[0], y = nb[1];
      if (z < 0 || z >= nz || y < 0 || y >= ny) continue;
      const int64_t base = z * sz + y * sy;
      int64_t x = s.x0;
      while (x < s.x1) {
        if (!mask[base + x] && !reached[base + x]) {
          int64_t l = x, r = x + 1;
          while (l > 0 && !mask[base + l - 1] && !reached[base + l - 1]) --l;
          while (r < nx && !mask[base + r] && !reached[base + r]) ++r;
          std::memset(reached.data() + base + l, 1, (size_t)(r - l));
          stack.push_back({(int32_t)z, (int32_t)y, (int32_t)l, (int32_t)r});
          x = r;
        } else {
          ++x;
        }
      }
    }
  }

  for (int64_t i = 0; i < n; ++i)
    if (!mask[i] && !reached[i]) mask[i] = 1;
}

// Full exact postprocessing in one native call (3-D volumes).
//
// Mirrors transforms/postprocess.py::postprocessing (the windowed
// re-derivation of /root/reference/lungmask/utils.py:272-358) voxel-for-voxel
// — that Python implementation remains the oracle and the differential tests
// in tests/test_native.py pin this one against it. The merge loop is the
// fused-path bottleneck in Python (per-region scipy dilation + np.unique over
// thousands of regions); here it is a 7-point stencil sweep over each
// region's current bounding window.
//
// Quirks reproduced exactly (see the Python docstring for the full list):
// ascending-area processing with stable (label-order) ties; dilated-border
// vote with ties by ascending component label; *component labels* compared
// against `spare` values at the vote (utils.py:323); champion-area cache
// mutation on merges (utils.py:330-339); sub-skip_below regions neither merge
// nor update caches; final sweep over sorted-unique class values with the
// FIRST value dropped (utils.py:355 `np.unique(mapped)[1:]`, even when 0 is
// absent); last-maximal-region tie-break for per-class champions; hole
// filling on the champion's own bounding window.
//
//   label_image: uint8 volume (z,y,x), the multi-class prediction
//   spare/n_spare: spare label values (fusion path), may be empty
//   skip_below: minimum region area to participate in merging
//   out: uint8 postprocessed volume (caller-allocated, same shape)
// Returns 0 on success, -1 on error (nz < 2: single-slice volumes use the
// Python area_closing path).
int32_t lm_postprocess(const uint8_t* label_image, int64_t nz, int64_t ny,
                       int64_t nx, const int32_t* spare, int32_t n_spare,
                       int32_t skip_below, uint8_t* out) {
  if (nz < 2) return -1;
  const int64_t sy = nx, sz = ny * nx, n = nz * sz;

  auto in_spare = [&](int64_t v) {
    for (int32_t s = 0; s < n_spare; ++s)
      if (spare[s] == v) return true;
    return false;
  };

  double t0 = pp_timing() ? pp_now() : 0.0;
  // Persistent scratch: these working buffers total ~250 MB for a full-size
  // fused volume; fresh vectors would be mmap'd and page-faulted anew on
  // every call (multi-second swings measured between identical calls), so
  // they are retained across calls instead.
  static thread_local std::vector<int32_t> comp;
  comp.resize(n);
  static thread_local CompStats st;
  const int32_t n_comp =
      label_runs<uint8_t>(label_image, nz, ny, nx, /*full*/ true, comp.data(), &st);
  if (n_comp < 0) return -1;
  std::vector<int64_t>& areas = st.areas;
  std::vector<int32_t>& maxint = st.value;
  std::vector<int32_t>& bbox = st.bbox;
  if (pp_timing()) {
    fprintf(stderr, "lm_postprocess: label %.3fs (n_comp=%d)\n", pp_now() - t0,
            n_comp);
    t0 = pp_now();
  }

  // Ascending initial area, ties in ascending-label (stable) order.
  std::vector<int32_t> order(n_comp);
  for (int32_t i = 0; i < n_comp; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return areas[a] < areas[b];
  });

  // Initial per-class champion areas + the interim-champion class LUT
  // (every region that strictly exceeded the running max keeps its mark —
  // reference utils.py:294-308 semantics, scanned in ascending-area order).
  int32_t max_class = 0;
  for (int32_t i = 0; i < n_comp; ++i)
    if (maxint[i] > max_class) max_class = maxint[i];
  std::vector<int64_t> champion_area(max_class + 1, 0);
  std::vector<uint8_t> class_of(n_comp + 1, 0);
  for (int32_t oi = 0; oi < n_comp; ++oi) {
    const int32_t r = order[oi];
    const int32_t v = maxint[r];
    if (areas[r] > champion_area[v]) {
      champion_area[v] = areas[r];
      class_of[r + 1] = static_cast<uint8_t>(v);
    }
  }

  // ---- merge loop ----
  bool merged_any = false;
  static thread_local std::vector<int64_t> cnt;
  cnt.assign(n_comp + 1, 0);
  std::vector<int32_t> touched;
  for (int32_t oi = 0; oi < n_comp; ++oi) {
    const int32_t r = order[oi];
    const int32_t L = r + 1;
    const int32_t v = maxint[r];
    if (!((areas[r] < champion_area[v] || in_spare(v)) &&
          areas[r] >= skip_below))
      continue;
    int32_t* b = bbox.data() + static_cast<size_t>(r) * 6;
    const int64_t z0 = b[0] > 2 ? b[0] - 2 : 0, y0 = b[1] > 2 ? b[1] - 2 : 0,
                  x0 = b[2] > 2 ? b[2] - 2 : 0;
    const int64_t z1 = b[3] + 2 < nz ? b[3] + 2 : nz,
                  y1 = b[4] + 2 < ny ? b[4] + 2 : ny,
                  x1 = b[5] + 2 < nx ? b[5] + 2 : nx;
    // Border vote: a voxel is under the dilated footprint iff it is L or has
    // an L 6-neighbor *within the window* (scipy pads with 0 outside the
    // window array — identical membership).
    touched.clear();
    for (int64_t z = z0; z < z1; ++z)
      for (int64_t y = y0; y < y1; ++y) {
        const int64_t row = z * sz + y * sy;
        for (int64_t x = x0; x < x1; ++x) {
          const int64_t p = row + x;
          const int32_t c = comp[p];
          if (c == 0 || c == L) continue;
          const bool dil = (x > x0 && comp[p - 1] == L) ||
                           (x + 1 < x1 && comp[p + 1] == L) ||
                           (y > y0 && comp[p - sy] == L) ||
                           (y + 1 < y1 && comp[p + sy] == L) ||
                           (z > z0 && comp[p - sz] == L) ||
                           (z + 1 < z1 && comp[p + sz] == L);
          if (!dil) continue;
          if (cnt[c]++ == 0) touched.push_back(c);
        }
      }
    std::sort(touched.begin(), touched.end());
    int32_t target = L;
    int64_t best_border = 0, moved = 0;
    for (const int32_t c : touched) {
      if (cnt[c] > best_border && !in_spare(c)) {
        best_border = cnt[c];
        target = c;
        moved = areas[r];
      }
      cnt[c] = 0;
    }
    if (target != L) {
      merged_any = true;
      for (int64_t z = z0; z < z1; ++z)
        for (int64_t y = y0; y < y1; ++y) {
          const int64_t row = z * sz + y * sy;
          for (int64_t x = x0; x < x1; ++x)
            if (comp[row + x] == L) comp[row + x] = target;
        }
      int32_t* tb = bbox.data() + static_cast<size_t>(target - 1) * 6;
      for (int k = 0; k < 3; ++k) {
        if (b[k] < tb[k]) tb[k] = b[k];
        if (b[k + 3] > tb[k + 3]) tb[k + 3] = b[k + 3];
      }
    }
    const int32_t t = target - 1;
    if (areas[t] == champion_area[maxint[t]]) champion_area[maxint[t]] += moved;
    areas[t] += moved;
  }

  if (pp_timing()) {
    fprintf(stderr, "lm_postprocess: merge %.3fs (merged_any=%d)\n",
            pp_now() - t0, (int)merged_any);
    t0 = pp_now();
  }

  // class volume (interim-champion LUT, spare classes zeroed — np.isin on
  // *class values*, utils.py:342).
  for (int32_t l = 1; l <= n_comp; ++l)
    if (class_of[l] && in_spare(class_of[l])) class_of[l] = 0;

  // ---- final sweep: per-class champion + windowed hole fill ----
  // finals: (label, class value, area, bbox*) in ascending label order.
  std::vector<int32_t> fin_label;
  std::vector<uint8_t> fin_value;
  std::vector<int64_t> fin_area;
  const int32_t* fin_bbox = nullptr;
  static thread_local CompStats st2;
  std::vector<int32_t>* comp_final = &comp;
  bool painted_any_zero = false;

  if (!merged_any && n_spare == 0) {
    // No merge wrote into comp and no spare was zeroed: comp restricted to
    // the marked champions IS the final labeling (equality argument in the
    // Python source). Areas are the original (unmutated in this branch).
    for (int32_t l = 1; l <= n_comp; ++l)
      if (class_of[l]) {
        fin_label.push_back(l);
        fin_value.push_back(class_of[l]);
        fin_area.push_back(areas[l - 1]);
      }
    fin_bbox = bbox.data();
  } else {
    // Paint the class volume into `out` (uint8, reused as scratch until the
    // final zero below) and relabel it with fused stats — no separate
    // int32 conversion or regionprops sweep.
    for (int64_t i = 0; i < n; ++i) {
      out[i] = class_of[comp[i]];
      painted_any_zero |= out[i] == 0;
    }
    if (pp_timing()) {
      fprintf(stderr, "lm_postprocess:   paint %.3fs\n", pp_now() - t0);
      t0 = pp_now();
    }
    const int32_t n2 =
        label_runs<uint8_t>(out, nz, ny, nx, true, comp.data(), &st2);
    if (n2 < 0) return -1;
    for (int32_t l = 1; l <= n2; ++l) {
      fin_label.push_back(l);
      fin_value.push_back(static_cast<uint8_t>(st2.value[l - 1]));
      fin_area.push_back(st2.areas[l - 1]);
    }
    fin_bbox = st2.bbox.data();
  }
  if (pp_timing()) {
    fprintf(stderr, "lm_postprocess: final-relabel %.3fs (finals=%zu)\n",
            pp_now() - t0, fin_label.size());
    t0 = pp_now();
  }

  // Classes present, ascending; drop the FIRST sorted-unique value verbatim
  // (utils.py:355) — when 0 is absent this drops the smallest class.
  std::vector<uint8_t> present(max_class + 2, 0);
  if (!merged_any && n_spare == 0) {
    bool any_zero = false;
    for (int64_t i = 0; i < n && !any_zero; ++i)
      if (class_of[comp[i]] == 0) any_zero = true;
    present[0] = any_zero ? 1 : 0;
    for (size_t f = 0; f < fin_label.size(); ++f) present[fin_value[f]] = 1;
  } else {
    present[0] = painted_any_zero ? 1 : 0;
    for (size_t f = 0; f < fin_label.size(); ++f) present[fin_value[f]] = 1;
  }
  std::vector<int32_t> classes;
  for (int32_t v = 0; v <= max_class + 1; ++v)
    if (present[v]) classes.push_back(v);
  if (!classes.empty()) classes.erase(classes.begin());

  // `out` may have served as the class-volume scratch above; zero it now
  // before painting the filled champions.
  std::memset(out, 0, static_cast<size_t>(n));

  // Champion per class: ascending-label scan keeps the LAST maximal region.
  std::vector<int32_t> champ(max_class + 2, -1);
  for (size_t f = 0; f < fin_label.size(); ++f) {
    const uint8_t v = fin_value[f];
    if (!v) continue;
    if (champ[v] < 0 || fin_area[f] >= fin_area[champ[v]]) champ[v] = (int32_t)f;
  }

  static thread_local std::vector<uint8_t> win;
  for (const int32_t v : classes) {
    if (v == 0 || champ[v] < 0) continue;
    const size_t f = champ[v];
    const int32_t L = fin_label[f];
    const int32_t* b = fin_bbox + static_cast<size_t>(L - 1) * 6;
    const int64_t z0 = b[0], y0 = b[1], x0 = b[2], z1 = b[3], y1 = b[4],
                  x1 = b[5];
    const int64_t wz = z1 - z0, wy = y1 - y0, wx = x1 - x0;
    win.assign(static_cast<size_t>(wz) * wy * wx, 0);
    for (int64_t z = z0; z < z1; ++z)
      for (int64_t y = y0; y < y1; ++y) {
        const int64_t row = z * sz + y * sy;
        uint8_t* w = win.data() + ((z - z0) * wy + (y - y0)) * wx;
        for (int64_t x = x0; x < x1; ++x)
          w[x - x0] = ((*comp_final)[row + x] == L) ? 1 : 0;
      }
    lm_fill_holes(win.data(), wz, wy, wx);
    for (int64_t z = z0; z < z1; ++z)
      for (int64_t y = y0; y < y1; ++y) {
        const int64_t row = z * sz + y * sy;
        const uint8_t* w = win.data() + ((z - z0) * wy + (y - y0)) * wx;
        for (int64_t x = x0; x < x1; ++x)
          if (w[x - x0]) out[row + x] = static_cast<uint8_t>(v);
      }
  }
  if (pp_timing())
    fprintf(stderr, "lm_postprocess: fills %.3fs\n", pp_now() - t0);
  return 0;
}

// Fused-path finish in one native call (reference mask.py:228-232 semantics):
//   spare = max(res_l) + 1
//   FN-fill:    res_l[res_l == 0 & res_r > 0] = spare
//   FP-removal: res_l[res_r == 0] = 0
//   out = lm_postprocess(res_l, spare=[spare])
// The three numpy passes over the full-size volume (plus the max scan) fold
// into one streaming pass feeding the postprocessing core directly.
// Returns 0 ok, -1 on error (spare would overflow uint8, or nz < 2).
int32_t lm_fused_finish(const uint8_t* res_l, const uint8_t* res_r, int64_t nz,
                        int64_t ny, int64_t nx, int32_t skip_below,
                        uint8_t* out) {
  const int64_t n = nz * ny * nx;
  uint8_t maxv = 0;
  for (int64_t i = 0; i < n; ++i)
    if (res_l[i] > maxv) maxv = res_l[i];
  if (maxv == 255) return -1;
  const uint8_t spare_u8 = (uint8_t)(maxv + 1);
  static thread_local std::vector<uint8_t> fused;
  fused.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    // Single-pass equivalent of FN-fill-then-FP-removal: res_r==0 always
    // clears; otherwise res_l==0 becomes spare.
    fused[i] = res_r[i] == 0 ? 0 : (res_l[i] == 0 ? spare_u8 : res_l[i]);
  }
  const int32_t spare = spare_u8;
  return lm_postprocess(fused.data(), nz, ny, nx, &spare, 1, skip_below, out);
}

// Expand bit-packed class maps (runtime/engine.py packs masks to 2 or 4 bits
// per pixel on device to shrink the device→host download; the expansion back
// to uint8 sits on the single-volume latency path). One 256-entry word-wide
// LUT turns each packed byte into a 4- or 2-byte store at memory bandwidth.
//   bits: 2 (4 pixels/byte, low crumb first) or 4 (2 pixels/byte, low nibble
//   first). Returns 0 on success, -1 on unsupported bits.
int32_t lm_unpack_bits(const uint8_t* packed, int64_t n_bytes, int32_t bits,
                       uint8_t* out) {
  // LUTs are built byte-wise so pixel order within each packed byte is
  // host-endianness-independent (a word-built LUT would reverse it on a
  // big-endian host).
  if (bits == 2) {
    uint8_t lut[256][4];
    for (uint32_t v = 0; v < 256; ++v)
      for (uint32_t p = 0; p < 4; ++p)
        lut[v][p] = (uint8_t)((v >> (2 * p)) & 3u);
    for (int64_t i = 0; i < n_bytes; ++i)
      std::memcpy(out + 4 * i, lut[packed[i]], 4);
    return 0;
  }
  if (bits == 4) {
    uint8_t lut[256][2];
    for (uint32_t v = 0; v < 256; ++v) {
      lut[v][0] = (uint8_t)(v & 15u);
      lut[v][1] = (uint8_t)(v >> 4);
    }
    for (int64_t i = 0; i < n_bytes; ++i)
      std::memcpy(out + 2 * i, lut[packed[i]], 2);
    return 0;
  }
  return -1;
}

// Batched mask paste-back: the reference's per-slice reshape_mask
// (/root/reference/lungmask/utils.py:114-129) — nearest-neighbor zoom of each
// (mh, mw) class map to its body bbox, pasted into a zero (H, W) canvas — for
// the whole volume in one call. Bit-identical to ops/resample.paste_masks_host
// (differential test in tests/test_resample.py): the gather plan uses scipy's
// float64 arithmetic, cc = i * double(in-1)/(out-1), round half up, with
// cc > in-1 treated as out of bounds (cval=0).
//
// Motivation: the numpy paste loop's per-slice fancy-indexing allocations made
// this stage the e2e long pole under host contention (BENCH_r03: 0.137 s
// quiet → 2.341 s contended). One pass of row-gather memcpy-like stores runs
// at memory bandwidth and holds no GIL.
//   masks: (n, mh, mw) uint8;  boxes: (n, 4) int32 half-open (r0, c0, r1, c1)
//   out:   (n, H, W) uint8, fully overwritten. Returns 0 on success, -1 on a
//   box outside the canvas (callers fall back to the numpy path).
int32_t lm_paste_masks(const uint8_t* masks, int64_t n, int64_t mh, int64_t mw,
                       const int32_t* boxes, int64_t H, int64_t W,
                       uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* b = boxes + 4 * i;
    if (b[0] < 0 || b[1] < 0 || b[2] > H || b[3] > W) return -1;
  }
  std::memset(out, 0, (size_t)(n * H * W));
  std::vector<int64_t> cidx;
  std::vector<uint8_t> row;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t r0 = boxes[4 * i], c0 = boxes[4 * i + 1];
    const int64_t r1 = boxes[4 * i + 2], c1 = boxes[4 * i + 3];
    const int64_t bh = r1 - r0, bw = c1 - c0;
    if (bh <= 0 || bw <= 0) continue;
    const uint8_t* mask = masks + i * mh * mw;
    uint8_t* canvas = out + i * H * W;
    // Column plan (shared by every row of this slice). oob → the sample
    // stays 0 (canvas is pre-zeroed), marked with index -1.
    cidx.assign(bw, -1);
    double czoom = bw == 1 ? 0.0 : (double)(mw - 1) / (double)(bw - 1);
    for (int64_t c = 0; c < bw; ++c) {
      double cc = (double)c * czoom;
      if (cc > (double)(mw - 1) || cc < 0.0) continue;
      int64_t idx = (int64_t)std::floor(cc + 0.5);
      cidx[c] = idx < 0 ? 0 : (idx > mw - 1 ? mw - 1 : idx);
    }
    double rzoom = bh == 1 ? 0.0 : (double)(mh - 1) / (double)(bh - 1);
    row.resize(bw);
    int64_t prev_src = -2;
    for (int64_t r = 0; r < bh; ++r) {
      double cc = (double)r * rzoom;
      if (cc > (double)(mh - 1) || cc < 0.0) {
        prev_src = -2;  // oob row: canvas stays 0
        continue;
      }
      int64_t src = (int64_t)std::floor(cc + 0.5);
      if (src < 0) src = 0;
      if (src > mh - 1) src = mh - 1;
      if (src != prev_src) {  // upsampled rows repeat: gather once, copy after
        const uint8_t* mrow = mask + src * mw;
        for (int64_t c = 0; c < bw; ++c)
          row[c] = cidx[c] < 0 ? 0 : mrow[cidx[c]];
        prev_src = src;
      }
      std::memcpy(canvas + (r0 + r) * W + c0, row.data(), (size_t)bw);
    }
  }
  return 0;
}

}  // extern "C"
