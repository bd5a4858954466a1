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

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

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

extern "C" {

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

}  // namespace

int32_t lm_label(const int32_t* img, int64_t nz, int64_t ny, int64_t nx,
                 int32_t connectivity, int32_t* out) {
  const int64_t sy = nx, sz = ny * nx;
  const bool full = connectivity != 1;
  const int32_t slack = full ? 1 : 0;
  UnionFind uf;
  std::vector<Run> runs;
  runs.reserve(1 << 16);
  // row_start[z*ny + y] .. row_start[z*ny + y + 1]: that row's runs.
  std::vector<int64_t> row_start(nz * ny + 1, 0);

  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t row = z * sz + y * sy;
      row_start[z * ny + y] = static_cast<int64_t>(runs.size());
      // Extract maximal same-value runs; adjacent runs differ by
      // construction, so within-row connectivity needs no unions.
      for (int64_t x = 0; x < nx;) {
        const int32_t v = img[row + x];
        if (v == 0) { ++x; continue; }
        int64_t e = x + 1;
        while (e < nx && img[row + e] == v) ++e;
        runs.push_back({static_cast<int32_t>(x), static_cast<int32_t>(e), v,
                        uf.make()});
        x = e;
      }
      const int64_t a0 = row_start[z * ny + y];
      const int64_t a1 = static_cast<int64_t>(runs.size());
      if (a1 == a0) continue;
      if (y > 0) {  // (z, y-1)
        const int64_t b0 = row_start[z * ny + y - 1];
        unite_rows(uf, runs, a0, a1, b0, row_start[z * ny + y], slack);
      }
      if (z > 0) {  // (z-1, y) always; (z-1, y±1) for full connectivity
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

  // Resolve + renumber in raster first-occurrence order (runs were created
  // in raster order, so a run sweep visits first occurrences in order),
  // then fill the output: zero it and paint each run with its final label.
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t next = 0;
  for (auto& r : runs) {
    const int32_t root = uf.find(r.prov);
    if (remap[root] == 0) remap[root] = ++next;
    r.prov = remap[root];  // reuse the field for the final label
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

}  // extern "C"
