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

// Multi-class connected components.
//   img:  int32 volume (z*y*x), 0 = background
//   out:  int32 labels, 0 background, 1..n in raster first-occurrence order
// Returns n (number of components), or -1 on error.
int32_t lm_label(const int32_t* img, int64_t nz, int64_t ny, int64_t nx,
                 int32_t connectivity, int32_t* out) {
  const int64_t sy = nx, sz = ny * nx, n = nz * sz;
  UnionFind uf;
  std::vector<int32_t> prov(n, -1);

  // Offsets to already-visited neighbors (negative raster offsets).
  int odz[13], ody[13], odx[13];
  int n_off = 0;
  if (connectivity == 1) {
    if (nz > 1) { odz[n_off] = -1; ody[n_off] = 0; odx[n_off] = 0; ++n_off; }
    odz[n_off] = 0; ody[n_off] = -1; odx[n_off] = 0; ++n_off;
    odz[n_off] = 0; ody[n_off] = 0; odx[n_off] = -1; ++n_off;
  } else {
    for (int dz = -1; dz <= 0; ++dz)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
          if (nz == 1 && dz != 0) continue;
          odz[n_off] = dz; ody[n_off] = dy; odx[n_off] = dx; ++n_off;
        }
  }

  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t row = z * sz + y * sy;
      for (int64_t x = 0; x < nx; ++x) {
        const int64_t i = row + x;
        const int32_t v = img[i];
        if (v == 0) continue;
        int32_t lbl = -1;
        for (int k = 0; k < n_off; ++k) {
          const int64_t zz = z + odz[k], yy = y + ody[k], xx = x + odx[k];
          if (zz < 0 || yy < 0 || yy >= ny || xx < 0 || xx >= nx) continue;
          const int64_t j = zz * sz + yy * sy + xx;
          if (img[j] != v) continue;
          const int32_t pl = prov[j];
          if (lbl == -1) lbl = pl;
          else if (pl != lbl) uf.unite(lbl, pl);
        }
        if (lbl == -1) lbl = uf.make();
        prov[i] = lbl;
      }
    }
  }

  // Resolve + renumber in raster first-occurrence order.
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (prov[i] < 0) { out[i] = 0; continue; }
    const int32_t root = uf.find(prov[i]);
    if (remap[root] == 0) remap[root] = ++next;
    out[i] = remap[root];
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
void lm_fill_holes(uint8_t* mask, int64_t nz, int64_t ny, int64_t nx) {
  const int64_t sy = nx, sz = ny * nx, n = nz * sz;
  std::vector<uint8_t> reached(n, 0);
  std::vector<int64_t> stack;
  stack.reserve(1 << 16);
  auto push = [&](int64_t z, int64_t y, int64_t x) {
    const int64_t i = z * sz + y * sy + x;
    if (!mask[i] && !reached[i]) { reached[i] = 1; stack.push_back(i); }
  };
  for (int64_t z = 0; z < nz; ++z)
    for (int64_t y = 0; y < ny; ++y)
      for (int64_t x = 0; x < nx; ++x)
        if (z == 0 || z == nz - 1 || y == 0 || y == ny - 1 || x == 0 || x == nx - 1)
          push(z, y, x);
  while (!stack.empty()) {
    const int64_t i = stack.back();
    stack.pop_back();
    const int64_t z = i / sz, y = (i % sz) / sy, x = i % sy;
    if (z > 0) push(z - 1, y, x);
    if (z < nz - 1) push(z + 1, y, x);
    if (y > 0) push(z, y - 1, x);
    if (y < ny - 1) push(z, y + 1, x);
    if (x > 0) push(z, y, x - 1);
    if (x < nx - 1) push(z, y, x + 1);
  }
  for (int64_t i = 0; i < n; ++i)
    if (!mask[i] && !reached[i]) mask[i] = 1;
}

}  // extern "C"
