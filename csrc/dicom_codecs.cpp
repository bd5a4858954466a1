// Native decoders for compressed DICOM transfer syntaxes.
//
// The reference delegates compressed decode to ITK/GDCM inside
// sitk.ImageSeriesReader (/root/reference/lungmask/utils.py:215-222). This
// framework decodes on the host in C++ so the streaming path stays
// self-contained:
//   * RLE Lossless (1.2.840.10008.1.2.5) — PS3.5 annex G PackBits planes.
//   * JPEG Lossless, first-order prediction (1.2.840.10008.1.2.4.70) and the
//     general process-14 syntax (…4.57) — ITU T.81 SOF3, all predictors,
//     restart markers, 2..16-bit precision, single component.
//
// Exposed via ctypes (see lungmask_tpu/io/codecs.py). All functions return
// 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {

// --- RLE (PackBits) ---------------------------------------------------------

// Decode one PackBits segment into exactly `out_len` bytes.
static int packbits_decode(const uint8_t* src, int64_t n, uint8_t* out,
                           int64_t out_len) {
  int64_t i = 0, o = 0;
  while (i < n && o < out_len) {
    int8_t c = (int8_t)src[i++];
    if (c >= 0) {
      int64_t cnt = (int64_t)c + 1;
      if (i + cnt > n) cnt = n - i;
      if (o + cnt > out_len) cnt = out_len - o;
      std::memcpy(out + o, src + i, (size_t)cnt);
      i += cnt;
      o += cnt;
    } else if (c != -128) {
      int64_t cnt = 1 - (int64_t)c;
      if (i >= n) break;
      uint8_t v = src[i++];
      if (o + cnt > out_len) cnt = out_len - o;
      std::memset(out + o, v, (size_t)cnt);
      o += cnt;
    }
  }
  return o == out_len ? 0 : -1;
}

// Decode a full RLE frame (PS3.5 G.3): 64-byte header of little-endian
// uint32s — segment count then up to 15 offsets — followed by the segments.
// Segments are byte planes, most significant first. Output is native-endian
// samples of `bytes_per_sample` bytes.
int lm_rle_decode(const uint8_t* src, int64_t n, uint8_t* out,
                  int64_t n_pixels, int32_t bytes_per_sample) {
  if (n < 64) return -2;
  uint32_t n_seg;
  std::memcpy(&n_seg, src, 4);
  if (n_seg == 0 || n_seg > 15 || (int32_t)n_seg != bytes_per_sample) return -3;
  std::vector<uint8_t> plane;
  for (uint32_t s = 0; s < n_seg; ++s) {
    uint32_t off, next;
    std::memcpy(&off, src + 4 + 4 * s, 4);
    if (s + 1 < n_seg)
      std::memcpy(&next, src + 4 + 4 * (s + 1), 4);
    else
      next = (uint32_t)n;
    if (off < 64 || next > n || off > next) return -4;
    // Plane s holds byte (n_seg-1-s) of each little-endian sample.
    if (plane.size() < (size_t)n_pixels) plane.resize(n_pixels);
    int rc = packbits_decode(src + off, next - off, plane.data(), n_pixels);
    if (rc != 0) return -5;
    int64_t byte_ix = (int64_t)n_seg - 1 - s;  // little-endian byte index
    for (int64_t p = 0; p < n_pixels; ++p)
      out[p * bytes_per_sample + byte_ix] = plane[p];
  }
  return 0;
}

// --- JPEG Lossless (ITU T.81 process 14, SOF3) ------------------------------

namespace {

struct BitReader {
  const uint8_t* d;
  int64_t n;
  int64_t pos = 0;
  uint32_t buf = 0;
  int bits = 0;
  bool marker_hit = false;  // stopped at a non-stuffed marker

  explicit BitReader(const uint8_t* data, int64_t len) : d(data), n(len) {}

  // Refill up to 24 bits; 0xFF00 unstuffs to 0xFF, a real marker stops us.
  void fill() {
    while (bits <= 24 && pos < n) {
      uint8_t b = d[pos];
      if (b == 0xFF) {
        if (pos + 1 < n && d[pos + 1] == 0x00) {
          pos += 2;
        } else {
          marker_hit = true;
          return;
        }
      } else {
        pos += 1;
      }
      buf = (buf << 8) | b;
      bits += 8;
    }
  }

  int get(int k) {  // read k bits MSB-first; -1 on exhaustion
    if (k == 0) return 0;
    if (bits < k) fill();
    if (bits < k) return -1;
    int v = (int)((buf >> (bits - k)) & ((1u << k) - 1));
    bits -= k;
    return v;
  }

  void reset_to_byte_after_marker() {  // consume an RSTn marker
    buf = 0;
    bits = 0;
    marker_hit = false;
    if (pos + 1 < n && d[pos] == 0xFF && d[pos + 1] >= 0xD0 && d[pos + 1] <= 0xD7)
      pos += 2;
  }
};

struct Huff {
  // Canonical JPEG Huffman table: codes of length 1..16.
  int mincode[17], maxcode[17], valptr[17];
  uint8_t vals[256];
  bool ok = false;

  bool build(const uint8_t* counts /*16*/, const uint8_t* values, int nvals) {
    if (nvals > 256) return false;  // canonical tables hold at most 256 symbols
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      valptr[l] = k;
      mincode[l] = code;
      code += counts[l - 1];
      maxcode[l] = code - 1;
      if (counts[l - 1] == 0) maxcode[l] = -1;
      k += counts[l - 1];
      code <<= 1;
    }
    for (int i = 0; i < nvals; ++i) vals[i] = values[i];
    ok = true;
    return true;
  }

  int decode(BitReader& br) const {  // returns symbol or -1
    int code = br.get(1);
    if (code < 0) return -1;
    for (int l = 1; l <= 16; ++l) {
      if (maxcode[l] >= 0 && code <= maxcode[l])
        return vals[valptr[l] + code - mincode[l]];
      int b = br.get(1);
      if (b < 0) return -1;
      code = (code << 1) | b;
    }
    return -1;
  }
};

inline int extend(int v, int ssss) {
  // T.81 F.2.2.1: map magnitude-category bits to a signed difference.
  if (ssss == 0) return 0;
  if (ssss == 16) return 32768;
  if (v < (1 << (ssss - 1))) return v - (1 << ssss) + 1;
  return v;
}

}  // namespace

// Decode a single-component JPEG lossless (SOF3) stream into uint16 pixels.
// Returns 0 on success; fills rows/cols/precision.
int lm_jpegll_decode(const uint8_t* src, int64_t n, uint16_t* out,
                     int64_t out_capacity, int32_t* rows_out,
                     int32_t* cols_out, int32_t* prec_out) {
  if (n < 4 || src[0] != 0xFF || src[1] != 0xD8) return -1;  // SOI
  int64_t p = 2;
  int rows = 0, cols = 0, prec = 0, predictor = 1, pt = 0;
  int restart_interval = 0;
  Huff tables[4];
  int scan_table = 0;
  int64_t scan_start = -1;

  while (p + 4 <= n) {
    if (src[p] != 0xFF) return -2;
    uint8_t m = src[p + 1];
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) {
      p += 2;
      continue;
    }
    int seg = (src[p + 2] << 8) | src[p + 3];
    if (seg < 2 || p + 2 + seg > n) return -2;  // segment must fit the buffer
    if (m == 0xC3) {  // SOF3
      if (seg < 8) return -3;
      prec = src[p + 4];
      rows = (src[p + 5] << 8) | src[p + 6];
      cols = (src[p + 7] << 8) | src[p + 8];
      int ncomp = src[p + 9];
      if (ncomp != 1) return -3;
    } else if (m == 0xC4) {  // DHT (possibly several tables per marker)
      int64_t q = p + 4, end = p + 2 + seg;
      while (q + 17 <= end) {
        int tc_th = src[q];
        int tc = (tc_th >> 4) & 0x0F;  // table class: 0=DC (lossless scans)
        int id = tc_th & 0x0F;
        const uint8_t* counts = src + q + 1;
        int nv = 0;
        for (int i = 0; i < 16; ++i) nv += counts[i];
        if (q + 17 + nv > end || id > 3) return -4;
        // AC-class tables are irrelevant to lossless scans; skip them so an
        // unused AC table with the same id cannot clobber the DC table.
        if (tc == 0 && !tables[id].build(counts, src + q + 17, nv)) return -4;
        q += 17 + nv;
      }
    } else if (m == 0xDD) {  // DRI
      if (seg < 4) return -2;
      restart_interval = (src[p + 4] << 8) | src[p + 5];
    } else if (m == 0xDA) {  // SOS
      if (seg < 8) return -5;  // 2 len + ns + 2*1 comp + Ss/Se/AhAl
      int ns = src[p + 4];
      if (ns != 1) return -5;
      scan_table = (src[p + 6] >> 4) & 0x0F;  // DC table selector
      predictor = src[p + 7];                  // Ss = predictor selection
      pt = src[p + 9] & 0x0F;                  // Al = point transform
      scan_start = p + 2 + seg;
      break;
    } else if (m == 0xD9) {  // EOI before SOS
      return -6;
    }
    p += 2 + seg;
  }

  if (scan_start < 0 || rows <= 0 || cols <= 0 || prec < 2 || prec > 16)
    return -7;
  if ((int64_t)rows * cols > out_capacity) return -8;
  if (!tables[scan_table].ok) return -9;
  if (predictor < 0 || predictor > 7) return -10;

  BitReader br(src + scan_start, n - scan_start);
  const Huff& h = tables[scan_table];
  const int default_pred = 1 << (prec - pt - 1);
  int64_t count_in_interval = 0;
  bool restarted = true;  // first sample behaves like a post-restart sample

  for (int r = 0; r < rows; ++r) {
    for (int c = 0; c < cols; ++c) {
      int pred;
      if (restarted) {
        pred = default_pred;
        restarted = false;
      } else if (r == 0) {
        pred = out[r * cols + c - 1];  // first row: Ra
      } else if (c == 0) {
        pred = out[(r - 1) * cols];  // first column: Rb
      } else {
        int ra = out[r * cols + c - 1];
        int rb = out[(r - 1) * cols + c];
        int rc = out[(r - 1) * cols + c - 1];
        switch (predictor) {
          case 0: pred = default_pred; break;  // only valid with restarts
          case 1: pred = ra; break;
          case 2: pred = rb; break;
          case 3: pred = rc; break;
          case 4: pred = ra + rb - rc; break;
          case 5: pred = ra + ((rb - rc) >> 1); break;
          case 6: pred = rb + ((ra - rc) >> 1); break;
          default: pred = (ra + rb) >> 1; break;  // 7
        }
      }
      int ssss = h.decode(br);
      if (ssss < 0 || ssss > 16) return -11;
      int diffbits = (ssss == 16) ? 0 : ssss;
      int v = br.get(diffbits);
      if (v < 0) return -11;
      int diff = extend(v, ssss);
      out[r * cols + c] = (uint16_t)((pred + diff) & 0xFFFF);
      if (restart_interval > 0 && ++count_in_interval == restart_interval &&
          !(r == rows - 1 && c == cols - 1)) {
        count_in_interval = 0;
        // Skip to the RSTn marker: discard partial bits, then the marker.
        br.fill();
        br.reset_to_byte_after_marker();
        restarted = true;
      }
    }
  }
  // First-row samples after a restart use Ra of the restarted sample chain;
  // handled above since restarts reset to default_pred then continue with Ra.
  if (pt > 0) {
    for (int64_t i = 0; i < (int64_t)rows * cols; ++i)
      out[i] = (uint16_t)(out[i] << pt);
  }
  *rows_out = rows;
  *cols_out = cols;
  *prec_out = prec;
  return 0;
}

// --- JPEG sequential DCT (ITU T.81 baseline SOF0 / extended SOF1) -----------
//
// Single-component (grayscale) decoder for the lossy DICOM transfer syntaxes
// 1.2.840.10008.1.2.4.50 (baseline, 8-bit) and .51 (extended, 12-bit) — the
// reference decodes these through ITK/GDCM (utils.py:215-222). The inverse
// DCT is the Loeffler-Ligtenberg-Moszowicz integer algorithm with the same
// 13-bit fixed-point constants and descale rounding as libjpeg's "islow"
// path, so decoded samples are bit-identical to a libjpeg decode of the same
// stream (asserted vs Pillow in tests/test_codecs.py).

namespace {

const int kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

inline int64_t dct_descale(int64_t x, int n) {
  return (x + (int64_t(1) << (n - 1))) >> n;
}

// One 8-point islow butterfly: in/out strided arrays, input already scaled.
// CONST_BITS=13 fixed-point constants (rounded 2^13 * cos multiples).
inline void islow_butterfly(const int64_t* in, int stride, int64_t* t10,
                            int64_t* t11, int64_t* t12, int64_t* t13,
                            int64_t* o0, int64_t* o1, int64_t* o2,
                            int64_t* o3) {
  const int64_t C0298 = 2446, C0390 = 3196, C0541 = 4433, C0765 = 6270,
                C0899 = 7373, C1175 = 9633, C1501 = 12299, C1847 = 15137,
                C1961 = 16069, C2053 = 16819, C2562 = 20995, C3072 = 25172;
  int64_t z2 = in[2 * stride], z3 = in[6 * stride];
  int64_t z1 = (z2 + z3) * C0541;
  int64_t t2 = z1 - z3 * C1847;
  int64_t t3 = z1 + z2 * C0765;
  z2 = in[0];
  z3 = in[4 * stride];
  int64_t t0 = (z2 + z3) << 13;
  int64_t t1 = (z2 - z3) << 13;
  *t10 = t0 + t3;
  *t13 = t0 - t3;
  *t11 = t1 + t2;
  *t12 = t1 - t2;
  t0 = in[7 * stride];
  t1 = in[5 * stride];
  t2 = in[3 * stride];
  t3 = in[1 * stride];
  z1 = t0 + t3;
  z2 = t1 + t2;
  z3 = t0 + t2;
  int64_t z4 = t1 + t3;
  int64_t z5 = (z3 + z4) * C1175;
  t0 *= C0298;
  t1 *= C2053;
  t2 *= C3072;
  t3 *= C1501;
  z1 *= -C0899;
  z2 *= -C2562;
  z3 *= -C1961;
  z4 *= -C0390;
  z3 += z5;
  z4 += z5;
  *o0 = t0 + z1 + z3;
  *o1 = t1 + z2 + z4;
  *o2 = t2 + z2 + z3;
  *o3 = t3 + z1 + z4;
}

// coef: dequantized coefficients in natural (row-major) order.
void idct8x8_islow(const int32_t* coef, int32_t* out) {
  int64_t wide[64], ws[64];
  for (int i = 0; i < 64; ++i) wide[i] = coef[i];
  for (int c = 0; c < 8; ++c) {
    int64_t t10, t11, t12, t13, b0, b1, b2, b3;
    islow_butterfly(wide + c, 8, &t10, &t11, &t12, &t13, &b0, &b1, &b2, &b3);
    // pass 1 keeps PASS1_BITS=2 extra fractional bits
    ws[8 * 0 + c] = dct_descale(t10 + b3, 13 - 2);
    ws[8 * 7 + c] = dct_descale(t10 - b3, 13 - 2);
    ws[8 * 1 + c] = dct_descale(t11 + b2, 13 - 2);
    ws[8 * 6 + c] = dct_descale(t11 - b2, 13 - 2);
    ws[8 * 2 + c] = dct_descale(t12 + b1, 13 - 2);
    ws[8 * 5 + c] = dct_descale(t12 - b1, 13 - 2);
    ws[8 * 3 + c] = dct_descale(t13 + b0, 13 - 2);
    ws[8 * 4 + c] = dct_descale(t13 - b0, 13 - 2);
  }
  for (int r = 0; r < 8; ++r) {
    int64_t t10, t11, t12, t13, b0, b1, b2, b3;
    islow_butterfly(ws + 8 * r, 1, &t10, &t11, &t12, &t13, &b0, &b1, &b2,
                    &b3);
    int32_t* o = out + 8 * r;
    // final descale: CONST_BITS + PASS1_BITS + 3 (the 3 undoes the 8x DCT
    // gain)
    o[0] = (int32_t)dct_descale(t10 + b3, 13 + 2 + 3);
    o[7] = (int32_t)dct_descale(t10 - b3, 13 + 2 + 3);
    o[1] = (int32_t)dct_descale(t11 + b2, 13 + 2 + 3);
    o[6] = (int32_t)dct_descale(t11 - b2, 13 + 2 + 3);
    o[2] = (int32_t)dct_descale(t12 + b1, 13 + 2 + 3);
    o[5] = (int32_t)dct_descale(t12 - b1, 13 + 2 + 3);
    o[3] = (int32_t)dct_descale(t13 + b0, 13 + 2 + 3);
    o[4] = (int32_t)dct_descale(t13 - b0, 13 + 2 + 3);
  }
}

}  // namespace

// Decode a single-component sequential-DCT JPEG (SOF0/SOF1) into uint16
// samples (level-shifted back to unsigned, clamped to [0, 2^prec - 1]).
// Returns 0 on success; negative codes classify the failure.
int lm_jpegdct_decode(const uint8_t* src, int64_t n, uint16_t* out,
                      int64_t out_capacity, int32_t* rows_out,
                      int32_t* cols_out, int32_t* prec_out) {
  if (n < 4 || src[0] != 0xFF || src[1] != 0xD8) return -1;  // SOI
  int64_t p = 2;
  int rows = 0, cols = 0, prec = 0;
  int restart_interval = 0;
  uint16_t qt[4][64];  // zigzag order, per table id
  bool qt_ok[4] = {false, false, false, false};
  int comp_qt = 0;  // quant table id of the single component
  Huff dc_tables[4], ac_tables[4];
  int dc_sel = 0, ac_sel = 0;
  int64_t scan_start = -1;

  while (p + 4 <= n) {
    if (src[p] != 0xFF) return -2;
    uint8_t m = src[p + 1];
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) {
      p += 2;
      continue;
    }
    int seg = (src[p + 2] << 8) | src[p + 3];
    if (seg < 2 || p + 2 + seg > n) return -2;
    if (m == 0xC0 || m == 0xC1) {  // SOF0 baseline / SOF1 extended
      if (seg < 11) return -3;
      prec = src[p + 4];
      rows = (src[p + 5] << 8) | src[p + 6];
      cols = (src[p + 7] << 8) | src[p + 8];
      int ncomp = src[p + 9];
      if (ncomp != 1) return -3;  // CT is monochrome
      comp_qt = src[p + 12] & 0x0F;
    } else if (m == 0xC2 ||
               (m >= 0xC5 && m <= 0xCF && m != 0xC8 && m != 0xCC)) {
      // (0xC4/DHT and 0xC8/JPG are outside or excluded; 0xCC/DAC is skipped
      // — harmless, since the SOF9-SOFB gate above rejects the arithmetic
      // SOFs that could reference it.)
      return -12;  // progressive/hierarchical/arithmetic: not supported
    } else if (m == 0xDB) {  // DQT (possibly several tables per marker)
      int64_t q = p + 4, end = p + 2 + seg;
      while (q < end) {
        int pq = (src[q] >> 4) & 0x0F, tq = src[q] & 0x0F;
        if (tq > 3 || pq > 1) return -4;
        int w = pq ? 2 : 1;
        if (q + 1 + 64 * w > end) return -4;
        for (int i = 0; i < 64; ++i)
          qt[tq][i] = pq ? (uint16_t)((src[q + 1 + 2 * i] << 8) |
                                      src[q + 2 + 2 * i])
                         : src[q + 1 + i];
        qt_ok[tq] = true;
        q += 1 + 64 * w;
      }
    } else if (m == 0xC4) {  // DHT: DC and AC classes
      int64_t q = p + 4, end = p + 2 + seg;
      while (q + 17 <= end) {
        int tc = (src[q] >> 4) & 0x0F, id = src[q] & 0x0F;
        const uint8_t* counts = src + q + 1;
        int nv = 0;
        for (int i = 0; i < 16; ++i) nv += counts[i];
        if (q + 17 + nv > end || id > 3 || tc > 1) return -4;
        Huff& t = tc ? ac_tables[id] : dc_tables[id];
        if (!t.build(counts, src + q + 17, nv)) return -4;
        q += 17 + nv;
      }
    } else if (m == 0xDD) {  // DRI
      if (seg < 4) return -2;
      restart_interval = (src[p + 4] << 8) | src[p + 5];
    } else if (m == 0xDA) {  // SOS
      if (seg < 8) return -5;
      if (src[p + 4] != 1) return -5;
      dc_sel = (src[p + 6] >> 4) & 0x0F;
      ac_sel = src[p + 6] & 0x0F;
      scan_start = p + 2 + seg;
      break;
    } else if (m == 0xD9) {
      return -6;  // EOI before SOS
    }
    p += 2 + seg;
  }

  if (scan_start < 0 || rows <= 0 || cols <= 0) return -7;
  if (prec != 8 && prec != 12) return -7;
  if ((int64_t)rows * cols > out_capacity) return -8;
  if (!qt_ok[comp_qt]) return -9;
  if (!dc_tables[dc_sel].ok || !ac_tables[ac_sel].ok) return -9;

  // Dequantization table in natural order.
  int32_t qnat[64];
  for (int i = 0; i < 64; ++i) qnat[kZigzag[i]] = qt[comp_qt][i];

  BitReader br(src + scan_start, n - scan_start);
  const Huff& dch = dc_tables[dc_sel];
  const Huff& ach = ac_tables[ac_sel];
  const int center = 1 << (prec - 1);
  const int maxval = (1 << prec) - 1;
  const int bh = (rows + 7) / 8, bw = (cols + 7) / 8;
  // int64: a corrupt stream can emit max-magnitude DC diffs for every block,
  // overflowing an int32 accumulator (signed-overflow UB). The dequantized
  // value is clamped back into int32 for the (int64-internal) IDCT.
  int64_t dc_pred = 0;
  int64_t count_in_interval = 0;
  int32_t coef[64], pix[64];

  for (int by = 0; by < bh; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      for (int i = 0; i < 64; ++i) coef[i] = 0;
      int ssss = dch.decode(br);
      if (ssss < 0 || ssss > 15) return -11;
      int v = br.get(ssss);
      if (v < 0) return -11;
      dc_pred += extend(v, ssss);
      int64_t dc = dc_pred * (int64_t)qnat[0];
      if (dc > INT32_MAX) dc = INT32_MAX;
      if (dc < INT32_MIN) dc = INT32_MIN;
      coef[0] = (int32_t)dc;
      int k = 1;
      while (k < 64) {
        int rs = ach.decode(br);
        if (rs < 0) return -11;
        int r = rs >> 4, s = rs & 15;
        if (s == 0) {
          if (r == 15) {  // ZRL: sixteen zeros
            k += 16;
            continue;
          }
          break;  // EOB
        }
        k += r;
        if (k > 63) return -11;
        int bits = br.get(s);
        if (bits < 0) return -11;
        coef[kZigzag[k]] = extend(bits, s) * qnat[kZigzag[k]];
        ++k;
      }
      idct8x8_islow(coef, pix);
      const int y0 = by * 8, x0 = bx * 8;
      const int ylim = rows - y0 < 8 ? rows - y0 : 8;
      const int xlim = cols - x0 < 8 ? cols - x0 : 8;
      for (int y = 0; y < ylim; ++y)
        for (int x = 0; x < xlim; ++x) {
          int s2 = pix[y * 8 + x] + center;
          if (s2 < 0) s2 = 0;
          if (s2 > maxval) s2 = maxval;
          out[(int64_t)(y0 + y) * cols + (x0 + x)] = (uint16_t)s2;
        }
      if (restart_interval > 0 && ++count_in_interval == restart_interval &&
          !(by == bh - 1 && bx == bw - 1)) {
        count_in_interval = 0;
        br.fill();
        br.reset_to_byte_after_marker();
        dc_pred = 0;
      }
    }
  }
  *rows_out = rows;
  *cols_out = cols;
  *prec_out = prec;
  return 0;
}

}  // extern "C"

// --- JPEG-LS (ITU-T T.87 / ISO 14495-1) --------------------------------------
//
// From-scratch LOCO-I decoder: regular mode (gradient-quantized contexts, MED
// prediction, bias correction, limited-length Golomb) and run mode (J-table
// run lengths, run-interruption contexts 365/366), lossless and near-lossless,
// single component (CT is monochrome), LSE preset parameters honored.
// Validated bit-for-bit against the CharLS reference implementation in
// tests/test_codecs.py (CharLS encodes the fixtures; this decodes them).

namespace jls {

struct BitReader {
  const uint8_t* d;
  int64_t n, p = 0;
  uint32_t cache = 0;
  int32_t ncached = 0;
  bool prev_ff = false;

  explicit BitReader(const uint8_t* data, int64_t len) : d(data), n(len) {}

  // Refill one byte honoring T.87 bit stuffing: a byte following 0xFF
  // carries only 7 payload bits (MSB is a stuffed 0). 0xFF followed by a
  // byte with MSB set is a marker — the scan is over; feed zero bits.
  void refill() {
    if (p >= n) {
      cache <<= 8;
      ncached += 8;
      return;
    }
    const uint8_t b = d[p];
    if (prev_ff) {
      if (b & 0x80) {  // marker: stop consuming, feed zeros
        cache <<= 8;
        ncached += 8;
        return;
      }
      ++p;
      prev_ff = false;
      cache = (cache << 7) | b;  // stuffed MSB dropped
      ncached += 7;
      return;
    }
    ++p;
    prev_ff = (b == 0xFF);
    cache = (cache << 8) | b;
    ncached += 8;
  }

  int32_t bit() {
    if (ncached == 0) refill();
    --ncached;
    return (cache >> ncached) & 1;
  }

  int32_t bits(int32_t k) {
    int32_t v = 0;
    for (int32_t i = 0; i < k; ++i) v = (v << 1) | bit();
    return v;
  }
};

constexpr int J[32] = {0, 0, 0, 0, 1, 1, 1, 1, 2, 2,  2,  2,  3,  3,  3,  3,
                       4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15};

inline int32_t clamp3(int32_t v, int32_t lo, int32_t hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

struct Decoder {
  int32_t maxval, near, t1, t2, t3, reset;
  int32_t range, qbpp, bpp, limit;
  int32_t A[367], B[365], C[365], N[367], Nn[2];
  int32_t run_index = 0;
  BitReader* br = nullptr;

  void init_params(int32_t precision, int32_t near_, int32_t maxval_,
                   int32_t t1_, int32_t t2_, int32_t t3_, int32_t reset_) {
    maxval = maxval_ > 0 ? maxval_ : (1 << precision) - 1;
    near = near_;
    // Default thresholds (T.87 C.2.4.1.1.1), overridable via LSE.
    int32_t d1, d2, d3;
    if (maxval >= 128) {
      // T.87: FACTOR = floor((min(MAXVAL,4095)+128)/256)
      const int32_t factor = ((maxval < 4095 ? maxval : 4095) + 128) >> 8;
      d1 = clamp3(factor * (3 - 2) + 2 + 3 * near, near + 1, maxval);
      d2 = clamp3(factor * (7 - 3) + 3 + 5 * near, d1, maxval);
      d3 = clamp3(factor * (21 - 4) + 4 + 7 * near, d2, maxval);
    } else {
      int32_t factor = 256 / (maxval + 1);
      auto mx = [](int32_t a, int32_t b) { return a > b ? a : b; };
      d1 = clamp3(mx(2, 3 / factor + 3 * near), near + 1, maxval);
      d2 = clamp3(mx(3, 7 / factor + 5 * near), d1, maxval);
      d3 = clamp3(mx(4, 21 / factor + 7 * near), d2, maxval);
    }
    t1 = t1_ > 0 ? t1_ : d1;
    t2 = t2_ > 0 ? t2_ : d2;
    t3 = t3_ > 0 ? t3_ : d3;
    reset = reset_ > 0 ? reset_ : 64;

    range = (maxval + 2 * near) / (2 * near + 1) + 1;
    qbpp = 1;
    while ((1 << qbpp) < range) ++qbpp;
    bpp = 2;
    while ((1 << bpp) < maxval + 1) ++bpp;
    limit = 2 * (bpp + (bpp > 8 ? bpp : 8));

    const int32_t a0 = ((range + 32) / 64) > 2 ? (range + 32) / 64 : 2;
    for (int i = 0; i < 367; ++i) {
      A[i] = a0;
      N[i] = 1;
    }
    for (int i = 0; i < 365; ++i) B[i] = C[i] = 0;
    Nn[0] = Nn[1] = 0;
    run_index = 0;
  }

  static int32_t quantize(int32_t d, int32_t near, int32_t t1, int32_t t2,
                          int32_t t3) {
    if (d <= -t3) return -4;
    if (d <= -t2) return -3;
    if (d <= -t1) return -2;
    if (d < -near) return -1;
    if (d <= near) return 0;
    if (d < t1) return 1;
    if (d < t2) return 2;
    if (d < t3) return 3;
    return 4;
  }

  int32_t golomb(int32_t k, int32_t glimit) {
    int32_t u = 0;
    while (br->bit() == 0) {
      if (++u > 64) return -1;  // corrupt stream guard
    }
    if (u < glimit - qbpp - 1) return (u << k) | br->bits(k);
    return br->bits(qbpp) + 1;
  }

  int32_t mod_range(int64_t rx) const {
    const int64_t span = (int64_t)range * (2 * near + 1);
    if (rx < -near) rx += span;
    else if (rx > maxval + near) rx -= span;
    if (rx < 0) rx = 0;
    if (rx > maxval) rx = maxval;
    return (int32_t)rx;
  }

  // Regular-mode sample. q in [1,364] after sign folding; sign ∈ {+1,-1}.
  int32_t regular(int32_t q, int32_t sign, int32_t ra, int32_t rb,
                  int32_t rc, bool* err) {
    // MED predictor
    int32_t px;
    const int32_t mn = ra < rb ? ra : rb, mx = ra > rb ? ra : rb;
    if (rc >= mx) px = mn;
    else if (rc <= mn) px = mx;
    else px = ra + rb - rc;
    px = clamp3(px + sign * C[q], 0, maxval);

    int32_t k = 0;
    while ((N[q] << k) < A[q] && k < 24) ++k;
    const int32_t merr = golomb(k, limit);
    if (merr < 0) { *err = true; return 0; }

    int32_t errval;
    if (near == 0 && k == 0 && 2 * B[q] <= -N[q]) {  // flipped mapping
      errval = (merr & 1) ? (merr - 1) / 2 : -(merr / 2) - 1;
    } else {
      errval = (merr & 1) ? -(merr + 1) / 2 : merr / 2;
    }

    // Statistics update with the sign-normalized reduced error (A.6.1).
    B[q] += errval * (2 * near + 1);
    A[q] += errval < 0 ? -errval : errval;
    if (N[q] == reset) {
      A[q] >>= 1;
      B[q] = B[q] >= 0 ? B[q] >> 1 : -((1 - B[q]) >> 1);
      N[q] >>= 1;
    }
    ++N[q];
    // Bias computation (A.6.2).
    if (B[q] <= -N[q]) {
      B[q] += N[q];
      if (C[q] > -128) --C[q];
      if (B[q] <= -N[q]) B[q] = -N[q] + 1;
    } else if (B[q] > 0) {
      B[q] -= N[q];
      if (C[q] < 127) ++C[q];
      if (B[q] > 0) B[q] = 0;
    }

    int64_t e = (int64_t)errval * (2 * near + 1);
    if (sign < 0) e = -e;
    return mod_range(px + e);
  }

  // Run-interruption sample (A.7.2).
  int32_t interruption(int32_t ra, int32_t rb, bool* err) {
    const int32_t abs_diff = ra > rb ? ra - rb : rb - ra;
    const int32_t ritype = abs_diff <= near ? 1 : 0;
    const int32_t q = 365 + ritype;
    const int32_t px = ritype ? ra : rb;
    // T.87 A.7.2: TEMP = A[366] + (N[366] >> 1) for RItype 1, A[365] for 0.
    const int32_t temp = ritype ? A[366] + (N[366] >> 1) : A[365];
    int32_t k = 0;
    while ((N[q] << k) < temp && k < 24) ++k;
    const int32_t em = golomb(k, limit - J[run_index] - 1);
    if (em < 0) { *err = true; return 0; }

    // Invert EMErrval = 2|e| - RItype - map: parity pins `map`, and the
    // positive-map condition pins the sign (its negation is exactly the
    // negative-map condition).
    const int32_t map = (em + ritype) & 1;
    const int32_t mag = (em + ritype + map) / 2;
    const int32_t pos_map = (k == 0 && 2 * Nn[ritype] < N[q]) ? 1 : 0;
    int32_t errval = (map == pos_map) ? mag : -mag;
    if (mag == 0) errval = 0;

    if (errval < 0) ++Nn[ritype];
    A[q] += (em + 1 - ritype) >> 1;
    if (N[q] == reset) {
      A[q] >>= 1;
      N[q] >>= 1;
      Nn[ritype] >>= 1;
    }
    ++N[q];

    int64_t e = (int64_t)errval * (2 * near + 1);
    if (ritype == 0 && ra > rb) e = -e;  // SIGN flip (A.7.2, A.19)
    return mod_range(px + e);
  }
};

}  // namespace jls

extern "C" {

// Decode a single-component JPEG-LS codestream.
//   src/n: codestream (SOI..EOI); out: row-major uint16 samples
//   rows/cols/prec/near_out: parsed stream properties
// Returns 0 on success; negative error codes otherwise.
int32_t lm_jpegls_decode(const uint8_t* src, int64_t n, uint16_t* out,
                         int64_t out_cap, int32_t* rows, int32_t* cols,
                         int32_t* prec, int32_t* near_out) {
  if (n < 4 || src[0] != 0xFF || src[1] != 0xD8) return -1;
  int64_t p = 2;
  int32_t precision = 0, h = 0, w = 0, ncomp = 0;
  int32_t maxval = 0, t1 = 0, t2 = 0, t3 = 0, reset = 0;
  int32_t near = 0;
  int64_t scan_start = -1;
  while (p + 4 <= n) {
    if (src[p] != 0xFF) return -2;
    const uint8_t m = src[p + 1];
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { p += 2; continue; }
    if (m == 0xD9) break;
    const int32_t seg = (src[p + 2] << 8) | src[p + 3];
    if (seg < 2 || p + 2 + seg > n) return -3;
    const uint8_t* s = src + p + 4;
    if (m == 0xF7) {  // SOF55
      if (seg < 8) return -3;  // 2 len + prec + h(2) + w(2) + ncomp
      precision = s[0];
      h = (s[1] << 8) | s[2];
      w = (s[3] << 8) | s[4];
      ncomp = s[5];
    } else if (m == 0xF8) {  // LSE
      if (seg < 3) return -3;
      if (s[0] == 1) {
        if (seg < 13) return -3;  // 2 len + id + 5 parameters x 2 bytes
        maxval = (s[1] << 8) | s[2];
        t1 = (s[3] << 8) | s[4];
        t2 = (s[5] << 8) | s[6];
        t3 = (s[7] << 8) | s[8];
        reset = (s[9] << 8) | s[10];
      }
    } else if (m == 0xDD) {
      return -4;  // restart intervals unsupported
    } else if (m == 0xDA) {  // SOS
      if (seg < 3) return -5;  // s[0] below needs a payload byte: a seg==2
                               // SOS ending at the buffer end would over-read
      const int32_t ns = s[0];
      if (ns != 1 || ncomp != 1) return -5;  // single component only
      if (seg < 2 + 1 + 2 * ns + 3) return -5;
      near = s[1 + 2 * ns];
      const int32_t ilv = s[1 + 2 * ns + 1];
      if (ilv != 0) return -6;
      scan_start = p + 2 + seg;
      break;
    }
    p += 2 + seg;
  }
  if (scan_start < 0 || precision < 2 || precision > 16 || h <= 0 || w <= 0)
    return -7;
  if ((int64_t)h * w > out_cap) return -8;

  jls::Decoder dec;
  dec.init_params(precision, near, maxval, t1, t2, t3, reset);
  jls::BitReader br(src + scan_start, n - scan_start);
  dec.br = &br;

  std::vector<int32_t> prev(w + 2, 0), cur(w + 2, 0);
  bool err = false;
  for (int32_t y = 0; y < h; ++y) {
    prev[w + 1] = prev[w];  // Rd at the last column equals Rb
    cur[0] = prev[1];       // Ra at the first column equals Rb
    int32_t x = 1;
    while (x <= w) {
      const int32_t ra = cur[x - 1], rb = prev[x], rc = prev[x - 1],
                    rd = prev[x + 1];
      const int32_t q1 = jls::Decoder::quantize(rd - rb, dec.near, dec.t1,
                                                dec.t2, dec.t3);
      const int32_t q2 = jls::Decoder::quantize(rb - rc, dec.near, dec.t1,
                                                dec.t2, dec.t3);
      const int32_t q3 = jls::Decoder::quantize(rc - ra, dec.near, dec.t1,
                                                dec.t2, dec.t3);
      if (q1 == 0 && q2 == 0 && q3 == 0) {
        // Run mode (A.7): run of samples "equal" to Ra, then interruption.
        bool line_done = false;
        while (true) {
          if (br.bit() == 1) {
            const int32_t rm = 1 << jls::J[dec.run_index];
            const int32_t take = rm < (w - x + 1) ? rm : (w - x + 1);
            for (int32_t i = 0; i < take; ++i) cur[x++] = ra;
            // A full 2^J run increments RUNindex even when it lands exactly
            // on the end of the line (the encoder's while-loop did).
            if (take == rm && dec.run_index < 31) ++dec.run_index;
            if (x > w) { line_done = true; break; }
          } else {
            const int32_t jn = jls::J[dec.run_index];
            const int32_t r = jn ? br.bits(jn) : 0;
            for (int32_t i = 0; i < r && x <= w; ++i) cur[x++] = ra;
            if (x > w) return -9;  // interruption sample must exist
            cur[x] = dec.interruption(ra, prev[x], &err);
            ++x;
            if (dec.run_index > 0) --dec.run_index;
            break;
          }
        }
        if (line_done) break;
        if (err) return -10;
      } else {
        int32_t q = 81 * q1 + 9 * q2 + q3;
        int32_t sign = 1;
        if (q < 0) { q = -q; sign = -1; }
        cur[x] = dec.regular(q, sign, ra, rb, rc, &err);
        if (err) return -10;
        ++x;
      }
    }
    uint16_t* row_out = out + (int64_t)y * w;
    for (int32_t i = 0; i < w; ++i) row_out[i] = (uint16_t)cur[i + 1];
    // After the swap, prev[0] is the old cur[0] — exactly "the value Ra had
    // at the first sample of the previous line", which is the Rc edge value
    // the next line needs (T.87 A.2.1).
    std::swap(prev, cur);
  }
  *rows = h;
  *cols = w;
  *prec = precision;
  *near_out = near;
  return 0;
}

}  // extern "C"
