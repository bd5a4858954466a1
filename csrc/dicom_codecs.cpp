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
  for (uint32_t s = 0; s < n_seg; ++s) {
    uint32_t off, next;
    std::memcpy(&off, src + 4 + 4 * s, 4);
    if (s + 1 < n_seg)
      std::memcpy(&next, src + 4 + 4 * (s + 1), 4);
    else
      next = (uint32_t)n;
    if (off < 64 || next > n || off > next) return -4;
    // Plane s holds byte (n_seg-1-s) of each little-endian sample.
    uint8_t* plane = new uint8_t[n_pixels];
    int rc = packbits_decode(src + off, next - off, plane, n_pixels);
    if (rc != 0) {
      delete[] plane;
      return -5;
    }
    int64_t byte_ix = (int64_t)n_seg - 1 - s;  // little-endian byte index
    for (int64_t p = 0; p < n_pixels; ++p)
      out[p * bytes_per_sample + byte_ix] = plane[p];
    delete[] plane;
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

  void build(const uint8_t* counts /*16*/, const uint8_t* values, int nvals) {
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
    for (int i = 0; i < nvals && i < 256; ++i) vals[i] = values[i];
    ok = true;
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
    if (m == 0xC3) {  // SOF3
      prec = src[p + 4];
      rows = (src[p + 5] << 8) | src[p + 6];
      cols = (src[p + 7] << 8) | src[p + 8];
      int ncomp = src[p + 9];
      if (ncomp != 1) return -3;
    } else if (m == 0xC4) {  // DHT (possibly several tables per marker)
      int64_t q = p + 4, end = p + 2 + seg;
      while (q + 17 <= end) {
        int tc_th = src[q];
        int id = tc_th & 0x0F;
        const uint8_t* counts = src + q + 1;
        int nv = 0;
        for (int i = 0; i < 16; ++i) nv += counts[i];
        if (q + 17 + nv > end || id > 3) return -4;
        tables[id].build(counts, src + q + 17, nv);
        q += 17 + nv;
      }
    } else if (m == 0xDD) {  // DRI
      restart_interval = (src[p + 4] << 8) | src[p + 5];
    } else if (m == 0xDA) {  // SOS
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
      if (ssss < 0) return -11;
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

}  // extern "C"
