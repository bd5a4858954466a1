// JPEG 2000 Part 1 (ITU-T T.800 / ISO 15444-1) decoder — reversible path.
//
// From-scratch implementation of the decode surface DICOM CT needs: the
// JPEG 2000 Lossless transfer syntax (1.2.840.10008.1.2.4.90) and reversible
// .91 streams, which the reference reads through ITK/GDCM
// (/root/reference/lungmask/utils.py:215-222). Scope:
//
//   * raw JPEG 2000 codestreams (DICOM PS3.5 A.4.4 mandates no JP2 boxes;
//     the Python wrapper unwraps a JP2 container if one appears anyway),
//   * single component (CT), any subsampling of 1, 8..16 bit, signed or
//     unsigned,
//   * 5/3 reversible wavelet (W=1 in COD), arbitrary decomposition levels,
//     arbitrary tile grids and multiple tile-parts,
//   * LRCP / RLCP / RPCL progressions, any precinct sizes, SOP/EPH markers,
//     multiple quality layers,
//   * code-block styles: default, segmentation symbols, predictable
//     termination is tolerated (it changes encoder-side flushes only).
//
// Also decodes High-Throughput JPEG 2000 (ITU-T T.814 / DICOM
// 1.2.840.10008.1.2.4.201/.202/.203) code-blocks via the HT cleanup-pass
// block decoder (HTDec below) — a port of the probe-validated Python
// reference in lungmask_tpu/io/htj2k.py (fuzz-pinned bit-exact against
// OpenJPEG). HT blocks carrying SigProp/MagRef refinement passes are
// refused (-27) rather than decoded lossily.
//
// Rejected with distinct error codes (mapped to clear messages in
// lungmask_tpu/io/codecs.py): irreversible 9/7 (-20, lossy), multi-component
// (-21), selective-bypass / termall / vertically-causal code-block styles
// (-22), PPM/PPT packed headers (-23), PCRL/CPRL progressions (-24),
// ROI shifts (-25), HT refinement passes (-27), malformed HT block (-28).
//
// Validated bit-for-bit against OpenJPEG (via Pillow) on random and
// CT-windowed fixtures in tests/test_codecs.py.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

// Set LM_J2K_DEBUG=1 to dump per-packet code-block accounting to stderr.
static bool j2k_debug() {
  static int v = -1;
  if (v < 0) {
    const char* e = getenv("LM_J2K_DEBUG");
    v = (e && *e == '1') ? 1 : 0;
  }
  return v == 1;
}

namespace j2k {

// ---------------------------------------------------------------------------
// MQ arithmetic decoder (T.800 Annex C; identical to the T.88 MQ coder).
// ---------------------------------------------------------------------------

struct MQState {
  uint16_t qe;
  uint8_t nmps, nlps, sw;
};

static const MQState kMQ[47] = {
    {0x5601, 1, 1, 1},   {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0},  {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},   {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0}, {0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0}, {0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0}, {0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0}, {0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0}, {0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0}, {0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0}, {0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0}, {0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0}, {0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0}, {0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0}, {0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0}, {0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0}, {0x5601, 46, 46, 0}};

struct MQContext {
  uint8_t index = 0;
  uint8_t mps = 0;
};

struct MQDecoder {
  const uint8_t* buf = nullptr;
  int64_t len = 0, bp = 0;
  uint32_t c = 0, a = 0;
  int32_t ct = 0;

  void init(const uint8_t* b, int64_t n) {
    buf = b;
    len = n;
    bp = 0;
    c = (uint32_t)(bp < len ? buf[bp] : 0xFF) << 16;
    bytein();
    c <<= 7;
    ct -= 7;
    a = 0x8000;
  }

  void bytein() {
    if (bp < len && buf[bp] == 0xFF) {
      if (bp + 1 >= len || buf[bp + 1] > 0x8F) {
        c += 0xFF00;
        ct = 8;
      } else {
        ++bp;
        c += (uint32_t)buf[bp] << 9;
        ct = 7;
      }
    } else {
      ++bp;
      c += (uint32_t)(bp < len ? buf[bp] : 0xFF) << 8;
      ct = 8;
    }
  }

  int decode(MQContext& cx) {
    const MQState& s = kMQ[cx.index];
    int d;
    a -= s.qe;
    if (((c >> 16) & 0xFFFF) < s.qe) {
      // LPS exchange path
      if (a < s.qe) {
        d = cx.mps;
        cx.index = s.nmps;
      } else {
        d = 1 - cx.mps;
        if (s.sw) cx.mps = 1 - cx.mps;
        cx.index = s.nlps;
      }
      a = s.qe;
      do {
        if (ct == 0) bytein();
        a <<= 1;
        c <<= 1;
        --ct;
      } while (a < 0x8000);
    } else {
      c -= (uint32_t)s.qe << 16;
      if (a & 0x8000) return cx.mps;
      // MPS exchange path
      if (a < s.qe) {
        d = 1 - cx.mps;
        if (s.sw) cx.mps = 1 - cx.mps;
        cx.index = s.nlps;
      } else {
        d = cx.mps;
        cx.index = s.nmps;
      }
      do {
        if (ct == 0) bytein();
        a <<= 1;
        c <<= 1;
        --ct;
      } while (a < 0x8000);
    }
    return d;
  }
};

// ---------------------------------------------------------------------------
// Packet-header bit reader with 0xFF bit-stuffing (T.800 B.10.1).
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* buf;
  int64_t len, pos = 0;
  uint32_t acc = 0;
  int32_t nbits = 0;
  uint8_t last = 0;
  bool error = false;

  BitReader(const uint8_t* b, int64_t n) : buf(b), len(n) {}

  int bit() {
    if (nbits == 0) {
      if (pos >= len) {
        error = true;
        return 0;
      }
      if (last == 0xFF) {
        acc = buf[pos++];
        nbits = 7;  // stuffed bit: MSB of the byte after 0xFF is skipped
      } else {
        acc = buf[pos++];
        nbits = 8;
      }
      last = (uint8_t)acc;
    }
    --nbits;
    return (acc >> nbits) & 1;
  }

  uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | bit();
    return v;
  }

  // Align to the next byte boundary (end of packet header). A conformant
  // header never ends in 0xFF (B.10.1), so no stuffing byte is pending.
  void align() {
    nbits = 0;
    last = 0;
  }
};

// ---------------------------------------------------------------------------
// Tag trees (T.800 B.10.2).
// ---------------------------------------------------------------------------

struct TagTree {
  int w = 0, h = 0;
  std::vector<int> parent;  // node -> parent index (-1 for root)
  std::vector<int> low;     // current lower bound
  std::vector<uint8_t> known;
  std::vector<int> leaf_of;  // (y*w+x) -> node id

  void init(int w_, int h_) {
    w = w_;
    h = h_;
    parent.clear();
    low.clear();
    known.clear();
    leaf_of.assign((size_t)w * h, -1);
    // Build levels bottom-up.
    std::vector<int> cur((size_t)w * h);
    int lw = w, lh = h;
    int base = 0;
    for (int i = 0; i < lw * lh; ++i) cur[i] = i;
    parent.resize((size_t)lw * lh, -1);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) leaf_of[(size_t)y * w + x] = y * lw + x;
    while (lw > 1 || lh > 1) {
      int nw = (lw + 1) / 2, nh = (lh + 1) / 2;
      int nbase = base + lw * lh;
      parent.resize((size_t)nbase + (size_t)nw * nh, -1);
      for (int y = 0; y < lh; ++y)
        for (int x = 0; x < lw; ++x)
          parent[(size_t)base + y * lw + x] = nbase + (y / 2) * nw + (x / 2);
      base = nbase;
      lw = nw;
      lh = nh;
    }
    low.assign(parent.size(), 0);
    known.assign(parent.size(), 0);
  }

  // Returns true iff leaf value < threshold (fully resolved); reads bits.
  bool decode(BitReader& br, int leaf_x, int leaf_y, int threshold) {
    int path[32];
    int n = 0;
    int node = leaf_of[(size_t)leaf_y * w + leaf_x];
    while (node >= 0) {
      path[n++] = node;
      node = parent[node];
    }
    int lo = 0;
    for (int i = n - 1; i >= 0; --i) {
      int nd = path[i];
      if (low[nd] < lo) low[nd] = lo;
      while (!known[nd] && low[nd] < threshold) {
        if (br.bit())
          known[nd] = 1;
        else
          ++low[nd];
      }
      lo = low[nd];
      if (!known[nd]) return false;  // value >= threshold (so far)
    }
    return low[path[0]] < threshold;
  }

  // Fully resolve a leaf's value (for zero-bitplane trees).
  int decode_value(BitReader& br, int leaf_x, int leaf_y) {
    int t = 1;
    while (!decode(br, leaf_x, leaf_y, t)) {
      ++t;
      if (br.error || t > 128) return -1;
    }
    return low[leaf_of[(size_t)leaf_y * w + leaf_x]];
  }
};

// ---------------------------------------------------------------------------
// Tier-1 EBCOT decoder (T.800 Annex D).
// ---------------------------------------------------------------------------

// Flag bits per coefficient position.
enum {
  F_SIG = 1,       // significant
  F_VISITED = 2,   // coded in current significance-propagation pass
  F_REFINED = 4,   // has been refined at least once
};

struct T1 {
  int w = 0, h = 0;
  std::vector<int32_t> data;   // magnitudes (accumulated)
  std::vector<uint8_t> flags;  // F_* per pixel
  std::vector<int8_t> sign;    // 0 positive, 1 negative
  MQContext cx[19];
  MQDecoder mq;

  int idx(int x, int y) const { return y * w + x; }
  bool sig(int x, int y) const {
    if (x < 0 || y < 0 || x >= w || y >= h) return false;
    return flags[idx(x, y)] & F_SIG;
  }
  int sgn(int x, int y) const {  // +1 / -1 / 0 with significance
    if (!sig(x, y)) return 0;
    return sign[idx(x, y)] ? -1 : 1;
  }

  // Zero-coding context (Table D.1) for band orientation:
  // orient: 0=LL, 1=HL, 2=LH, 3=HH.
  int zc_context(int x, int y, int orient) const {
    int hcount = (int)sig(x - 1, y) + (int)sig(x + 1, y);
    int vcount = (int)sig(x, y - 1) + (int)sig(x, y + 1);
    int dcount = (int)sig(x - 1, y - 1) + (int)sig(x + 1, y - 1) +
                 (int)sig(x - 1, y + 1) + (int)sig(x + 1, y + 1);
    int hh = hcount, vv = vcount;
    if (orient == 1) std::swap(hh, vv);  // HL: transpose roles
    if (orient == 3) {                   // HH (Table D.1 third column)
      int hv = hcount + vcount;
      if (dcount >= 3) return 8;
      if (dcount == 2) return hv >= 1 ? 7 : 6;
      if (dcount == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
      return hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
    }
    if (hh == 2) return 8;
    if (hh == 1) {
      if (vv >= 1) return 7;
      return dcount >= 1 ? 6 : 5;
    }
    if (vv == 2) return 4;
    if (vv == 1) return 3;
    if (dcount >= 2) return 2;
    return dcount == 1 ? 1 : 0;
  }

  // Sign-coding context + XOR bit (Table D.3).
  void sc_context(int x, int y, int& ctx, int& xorbit) const {
    int hc = sgn(x - 1, y) + sgn(x + 1, y);
    int vc = sgn(x, y - 1) + sgn(x, y + 1);
    hc = hc > 1 ? 1 : (hc < -1 ? -1 : hc);
    vc = vc > 1 ? 1 : (vc < -1 ? -1 : vc);
    if (hc == 1) {
      if (vc == 1) { ctx = 13; xorbit = 0; }
      else if (vc == 0) { ctx = 12; xorbit = 0; }
      else { ctx = 11; xorbit = 0; }
    } else if (hc == 0) {
      if (vc == 1) { ctx = 10; xorbit = 0; }
      else if (vc == 0) { ctx = 9; xorbit = 0; }
      else { ctx = 10; xorbit = 1; }
    } else {
      if (vc == 1) { ctx = 11; xorbit = 1; }
      else if (vc == 0) { ctx = 12; xorbit = 1; }
      else { ctx = 13; xorbit = 1; }
    }
  }

  int mr_context(int x, int y) const {
    if (flags[idx(x, y)] & F_REFINED) return 16;
    int nb = (int)sig(x - 1, y) + (int)sig(x + 1, y) + (int)sig(x, y - 1) +
             (int)sig(x, y + 1) + (int)sig(x - 1, y - 1) +
             (int)sig(x + 1, y - 1) + (int)sig(x - 1, y + 1) +
             (int)sig(x + 1, y + 1);
    return nb > 0 ? 15 : 14;
  }

  bool any_sig_neighbor(int x, int y) const {
    return sig(x - 1, y) || sig(x + 1, y) || sig(x, y - 1) || sig(x, y + 1) ||
           sig(x - 1, y - 1) || sig(x + 1, y - 1) || sig(x - 1, y + 1) ||
           sig(x + 1, y + 1);
  }

  void decode_sig(int x, int y, int bp, int orient) {
    int ctx, xorbit;
    sc_context(x, y, ctx, xorbit);
    int s = mq.decode(cx[ctx]) ^ xorbit;
    flags[idx(x, y)] |= F_SIG;
    sign[idx(x, y)] = (int8_t)s;
    data[idx(x, y)] |= (int32_t)1 << bp;
    (void)orient;
  }

  void spp(int bp, int orient) {  // significance propagation pass
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; ++x)
        for (int y = y0; y < std::min(y0 + 4, h); ++y) {
          int i = idx(x, y);
          if ((flags[i] & F_SIG) || !any_sig_neighbor(x, y)) continue;
          if (mq.decode(cx[zc_context(x, y, orient)]))
            decode_sig(x, y, bp, orient);
          flags[i] |= F_VISITED;
        }
  }

  void mrp(int bp) {  // magnitude refinement pass
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; ++x)
        for (int y = y0; y < std::min(y0 + 4, h); ++y) {
          int i = idx(x, y);
          if (!(flags[i] & F_SIG) || (flags[i] & F_VISITED)) continue;
          int b = mq.decode(cx[mr_context(x, y)]);
          flags[i] |= F_REFINED;
          if (b) data[i] |= (int32_t)1 << bp;
        }
  }

  bool cup(int bp, int orient, bool segsym) {  // cleanup pass
    for (int y0 = 0; y0 < h; y0 += 4)
      for (int x = 0; x < w; ++x) {
        int y = y0;
        // Run-length mode: full stripe of 4, all insignificant, no
        // significant neighbors, none visited.
        if (y0 + 4 <= h) {
          bool rl = true;
          for (int yy = y0; yy < y0 + 4; ++yy) {
            int i = idx(x, yy);
            if ((flags[i] & (F_SIG | F_VISITED)) || any_sig_neighbor(x, yy)) {
              rl = false;
              break;
            }
          }
          if (rl) {
            if (mq.decode(cx[17]) == 0) {  // run-length context: all stay 0
              for (int yy = y0; yy < y0 + 4; ++yy)
                flags[idx(x, yy)] &= ~F_VISITED;
              continue;
            }
            int r = (mq.decode(cx[18]) << 1) | mq.decode(cx[18]);  // UNIFORM
            y = y0 + r;
            decode_sig(x, y, bp, orient);
            ++y;
          }
        }
        for (; y < std::min(y0 + 4, h); ++y) {
          int i = idx(x, y);
          if (flags[i] & F_VISITED) {
            flags[i] &= ~F_VISITED;
            continue;
          }
          if (flags[i] & F_SIG) continue;
          if (mq.decode(cx[zc_context(x, y, orient)]))
            decode_sig(x, y, bp, orient);
        }
      }
    // Clear visited for next bitplane.
    for (auto& f : flags) f &= ~F_VISITED;
    if (segsym) {
      int v = 0;
      for (int i = 0; i < 4; ++i) v = (v << 1) | mq.decode(cx[18]);
      if (v != 0xA) return false;  // corrupted stream
    }
    return true;
  }

  // Decode a code-block: data buffer = concatenated codeword segment,
  // numbps = max bitplanes present, npasses = coding passes to run.
  bool run(const uint8_t* seg, int64_t seglen, int numbps, int npasses,
           int orient, bool segsym) {
    data.assign((size_t)w * h, 0);
    flags.assign((size_t)w * h, 0);
    sign.assign((size_t)w * h, 0);
    for (auto& c : cx) c = MQContext{};
    cx[17].index = 3;  // run-length context initial state (Table D.7)
    cx[18].index = 46; // UNIFORM
    cx[0].index = 4;   // ZC context 0 initial state
    mq.init(seg, seglen);
    int bp = numbps - 1;
    int pass = 0;
    // First pass on the top bitplane is a cleanup pass.
    if (pass < npasses) {
      if (!cup(bp, orient, segsym)) return false;
      ++pass;
    }
    while (pass < npasses && bp > 0) {
      --bp;
      if (pass < npasses) { spp(bp, orient); ++pass; }
      if (pass < npasses) { mrp(bp); ++pass; }
      if (pass < npasses) {
        if (!cup(bp, orient, segsym)) return false;
        ++pass;
      }
    }
    return true;
  }
};

// ---------------------------------------------------------------------------
// Codestream structures.
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// HTJ2K (ITU-T T.814) cleanup-pass block decoder.
//
// Port of the probe-validated Python reference (lungmask_tpu/io/htj2k.py):
// every coding rule was reconstructed empirically against OpenJPEG's HT
// decoder and the Python codec round-trips bit-exactly (tests/test_htj2k.py,
// tools/htj2k_fuzz.py). The codeword LUTs are generated from the probed
// tables by tools/htj2k_gen_tables.py. Scope: the cleanup pass only —
// blocks carrying SigProp/MagRef refinement passes are refused loudly
// (-27) rather than decoded lossily.
// ---------------------------------------------------------------------------

#include "htj2k_tables.inc"

struct HTMel {  // adaptive run-length coder, MSB-first, 0xFF stuffing
  const uint8_t* d = nullptr;
  int64_t n = 0, pos = 0;
  int bit = 7, state = 0, one = 0;
  int64_t zeros = 0;
  static const int E[13];
  void init(const uint8_t* p, int64_t len) { d = p; n = len; }
  int read_bit() {
    if (pos >= n) return 1;  // pad behaves as max-run continuation
    int b = (d[pos] >> bit) & 1;
    if (bit == 0) {
      bool skip7 = d[pos] == 0xFF;
      pos++;
      bit = skip7 ? 6 : 7;
    } else {
      bit--;
    }
    return b;
  }
  int event() {
    while (zeros == 0 && !one) {
      int e = E[state];
      if (read_bit()) {
        zeros += (int64_t)1 << e;
        state = state < 12 ? state + 1 : 12;
      } else {
        int run = 0;
        for (int i = e - 1; i >= 0; --i) run |= read_bit() << i;
        zeros += run;
        one = 1;
        state = state > 0 ? state - 1 : 0;
      }
    }
    if (zeros) {
      zeros--;
      return 0;
    }
    one = 0;
    return 1;
  }
};
const int HTMel::E[13] = {0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5};

struct HTVlc {  // backward bit reader with the marker-pair stuffing rules
  const uint8_t* d = nullptr;
  int64_t ipos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool unstuff = false;
  void init(const uint8_t* seg, int64_t scup) {
    d = seg;
    ipos = scup - 2;  // byte holding the first nibble
    int nib = ipos >= 0 ? (d[ipos] >> 4) : 0;
    if ((nib & 7) == 7) {  // low 3 bits all ones: bit 3 is a stuffed 0
      acc = nib & 7;
      nbits = 3;
    } else {
      acc = nib;
      nbits = 4;
    }
    unstuff = nib >= 9;  // X byte's low nibble belongs to Scup (worst case)
  }
  void refill() {
    while (nbits <= 56 && ipos > 0) {
      ipos--;
      uint32_t b = d[ipos];
      int take = (unstuff && (b & 0x7F) == 0x7F) ? 7 : 8;
      acc |= (uint64_t)(b & ((1u << take) - 1)) << nbits;
      nbits += take;
      unstuff = b > 0x8F;
    }
  }
  uint32_t read(int m) {
    if (m > nbits) refill();
    if (m > nbits) nbits = m;  // zero-pad past the stream
    uint32_t v = (uint32_t)(acc & (((uint64_t)1 << m) - 1));
    acc >>= m;
    nbits -= m;
    return v;
  }
  uint32_t peek7() {
    if (nbits < 7) refill();
    return (uint32_t)(acc & 0x7F);
  }
  void drop(int m) {
    if (m > nbits) nbits = m;  // zero-pad (only reachable near stream end)
    acc >>= m;
    nbits -= m;
  }
};

struct HTMag {  // forward LSB-first reader; byte after 0xFF carries 7 bits
  const uint8_t* d = nullptr;
  int64_t n = 0, pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool prev_ff = false;
  void init(const uint8_t* p, int64_t len) { d = p; n = len; }
  uint32_t read(int m) {
    while (nbits < m) {
      if (pos < n) {
        int take = prev_ff ? 7 : 8;
        acc |= (uint64_t)(d[pos] & ((1u << take) - 1)) << nbits;
        nbits += take;
        prev_ff = d[pos] == 0xFF;
        pos++;
      } else {
        nbits = m;  // zero-pad
      }
    }
    uint32_t v = (uint32_t)(acc & (((uint64_t)1 << m) - 1));
    acc >>= m;
    nbits -= m;
    return v;
  }
};

static uint32_t ht_uvlc(HTVlc& v) {
  if (v.read(1)) return 1;
  if (v.read(1)) return 2;
  if (v.read(1)) return 3 + v.read(1);
  return 5 + v.read(5);
}
static uint32_t ht_uvlc_pfx(HTVlc& v) {
  if (v.read(1)) return 1;
  if (v.read(1)) return 2;
  if (v.read(1)) return 3;
  return 5;
}
static uint32_t ht_uvlc_sfx(HTVlc& v, uint32_t base) {
  if (base == 3) return 3 + v.read(1);
  if (base == 5) return 5 + v.read(5);
  return base;
}
// interleaved pair form: pfx0 pfx1 sfx0 sfx1
static void ht_uvlc_pair(HTVlc& v, uint32_t* u0, uint32_t* u1) {
  uint32_t b0 = ht_uvlc_pfx(v), b1 = ht_uvlc_pfx(v);
  *u0 = ht_uvlc_sfx(v, b0);
  *u1 = ht_uvlc_sfx(v, b1);
}
// initial line pair, both u_off, MEL event 0: u0's prefix; when it says
// u0 > 2, u1-1 is ONE bit and precedes u0's suffix; else u1 is a full code
static void ht_uvlc_joint(HTVlc& v, uint32_t* u0, uint32_t* u1) {
  if (v.read(1)) {
    *u0 = 1;
    *u1 = ht_uvlc(v);
    return;
  }
  if (v.read(1)) {
    *u0 = 2;
    *u1 = ht_uvlc(v);
    return;
  }
  if (v.read(1)) {
    *u1 = 1 + v.read(1);
    *u0 = 3 + v.read(1);
    return;
  }
  *u1 = 1 + v.read(1);
  *u0 = 5 + v.read(5);
}

// eqn-1 context class from the left quad's rho
static inline int ht_init_ctx(int left_rho) {
  return ((left_rho & 3) ? 1 : 0) | (((left_rho >> 2) & 1) << 1) |
         (((left_rho >> 3) & 1) << 2);
}

static inline int ht_exp_of(int64_t mu) {  // bitlen(2*mu - 1), 0 for mu==0
  if (mu <= 0) return 0;
  uint64_t v = 2 * (uint64_t)mu - 1;
  int e = 0;
  while (v) {
    v >>= 1;
    e++;
  }
  return e;
}

struct HTDec {
  int w = 0, h = 0;
  std::vector<int32_t> mu;   // decoded magnitudes
  std::vector<int8_t> sign;  // 0 positive, 1 negative

  // Decode one cleanup segment. max_u: conformance bound on U_q
  // (zero-bitplanes + 1); returns false on malformed input.
  bool run(const uint8_t* seg, int64_t len, int max_u) {
    if (len < 2) return false;
    int64_t lcup = len;
    int64_t scup = ((int64_t)seg[lcup - 1] << 4) | (seg[lcup - 2] & 0xF);
    if (scup < 2 || scup > lcup || scup > 4079) return false;
    HTMel mel;
    mel.init(seg + lcup - scup, scup);
    HTVlc vlc;
    vlc.init(seg + lcup - scup, scup);
    HTMag mag;
    mag.init(seg, lcup - scup);

    int qw = (w + 1) / 2, qh = (h + 1) / 2;
    mu.assign((size_t)w * h, 0);
    sign.assign((size_t)w * h, 0);
    std::vector<int> prev_rho(qw, 0), cur_rho(qw, 0);
    std::vector<int> prev_e(2 * qw, 0), cur_e(2 * qw, 0);

    for (int qy = 0; qy < qh; ++qy) {
      bool initial = qy == 0;
      if (qy) {
        prev_rho.swap(cur_rho);
        prev_e.swap(cur_e);
        std::fill(cur_rho.begin(), cur_rho.end(), 0);
        std::fill(cur_e.begin(), cur_e.end(), 0);
      }
      for (int qx = 0; qx < qw;) {
        int npair = (qx + 1 < qw) ? 2 : 1;
        uint16_t ent[2] = {0, 0};
        bool have_cw[2] = {false, false};
        for (int i = 0; i < npair; ++i) {
          int x = qx + i;
          int c;
          if (initial) {
            c = ht_init_ctx(x ? cur_rho[x - 1] : 0);
          } else {
            int above = prev_rho[x];
            int nw = x ? (prev_rho[x - 1] >> 3) & 1 : 0;
            int n0 = (above >> 1) & 1;
            int n1 = (above >> 3) & 1;
            int ne = (x + 1 < qw) ? (prev_rho[x + 1] >> 1) & 1 : 0;
            int left = x ? cur_rho[x - 1] : 0;
            int wbit = (left & 0xC) ? 1 : 0;
            c = (nw | n0) | ((n1 | ne) << 1) | (wbit << 2);
          }
          if (c == 0 && mel.event() == 0) {
            cur_rho[x] = 0;
            continue;  // wholly insignificant, no codeword
          }
          const uint16_t* tab = kHTVlcTables[(initial ? 0 : 8) + c];
          uint16_t e = tab[vlc.peek7()];
          if (!e) return false;
          vlc.drop(e & 7);
          ent[i] = e;
          have_cw[i] = true;
          cur_rho[x] = (e >> 3) & 0xF;
        }
        // u-section
        uint32_t us[2] = {0, 0};
        bool uoff0 = have_cw[0] && (ent[0] & 0x80);
        bool uoff1 = npair == 2 && have_cw[1] && (ent[1] & 0x80);
        if (npair == 2 && uoff0 && uoff1) {
          if (initial) {
            if (mel.event()) {
              ht_uvlc_pair(vlc, &us[0], &us[1]);
              us[0] += 2;
              us[1] += 2;
            } else {
              ht_uvlc_joint(vlc, &us[0], &us[1]);
            }
          } else {
            ht_uvlc_pair(vlc, &us[0], &us[1]);
          }
        } else {
          if (uoff0) us[0] = ht_uvlc(vlc);
          if (uoff1) us[1] = ht_uvlc(vlc);
        }
        // magnitudes
        for (int i = 0; i < npair; ++i) {
          int x = qx + i;
          int rho = cur_rho[x];
          if (!have_cw[i] || rho == 0) continue;
          int kq;
          if (initial) {
            kq = 1;
          } else {
            int lo = 2 * x - 1 < 0 ? 0 : 2 * x - 1;
            int hi = 2 * x + 3 > 2 * qw ? 2 * qw : 2 * x + 3;
            int ev = 0;
            for (int j = lo; j < hi; ++j) ev = std::max(ev, prev_e[j]);
            bool gamma = (rho & (rho - 1)) != 0;
            kq = gamma ? std::max(1, ev - 1) : 1;
          }
          int64_t U = (int64_t)us[i] + kq;
          if (U > max_u || U > 31) return false;
          for (int k = 0; k < 4; ++k) {
            if (!(rho >> k & 1)) continue;
            int kn = (ent[i] >> (8 + k)) & 1;
            int e1 = (ent[i] >> (12 + k)) & 1;
            int m = (int)U - kn;
            if (m < 0) return false;
            uint32_t v = mag.read(m);
            int s = (int)(v & 1);
            int64_t mg = v >> 1;
            int64_t muv = 1 + mg + (m > 0 ? ((int64_t)e1 << (m - 1)) : 0);
            int r = qy * 2 + (k & 1);
            int col = x * 2 + (k >> 1);
            if (r < h && col < w) {
              mu[(size_t)r * w + col] = (int32_t)muv;
              sign[(size_t)r * w + col] = (int8_t)s;
            }
            cur_e[2 * x + (k >> 1)] =
                (k & 1) ? ht_exp_of(muv) : cur_e[2 * x + (k >> 1)];
          }
        }
        qx += npair;
      }
    }
    return true;
  }
};

static inline int ceildiv(int64_t a, int64_t b) {
  return (int)((a + b - 1) / b);
}
static inline int ceildivpow2(int64_t a, int e) {
  return (int)((a + ((int64_t)1 << e) - 1) >> e);
}
static inline int floordivpow2(int64_t a, int e) { return (int)(a >> e); }
static inline int floorlog2(uint32_t v) {
  int r = 0;
  while (v > 1) { v >>= 1; ++r; }
  return r;
}

struct CodeBlock {
  int x0, y0, x1, y1;
  bool included = false;   // included in any previous layer
  int lblock = 3;
  int numbps = 0;          // Mb - zero bitplanes (once known)
  int npasses = 0;         // total passes accumulated
  int64_t seg1len = -1;    // HT: length of the cleanup codeword segment
  std::vector<uint8_t> segment;  // concatenated body bytes
};

struct PrecinctBand {
  int cbx0 = 0, cby0 = 0, cbw = 0, cbh = 0;  // code-block grid in this precinct
  TagTree incl, imsb;
  std::vector<CodeBlock> cblks;
};

struct Band {
  int orient;           // 0 LL, 1 HL, 2 LH, 3 HH
  int x0, y0, x1, y1;   // band coordinates
  int numbps;           // Mb for this band
  std::vector<int32_t> coef;  // (y1-y0) x (x1-x0)
};

struct Resolution {
  int x0, y0, x1, y1;   // resolution-level coordinates
  int ppx, ppy;         // precinct exponents (in resolution coords)
  int npw, nph;         // precinct grid
  int nbands;
  Band bands[3];        // r==0: bands[0] is LL; else HL,LH,HH
  std::vector<PrecinctBand> pband;  // nbands * npw * nph
};

struct COD {
  int prog = 0;        // progression order
  int layers = 1;
  int mct = 0;
  int levels = 5;      // decomposition levels
  int xcb = 6, ycb = 6;  // code-block exponents (log2 of dimensions)
  int cstyle = 0;      // code-block style flags
  int wavelet = 1;     // 0 = 9/7 irreversible, 1 = 5/3 reversible
  bool ht = false;     // HT (T.814) block coder (cstyle bit 6)
  bool sop = false, eph = false;
  bool have_precincts = false;
  std::vector<uint8_t> prec_sizes;  // packed PPx|PPy<<4 per resolution
};

struct QCD {
  int guard = 2;
  std::vector<int> exps;  // exponent per subband (style 0: one per subband)
  int style = 0;
};

}  // namespace j2k

extern "C" {

// Decode a raw JPEG 2000 Part 1 codestream (single component, reversible).
//   src/n: codestream bytes (starting with FF4F SOC)
//   out/out_cap: int32 output, row-major rows*cols samples
//   rows/cols/prec/sgnd: image geometry outputs
// Returns 0 on success; negative error codes documented at the top of the
// file (-1 malformed, -2 capacity, -20.. unsupported features).
int32_t lm_j2k_decode(const uint8_t* src, int64_t n, int32_t* out,
                      int64_t out_cap, int32_t* rows, int32_t* cols,
                      int32_t* prec, int32_t* sgnd) {
  using namespace j2k;
  if (n < 4 || src[0] != 0xFF || src[1] != 0x4F) return -1;  // SOC

  auto rd16 = [&](int64_t p) -> uint32_t {
    return ((uint32_t)src[p] << 8) | src[p + 1];
  };
  auto rd32 = [&](int64_t p) -> uint32_t {
    return ((uint32_t)src[p] << 24) | ((uint32_t)src[p + 1] << 16) |
           ((uint32_t)src[p + 2] << 8) | src[p + 3];
  };

  // --- main header ---
  int64_t p = 2;
  uint32_t xsiz = 0, ysiz = 0, x0siz = 0, y0siz = 0;
  uint32_t xt = 0, yt = 0, xt0 = 0, yt0 = 0;
  int ncomp = 0, precision = 0, is_signed = 0;
  COD cod;
  QCD qcd;
  bool have_siz = false, have_cod = false, have_qcd = false;

  struct TilePart {
    int64_t off, len;
  };
  std::vector<std::vector<TilePart>> tile_parts;

  while (p + 4 <= n) {
    if (src[p] != 0xFF) return -1;
    uint8_t m = src[p + 1];
    if (m == 0xD9) break;  // EOC
    if (m == 0x90) {       // SOT
      if (p + 12 > n) return -1;
      uint32_t lsot = rd16(p + 2);
      uint32_t isot = rd16(p + 4);
      uint32_t psot = rd32(p + 6);
      (void)lsot;
      int64_t data_start = p + 12;  // SOT(12) then markers then SOD
      // Scan forward to SOD within this tile-part header.
      int64_t q = p + 2 + lsot;
      bool sod_found = false;
      while (q + 4 <= n) {
        if (src[q] != 0xFF) return -1;
        if (src[q + 1] == 0x93) {  // SOD
          q += 2;
          sod_found = true;
          break;
        }
        // Tile-part headers may carry COD/QCD overrides — unsupported if
        // they differ; skip known-harmless markers (COM, PLT).
        uint8_t tm = src[q + 1];
        uint32_t tl = rd16(q + 2);
        if (tm == 0x52 || tm == 0x5C || tm == 0x53 || tm == 0x5D)
          return -26;  // per-tile coding/quant overrides not supported
        if (tm == 0x61) return -23;  // PPT
        if (tm == 0x5F) return -24;  // POC in a tile-part header (A.6.6)
        q += 2 + tl;
      }
      (void)data_start;
      int64_t body_end = (psot == 0) ? n : p + psot;
      // A corrupt Lsot/Psot can leave the SOD scan past body_end; a
      // negative tile-part length would turn into a huge range insert.
      if (body_end > n || !sod_found || q > body_end) return -1;
      if (tile_parts.size() <= isot) tile_parts.resize(isot + 1);
      tile_parts[isot].push_back({q, body_end - q});
      p = body_end;
      continue;
    }
    if (p + 4 > n) return -1;
    uint32_t l = rd16(p + 2);
    int64_t seg = p + 4;
    // Segment data spans [seg, seg + l - 2); every fixed-offset field read
    // below must stay inside it and inside the buffer.
    if (l < 2 || seg + (int64_t)l - 2 > n) return -1;
    switch (m) {
      case 0x51: {  // SIZ
        if ((int64_t)l - 2 < 39) return -1;  // Lsiz >= 41 for 1 component
        xsiz = rd32(seg + 2);
        ysiz = rd32(seg + 6);
        x0siz = rd32(seg + 10);
        y0siz = rd32(seg + 14);
        xt = rd32(seg + 18);
        yt = rd32(seg + 22);
        xt0 = rd32(seg + 26);
        yt0 = rd32(seg + 30);
        ncomp = (int)rd16(seg + 34);
        if (ncomp != 1) return -21;
        uint8_t ssiz = src[seg + 36];
        precision = (ssiz & 0x7F) + 1;
        is_signed = ssiz >> 7;
        if (src[seg + 37] != 1 || src[seg + 38] != 1) return -21;  // subsampled
        // Geometry sanity (corrupt fields otherwise reach div-by-zero in
        // the tile grid or unsigned-wrap into absurd allocations).
        if (xsiz <= x0siz || ysiz <= y0siz || xt == 0 || yt == 0 ||
            xt0 > x0siz || yt0 > y0siz)
          return -1;
        have_siz = true;
        break;
      }
      case 0x52: {  // COD
        if ((int64_t)l - 2 < 10) return -1;
        uint8_t scod = src[seg];
        cod.have_precincts = scod & 1;
        cod.sop = scod & 2;
        cod.eph = scod & 4;
        cod.prog = src[seg + 1];
        cod.layers = (int)rd16(seg + 2);
        cod.mct = src[seg + 4];
        cod.levels = src[seg + 5];
        cod.xcb = (src[seg + 6] & 0xF) + 2;
        cod.ycb = (src[seg + 7] & 0xF) + 2;
        cod.cstyle = src[seg + 8];
        cod.wavelet = src[seg + 9] == 1 ? 1 : 0;
        if (src[seg + 9] == 0) return -20;  // 9/7 irreversible
        cod.ht = (cod.cstyle & 0x40) != 0;  // HT (T.814) block coder
        // 0x01 bypass, 0x02 per-pass context reset, 0x04 termall, 0x08
        // vertically causal: each changes MQ decoding in ways this T1 does
        // not implement — decoding anyway would desynchronize silently.
        // (0x10 predictable termination is an encoder-side constraint and
        // 0x20 segmentation symbols ARE implemented — both decode normally.)
        // For HT code-blocks those bits select HT-mixed / causal variants
        // this decoder does not implement either.
        if (cod.cstyle & (0x01 | 0x02 | 0x04 | 0x08))
          return -22;  // bypass / reset / termall / vertically causal
        if (cod.prog > 2) return -24;  // PCRL / CPRL
        if (cod.levels > 32) return -1;  // T.800 allows at most 32 levels
        // T.800 B.7: code-block dims are 2^xcb with xcb in [2,10] and the
        // block area capped at 4096 (xcb+ycb <= 12); larger values would
        // also overflow the T1 flag grids and shift counts below.
        if (cod.xcb > 10 || cod.ycb > 10 || cod.xcb + cod.ycb > 12) return -1;
        if (cod.have_precincts) {
          if ((int64_t)l - 2 < 10 + cod.levels + 1) return -1;
          cod.prec_sizes.assign(src + seg + 10, src + seg + 10 + cod.levels + 1);
          // PPx/PPy = 0 is only legal at resolution 0 (T.800 Table A.21);
          // at r > 0 the band precinct is PPx-1 wide, so 0 would turn the
          // geometry below into shifts by -1 (UB) on a corrupt stream.
          for (size_t r = 1; r < cod.prec_sizes.size(); ++r)
            if ((cod.prec_sizes[r] & 0xF) == 0 || (cod.prec_sizes[r] >> 4) == 0)
              return -1;
        }
        have_cod = true;
        break;
      }
      case 0x5C: {  // QCD
        if ((int64_t)l - 2 < 1) return -1;
        uint8_t sqcd = src[seg];
        qcd.style = sqcd & 0x1F;
        qcd.guard = sqcd >> 5;
        qcd.exps.clear();
        if (qcd.style == 0) {
          for (int64_t q = seg + 1; q < seg + l - 2; ++q)
            qcd.exps.push_back(src[q] >> 3);
        } else if (qcd.style == 1) {
          if ((int64_t)l - 2 < 3) return -1;
          qcd.exps.push_back((int)(rd16(seg + 1) >> 11));
        } else {  // style 2: scalar expounded (irreversible) — not lossless
          return -20;
        }
        if (qcd.exps.empty()) return -1;  // band_numbps needs >= 1 exponent
        have_qcd = true;
        break;
      }
      case 0x5E: {  // RGN
        return -25;
      }
      case 0x60: {  // PPM
        return -23;
      }
      case 0x53:    // COC: per-component coding-style override
      case 0x5D: {  // QCC: per-component quantization override
        // Single-component streams may still carry these to override COD/
        // QCD (different code-block size, levels, or even the 9/7 wavelet,
        // which would bypass the -20 lossy gate). Decoding with the stale
        // COD/QCD parameters would desynchronize silently — refuse instead.
        return -26;
      }
      default:
        break;  // COM, TLM, PLM, POC(!) etc. — POC would alter progression
    }
    if (m == 0x5F) return -24;  // POC: progression order changes
    p += 2 + l;
  }
  if (!have_siz || !have_cod || !have_qcd) return -1;

  const int64_t total = (int64_t)(xsiz - x0siz) * (ysiz - y0siz);
  if (total > out_cap) return -2;
  *rows = (int32_t)(ysiz - y0siz);
  *cols = (int32_t)(xsiz - x0siz);
  *prec = precision;
  *sgnd = is_signed;

  const int ntx = ceildiv((int64_t)xsiz - xt0, xt);
  const int nty = ceildiv((int64_t)ysiz - yt0, yt);
  const int NL = cod.levels;
  const bool segsym = (cod.cstyle & 0x20) != 0;

  // Mb per band: guard + exp_b - 1 (style 0: per subband; style 1: derived).
  auto band_numbps = [&](int r, int orient) -> int {
    int e;
    if (qcd.style == 0) {
      // SPqcd order: LL, then (HL, LH, HH) per level from the deepest
      // decomposition level outward (E.1) — index 1 + 3*(r-1) + orient.
      size_t ix = (r == 0) ? 0 : (size_t)(1 + 3 * (r - 1) + orient);
      if (ix >= qcd.exps.size()) ix = qcd.exps.size() - 1;
      e = qcd.exps[ix];
    } else {
      // derived: eps_b = eps_0 - NL + n_b (T.800 E.1.1); with gains 0 for
      // reversible this is the standard derived exponent.
      int nb = (r == 0) ? NL : NL - r + 1;
      e = qcd.exps[0] - NL + nb;
    }
    return qcd.guard + e - 1;
  };

  for (int tyi = 0; tyi < nty; ++tyi)
    for (int txi = 0; txi < ntx; ++txi) {
      int tidx = tyi * ntx + txi;
      // Tile bounds (component coords == tile coords, subsampling 1).
      int tx0 = std::max((int64_t)xt0 + (int64_t)txi * xt, (int64_t)x0siz);
      int ty0 = std::max((int64_t)yt0 + (int64_t)tyi * yt, (int64_t)y0siz);
      int tx1 = (int)std::min((int64_t)xt0 + (int64_t)(txi + 1) * xt, (int64_t)xsiz);
      int ty1 = (int)std::min((int64_t)yt0 + (int64_t)(tyi + 1) * yt, (int64_t)ysiz);
      int tw = tx1 - tx0, th = ty1 - ty0;
      if (tw <= 0 || th <= 0) continue;

      // Build resolutions, bands, precincts, code-blocks.
      std::vector<Resolution> res(NL + 1);
      for (int r = 0; r <= NL; ++r) {
        Resolution& R = res[r];
        int e = NL - r;
        R.x0 = ceildivpow2(tx0, e);
        R.y0 = ceildivpow2(ty0, e);
        R.x1 = ceildivpow2(tx1, e);
        R.y1 = ceildivpow2(ty1, e);
        if (cod.have_precincts) {
          R.ppx = cod.prec_sizes[r] & 0xF;
          R.ppy = cod.prec_sizes[r] >> 4;
        } else {
          R.ppx = 15;
          R.ppy = 15;
        }
        R.npw = (R.x1 > R.x0)
                    ? ceildivpow2(R.x1, R.ppx) - floordivpow2(R.x0, R.ppx)
                    : 0;
        R.nph = (R.y1 > R.y0)
                    ? ceildivpow2(R.y1, R.ppy) - floordivpow2(R.y0, R.ppy)
                    : 0;
        // Code-block size within precincts (B.7): one less in each dim for
        // r > 0 because precincts are split across the four bands.
        int xcb = std::min(cod.xcb, r == 0 ? R.ppx : R.ppx - 1);
        int ycb = std::min(cod.ycb, r == 0 ? R.ppy : R.ppy - 1);

        R.nbands = (r == 0) ? 1 : 3;
        for (int b = 0; b < R.nbands; ++b) {
          Band& B = R.bands[b];
          if (r == 0) {
            B.orient = 0;
            B.x0 = ceildivpow2(tx0, NL);
            B.y0 = ceildivpow2(ty0, NL);
            B.x1 = ceildivpow2(tx1, NL);
            B.y1 = ceildivpow2(ty1, NL);
          } else {
            B.orient = b + 1;  // 1 HL, 2 LH, 3 HH
            int nb = NL - r;   // band downsample exponent is nb+1
            int xo = (B.orient == 1 || B.orient == 3) ? 1 : 0;
            int yo = (B.orient == 2 || B.orient == 3) ? 1 : 0;
            B.x0 = ceildivpow2(tx0 - ((int64_t)xo << nb), nb + 1);
            B.y0 = ceildivpow2(ty0 - ((int64_t)yo << nb), nb + 1);
            B.x1 = ceildivpow2(tx1 - ((int64_t)xo << nb), nb + 1);
            B.y1 = ceildivpow2(ty1 - ((int64_t)yo << nb), nb + 1);
          }
          B.numbps = band_numbps(r, r == 0 ? 0 : b);
          B.coef.assign((size_t)std::max(0, B.x1 - B.x0) *
                            std::max(0, B.y1 - B.y0),
                        0);
        }

        R.pband.resize((size_t)R.nbands * R.npw * R.nph);
        for (int b = 0; b < R.nbands; ++b) {
          Band& B = R.bands[b];
          // Precinct partition projected into the band: for r>0 bands live at
          // one more level of downsampling, so precinct size halves.
          int pw = (r == 0) ? R.ppx : R.ppx - 1;
          int ph = (r == 0) ? R.ppy : R.ppy - 1;
          for (int py = 0; py < R.nph; ++py)
            for (int px = 0; px < R.npw; ++px) {
              PrecinctBand& P =
                  R.pband[(size_t)b * R.npw * R.nph + (size_t)py * R.npw + px];
              // Precinct bounds in band coordinates.
              int bpx0 = (floordivpow2(B.x0, pw) + px) << pw;
              int bpy0 = (floordivpow2(B.y0, ph) + py) << ph;
              int bpx1 = bpx0 + (1 << pw);
              int bpy1 = bpy0 + (1 << ph);
              bpx0 = std::max(bpx0, B.x0);
              bpy0 = std::max(bpy0, B.y0);
              bpx1 = std::min(bpx1, B.x1);
              bpy1 = std::min(bpy1, B.y1);
              if (bpx1 <= bpx0 || bpy1 <= bpy0) {
                P.cbw = P.cbh = 0;
                continue;
              }
              P.cbx0 = floordivpow2(bpx0, xcb);
              P.cby0 = floordivpow2(bpy0, ycb);
              P.cbw = ceildivpow2(bpx1, xcb) - P.cbx0;
              P.cbh = ceildivpow2(bpy1, ycb) - P.cby0;
              P.incl.init(P.cbw, P.cbh);
              P.imsb.init(P.cbw, P.cbh);
              P.cblks.resize((size_t)P.cbw * P.cbh);
              for (int cy = 0; cy < P.cbh; ++cy)
                for (int cx = 0; cx < P.cbw; ++cx) {
                  CodeBlock& C = P.cblks[(size_t)cy * P.cbw + cx];
                  C.x0 = std::max((P.cbx0 + cx) << xcb, bpx0);
                  C.y0 = std::max((P.cby0 + cy) << ycb, bpy0);
                  C.x1 = std::min((P.cbx0 + cx + 1) << xcb, bpx1);
                  C.y1 = std::min((P.cby0 + cy + 1) << ycb, bpy1);
                }
            }
        }
      }

      // Concatenate this tile's tile-part bodies.
      std::vector<uint8_t> body;
      if ((size_t)tidx < tile_parts.size())
        for (auto& tp : tile_parts[tidx])
          body.insert(body.end(), src + tp.off, src + tp.off + tp.len);
      BitReader br(body.data(), (int64_t)body.size());

      // Decode one packet: (layer, resolution, precinct).
      auto read_packet = [&](int r, int pidx, int layer) -> bool {
        Resolution& R = res[r];
        if (cod.sop) {
          // Skip SOP marker segment (6 bytes) if present at this position.
          if (br.pos + 6 <= (int64_t)body.size() && body[br.pos] == 0xFF &&
              body[br.pos + 1] == 0x91)
            br.pos += 6;
        }
        if (br.bit() == 0) {  // empty packet
          br.align();
          if (cod.eph && br.pos + 2 <= (int64_t)body.size() &&
              body[br.pos] == 0xFF && body[br.pos + 1] == 0x92)
            br.pos += 2;
          return !br.error;
        }
        struct Pending {
          CodeBlock* cb;
          int64_t len;
          int newpasses;
        };
        std::vector<Pending> order;
        for (int b = 0; b < R.nbands; ++b) {
          PrecinctBand& P = R.pband[(size_t)b * R.npw * R.nph + pidx];
          for (int cy = 0; cy < P.cbh; ++cy)
            for (int cx = 0; cx < P.cbw; ++cx) {
              CodeBlock& C = P.cblks[(size_t)cy * P.cbw + cx];
              if (C.x1 <= C.x0 || C.y1 <= C.y0) continue;
              bool included;
              if (!C.included) {
                // Inclusion tag tree: included iff first-inclusion layer
                // index < layer + 1 (B.10.4).
                included = P.incl.decode(br, cx, cy, layer + 1);
              } else {
                included = br.bit();
              }
              if (!included) continue;
              int newpasses = 0;
              if (!C.included) {
                int zbp = P.imsb.decode_value(br, cx, cy);
                if (zbp < 0) return false;
                C.numbps = R.bands[b].numbps - zbp;
                // A corrupt imsb tree (zbp can reach 128) or hostile QCD
                // (Mb up to 37) would otherwise reach T1 with a negative
                // start bit-plane or int32-overflowing shifts. numbps == 0
                // (all bit-planes zero) is tolerated and skipped at T1.
                if (C.numbps < 0 || C.numbps > 31) return false;
                C.included = true;
              }
              // Number of new passes (B.10.6).
              if (br.bit() == 0)
                newpasses = 1;
              else if (br.bit() == 0)
                newpasses = 2;
              else {
                uint32_t v = br.bits(2);
                if (v < 3)
                  newpasses = 3 + (int)v;
                else {
                  v = br.bits(5);
                  if (v < 31)
                    newpasses = 6 + (int)v;
                  else
                    newpasses = 37 + (int)br.bits(7);
                }
              }
              // Lblock update + length. An HT code-block terminates its
              // cleanup pass, so a first contribution with more passes
              // carries TWO codeword segments (cleanup | SigProp+MagRef),
              // each with its own comma run + length field.
              int64_t len = 0;
              bool has_cleanup = C.npasses == 0;
              if (cod.ht && has_cleanup && newpasses > 1) {
                while (br.bit()) ++C.lblock;
                int64_t len1 = br.bits(C.lblock);
                while (br.bit()) ++C.lblock;
                int64_t len2 =
                    br.bits(C.lblock + floorlog2((uint32_t)(newpasses - 1)));
                C.seg1len = len1;
                len = len1 + len2;
              } else {
                while (br.bit()) ++C.lblock;
                int lenbits = C.lblock + floorlog2((uint32_t)newpasses);
                len = br.bits(lenbits);
                if (cod.ht && has_cleanup) C.seg1len = len;
              }
              order.push_back({&C, len, newpasses});
              if (j2k_debug())
                fprintf(stderr,
                        "pkt t=%d r=%d b=%d cb=(%d,%d) numbps=%d np=%d "
                        "len=%lld lblock=%d\n",
                        tidx, r, b, cx, cy, C.numbps, newpasses,
                        (long long)len, C.lblock);
              if (br.error) return false;
            }
        }
        br.align();
        if (cod.eph) {
          if (br.pos + 2 <= (int64_t)body.size() && body[br.pos] == 0xFF &&
              body[br.pos + 1] == 0x92)
            br.pos += 2;
        }
        for (auto& pe : order) {
          if (br.pos + pe.len > (int64_t)body.size()) return false;
          pe.cb->segment.insert(pe.cb->segment.end(), body.data() + br.pos,
                                body.data() + br.pos + pe.len);
          pe.cb->npasses += pe.newpasses;
          br.pos += pe.len;
        }
        return !br.error;
      };

      // Packet iteration per progression order.
      bool ok = true;
      if (cod.prog == 0) {  // LRCP
        for (int l = 0; l < cod.layers && ok; ++l)
          for (int r = 0; r <= NL && ok; ++r)
            for (int pidx = 0; pidx < res[r].npw * res[r].nph && ok; ++pidx)
              ok = read_packet(r, pidx, l);
      } else if (cod.prog == 1) {  // RLCP
        for (int r = 0; r <= NL && ok; ++r)
          for (int l = 0; l < cod.layers && ok; ++l)
            for (int pidx = 0; pidx < res[r].npw * res[r].nph && ok; ++pidx)
              ok = read_packet(r, pidx, l);
      } else {  // RPCL
        for (int r = 0; r <= NL && ok; ++r)
          for (int pidx = 0; pidx < res[r].npw * res[r].nph && ok; ++pidx)
            for (int l = 0; l < cod.layers && ok; ++l)
              ok = read_packet(r, pidx, l);
      }
      if (!ok) return -3;

      // Tier-1 decode every code-block into its band.
      T1 t1;
      for (int r = 0; r <= NL; ++r) {
        Resolution& R = res[r];
        for (int b = 0; b < R.nbands; ++b) {
          Band& B = R.bands[b];
          int bw = B.x1 - B.x0;
          for (int pidx = 0; pidx < R.npw * R.nph; ++pidx) {
            PrecinctBand& P = R.pband[(size_t)b * R.npw * R.nph + pidx];
            for (auto& C : P.cblks) {
              if (!C.included || C.npasses == 0 || C.numbps <= 0) continue;
              int cw = C.x1 - C.x0, ch = C.y1 - C.y0;
              if (cw <= 0 || ch <= 0) continue;
              if (cod.ht) {
                // Cleanup-only HT decode; refinement passes would refine
                // bit-planes this decoder does not implement — decoding
                // without them silently truncates, so refuse loudly.
                if (C.npasses > 1) return -27;
                HTDec ht;
                ht.w = cw;
                ht.h = ch;
                int p = C.numbps - 1;  // cleanup bit-plane
                int max_u = B.numbps - C.numbps + 1;  // zero bitplanes + 1
                if (p < 0 || p > 30) return -28;
                if (C.seg1len < 0 || C.seg1len > (int64_t)C.segment.size())
                  return -28;
                if (!ht.run(C.segment.data(), C.seg1len, max_u)) return -28;
                for (int y = 0; y < ch; ++y)
                  for (int x = 0; x < cw; ++x) {
                    int64_t m = ht.mu[(size_t)y * cw + x];
                    if (!m) continue;
                    if (p > 0 && m > (int64_t)(INT32_MAX >> p)) return -28;
                    int32_t val =
                        (int32_t)((m << p) | (p > 0 ? 1 << (p - 1) : 0));
                    if (ht.sign[(size_t)y * cw + x]) val = -val;
                    B.coef[(size_t)(C.y0 - B.y0 + y) * bw +
                           (C.x0 - B.x0 + x)] = val;
                  }
                continue;
              }
              t1.w = cw;
              t1.h = ch;
              if (!t1.run(C.segment.data(), (int64_t)C.segment.size(),
                          C.numbps, C.npasses, B.orient, segsym))
                return -4;
              for (int y = 0; y < t1.h; ++y)
                for (int x = 0; x < t1.w; ++x) {
                  int32_t mag = t1.data[(size_t)y * t1.w + x];
                  if (t1.sign[(size_t)y * t1.w + x]) mag = -mag;
                  B.coef[(size_t)(C.y0 - B.y0 + y) * bw + (C.x0 - B.x0 + x)] =
                      mag;
                }
            }
          }
        }
      }

      // Inverse 5/3 DWT (T.800 Annex F). Reconstruct level by level into a
      // tile-sized buffer addressed in tile coordinates.
      std::vector<int32_t> cur;  // current LL, coords [cx0,cx1)x[cy0,cy1)
      {
        Band& LL = res[0].bands[0];
        cur = LL.coef;
      }
      int cx0 = res[0].x0, cy0 = res[0].y0, cx1 = res[0].x1, cy1 = res[0].y1;

      auto sym = [&](int i, int i0, int i1) {
        // whole-sample symmetric extension into [i0, i1)
        int span = 2 * (i1 - i0 - 1);
        if (span <= 0) return i0;
        int j = i - i0;
        j = ((j % span) + span) % span;
        if (j >= i1 - i0) j = span - j;
        return i0 + j;
      };

      for (int r = 1; r <= NL; ++r) {
        Resolution& R = res[r];
        int u0 = R.x0, u1 = R.x1, v0 = R.y0, v1 = R.y1;
        int w = u1 - u0, h = v1 - v0;
        std::vector<int32_t> a((size_t)w * std::max(h, 0), 0);
        // Interleave: even/odd positions in tile coords at this level.
        Band& HL = R.bands[0];
        Band& LH = R.bands[1];
        Band& HH = R.bands[2];
        int llw = cx1 - cx0;
        int hlw = HL.x1 - HL.x0;
        int lhw = LH.x1 - LH.x0;
        int hhw = HH.x1 - HH.x0;
        for (int v = v0; v < v1; ++v)
          for (int u = u0; u < u1; ++u) {
            int32_t val;
            if ((u & 1) == 0 && (v & 1) == 0)
              val = cur[(size_t)(v / 2 - cy0) * llw + (u / 2 - cx0)];
            else if ((u & 1) == 1 && (v & 1) == 0)
              val = hlw > 0 ? HL.coef[(size_t)(v / 2 - HL.y0) * hlw +
                                      ((u - 1) / 2 - HL.x0)]
                            : 0;
            else if ((u & 1) == 0 && (v & 1) == 1)
              val = lhw > 0 ? LH.coef[(size_t)((v - 1) / 2 - LH.y0) * lhw +
                                      (u / 2 - LH.x0)]
                            : 0;
            else
              val = hhw > 0 ? HH.coef[(size_t)((v - 1) / 2 - HH.y0) * hhw +
                                      ((u - 1) / 2 - HH.x0)]
                            : 0;
            a[(size_t)(v - v0) * w + (u - u0)] = val;
          }

        // 1D synthesis on a line Y[i0..i1) with WSS extension (F.3.8.2):
        //   X(2n)   = Y(2n)   - floor((Y(2n-1) + Y(2n+1) + 2) / 4)
        //   X(2n+1) = Y(2n+1) + floor((X(2n)   + X(2n+2))    / 2)
        auto sr1d = [&](std::vector<int32_t>& y, int i0, int i1) {
          int len = i1 - i0;
          if (len <= 0) return;
          if (len == 1) {
            // Single-sample line: X = Y (even origin) or Y/2 (odd) — F.3.8.4.
            if (i0 & 1) y[0] = y[0] / 2;
            return;
          }
          std::vector<int32_t> x(len);
          auto Y = [&](int i) { return y[sym(i, i0, i1) - i0]; };
          // even (low) samples first
          for (int i = i0 % 2 == 0 ? i0 : i0 + 1; i < i1; i += 2)
            x[i - i0] = Y(i) - ((Y(i - 1) + Y(i + 1) + 2) >> 2);
          auto X = [&](int i) {
            int j = sym(i, i0, i1);
            // symmetric extension maps odd out-of-range onto in-range even
            return x[j - i0];
          };
          for (int i = i0 % 2 == 0 ? i0 + 1 : i0; i < i1; i += 2)
            x[i - i0] = Y(i) + ((X(i - 1) + X(i + 1)) >> 1);
          y = std::move(x);
        };

        // Horizontal pass on every row, then vertical on every column
        // (matches the reference implementation order; validated bit-for-bit
        // against OpenJPEG fixtures).
        std::vector<int32_t> line;
        for (int v = 0; v < h; ++v) {
          line.assign(a.begin() + (size_t)v * w, a.begin() + (size_t)(v + 1) * w);
          sr1d(line, u0, u1);
          std::copy(line.begin(), line.end(), a.begin() + (size_t)v * w);
        }
        for (int u = 0; u < w; ++u) {
          line.resize(h);
          for (int v = 0; v < h; ++v) line[v] = a[(size_t)v * w + u];
          sr1d(line, v0, v1);
          for (int v = 0; v < h; ++v) a[(size_t)v * w + u] = line[v];
        }

        cur = std::move(a);
        cx0 = u0;
        cy0 = v0;
        cx1 = u1;
        cy1 = v1;
      }

      // DC level shift + write into the output image.
      const int32_t shift = is_signed ? 0 : (int32_t)1 << (precision - 1);
      const int imgw = (int)(xsiz - x0siz);
      for (int y = 0; y < th; ++y) {
        const int32_t* srcrow = cur.data() + (size_t)y * tw;
        int32_t* dst =
            out + (size_t)(ty0 - (int)y0siz + y) * imgw + (tx0 - (int)x0siz);
        for (int x = 0; x < tw; ++x) dst[x] = srcrow[x] + shift;
      }
    }

  return 0;
}

}  // extern "C"
