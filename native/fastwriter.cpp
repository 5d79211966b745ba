// Host-side output formatting for nanosim_tpu.
//
// The device produces packed uint8 read rows and integer event lists; this
// translation unit turns a whole accepted batch into FASTA/FASTQ records and
// reference-format ground-truth error-log lines in one call, replacing the
// per-read/per-event Python formatting loop (the dominant host cost at high
// read rates).
//
// Build: g++ -O3 -march=native -shared -fPIC fastwriter.cpp -o libfastwriter.so
// Interface: plain C, consumed via ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

namespace {

inline char* put_bytes(char* p, const void* src, int64_t n) {
  std::memcpy(p, src, static_cast<size_t>(n));
  return p + n;
}

inline char* put_u64(char* p, uint64_t v) {
  char tmp[20];
  int n = 0;
  do {
    tmp[n++] = static_cast<char>('0' + v % 10);
    v /= 10;
  } while (v);
  for (int i = n - 1; i >= 0; --i) *p++ = tmp[i];
  return p;
}

inline char* put_i64(char* p, int64_t v) {
  if (v < 0) {
    *p++ = '-';
    return put_u64(p, static_cast<uint64_t>(-v));
  }
  return put_u64(p, static_cast<uint64_t>(v));
}

const char kCompLut[256] = {};  // initialized in init_comp()

char g_comp[256];
bool g_comp_init = false;

void init_comp() {
  if (g_comp_init) return;
  for (int i = 0; i < 256; ++i) g_comp[i] = static_cast<char>(i);
  g_comp['A'] = 'T';
  g_comp['T'] = 'A';
  g_comp['C'] = 'G';
  g_comp['G'] = 'C';
  g_comp['a'] = 't';
  g_comp['t'] = 'a';
  g_comp['c'] = 'g';
  g_comp['g'] = 'c';
  g_comp_init = true;
}

const char* kTypeNames[3] = {"mis", "ins", "del"};
const int kTypeLens[3] = {3, 3, 3};

// --- 2-bit packed read support (flat emitter) -------------------------------
//
// Packing convention (sim/compact.py): base index 4*w + j of a read lives in
// bits [2j, 2j+2) of packed byte w; code 0/1/2/3 = A/C/G/T.

const char kCode2Base[4] = {'A', 'C', 'G', 'T'};

uint32_t g_dec4[256];     // packed byte -> 4 ASCII bases (little-endian u32)
uint32_t g_dec4_rc[256];  // packed byte -> 4 complemented bases in REVERSE order
bool g_dec_init = false;

void init_dec() {
  if (g_dec_init) return;
  for (int v = 0; v < 256; ++v) {
    char fwd[4], rc[4];
    for (int j = 0; j < 4; ++j) {
      const int c = (v >> (2 * j)) & 3;
      fwd[j] = kCode2Base[c];
      rc[3 - j] = kCode2Base[3 - c];
    }
    std::memcpy(&g_dec4[v], fwd, 4);
    std::memcpy(&g_dec4_rc[v], rc, 4);
  }
  g_dec_init = true;
}

// Decode bases [start, start+n) of a packed read into dst (ASCII).
inline void decode_span(const uint8_t* packed, int64_t start, int64_t n, char* dst) {
  int64_t i = start;
  char* p = dst;
  // head: unaligned bases up to the next byte boundary
  while ((i & 3) && n > 0) {
    *p++ = kCode2Base[(packed[i >> 2] >> (2 * (i & 3))) & 3];
    ++i;
    --n;
  }
  // body: whole bytes via LUT (may write up to 3 bytes past n; callers
  // guarantee slack in dst)
  const uint8_t* bp = packed + (i >> 2);
  int64_t nb = n >> 2;
  for (int64_t b = 0; b < nb; ++b) {
    uint32_t w = g_dec4[bp[b]];
    std::memcpy(p, &w, 4);
    p += 4;
  }
  i += nb << 2;
  n -= nb << 2;
  while (n > 0) {
    *p++ = kCode2Base[(packed[i >> 2] >> (2 * (i & 3))) & 3];
    ++i;
    --n;
  }
}

// Decode the reverse complement of packed bases [0, total) into dst.
inline void decode_rc(const uint8_t* packed, int64_t total, char* dst) {
  // pre[j] = comp(base(total - 1 - j)); walk source bytes from the end.
  char* p = dst;
  int64_t i = total;  // source index (exclusive)
  // head: bring source index down to a byte boundary
  while ((i & 3) && i > 0) {
    --i;
    *p++ = kCode2Base[3 - ((packed[i >> 2] >> (2 * (i & 3))) & 3)];
  }
  int64_t nb = i >> 2;
  for (int64_t b = nb - 1; b >= 0; --b) {
    uint32_t w = g_dec4_rc[packed[b]];
    std::memcpy(p, &w, 4);
    p += 4;
  }
}

// --- JAX-compatible threefry-2x32 + error-walk replay ----------------------
//
// The ground-truth error log needs the walk's event list, but shipping it
// from the device costs ~45% of the host-link bytes.  The walk is a pure
// function of (seed, stream, slot, site) under the framework's counter-based
// RNG contract, so the host REPLAYS it: threefry here is bit-identical to
// jax._src.prng (20 rounds, rotation schedule 13/15/26/6 + 17/29/16/24), and
// draws use the partitionable counter layout (block (0, p), output y0 ^ y1).
// The one cross-platform risk is the f32 ECDF-inversion arithmetic (XLA may
// fuse/contract differently); every lane therefore carries a device-computed
// checksum over its event words, and mismatching lanes are re-fetched from
// the device (exact), keeping output byte-correct regardless.

namespace walkreplay {

struct Key {
  uint32_t k0, k1;
};

inline void tf_block(uint32_t k0, uint32_t k1, uint32_t x0, uint32_t x1,
                     uint32_t* y0, uint32_t* y1) {
  static const uint32_t R0[4] = {13, 15, 26, 6}, R1[4] = {17, 29, 16, 24};
  const uint32_t ks[3] = {k0, k1, k0 ^ k1 ^ 0x1BD11BDAu};
  x0 += ks[0];
  x1 += ks[1];
  for (int i = 0; i < 5; ++i) {
    const uint32_t* rot = (i % 2 == 0) ? R0 : R1;
    for (int r = 0; r < 4; ++r) {
      x0 += x1;
      x1 = (x1 << rot[r]) | (x1 >> (32 - rot[r]));
      x1 ^= x0;
    }
    x0 += ks[(i + 1) % 3];
    x1 += ks[(i + 2) % 3] + static_cast<uint32_t>(i + 1);
  }
  *y0 = x0;
  *y1 = x1;
}

inline Key fold_in(Key k, uint32_t data) {
  Key o;
  tf_block(k.k0, k.k1, 0u, data, &o.k0, &o.k1);
  return o;
}

inline float bits_to_uniform(uint32_t b) {
  uint32_t f = (b >> 9) | 0x3F800000u;
  float out;
  std::memcpy(&out, &f, 4);
  return out - 1.0f;
}

// jax.random.uniform(key, (n,)) position p: block (0, p), bits = y0 ^ y1
inline float uniform_at(Key k, uint32_t pos) {
  uint32_t y0, y1;
  tf_block(k.k0, k.k1, 0u, pos, &y0, &y1);
  return bits_to_uniform(y0 ^ y1);
}

// Exact-breakpoint ECDF (profiles/ecdf.exact_breakpoints): inversion is pure
// f32 comparisons + lookup — bit-identical to the device (no float
// arithmetic to diverge).
struct Ecdf {
  const int32_t* bin_lo;  // [n_bins]
  const float* breaks;    // [n_bins, K] padded with 2.0
  const int32_t* vals;    // [n_bins, K]
  const int32_t* n_bk;    // [n_bins]
  int64_t n_bins, K;

  int select_bin(int32_t value) const {
    // searchsorted(bin_lo, value, side='right') - 1, clipped
    int64_t lo = 0, hi = n_bins;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (bin_lo[mid] <= value) lo = mid + 1; else hi = mid;
    }
    int64_t idx = lo - 1;
    if (idx < 0) idx = 0;
    if (idx >= n_bins) idx = n_bins - 1;
    return static_cast<int>(idx);
  }

  int32_t invert(int lane, float p) const {
    const float* bk = breaks + lane * K;
    // count of breaks <= p (breaks ascending, padded with 2.0 > any p)
    int64_t lo = 0, hi = K;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (bk[mid] <= p) lo = mid + 1; else hi = mid;
    }
    int64_t idx = lo - 1;
    if (idx < 0) idx = 0;
    int64_t nmax = n_bk[lane] - 1;
    if (idx > nmax) idx = nmax;
    return vals[lane * K + idx];
  }
};

}  // namespace walkreplay

inline uint32_t bits_at(walkreplay::Key k, uint32_t pos) {
  uint32_t y0, y1;
  walkreplay::tf_block(k.k0, k.k1, 0u, pos, &y0, &y1);
  return y0 ^ y1;
}

// --- 8-wide threefry (AVX2, runtime-dispatched) ------------------------------
//
// Every threefry evaluation in this file has x0 = 0 and one of two shapes:
// (a) one key with 8 consecutive counters (uniform streams, fold_in of
// consecutive step indices) or (b) 8 distinct keys with one shared counter
// (the per-step walk uniforms).  Both batch the 20 add/rot/xor rounds into
// one AVX2 pass; the scalar loop keeps non-AVX2 hosts bit-identical.

namespace walkreplay {

#if defined(__x86_64__)
__attribute__((target("avx2"))) inline void tf8_avx2(
    const uint32_t* k0, const uint32_t* k1, const uint32_t* x1,
    uint32_t* y0, uint32_t* y1) {
  const __m256i K0 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(k0));
  const __m256i K1 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(k1));
  const __m256i KS2 =
      _mm256_xor_si256(_mm256_xor_si256(K0, K1), _mm256_set1_epi32(0x1BD11BDA));
  __m256i X0 = K0;  // x0 = 0 + ks[0]
  __m256i X1 = _mm256_add_epi32(
      _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x1)), K1);
#define NTF_ROUND(RC)                                                        \
  X0 = _mm256_add_epi32(X0, X1);                                             \
  X1 = _mm256_or_si256(_mm256_slli_epi32(X1, RC),                            \
                       _mm256_srli_epi32(X1, 32 - (RC)));                    \
  X1 = _mm256_xor_si256(X1, X0);
#define NTF_INJECT(KA, KB, CI)                                               \
  X0 = _mm256_add_epi32(X0, KA);                                             \
  X1 = _mm256_add_epi32(X1, _mm256_add_epi32(KB, _mm256_set1_epi32(CI)));
  NTF_ROUND(13) NTF_ROUND(15) NTF_ROUND(26) NTF_ROUND(6)
  NTF_INJECT(K1, KS2, 1)
  NTF_ROUND(17) NTF_ROUND(29) NTF_ROUND(16) NTF_ROUND(24)
  NTF_INJECT(KS2, K0, 2)
  NTF_ROUND(13) NTF_ROUND(15) NTF_ROUND(26) NTF_ROUND(6)
  NTF_INJECT(K0, K1, 3)
  NTF_ROUND(17) NTF_ROUND(29) NTF_ROUND(16) NTF_ROUND(24)
  NTF_INJECT(K1, KS2, 4)
  NTF_ROUND(13) NTF_ROUND(15) NTF_ROUND(26) NTF_ROUND(6)
  NTF_INJECT(KS2, K0, 5)
#undef NTF_ROUND
#undef NTF_INJECT
  _mm256_storeu_si256(reinterpret_cast<__m256i*>(y0), X0);
  _mm256_storeu_si256(reinterpret_cast<__m256i*>(y1), X1);
}
inline bool tf8_supported() {
  static const bool ok = __builtin_cpu_supports("avx2");
  return ok;
}
#else
inline bool tf8_supported() { return false; }
#endif

inline void tf8(const uint32_t* k0, const uint32_t* k1, const uint32_t* x1,
                uint32_t* y0, uint32_t* y1) {
#if defined(__x86_64__)
  if (tf8_supported()) {
    tf8_avx2(k0, k1, x1, y0, y1);
    return;
  }
#endif
  for (int i = 0; i < 8; ++i) tf_block(k0[i], k1[i], 0u, x1[i], &y0[i], &y1[i]);
}

// (a) one key, counters pos0..pos0+7 -> 8 uniforms
inline void uniform8_at(Key k, uint32_t pos0, float* out) {
  uint32_t k0[8], k1[8], xs[8], y0[8], y1[8];
  for (int i = 0; i < 8; ++i) {
    k0[i] = k.k0;
    k1[i] = k.k1;
    xs[i] = pos0 + static_cast<uint32_t>(i);
  }
  tf8(k0, k1, xs, y0, y1);
  for (int i = 0; i < 8; ++i) out[i] = bits_to_uniform(y0[i] ^ y1[i]);
}

// (b) fold_in of consecutive data d0..d0+7 -> 8 derived keys
inline void fold8_in(Key k, uint32_t d0, uint32_t* ok0, uint32_t* ok1) {
  uint32_t k0[8], k1[8], xs[8];
  for (int i = 0; i < 8; ++i) {
    k0[i] = k.k0;
    k1[i] = k.k1;
    xs[i] = d0 + static_cast<uint32_t>(i);
  }
  tf8(k0, k1, xs, ok0, ok1);
}

// (c) 8 distinct keys, one shared counter -> 8 uniforms
inline void uniform8_keys(const uint32_t* k0, const uint32_t* k1, uint32_t pos,
                          float* out) {
  uint32_t xs[8], y0[8], y1[8];
  for (int i = 0; i < 8; ++i) xs[i] = pos;
  tf8(k0, k1, xs, y0, y1);
  for (int i = 0; i < 8; ++i) out[i] = bits_to_uniform(y0[i] ^ y1[i]);
}

}  // namespace walkreplay

// ops/rng.uniform2_per_slot: one u32 draw -> two 16-bit-resolution uniforms
inline float u2_lo(uint32_t b) { return static_cast<float>(b & 0xFFFFu) * (1.0f / 65536.0f); }
inline float u2_hi(uint32_t b) { return static_cast<float>(b >> 16) * (1.0f / 65536.0f); }

// --- host read reconstruction ----------------------------------------------
//
// Under the counter-based RNG contract the final read bytes are a pure
// function of (genome, walk events, threefry draws); sim/reconstruct.py is
// the numpy spec, this is the fast mirror.  Byte-identical to the device's
// fused_read_v2 (enforced by tests/test_reconstruct.py).

// IUPAC candidate sets (ops/seqops.py; case_convert, simulator.py:743-755);
// 2-bit code for ref byte c whose chunk-buffer index is bidx.
inline int resolve_code(uint8_t c, walkreplay::Key kiupac, int64_t bidx) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
  }
  const char* opts;
  int cnt;
  switch (c) {
    case 'Y': opts = "CT"; cnt = 2; break;
    case 'R': opts = "AG"; cnt = 2; break;
    case 'W': opts = "AT"; cnt = 2; break;
    case 'S': opts = "GC"; cnt = 2; break;
    case 'K': opts = "TG"; cnt = 2; break;
    case 'M': opts = "CA"; cnt = 2; break;
    case 'D': opts = "AGT"; cnt = 3; break;
    case 'V': opts = "ACG"; cnt = 3; break;
    case 'H': opts = "ACT"; cnt = 3; break;
    case 'B': opts = "CGT"; cnt = 3; break;
    case 'N': case 'X': opts = "ATCG"; cnt = 4; break;
    default: return 0;  // non-IUPAC byte -> 'A' (_ascii_to_code)
  }
  float u = u2_lo(bits_at(kiupac, static_cast<uint32_t>(bidx)));
  int idx = static_cast<int>(u * static_cast<float>(cnt));
  if (idx > cnt - 1) idx = cnt - 1;
  switch (opts[idx]) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    default: return 3;
  }
}

// random-base choice order (A, T, C, G) -> 2-bit code (seqops.random_bases)
const int kChoiceCode[4] = {0, 3, 1, 2};

// head/tail random bases from uniforms at consecutive pool counters under
// one key (pool clipped at cap-1); the unclipped stretch batches 8 draws
// per AVX2 threefry pass
inline void fill_ht_bases(walkreplay::Key k, int64_t pool0, int64_t n,
                          int64_t cap, char* dst) {
  const int64_t cmax = cap - 1 < 0 ? 0 : cap - 1;
  int64_t un = cmax - pool0 + 1;
  if (un < 0) un = 0;
  if (un > n) un = n;
  int64_t i = 0;
  float u8[8];
  for (; i + 8 <= un; i += 8) {
    walkreplay::uniform8_at(k, static_cast<uint32_t>(pool0 + i), u8);
    for (int x = 0; x < 8; ++x) {
      int c = static_cast<int>(u8[x] * 4.0f);
      if (c > 3) c = 3;
      dst[i + x] = kCode2Base[kChoiceCode[c]];
    }
  }
  for (; i < un; ++i) {
    float u = walkreplay::uniform_at(k, static_cast<uint32_t>(pool0 + i));
    int c = static_cast<int>(u * 4.0f);
    if (c > 3) c = 3;
    dst[i] = kCode2Base[kChoiceCode[c]];
  }
  if (i < n) {  // clipped region: one pool index -> one repeated base
    float u = walkreplay::uniform_at(k, static_cast<uint32_t>(cmax));
    int c = static_cast<int>(u * 4.0f);
    if (c > 3) c = 3;
    std::memset(dst + i, kCode2Base[kChoiceCode[c]], n - i);
  }
}

struct ReconArgs {
  int64_t seed, stream, site_iupac, site_mis, site_ht, ht_cap, chunk;
  const int64_t* slots;
  const char* names_buf;
  const int64_t* name_off;
  const int64_t* total_len;
  const int64_t* head;
  const int64_t* l_new;
  const uint8_t* rev;
  const uint32_t* ev_flat;
  const int64_t* ev_off;
  const int64_t* n_events;      // events for RECONSTRUCTION (always)
  const int64_t* n_events_log;  // events for the error log (0 if log off)
  const uint8_t* genome_flat;
  const int64_t* g_off;
  const int64_t* g_len;
  const int64_t* start_pos;
  const int64_t* ubf;
  const int64_t* ube;
  char* fastx_out;
  char* err_out;
  int write_errors;
  // FASTQ: base-quality reconstruction through the exact QualDevice
  // breakpoint table (ops/tables.build_qual_breakpoints); qK = row width,
  // rows ordered 0=match 1=mis 2=ins 3=ht (4=unmapped unused here).
  int fastq = 0;
  int64_t site_qual = 0;
  const float* q_breaks = nullptr;  // [>=4, qK], row-sorted, sentinel 0.0
  const int32_t* q_vals = nullptr;  // [>=4, qK]
  int64_t qK = 0;
};

void recon_range(const ReconArgs& a, int64_t r0, int64_t r1,
                 int64_t* fw, int64_t* ew) {
  using walkreplay::Key;
  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(a.seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(a.seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(a.stream));

  std::vector<char> pre_buf;
  std::vector<uint8_t> cls_buf;  // per-position qclass (FASTQ only)
  std::vector<int64_t> rpos_buf;
  char* fp = a.fastx_out + a.ubf[r0];
  char* ep = a.err_out + a.ube[r0];
  char* const fp0 = fp;
  char* const ep0 = ep;

  for (int64_t r = r0; r < r1; ++r) {
    const int64_t total = a.total_len[r];
    const int64_t head = a.head[r];
    const int64_t lnew = a.l_new[r];
    const bool rev = a.rev[r] != 0;
    const char* name = a.names_buf + a.name_off[r];
    const int64_t name_len = a.name_off[r + 1] - a.name_off[r];
    const int64_t ne = a.n_events[r];
    const uint32_t* ev = a.ev_flat + a.ev_off[r];
    const int64_t goff = a.g_off[r];
    const int64_t spos = a.start_pos[r];
    const uint8_t* gseq = a.genome_flat + goff + spos;
    const int64_t buf_off = (goff + spos) % a.chunk;

    Key ks = walkreplay::fold_in(base, static_cast<uint32_t>(a.slots[r]));
    Key k_iupac = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_iupac));
    Key k_mis = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_mis));
    Key k_ht = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ht));
    Key k_qual = a.fastq
        ? walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_qual))
        : ks;

    if ((int64_t)pre_buf.size() < total + 4) pre_buf.resize(total + 4);
    char* pre = pre_buf.data();
    uint8_t* cls = nullptr;
    if (a.fastq) {
      if ((int64_t)cls_buf.size() < total + 4) cls_buf.resize(total + 4);
      cls = cls_buf.data();
      std::memset(cls, 3, total);  // head/tail default; middle overwritten
      std::memset(cls + head, 0, lnew > 0 ? lnew : 0);  // match default
    }
    if ((int64_t)rpos_buf.size() < (ne ? ne : 1)) rpos_buf.resize(ne ? ne : 1);
    int64_t* rpos = rpos_buf.data();

    auto eff_len = [&](int64_t e) -> int64_t {
      const uint32_t w = ev[e];
      const int64_t len = (w >> 17) & 0x1FFF;
      if ((w >> 30) == 1 && e + 1 < ne) {
        const uint32_t w2 = ev[e + 1];
        if ((w2 >> 30) == 1 && (w2 & 0x1FFFF) == (w & 0x1FFFF)) return 0;
      }
      return len;
    };
    // output coordinate of pre-reverse position jj
    auto out_j = [&](int64_t jj) -> uint32_t {
      return static_cast<uint32_t>(rev ? total - 1 - jj : jj);
    };
    // resolved 2-bit code of ref index i
    auto ref_code = [&](int64_t i) -> int {
      return resolve_code(gseq[i], k_iupac, buf_off + i);
    };
    // match span [i, ref_start): bulk copy (genome bytes are already the
    // output ASCII for A/C/G/T), then patch the rare non-ACGT bytes
    auto copy_match = [&](int64_t i0, int64_t i1, int64_t m0) {
      const int64_t n = i1 - i0;
      if (n <= 0) return;
      std::memcpy(pre + head + m0, gseq + i0, static_cast<size_t>(n));
      for (int64_t x = 0; x < n; ++x) {
        const uint8_t c = gseq[i0 + x];
        if (c != 'A' && c != 'C' && c != 'G' && c != 'T')
          pre[head + m0 + x] = kCode2Base[resolve_code(c, k_iupac, buf_off + i0 + x)];
      }
    };

    // --- middle (pre-reverse) -------------------------------------------
    int64_t i = 0, m = 0;
    for (int64_t e = 0; e < ne; ++e) {
      const uint32_t w = ev[e];
      const int64_t px = w & 0x1FFFF;
      const int32_t t = w >> 30;
      const int64_t len = eff_len(e);
      const int64_t key = (px + 1) / 2;
      const int64_t ref_start = (t == 1) ? key : px / 2;
      rpos[e] = m + (ref_start - i);
      copy_match(i, ref_start, m);
      m += ref_start > i ? ref_start - i : 0;
      i = ref_start > i ? ref_start : i;
      if (len == 0) continue;
      if (t == 0) {  // mis: ref code + 1..3, OUTPUT-indexed uniforms
        if (cls) std::memset(cls + head + m, 1, len);
        for (int64_t x = 0; x < len; ++x, ++i, ++m) {
          const uint32_t b = bits_at(k_mis, out_j(head + m));
          int off = 1 + static_cast<int>(u2_lo(b) * 3.0f);
          if (off > 3) off = 3;
          pre[head + m] = kCode2Base[(ref_code(i) + off) & 3];
        }
      } else if (t == 1) {  // ins: uniform base, OUTPUT-indexed uniforms
        if (cls) std::memset(cls + head + m, 2, len);
        for (int64_t x = 0; x < len; ++x, ++m) {
          const uint32_t b = bits_at(k_mis, out_j(head + m));
          int code = static_cast<int>(u2_hi(b) * 4.0f);
          if (code > 3) code = 3;
          pre[head + m] = kCode2Base[code];
        }
      } else {  // del
        i += len;
      }
    }
    copy_match(i, i + (lnew - m), m);  // trailing matches

    // --- head/tail random bases -----------------------------------------
    fill_ht_bases(k_ht, 0, head, a.ht_cap, pre);
    fill_ht_bases(k_ht, head, total - head - lnew, a.ht_cap, pre + head + lnew);

    // --- FASTA/FASTQ record ----------------------------------------------
    *fp++ = a.fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    if (rev) {
      for (int64_t j = 0; j < total; ++j)
        *fp++ = g_comp[(uint8_t)pre[total - 1 - j]];
    } else {
      fp = put_bytes(fp, pre, total);
    }
    *fp++ = '\n';
    if (a.fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      // qual(j) = vals[c][count(breaks[c] <= u(j)) - 1] + 33, u(j) the
      // SITE_QUAL draw at OUTPUT position j (sentinel 0.0 => count >= 1)
      float u8[8];
      for (int64_t j0 = 0; j0 < total; j0 += 8) {
        walkreplay::uniform8_at(k_qual, static_cast<uint32_t>(j0), u8);
        const int64_t jn = total - j0 < 8 ? total - j0 : 8;
        for (int64_t x = 0; x < jn; ++x) {
          const int64_t j = j0 + x;
          const int c = cls[rev ? total - 1 - j : j];
          const float u = u8[x];
          const float* br = a.q_breaks + c * a.qK;
          int64_t lo = 0, hi = a.qK;
          while (lo < hi) {
            const int64_t mid = (lo + hi) >> 1;
            if (br[mid] <= u) lo = mid + 1; else hi = mid;
          }
          *fp++ = static_cast<char>(a.q_vals[c * a.qK + lo - 1] + 33);
        }
      }
      *fp++ = '\n';
    }

    // --- ground-truth error log (reverse event order) --------------------
    if (!a.write_errors || a.n_events_log[r] == 0) continue;
    const char* mid = pre + head;
    for (int64_t e = ne - 1; e >= 0; --e) {
      const uint32_t w = ev[e];
      const int64_t len = eff_len(e);
      if (len == 0) continue;
      const int64_t px = w & 0x1FFFF;
      const int32_t t = w >> 30;
      const int64_t key = (px + 1) / 2;
      ep = put_bytes(ep, name, name_len);
      *ep++ = '\t';
      ep = put_i64(ep, key);
      *ep++ = '\t';
      ep = put_bytes(ep, kTypeNames[t], 3);
      *ep++ = '\t';
      ep = put_i64(ep, len);
      *ep++ = '\t';
      if (t == 1) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        ep = put_bytes(ep, gseq + key, len);
      }
      *ep++ = '\t';
      if (t == 2) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        ep = put_bytes(ep, mid + rpos[e], len);
      }
      *ep++ = '\n';
    }
  }
  *fw = fp - fp0;
  *ew = ep - ep0;
}

// --- -hp host reconstruction ------------------------------------------------
//
// Genome `-hp -k` pipeline (sim/reconstruct.reconstruct_hp_lane is the numpy
// spec; reference semantics: mutate_read suppression simulator.py:1920-1950 +
// mutate_homo simulator.py:618-705): IUPAC-resolve the extracted segment,
// drop events overlapping >= k homopolymer runs, pass-1 mutation with
// MIDDLE-indexed draws, resize >= k runs of the mutated read via the exact
// u-space table, in-run mismatches, head/tail/strand/quals.  The error log
// uses PASS-1 coordinates and bases (the reference logs before mutate_homo).

inline int base2code(uint8_t c) {
  switch (c) {
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return 0;
  }
}

struct HpReconArgs {
  int64_t seed, stream;
  int64_t site_iupac, site_ins, site_hp, site_hp_qual, site_hp_mis;
  int64_t site_ht, site_qual;
  int64_t ht_cap, k, l_cap;
  float hp_mis_rate;
  const int64_t* slots;
  const char* names_buf;
  const int64_t* name_off;
  const int64_t* middle_ref;
  const int64_t* head;
  const int64_t* tail;
  const uint8_t* rev;
  const uint32_t* ev_flat;
  const int64_t* ev_off;
  const int64_t* n_events;
  const uint8_t* genome_flat;
  const int64_t* g_off;
  const int64_t* start_pos;
  const int64_t* ubf;
  const int64_t* ube;
  char* fastx_out;
  char* err_out;
  int write_errors;
  int fastq;
  // resize table: rows [AT m=0..M | CG m=0..M], width tabN
  const float* hp_breaks;
  const int32_t* hp_vals;
  int64_t tabM, tabN;
  // base-quality table (FASTQ)
  const float* q_breaks;
  const int32_t* q_vals;
  int64_t qK;
};

// returns 0 ok, 1 fastx overflow (caller grows the per-lane pad and retries)
int recon_hp_range(const HpReconArgs& a, int64_t r0, int64_t r1,
                   int64_t* fw, int64_t* ew) {
  using walkreplay::Key;
  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(a.seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(a.seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(a.stream));

  std::vector<uint8_t> res_buf, in_hp, mid1, cls1, midf, clsf, pre, clsp;
  std::vector<int32_t> cum;
  std::vector<int64_t> rpos_buf, surv, eff, run_s, run_m, run_sz, out_s;
  char* fp = a.fastx_out + a.ubf[r0];
  char* ep = a.err_out + a.ube[r0];
  char* const fp0 = fp;
  char* const ep0 = ep;
  char* const fend = a.fastx_out + a.ubf[r1];

  for (int64_t r = r0; r < r1; ++r) {
    const int64_t mref = a.middle_ref[r];
    const int64_t head = a.head[r];
    const int64_t tail = a.tail[r];
    const bool rev = a.rev[r] != 0;
    const char* name = a.names_buf + a.name_off[r];
    const int64_t name_len = a.name_off[r + 1] - a.name_off[r];
    const int64_t ne = a.n_events[r];
    const uint32_t* ev = a.ev_flat + a.ev_off[r];
    const int64_t goff = a.g_off[r];
    const int64_t spos = a.start_pos[r];
    const uint8_t* gseq = a.genome_flat + goff + spos;

    Key ks = walkreplay::fold_in(base, static_cast<uint32_t>(a.slots[r]));
    Key k_iupac = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_iupac));
    Key k_ins = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ins));
    Key k_hp = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_hp));
    Key k_hpq = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_hp_qual));
    Key k_hpm = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_hp_mis));
    Key k_ht = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ht));
    Key k_qual = a.fastq
        ? walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_qual))
        : ks;

    // --- 1. resolved segment + run coverage for suppression --------------
    if ((int64_t)res_buf.size() < mref + 1) res_buf.resize(mref + 1);
    std::memcpy(res_buf.data(), gseq, static_cast<size_t>(mref));
    for (int64_t i = 0; i < mref; ++i) {
      const uint8_t c = res_buf[i];
      if (c != 'A' && c != 'C' && c != 'G' && c != 'T')
        res_buf[i] = kCode2Base[resolve_code(c, k_iupac, i)];
    }
    if ((int64_t)in_hp.size() < mref + 1) in_hp.resize(mref + 1);
    if ((int64_t)cum.size() < mref + 1) cum.resize(mref + 1);
    {
      int64_t i = 0;
      while (i < mref) {
        int64_t j = i + 1;
        while (j < mref && res_buf[j] == res_buf[i]) ++j;
        const uint8_t big = (j - i) >= a.k ? 1 : 0;
        std::memset(in_hp.data() + i, big, static_cast<size_t>(j - i));
        i = j;
      }
      int32_t c = 0;
      for (int64_t p = 0; p < mref; ++p) {
        c += in_hp[p];
        cum[p] = c;
      }
    }

    // --- 2. suppression + dedup ------------------------------------------
    if ((int64_t)surv.size() < (ne ? ne : 1)) {
      surv.resize(ne ? ne : 1);
      eff.resize(ne ? ne : 1);
      rpos_buf.resize(ne ? ne : 1);
    }
    if ((int64_t)rpos_buf.size() < (ne ? ne : 1)) rpos_buf.resize(ne ? ne : 1);
    for (int64_t e = 0; e < ne; ++e) {
      const uint32_t w = ev[e];
      const int64_t px = w & 0x1FFFF;
      const int32_t t = w >> 30;
      const int64_t len = (w >> 17) & 0x1FFF;
      const int64_t p = (px + 1) / 2;
      const int64_t lo = (t == 1) ? p - 1 : px / 2;
      const int64_t hi = (t == 1) ? p + len - 1 : px / 2 + len - 1;
      int64_t lo_c = lo < 0 ? 0 : (lo > mref - 1 ? mref - 1 : lo);
      int64_t hi_c = hi < 0 ? 0 : (hi > mref - 1 ? mref - 1 : hi);
      bool covered = mref > 0 && (cum[hi_c] - cum[lo_c]) > 0;
      covered = covered || (mref > 0 && in_hp[lo_c] && lo >= 0);
      surv[e] = covered ? 0 : len;
    }
    int64_t dels = 0, inss = 0;
    for (int64_t e = 0; e < ne; ++e) {
      eff[e] = surv[e];
      if ((ev[e] >> 30) == 1 && e + 1 < ne && (ev[e + 1] >> 30) == 1 &&
          (ev[e + 1] & 0x1FFFF) == (ev[e] & 0x1FFFF))
        eff[e] = 0;
      if ((ev[e] >> 30) == 1) inss += eff[e];
      else if ((ev[e] >> 30) == 2) dels += eff[e];
    }
    const int64_t l_new1 = mref - dels + inss;

    // --- 3. pass-1 mutation (MIDDLE-indexed draws) -----------------------
    if ((int64_t)mid1.size() < l_new1 + 1) mid1.resize(l_new1 + 1);
    if ((int64_t)cls1.size() < l_new1 + 1) cls1.resize(l_new1 + 1);
    {
      int64_t i = 0, m = 0;
      for (int64_t e = 0; e < ne; ++e) {
        const uint32_t w = ev[e];
        const int64_t px = w & 0x1FFFF;
        const int32_t t = w >> 30;
        const int64_t len = eff[e];
        const int64_t key = (px + 1) / 2;
        const int64_t ref_start = (t == 1) ? key : px / 2;
        rpos_buf[e] = m + (ref_start - i);
        if (ref_start > i) {
          std::memcpy(mid1.data() + m, res_buf.data() + i,
                      static_cast<size_t>(ref_start - i));
          std::memset(cls1.data() + m, 0, static_cast<size_t>(ref_start - i));
          m += ref_start - i;
          i = ref_start;
        }
        if (len == 0) continue;
        if (t == 0) {  // mis: iupac-hi @ middle idx
          for (int64_t x = 0; x < len; ++x, ++i, ++m) {
            int off = 1 + static_cast<int>(u2_hi(bits_at(k_iupac, (uint32_t)m)) * 3.0f);
            if (off > 3) off = 3;
            mid1[m] = kCode2Base[(base2code(res_buf[i]) + off) & 3];
            cls1[m] = 1;
          }
        } else if (t == 1) {  // ins: SITE_INS_BASE lo @ middle idx
          for (int64_t x = 0; x < len; ++x, ++m) {
            int code = static_cast<int>(u2_lo(bits_at(k_ins, (uint32_t)m)) * 4.0f);
            if (code > 3) code = 3;
            mid1[m] = kCode2Base[code];
            cls1[m] = 2;
          }
        } else {
          i += len;
        }
      }
      if (l_new1 > m) {
        std::memcpy(mid1.data() + m, res_buf.data() + i,
                    static_cast<size_t>(l_new1 - m));
        std::memset(cls1.data() + m, 0, static_cast<size_t>(l_new1 - m));
      }
    }

    // --- 4. runs of the pass-1 read + exact-table sizes ------------------
    run_s.clear();
    run_m.clear();
    run_sz.clear();
    {
      int64_t i = 0;
      while (i < l_new1) {
        int64_t j = i + 1;
        while (j < l_new1 && mid1[j] == mid1[i]) ++j;
        if (j - i >= a.k) {
          run_s.push_back(i);
          run_m.push_back(j - i);
        }
        i = j;
      }
      for (size_t ri = 0; ri < run_s.size(); ++ri) {
        const uint8_t c = mid1[run_s[ri]];
        const bool is_at = c == 'A' || c == 'T';
        int64_t m = run_m[ri] < a.tabM ? run_m[ri] : a.tabM;
        const int64_t row = (is_at ? 0 : a.tabM + 1) + m;
        const float u = walkreplay::uniform_at(k_hp, (uint32_t)ri);
        const float* br = a.hp_breaks + row * a.tabN;
        int64_t lo = 0, hi = a.tabN;
        while (lo < hi) {
          const int64_t mid = (lo + hi) >> 1;
          if (br[mid] <= u) lo = mid + 1; else hi = mid;
        }
        int64_t n = a.hp_vals[row * a.tabN + lo - 1];
        if (n > a.l_cap / 2) n = a.l_cap / 2;
        run_sz.push_back(n);
      }
    }

    // --- 5. final middle layout + in-run mismatches ----------------------
    int64_t l_new2 = l_new1;
    for (size_t ri = 0; ri < run_s.size(); ++ri) l_new2 += run_sz[ri] - run_m[ri];
    if ((int64_t)midf.size() < l_new2 + 1) midf.resize(l_new2 + 1);
    if ((int64_t)clsf.size() < l_new2 + 1) clsf.resize(l_new2 + 1);
    out_s.clear();
    {
      size_t ri = 0;
      int64_t p = 0, q = 0;
      while (p < l_new1) {
        if (ri < run_s.size() && p == run_s[ri]) {
          const int64_t m = run_m[ri];
          const int64_t n = run_sz[ri];
          const int64_t kept = n < m ? n : m;
          std::memcpy(midf.data() + q, mid1.data() + p, (size_t)kept);
          std::memcpy(clsf.data() + q, cls1.data() + p, (size_t)kept);
          if (n > m) {
            std::memset(midf.data() + q + m, mid1[p], (size_t)(n - m));
            std::memset(clsf.data() + q + m, 2, (size_t)(n - m));
          }
          out_s.push_back(q);
          q += n;
          p += m;
          ++ri;
        } else {
          midf[q] = mid1[p];
          clsf[q] = cls1[p];
          ++q;
          ++p;
        }
      }
    }
    for (size_t ri = 0; ri < run_s.size(); ++ri) {
      const int64_t sfin = out_s[ri];
      const int64_t n = run_sz[ri];
      for (int64_t j = 0; j < n; ++j) {
        const float u = walkreplay::uniform_at(k_hpq, (uint32_t)(sfin + j));
        if (u > 0.0f && u <= a.hp_mis_rate) {
          const float u2 = walkreplay::uniform_at(k_hpm, (uint32_t)(sfin + j));
          int off = 1 + static_cast<int>(u2 * 3.0f);
          if (off > 3) off = 3;
          midf[sfin + j] = kCode2Base[(base2code(midf[sfin + j]) + off) & 3];
          clsf[sfin + j] = 1;
        }
      }
    }

    // --- 6. assembly + record --------------------------------------------
    const int64_t total = head + l_new2 + tail;
    if ((int64_t)pre.size() < total + 4) pre.resize(total + 4);
    std::memcpy(pre.data() + head, midf.data(), (size_t)l_new2);
    fill_ht_bases(k_ht, 0, head, a.ht_cap, (char*)pre.data());
    fill_ht_bases(k_ht, head, tail, a.ht_cap, (char*)pre.data() + head + l_new2);

    const int64_t rec_bytes =
        1 + name_len + 1 + total + 1 + (a.fastq ? 2 + total + 1 : 0);
    if (fp + rec_bytes > fend) {  // per-lane pad too small: caller retries
      *fw = 0;
      *ew = 0;
      return 1;
    }
    *fp++ = a.fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    if (rev) {
      for (int64_t j = 0; j < total; ++j)
        *fp++ = g_comp[pre[total - 1 - j]];
    } else {
      fp = put_bytes(fp, (const char*)pre.data(), total);
    }
    *fp++ = '\n';
    if (a.fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      if ((int64_t)clsp.size() < total + 4) clsp.resize(total + 4);
      std::memset(clsp.data(), 3, (size_t)total);
      std::memcpy(clsp.data() + head, clsf.data(), (size_t)l_new2);
      float u8[8];
      for (int64_t j0 = 0; j0 < total; j0 += 8) {
        walkreplay::uniform8_at(k_qual, static_cast<uint32_t>(j0), u8);
        const int64_t jn = total - j0 < 8 ? total - j0 : 8;
        for (int64_t x = 0; x < jn; ++x) {
          const int64_t j = j0 + x;
          const int c = clsp[rev ? total - 1 - j : j];
          const float u = u8[x];
          const float* br = a.q_breaks + c * a.qK;
          int64_t lo = 0, hi = a.qK;
          while (lo < hi) {
            const int64_t mid = (lo + hi) >> 1;
            if (br[mid] <= u) lo = mid + 1; else hi = mid;
          }
          *fp++ = static_cast<char>(a.q_vals[c * a.qK + lo - 1] + 33);
        }
      }
      *fp++ = '\n';
    }

    // --- 7. ground-truth error log (pass-1 coordinates, reverse order) ---
    if (!a.write_errors) continue;
    for (int64_t e = ne - 1; e >= 0; --e) {
      const int64_t len = eff[e];
      if (len == 0) continue;
      const uint32_t w = ev[e];
      const int64_t px = w & 0x1FFFF;
      const int32_t t = w >> 30;
      const int64_t key = (px + 1) / 2;
      ep = put_bytes(ep, name, name_len);
      *ep++ = '\t';
      ep = put_i64(ep, key);
      *ep++ = '\t';
      ep = put_bytes(ep, kTypeNames[t], 3);
      *ep++ = '\t';
      ep = put_i64(ep, len);
      *ep++ = '\t';
      if (t == 1) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        ep = put_bytes(ep, gseq + key, len);
      }
      *ep++ = '\t';
      if (t == 2) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        ep = put_bytes(ep, (const char*)mid1.data() + rpos_buf[e], len);
      }
      *ep++ = '\n';
    }
  }
  *fw = fp - fp0;
  *ew = ep - ep0;
  return 0;
}

struct FlatArgs {
  const uint8_t* reads_packed;
  const int64_t* read_off;  // [k] byte offsets into reads_packed
  const uint8_t* quals_flat;
  const int64_t* qual_off;  // [k] byte offsets (fastq only)
  const char* names_buf;
  const int64_t* name_off;
  const int64_t* total_len;
  const int64_t* head;
  const int64_t* l_new;
  const uint8_t* rev;
  const uint32_t* ev_flat;  // packed events: pos2x | len<<17 | type<<30
  const int64_t* ev_off;    // [k] word offsets
  const int64_t* n_events;
  const uint8_t* genome_flat;
  const int64_t* g_off;
  const int64_t* g_len;
  const uint8_t* g_circ;
  const int64_t* start_pos;
  const int64_t* ubf;  // [k+1] fastx upper-bound prefix (write offsets)
  const int64_t* ube;  // [k+1] err upper-bound prefix
  char* fastx_out;
  char* err_out;
  int fastq;
  int write_errors;
};

// Format reads [r0, r1) at exact offsets ubf[r0] / ube[r0]; returns bytes
// written into each stream via *fw / *ew.
void emit_flat_range(const FlatArgs& a, int64_t r0, int64_t r1,
                     std::vector<char>& mid_scratch, int64_t* fw, int64_t* ew) {
  char* fp = a.fastx_out + a.ubf[r0];
  char* ep = a.err_out + a.ube[r0];
  char* const fp0 = fp;
  char* const ep0 = ep;

  for (int64_t r = r0; r < r1; ++r) {
    const uint8_t* packed = a.reads_packed + a.read_off[r];
    const int64_t total = a.total_len[r];
    const char* name = a.names_buf + a.name_off[r];
    const int64_t name_len = a.name_off[r + 1] - a.name_off[r];

    *fp++ = a.fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    decode_span(packed, 0, total, fp);  // <=3 bytes slack covered by bounds
    fp += total;
    *fp++ = '\n';
    if (a.fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      fp = put_bytes(fp, a.quals_flat + a.qual_off[r], total);
      *fp++ = '\n';
    }

    if (!a.write_errors) continue;
    const int64_t ne = a.n_events[r];
    if (ne == 0) continue;

    // middle segment (pre-reverse orientation), decoded once per read
    const int64_t lnew = a.l_new[r];
    if ((int64_t)mid_scratch.size() < total + 4) mid_scratch.resize(total + 4);
    char* mid = mid_scratch.data();
    if (a.rev[r]) {
      decode_rc(packed, total, mid);
      mid += a.head[r];
    } else {
      decode_span(packed, a.head[r], lnew, mid);
    }

    const uint32_t* ev = a.ev_flat + a.ev_off[r];
    const int64_t goff = a.g_off[r];
    const int64_t glen = a.g_len[r];
    const bool circ = a.g_circ[r] != 0;
    const int64_t spos = a.start_pos[r];

    constexpr int64_t kStackEv = 2048;
    int64_t rpos_stack[kStackEv];
    int64_t* rpos = rpos_stack;
    int64_t* rpos_heap = nullptr;
    if (ne > kStackEv) {
      rpos_heap = new int64_t[ne];
      rpos = rpos_heap;
    }
    // effective length: of consecutive same-key insertions only the LAST
    // survives (reference dict-overwrite, simulator.py:1880-1882)
    auto eff_len = [&](int64_t e) -> int64_t {
      const uint32_t w = ev[e];
      const int64_t len = (w >> 17) & 0x1FFF;
      const int32_t t = w >> 30;
      if (t == 1 && e + 1 < ne) {
        const uint32_t w2 = ev[e + 1];
        if ((w2 >> 30) == 1 && (w2 & 0x1FFFF) == (w & 0x1FFFF)) return 0;
      }
      return len;
    };
    {
      int64_t cum_del = 0, cum_ins = 0;
      for (int64_t e = 0; e < ne; ++e) {
        const uint32_t w = ev[e];
        const int64_t px = w & 0x1FFFF;
        const int64_t len = eff_len(e);
        const int32_t t = w >> 30;
        const int64_t key = (px + 1) / 2;
        rpos[e] = ((t == 1) ? key : px / 2) - cum_del + cum_ins;
        if (t == 1) cum_ins += len;
        if (t == 2) cum_del += len;
      }
    }

    for (int64_t e = ne - 1; e >= 0; --e) {
      const uint32_t w = ev[e];
      const int64_t len = eff_len(e);
      if (len == 0) continue;
      const int64_t px = w & 0x1FFFF;
      const int32_t t = w >> 30;
      const int64_t key = (px + 1) / 2;
      ep = put_bytes(ep, name, name_len);
      *ep++ = '\t';
      ep = put_i64(ep, key);
      *ep++ = '\t';
      ep = put_bytes(ep, kTypeNames[t], 3);
      *ep++ = '\t';
      ep = put_i64(ep, len);
      *ep++ = '\t';
      if (t == 1) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        const int64_t s = spos + key;
        if (circ) {
          for (int64_t j = 0; j < len; ++j)
            *ep++ = static_cast<char>(a.genome_flat[goff + (s + j) % glen]);
        } else {
          ep = put_bytes(ep, a.genome_flat + goff + s, len);
        }
      }
      *ep++ = '\t';
      if (t == 2) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        ep = put_bytes(ep, mid + rpos[e], len);
      }
      *ep++ = '\n';
    }
    if (rpos_heap) delete[] rpos_heap;
  }
  *fw = fp - fp0;
  *ew = ep - ep0;
}

}  // namespace

extern "C" {

// Replay the aligned-read error walks for a batch of lanes and verify each
// against its device-computed checksum.  Writes packed event words
// (pos2x | len << 17 | type << 30) at ev_off[lane] (word offsets) for lanes
// with ok[lane] == 1.  Layout matches a with-events compact transfer, so the
// flat emitter consumes the result unchanged.
int64_t replay_walk_batch(
    int64_t seed, int64_t stream, int64_t site_walk,
    int64_t B, const int64_t* slots, const int64_t* part_ids,
    const uint8_t* lane_do,
    const int64_t* m_ref, const int64_t* n_events_meta,
    const uint32_t* checksums,
    // first_match ECDF (exact breakpoints; single bin)
    const int32_t* fm_bin_lo, const float* fm_breaks, const int32_t* fm_vals,
    const int32_t* fm_n_bk, int64_t fm_bins, int64_t fm_K,
    // match markov ECDF (exact breakpoints)
    const int32_t* mm_bin_lo, const float* mm_breaks, const int32_t* mm_vals,
    const int32_t* mm_n_bk, int64_t mm_bins, int64_t mm_K,
    // mixtures + transitions
    const float* mix_cdf, int64_t mix_n, const float* trans_cum,
    uint32_t* ev_out, const int64_t* ev_off, int64_t e_guard,
    uint8_t* ok_out, int32_t n_threads) {
  using walkreplay::Ecdf;
  using walkreplay::Key;
  Ecdf fm{fm_bin_lo, fm_breaks, fm_vals, fm_n_bk, fm_bins, fm_K};
  Ecdf mm{mm_bin_lo, mm_breaks, mm_vals, mm_n_bk, mm_bins, mm_K};

  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(stream));

  auto run_range = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      if (!lane_do[b]) {
        ok_out[b] = 0;
        continue;
      }
      const int64_t n_exp = n_events_meta[b];
      uint32_t* ev = ev_out + ev_off[b];
      Key sk = walkreplay::fold_in(base, static_cast<uint32_t>(slots[b]));
      if (part_ids) sk = walkreplay::fold_in(sk, static_cast<uint32_t>(part_ids[b]));
      Key wk = walkreplay::fold_in(sk, static_cast<uint32_t>(site_walk));
      Key k0 = walkreplay::fold_in(wk, 0u);
      float u0 = walkreplay::uniform_at(k0, 0u);
      int64_t fmatch = fm.invert(0, u0);
      int64_t prev = fmatch < 2 ? 2 : fmatch;
      int64_t pos = prev, mid = m_ref[b];
      int state = 0;
      uint32_t sum = 0;
      int64_t e = 0;
      uint32_t t = 1;
      bool fail = false;
      // 8-step lookahead: fold_in(wk, t..t+7) + the three uniforms = 4 AVX2
      // passes per 8 steps instead of 32 scalar threefry blocks
      float ue8[8], ul8[8], um8[8];
      int ti = 8;
      while (pos < mid) {
        if (e >= n_exp || e >= e_guard) {
          fail = true;
          break;
        }
        if (ti == 8) {
          uint32_t tk0[8], tk1[8];
          walkreplay::fold8_in(wk, t, tk0, tk1);
          walkreplay::uniform8_keys(tk0, tk1, 0u, ue8);
          walkreplay::uniform8_keys(tk0, tk1, 1u, ul8);
          walkreplay::uniform8_keys(tk0, tk1, 2u, um8);
          ti = 0;
        }
        float ue = ue8[ti];
        float ul = ul8[ti];
        float um = um8[ti];
        const float* cum = trans_cum + state * 3;
        int etype = (cum[0] <= ue) + (cum[1] <= ue) + (cum[2] <= ue);
        if (etype > 2) etype = 2;
        const float* cdf = mix_cdf + etype * mix_n;
        int64_t lo = 0, hi = mix_n;
        while (lo < hi) {
          int64_t m = (lo + hi) / 2;
          if (cdf[m] < ul) lo = m + 1; else hi = m;
        }
        int64_t elen = lo + 1;
        const bool is_ins = etype == 1;
        const int64_t e_pos2x = is_ins ? 2 * pos - 1 : 2 * pos;
        const int64_t pos_after = pos + (is_ins ? 0 : elen);
        if (!is_ins && pos_after > mid) mid = pos_after;
        int64_t mstep = mm.invert(mm.select_bin(static_cast<int32_t>(prev)), um);
        if (prev == 0 && mstep == 0) mstep = 1;
        if (pos_after + mstep > mid) mid = pos_after + mstep;
        const uint32_t word = static_cast<uint32_t>(e_pos2x)
            | (static_cast<uint32_t>(elen) << 17)
            | (static_cast<uint32_t>(etype) << 30);
        ev[e] = word;
        sum += (word + 1u) * (2u * static_cast<uint32_t>(e) + 1u);
        state = etype + 1 + (mstep == 0 ? 3 : 0);
        prev = mstep;
        pos = pos_after + mstep;
        ++t;
        ++ti;
        ++e;
      }
      ok_out[b] = (!fail && e == n_exp && sum == checksums[b]) ? 1 : 0;
    }
  };

  int T = n_threads < 1 ? 1 : n_threads;
  if (T <= 1 || B < 64) {
    run_range(0, B);
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < T; ++i)
      threads.emplace_back(run_range, B * i / T, B * (i + 1) / T);
    for (auto& th : threads) th.join();
  }
  return 0;
}

// Flat-batch emitter: reads arrive 2-bit packed in one flat buffer (per-read
// byte offsets), events packed u32 (pos2x | len<<17 | type<<30) in a flat
// buffer (per-read word offsets).  Output offsets are EXACT upper-bound
// prefixes (ubf/ube, computed caller-side), so ranges of reads format
// independently -> multithreaded; the per-range outputs are compacted with
// memmove afterwards.  Returns 0; writes final sizes to *fastx_written /
// *err_written.  Caller guarantees fastx/err buffers >= ubf[k] / ube[k].
int64_t emit_batch_flat(
    const uint8_t* reads_packed, const int64_t* read_off,
    const uint8_t* quals_flat, const int64_t* qual_off,
    int64_t k, const char* names_buf, const int64_t* name_off,
    const int64_t* total_len, const int64_t* head, const int64_t* l_new,
    const uint8_t* rev,
    const uint32_t* ev_flat, const int64_t* ev_off, const int64_t* n_events,
    const uint8_t* genome_flat, const int64_t* g_off, const int64_t* g_len,
    const uint8_t* g_circ, const int64_t* start_pos,
    const int64_t* ubf, const int64_t* ube,
    char* fastx_out, int64_t* fastx_written,
    char* err_out, int64_t* err_written,
    int32_t fastq, int32_t write_errors, int32_t n_threads) {
  init_comp();
  init_dec();
  FlatArgs a{reads_packed, read_off, quals_flat, qual_off, names_buf,
             name_off,     total_len, head,       l_new,    rev,
             ev_flat,      ev_off,    n_events,   genome_flat,
             g_off,        g_len,     g_circ,     start_pos,
             ubf,          ube,       fastx_out,  err_out,
             static_cast<int>(fastq), static_cast<int>(write_errors)};

  int T = n_threads < 1 ? 1 : static_cast<int>(n_threads);
  if (T > k) T = static_cast<int>(k < 1 ? 1 : k);
  std::vector<int64_t> r0s(T + 1);
  for (int t = 0; t <= T; ++t) r0s[t] = k * t / T;
  std::vector<int64_t> fws(T, 0), ews(T, 0);

  if (T == 1) {
    std::vector<char> mid;
    emit_flat_range(a, 0, k, mid, &fws[0], &ews[0]);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(T);
    for (int t = 0; t < T; ++t) {
      threads.emplace_back([&, t]() {
        std::vector<char> mid;
        emit_flat_range(a, r0s[t], r0s[t + 1], mid, &fws[t], &ews[t]);
      });
    }
    for (auto& th : threads) th.join();
  }

  // compact the per-range outputs (ranges start at upper-bound offsets)
  int64_t fpos = fws[0], epos = ews[0];
  for (int t = 1; t < T; ++t) {
    std::memmove(fastx_out + fpos, fastx_out + a.ubf[r0s[t]], fws[t]);
    fpos += fws[t];
    std::memmove(err_out + epos, err_out + a.ube[r0s[t]], ews[t]);
    epos += ews[t];
  }
  *fastx_written = fpos;
  *err_written = epos;
  return 0;
}

// Reconstruction emitter: like emit_batch_flat, but read bytes never arrive
// from the device — they are regenerated from (genome, replayed events,
// counter RNG).  Aligned-genome linear fast path only (FASTA; FASTQ keeps
// the device path).  Output offsets are exact upper bounds (ubf/ube) so
// ranges run in parallel and are compacted afterwards.
int64_t emit_batch_recon(
    int64_t seed, int64_t stream, int64_t site_iupac, int64_t site_mis,
    int64_t site_ht, int64_t ht_cap, int64_t chunk,
    int64_t k, const int64_t* slots,
    const char* names_buf, const int64_t* name_off,
    const int64_t* total_len, const int64_t* head, const int64_t* l_new,
    const uint8_t* rev,
    const uint32_t* ev_flat, const int64_t* ev_off, const int64_t* n_events,
    const int64_t* n_events_log,
    const uint8_t* genome_flat, const int64_t* g_off, const int64_t* g_len,
    const int64_t* start_pos,
    const int64_t* ubf, const int64_t* ube,
    char* fastx_out, int64_t* fastx_written,
    char* err_out, int64_t* err_written,
    int32_t write_errors, int32_t n_threads,
    int32_t fastq, int64_t site_qual,
    const float* q_breaks, const int32_t* q_vals, int64_t qK) {
  init_comp();
  init_dec();
  ReconArgs a{seed,     stream,   site_iupac, site_mis, site_ht, ht_cap,
              chunk,    slots,    names_buf,  name_off, total_len, head,
              l_new,    rev,      ev_flat,    ev_off,   n_events,
              n_events_log, genome_flat, g_off, g_len, start_pos,
              ubf,      ube,      fastx_out,  err_out,
              static_cast<int>(write_errors),
              static_cast<int>(fastq), site_qual, q_breaks, q_vals, qK};

  int T = n_threads < 1 ? 1 : static_cast<int>(n_threads);
  if (T > k) T = static_cast<int>(k < 1 ? 1 : k);
  std::vector<int64_t> r0s(T + 1);
  for (int t = 0; t <= T; ++t) r0s[t] = k * t / T;
  std::vector<int64_t> fws(T, 0), ews(T, 0);

  if (T == 1) {
    recon_range(a, 0, k, &fws[0], &ews[0]);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(T);
    for (int t = 0; t < T; ++t)
      threads.emplace_back([&, t]() { recon_range(a, r0s[t], r0s[t + 1], &fws[t], &ews[t]); });
    for (auto& th : threads) th.join();
  }

  int64_t fpos = fws[0], epos = ews[0];
  for (int t = 1; t < T; ++t) {
    std::memmove(fastx_out + fpos, fastx_out + a.ubf[r0s[t]], fws[t]);
    fpos += fws[t];
    std::memmove(err_out + epos, err_out + a.ube[r0s[t]], ews[t]);
    epos += ews[t];
  }
  *fastx_written = fpos;
  *err_written = epos;
  return 0;
}

// -hp reconstruction emitter (recon_hp_range).  ubf entries are per-lane
// upper bounds including a growth pad for the resized middles; returns 1 if
// any range ran out of pad (caller grows and retries), else 0.
int64_t emit_batch_recon_hp(
    int64_t seed, int64_t stream,
    int64_t site_iupac, int64_t site_ins, int64_t site_hp,
    int64_t site_hp_qual, int64_t site_hp_mis,
    int64_t site_ht, int64_t site_qual,
    int64_t ht_cap, int64_t hp_k, int64_t l_cap, double hp_mis_rate,
    int64_t k, const int64_t* slots,
    const char* names_buf, const int64_t* name_off,
    const int64_t* middle_ref, const int64_t* head, const int64_t* tail,
    const uint8_t* rev,
    const uint32_t* ev_flat, const int64_t* ev_off, const int64_t* n_events,
    const uint8_t* genome_flat, const int64_t* g_off,
    const int64_t* start_pos,
    const int64_t* ubf, const int64_t* ube,
    char* fastx_out, int64_t* fastx_written,
    char* err_out, int64_t* err_written,
    int32_t fastq, int32_t write_errors,
    const float* hp_breaks, const int32_t* hp_vals, int64_t tabM, int64_t tabN,
    const float* q_breaks, const int32_t* q_vals, int64_t qK,
    int32_t n_threads) {
  init_comp();
  init_dec();
  HpReconArgs a{seed, stream, site_iupac, site_ins, site_hp, site_hp_qual,
                site_hp_mis, site_ht, site_qual, ht_cap, hp_k, l_cap,
                static_cast<float>(hp_mis_rate),
                slots, names_buf, name_off, middle_ref, head, tail, rev,
                ev_flat, ev_off, n_events, genome_flat, g_off, start_pos,
                ubf, ube, fastx_out, err_out,
                static_cast<int>(write_errors), static_cast<int>(fastq),
                hp_breaks, hp_vals, tabM, tabN, q_breaks, q_vals, qK};

  int T = n_threads < 1 ? 1 : static_cast<int>(n_threads);
  if (T > k) T = static_cast<int>(k < 1 ? 1 : k);
  std::vector<int64_t> r0s(T + 1);
  for (int t = 0; t <= T; ++t) r0s[t] = k * t / T;
  std::vector<int64_t> fws(T, 0), ews(T, 0);
  std::vector<int> rcs(T, 0);

  if (T == 1) {
    rcs[0] = recon_hp_range(a, 0, k, &fws[0], &ews[0]);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(T);
    for (int t = 0; t < T; ++t)
      threads.emplace_back([&, t]() {
        rcs[t] = recon_hp_range(a, r0s[t], r0s[t + 1], &fws[t], &ews[t]);
      });
    for (auto& th : threads) th.join();
  }
  for (int t = 0; t < T; ++t)
    if (rcs[t] != 0) return rcs[t];

  int64_t fpos = fws[0], epos = ews[0];
  for (int t = 1; t < T; ++t) {
    std::memmove(fastx_out + fpos, fastx_out + a.ubf[r0s[t]], fws[t]);
    fpos += fws[t];
    std::memmove(err_out + epos, err_out + a.ube[r0s[t]], ews[t]);
    epos += ews[t];
  }
  *fastx_written = fpos;
  *err_written = epos;
  return 0;
}

// Returns 0 on success, 1 if fastx_out overflowed, 2 if err_out overflowed.
// All per-read arrays (names, totals, ...) are indexed 0..k-1 in emission
// order; reads/quals/events rows are selected through lane_idx.
int64_t emit_batch(
    const uint8_t* reads, int64_t read_stride, const uint8_t* quals,
    int64_t k, const int64_t* lane_idx, const char* names_buf,
    const int64_t* name_off, const int64_t* total_len, const int64_t* head,
    const int64_t* l_new, const uint8_t* rev,
    const int32_t* ev_pos2x, const int32_t* ev_type, const int32_t* ev_len,
    int64_t e_stride, const int64_t* n_events,
    const uint8_t* genome_flat, const int64_t* g_off, const int64_t* g_len,
    const uint8_t* g_circ, const int64_t* start_pos,
    char* fastx_out, int64_t fastx_cap, int64_t* fastx_written,
    char* err_out, int64_t err_cap, int64_t* err_written,
    int32_t fastq, int32_t write_errors,
    // scratch for un-reversing the middle (caller supplies >= max total_len)
    char* mid_scratch, int64_t mid_scratch_cap) {
  init_comp();
  (void)kCompLut;
  char* fp = fastx_out;
  char* ep = err_out;
  char* const f_end = fastx_out + fastx_cap;
  char* const e_end = err_out + err_cap;

  for (int64_t r = 0; r < k; ++r) {
    const int64_t lane = lane_idx[r];
    const uint8_t* row = reads + lane * read_stride;
    const int64_t total = total_len[r];
    const char* name = names_buf + name_off[r];
    const int64_t name_len = name_off[r + 1] - name_off[r];

    // ---- FASTA/FASTQ record ----
    const int64_t rec_max = 2 * name_len + (fastq ? 2 * total : total) + 8;
    if (f_end - fp < rec_max) return 1;
    *fp++ = fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    fp = put_bytes(fp, row, total);
    *fp++ = '\n';
    if (fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      fp = put_bytes(fp, quals + lane * read_stride, total);
      *fp++ = '\n';
    }

    // ---- error-log lines ----
    if (!write_errors) continue;
    const int64_t ne = n_events[r];
    if (ne == 0) continue;
    if (total > mid_scratch_cap) return 2;

    // middle segment in pre-reverse orientation
    const char* mid;
    if (rev[r]) {
      for (int64_t j = 0; j < total; ++j)
        mid_scratch[j] = g_comp[row[total - 1 - j]];
      mid = mid_scratch + head[r];
    } else {
      mid = reinterpret_cast<const char*>(row) + head[r];
    }

    const int32_t* epx = ev_pos2x + lane * e_stride;
    const int32_t* ety = ev_type + lane * e_stride;
    const int32_t* eln = ev_len + lane * e_stride;
    const int64_t goff = g_off[r];
    const int64_t glen = g_len[r];
    const bool circ = g_circ[r] != 0;
    const int64_t spos = start_pos[r];

    // read-coordinate start per event (prefix sums, ascending order), then
    // emit in reverse order as mutate_read does (simulator.py:1957-2008)
    // First pass forward to compute read positions into a small stack buffer.
    // ne can reach a few thousand; allocate on the heap only when large.
    constexpr int64_t kStackEv = 1024;
    int64_t rpos_stack[kStackEv];
    int64_t* rpos = rpos_stack;
    int64_t* rpos_heap = nullptr;
    if (ne > kStackEv) {
      rpos_heap = new int64_t[ne];
      rpos = rpos_heap;
    }
    auto eff_len = [&](int64_t e) -> int64_t {
      // dict-overwrite semantics: consecutive same-key insertions keep only
      // the last (simulator.py:1880-1882)
      if (ety[e] == 1 && e + 1 < ne && ety[e + 1] == 1 && epx[e + 1] == epx[e])
        return 0;
      return eln[e];
    };
    {
      int64_t cum_del = 0, cum_ins = 0;
      for (int64_t e = 0; e < ne; ++e) {
        const int32_t t = ety[e];
        const int64_t key = (epx[e] + 1) / 2;
        const int64_t ref_start = (t == 1) ? key : epx[e] / 2;
        rpos[e] = ref_start - cum_del + cum_ins;
        if (t == 1) cum_ins += eff_len(e);
        if (t == 2) cum_del += eln[e];
      }
    }

    for (int64_t e = ne - 1; e >= 0; --e) {
      const int32_t t = ety[e];
      const int64_t len = eff_len(e);
      if (len == 0) continue;  // match placeholder / overwritten dup ins
      const int64_t key = (epx[e] + 1) / 2;
      const int64_t line_max = name_len + 64 + 2 * len;
      if (e_end - ep < line_max) {
        if (rpos_heap) delete[] rpos_heap;
        return 2;
      }
      ep = put_bytes(ep, name, name_len);
      *ep++ = '\t';
      ep = put_i64(ep, key);
      *ep++ = '\t';
      ep = put_bytes(ep, kTypeNames[t], kTypeLens[t]);
      *ep++ = '\t';
      ep = put_i64(ep, len);
      *ep++ = '\t';
      // ref_base
      if (t == 1) {
        for (int64_t j = 0; j < len; ++j) *ep++ = '-';
      } else {
        const int64_t s = spos + key;
        if (circ) {
          for (int64_t j = 0; j < len; ++j)
            *ep++ = static_cast<char>(genome_flat[goff + (s + j) % glen]);
        } else {
          ep = put_bytes(ep, genome_flat + goff + s, len);
        }
      }
      *ep++ = '\t';
      // seq_base
      if (t == 2) {
        for (int64_t j = 0; j < len; ++j) *ep++ = '-';
      } else {
        ep = put_bytes(ep, mid + rpos[e], len);
      }
      *ep++ = '\n';
    }
    if (rpos_heap) delete[] rpos_heap;
  }

  *fastx_written = fp - fastx_out;
  *err_written = ep - err_out;
  return 0;
}

// Chimeric batches: one record spans n_seg segments; events/genome metadata
// are per (read, segment).  Mirrors the reference's chimeric ground-truth
// logging (simulator.py:1355-1443) the way emit_batch mirrors the linear
// path.  Per-(r,s) arrays are [k*S] row-major; ev_row selects the event rows
// (the device lays events out segment-major as seg*B + lane).
// Returns 0 ok, 1 fastx overflow, 2 err overflow.
int64_t emit_chimeric_batch(
    const uint8_t* reads, int64_t read_stride, const uint8_t* quals,
    int64_t k, const int64_t* lane_idx, const char* names_buf,
    const int64_t* name_off, const int64_t* total_len, const uint8_t* rev,
    int64_t S, const int64_t* n_seg,
    const int64_t* seg_off,      // [k*S] pre-reverse read-coord segment starts
    const int64_t* ev_row,      // [k*S] row index into event arrays
    const int64_t* n_events_rs,  // [k*S]
    const int32_t* ev_pos2x, const int32_t* ev_type, const int32_t* ev_len,
    int64_t e_stride,
    const uint8_t* genome_flat, const int64_t* g_off, const int64_t* g_len,
    const uint8_t* g_circ, const int64_t* start_pos,  // [k*S]
    char* fastx_out, int64_t fastx_cap, int64_t* fastx_written,
    char* err_out, int64_t err_cap, int64_t* err_written,
    int32_t fastq, int32_t write_errors,
    char* mid_scratch, int64_t mid_scratch_cap) {
  init_comp();
  char* fp = fastx_out;
  char* ep = err_out;
  char* const f_end = fastx_out + fastx_cap;
  char* const e_end = err_out + err_cap;

  for (int64_t r = 0; r < k; ++r) {
    const int64_t lane = lane_idx[r];
    const uint8_t* row = reads + lane * read_stride;
    const int64_t total = total_len[r];
    const char* name = names_buf + name_off[r];
    const int64_t name_len = name_off[r + 1] - name_off[r];

    const int64_t rec_max = 2 * name_len + (fastq ? 2 * total : total) + 8;
    if (f_end - fp < rec_max) return 1;
    *fp++ = fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    fp = put_bytes(fp, row, total);
    *fp++ = '\n';
    if (fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      fp = put_bytes(fp, quals + lane * read_stride, total);
      *fp++ = '\n';
    }

    if (!write_errors) continue;
    if (total > mid_scratch_cap) return 2;

    // pre-reverse whole-read orientation (segments index into it)
    const char* pre;
    if (rev[r]) {
      for (int64_t j = 0; j < total; ++j)
        mid_scratch[j] = g_comp[row[total - 1 - j]];
      pre = mid_scratch;
    } else {
      pre = reinterpret_cast<const char*>(row);
    }

    const int64_t ns = n_seg[r];
    for (int64_t s = 0; s < ns; ++s) {
      const int64_t rs = r * S + s;
      const int64_t ne = n_events_rs[rs];
      if (ne == 0) continue;
      const char* mid = pre + seg_off[rs];
      const int32_t* epx = ev_pos2x + ev_row[rs] * e_stride;
      const int32_t* ety = ev_type + ev_row[rs] * e_stride;
      const int32_t* eln = ev_len + ev_row[rs] * e_stride;
      const int64_t goff = g_off[rs];
      const int64_t glen = g_len[rs];
      const bool circ = g_circ[rs] != 0;
      const int64_t spos = start_pos[rs];

      constexpr int64_t kStackEv = 1024;
      int64_t rpos_stack[kStackEv];
      int64_t* rpos = rpos_stack;
      int64_t* rpos_heap = nullptr;
      if (ne > kStackEv) {
        rpos_heap = new int64_t[ne];
        rpos = rpos_heap;
      }
      auto eff_len = [&](int64_t e) -> int64_t {
        if (ety[e] == 1 && e + 1 < ne && ety[e + 1] == 1 && epx[e + 1] == epx[e])
          return 0;  // overwritten duplicate insertion
        return eln[e];
      };
      {
        int64_t cum_del = 0, cum_ins = 0;
        for (int64_t e = 0; e < ne; ++e) {
          const int32_t t = ety[e];
          const int64_t key = (epx[e] + 1) / 2;
          const int64_t ref_start = (t == 1) ? key : epx[e] / 2;
          rpos[e] = ref_start - cum_del + cum_ins;
          if (t == 1) cum_ins += eff_len(e);
          if (t == 2) cum_del += eln[e];
        }
      }

      for (int64_t e = ne - 1; e >= 0; --e) {
        const int32_t t = ety[e];
        const int64_t len = eff_len(e);
        if (len == 0) continue;
        const int64_t key = (epx[e] + 1) / 2;
        const int64_t line_max = name_len + 64 + 2 * len;
        if (e_end - ep < line_max) {
          if (rpos_heap) delete[] rpos_heap;
          return 2;
        }
        ep = put_bytes(ep, name, name_len);
        *ep++ = '\t';
        ep = put_i64(ep, key);
        *ep++ = '\t';
        ep = put_bytes(ep, kTypeNames[t], kTypeLens[t]);
        *ep++ = '\t';
        ep = put_i64(ep, len);
        *ep++ = '\t';
        if (t == 1) {
          for (int64_t j = 0; j < len; ++j) *ep++ = '-';
        } else {
          const int64_t p0 = spos + key;
          if (circ) {
            for (int64_t j = 0; j < len; ++j)
              *ep++ = static_cast<char>(genome_flat[goff + (p0 + j) % glen]);
          } else {
            ep = put_bytes(ep, genome_flat + goff + p0, len);
          }
        }
        *ep++ = '\t';
        if (t == 2) {
          for (int64_t j = 0; j < len; ++j) *ep++ = '-';
        } else {
          ep = put_bytes(ep, mid + rpos[e], len);
        }
        *ep++ = '\n';
      }
      if (rpos_heap) delete[] rpos_heap;
    }
  }

  *fastx_written = fp - fastx_out;
  *err_written = ep - err_out;
  return 0;
}

// --- unaligned pass: walk replay + host reconstruction ----------------------
//
// The unaligned walk (ops/error_walk.unaligned_walk) draws per STEP: a type
// uniform (match/mis/ins/del at 0.4/0.3/0.15/0.15 cutoffs) and a length
// uniform (mixture inverse-CDF for error steps).  Step words store matches
// as length-0 events.  Reconstruction applies the reference's
// presentation-space semantics (apply_errors.build_unaligned_map): insertion
// keys pos + 0.1 mean a same-pos mis/del swallows just-inserted bases.

int64_t replay_unaligned_walk_batch(
    int64_t seed, int64_t stream, int64_t site_walk,
    int64_t B, const int64_t* slots, const int64_t* part_ids,
    const uint8_t* lane_do,
    const int64_t* m_ref, const int64_t* n_steps_meta,
    const uint32_t* checksums,
    const float* mix_cdf, int64_t mix_n,
    uint32_t* ev_out, const int64_t* ev_off, int64_t e_guard,
    uint8_t* ok_out, int32_t n_threads) {
  using walkreplay::Key;
  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(stream));

  auto run_range = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      if (!lane_do[b]) {
        ok_out[b] = 0;
        continue;
      }
      const int64_t n_exp = n_steps_meta[b];
      uint32_t* ev = ev_out + ev_off[b];
      Key sk = walkreplay::fold_in(base, static_cast<uint32_t>(slots[b]));
      if (part_ids) sk = walkreplay::fold_in(sk, static_cast<uint32_t>(part_ids[b]));
      Key wk = walkreplay::fold_in(sk, static_cast<uint32_t>(site_walk));
      int64_t pos = 0, mid = m_ref[b];
      uint32_t sum = 0;
      int64_t e = 0;
      bool fail = false;
      uint32_t t = 0;
      float ut8[8], ul8[8];
      int ti = 8;  // 8-step lookahead, 3 AVX2 passes per 8 steps
      while (pos < mid) {
        if (e >= n_exp || e >= e_guard) {
          fail = true;
          break;
        }
        if (ti == 8) {
          uint32_t tk0[8], tk1[8];
          walkreplay::fold8_in(wk, t, tk0, tk1);
          walkreplay::uniform8_keys(tk0, tk1, 0u, ut8);
          walkreplay::uniform8_keys(tk0, tk1, 1u, ul8);
          ti = 0;
        }
        float u_type = ut8[ti];
        float u_len = ul8[ti];
        int kind = (u_type >= 0.4f) + (u_type >= 0.7f) + (u_type >= 0.85f);
        int etype = kind - 1;
        if (etype < 0) etype = 0;
        if (etype > 2) etype = 2;
        const bool is_err = kind > 0;
        int64_t elen = 1;
        if (is_err) {
          const float* cdf = mix_cdf + etype * mix_n;
          int64_t lo = 0, hi = mix_n;
          while (lo < hi) {
            int64_t m = (lo + hi) / 2;
            if (cdf[m] < u_len) lo = m + 1; else hi = m;
          }
          elen = lo + 1;
        }
        const bool is_ins = kind == 2;
        const int64_t e_pos2x = is_ins ? 2 * pos + 1 : 2 * pos;
        const int64_t store_len = is_err ? elen : 0;
        const int64_t pos_after = pos + (is_ins ? 0 : elen);
        if (!is_ins && pos_after > mid) mid = pos_after;
        const uint32_t word = static_cast<uint32_t>(e_pos2x)
            | (static_cast<uint32_t>(store_len) << 17)
            | (static_cast<uint32_t>(etype) << 30);
        ev[e] = word;
        sum += (word + 1u) * (2u * static_cast<uint32_t>(e) + 1u);
        pos = pos_after;
        ++t;
        ++ti;
        ++e;
      }
      ok_out[b] = (!fail && e == n_exp && sum == checksums[b]) ? 1 : 0;
    }
  };

  int T = n_threads < 1 ? 1 : n_threads;
  if (T <= 1 || B < 64) {
    run_range(0, B);
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < T; ++i)
      threads.emplace_back(run_range, B * i / T, B * (i + 1) / T);
    for (auto& th : threads) th.join();
  }
  return 0;
}

struct UnalReconArgs {
  int64_t seed, stream, site_iupac, site_ins, site_qual;
  const int64_t* slots;
  const char* names_buf;
  const int64_t* name_off;
  const int64_t* l_new;      // final mutated length (= record total)
  const int64_t* middle_ref;
  const uint8_t* rev;
  const uint32_t* ev_flat;   // per-STEP words
  const int64_t* ev_off;
  const int64_t* n_steps;
  const uint8_t* genome_flat;
  const int64_t* g_off;
  const int64_t* start_pos;
  const int64_t* ubf;
  char* fastx_out;
  int fastq;
  const float* q_breaks;  // [>=5, qK] (row 4 = unmapped)
  const int32_t* q_vals;
  int64_t qK;
};

void recon_unaligned_range(const UnalReconArgs& a, int64_t r0, int64_t r1,
                           int64_t* fw) {
  using walkreplay::Key;
  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(a.seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(a.seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(a.stream));

  std::vector<uint8_t> flags_buf;  // per presentation position: 1 dead, 2 ins, 4 mis
  std::vector<char> out_buf;
  char* fp = a.fastx_out + a.ubf[r0];
  char* const fp0 = fp;
  constexpr uint8_t F_DEAD = 1, F_INS = 2, F_MIS = 4;

  for (int64_t r = r0; r < r1; ++r) {
    const int64_t lnew = a.l_new[r];
    const int64_t mid = a.middle_ref[r];
    const bool rev = a.rev[r] != 0;
    const char* name = a.names_buf + a.name_off[r];
    const int64_t name_len = a.name_off[r + 1] - a.name_off[r];
    const int64_t ns = a.n_steps[r];
    const uint32_t* ev = a.ev_flat + a.ev_off[r];
    const uint8_t* gseq = a.genome_flat + a.g_off[r] + a.start_pos[r];

    Key ks = walkreplay::fold_in(base, static_cast<uint32_t>(a.slots[r]));
    Key k_iupac = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_iupac));
    Key k_ins = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ins));
    Key k_qual = a.fastq
        ? walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_qual))
        : ks;

    // presentation spans (apply_errors.build_unaligned_map semantics)
    int64_t tot_ins = 0;
    for (int64_t e = 0; e < ns; ++e) {
      const uint32_t w = ev[e];
      if ((w >> 30) == 1 && ((w >> 17) & 0x1FFF)) tot_ins += (w >> 17) & 0x1FFF;
    }
    const int64_t P = mid + tot_ins;
    if ((int64_t)flags_buf.size() < P + 1) flags_buf.resize(P + 1);
    uint8_t* flags = flags_buf.data();
    std::memset(flags, 0, P);

    int64_t prior_ins = 0, k_same = 0;
    for (int64_t e = 0; e < ns; ++e) {
      const uint32_t w = ev[e];
      const int64_t px = w & 0x1FFFF;
      const int32_t t = w >> 30;
      const int64_t len = (w >> 17) & 0x1FFF;
      const int64_t pos = px >> 1;  // ins px = 2p+1, others 2p
      if (len == 0) {  // match step resets the consecutive-ins run
        k_same = 0;
        continue;
      }
      if (t == 1) {
        const int64_t ps = pos + prior_ins + 1;
        for (int64_t x = 0; x < len && ps + x < P; ++x) flags[ps + x] |= F_INS;
        prior_ins += len;
        k_same += len;
      } else {
        const int64_t ps = pos + (prior_ins - k_same);
        const uint8_t f = (t == 0) ? F_MIS : F_DEAD;
        for (int64_t x = 0; x < len && ps + x < P; ++x) flags[ps + x] |= f;
        k_same = 0;
      }
    }

    if ((int64_t)out_buf.size() < lnew + 4) out_buf.resize(lnew + 4);
    char* out = out_buf.data();
    int64_t j = 0, ref_idx = 0;
    for (int64_t p = 0; p < P && j < lnew; ++p) {
      const uint8_t f = flags[p];
      const bool is_ins = f & F_INS;
      if (f & F_DEAD) {
        if (!is_ins) ++ref_idx;
        continue;
      }
      int code;
      if (is_ins) {
        const uint32_t b = bits_at(k_ins, static_cast<uint32_t>(j));
        code = static_cast<int>(u2_lo(b) * 4.0f);
        if (code > 3) code = 3;
      } else {
        code = resolve_code(gseq[ref_idx], k_iupac, ref_idx);
        ++ref_idx;
      }
      if (f & F_MIS) {
        const uint32_t b = bits_at(k_iupac, static_cast<uint32_t>(j));
        int off = 1 + static_cast<int>(u2_hi(b) * 3.0f);
        if (off > 3) off = 3;
        code = (code + off) & 3;
      }
      out[j++] = kCode2Base[code];
    }

    *fp++ = a.fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    if (rev) {
      for (int64_t x = 0; x < lnew; ++x)
        *fp++ = g_comp[(uint8_t)out[lnew - 1 - x]];
    } else {
      fp = put_bytes(fp, out, lnew);
    }
    *fp++ = '\n';
    if (a.fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      // all-unmapped class (row 4); qual index j is NOT strand-flipped
      // (unaligned_batch computes quals after the read flip)
      const float* br = a.q_breaks + 4 * a.qK;
      const int32_t* vl = a.q_vals + 4 * a.qK;
      float u8[8];
      for (int64_t x0 = 0; x0 < lnew; x0 += 8) {
        walkreplay::uniform8_at(k_qual, static_cast<uint32_t>(x0), u8);
        const int64_t xn = lnew - x0 < 8 ? lnew - x0 : 8;
        for (int64_t x = 0; x < xn; ++x) {
          const float u = u8[x];
          int64_t lo = 0, hi = a.qK;
          while (lo < hi) {
            const int64_t m = (lo + hi) >> 1;
            if (br[m] <= u) lo = m + 1; else hi = m;
          }
          *fp++ = static_cast<char>(vl[lo - 1] + 33);
        }
      }
      *fp++ = '\n';
    }
  }
  *fw = fp - fp0;
}

int64_t emit_batch_recon_unaligned(
    int64_t seed, int64_t stream, int64_t site_iupac, int64_t site_ins,
    int64_t site_qual, int64_t k,
    const int64_t* slots, const char* names_buf, const int64_t* name_off,
    const int64_t* l_new, const int64_t* middle_ref, const uint8_t* rev,
    const uint32_t* ev_flat, const int64_t* ev_off, const int64_t* n_steps,
    const uint8_t* genome_flat, const int64_t* g_off, const int64_t* start_pos,
    const int64_t* ubf,
    char* fastx_out, int64_t* fastx_written,
    int32_t fastq, const float* q_breaks, const int32_t* q_vals, int64_t qK,
    int32_t n_threads) {
  init_comp();
  UnalReconArgs a{seed, stream, site_iupac, site_ins, site_qual,
                  slots, names_buf, name_off, l_new, middle_ref, rev,
                  ev_flat, ev_off, n_steps, genome_flat, g_off, start_pos,
                  ubf, fastx_out, static_cast<int>(fastq),
                  q_breaks, q_vals, qK};
  int T = n_threads < 1 ? 1 : static_cast<int>(n_threads);
  if (T > k) T = static_cast<int>(k < 1 ? 1 : k);
  std::vector<int64_t> r0s(T + 1);
  for (int t = 0; t <= T; ++t) r0s[t] = k * t / T;
  std::vector<int64_t> fws(T, 0);
  if (T == 1) {
    recon_unaligned_range(a, 0, k, &fws[0]);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(T);
    for (int t = 0; t < T; ++t)
      threads.emplace_back([&, t]() { recon_unaligned_range(a, r0s[t], r0s[t + 1], &fws[t]); });
    for (auto& th : threads) th.join();
  }
  int64_t fpos = fws[0];
  for (int t = 1; t < T; ++t) {
    std::memmove(fastx_out + fpos, fastx_out + a.ubf[r0s[t]], fws[t]);
    fpos += fws[t];
  }
  *fastx_written = fpos;
  return 0;
}

// --- transcriptome host reconstruction --------------------------------------
//
// Layout: head | mutated middle | polyA 'A's | tail (pre-reverse), then the
// strand flip and (dRNA) T->U translation.  Middle mutation draws are
// MIDDLE-indexed (iupac = SITE_IUPAC lo @ source index, mis = SITE_IUPAC hi
// @ middle index, ins = SITE_INS_BASE lo @ middle index) on per-SLOT keys;
// the source bytes are the transcript slice, or the exon/retained-intron
// interval concatenation for IR reads (host-assembled from the device's
// per-feature intervals).  Error-log ref bases are the IUPAC-RESOLVED
// source (matching TrxBatchWriter, which logs from the resolved ref rows).

struct TrxReconArgs {
  int64_t seed, stream, site_iupac, site_ins, site_ht, site_qual, ht_cap;
  const int64_t* slots;
  const char* names_buf;
  const int64_t* name_off;
  const int64_t* total_len;
  const int64_t* head;
  const int64_t* tail;
  const int64_t* pa_len;
  const int64_t* l_new;
  const int64_t* middle_ref;
  const uint8_t* rev;
  const uint32_t* ev_flat;
  const int64_t* ev_off;
  const int64_t* n_events;
  const uint8_t* src_a;      // packed transcriptome flat
  const uint8_t* src_b;      // IR interval-concat aux buffer
  const uint8_t* use_b;      // [k]
  const int64_t* src_off;    // [k] offset into src_a or src_b
  const int64_t* ubf;
  const int64_t* ube;
  char* fastx_out;
  char* err_out;
  int fastq;
  int uracil;
  int write_errors;
  const float* q_breaks;
  const int32_t* q_vals;
  int64_t qK;
};

void recon_trx_range(const TrxReconArgs& a, int64_t r0, int64_t r1,
                     int64_t* fw, int64_t* ew) {
  using walkreplay::Key;
  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(a.seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(a.seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(a.stream));

  std::vector<char> pre_buf;
  std::vector<uint8_t> cls_buf;
  std::vector<int64_t> rpos_buf;
  std::vector<float> uq_buf;
  char* fp = a.fastx_out + a.ubf[r0];
  char* ep = a.err_out + a.ube[r0];
  char* const fp0 = fp;
  char* const ep0 = ep;

  for (int64_t r = r0; r < r1; ++r) {
    const int64_t total = a.total_len[r];
    const int64_t head = a.head[r];
    const int64_t tail = a.tail[r];
    const int64_t pa = a.pa_len[r];
    const int64_t lnew = a.l_new[r];
    const bool rev = a.rev[r] != 0;
    const char* name = a.names_buf + a.name_off[r];
    const int64_t name_len = a.name_off[r + 1] - a.name_off[r];
    const int64_t ne = a.n_events[r];
    const uint32_t* ev = a.ev_flat + a.ev_off[r];
    const uint8_t* gseq = (a.use_b[r] ? a.src_b : a.src_a) + a.src_off[r];

    Key ks = walkreplay::fold_in(base, static_cast<uint32_t>(a.slots[r]));
    Key k_iu = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_iupac));
    Key k_in = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ins));
    Key k_ht = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ht));
    Key k_qual = a.fastq
        ? walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_qual))
        : ks;

    if ((int64_t)pre_buf.size() < total + 4) pre_buf.resize(total + 4);
    char* pre = pre_buf.data();
    uint8_t* cls = nullptr;
    if (a.fastq) {
      if ((int64_t)cls_buf.size() < total + 4) cls_buf.resize(total + 4);
      cls = cls_buf.data();
      std::memset(cls, 3, total);  // head/tail/polyA default ht-class
      std::memset(cls + head, 0, lnew > 0 ? lnew : 0);
    }

    // head / tail random bases (pool index clipped)
    fill_ht_bases(k_ht, 0, head, a.ht_cap, pre);
    fill_ht_bases(k_ht, head, tail, a.ht_cap, pre + head + lnew + pa);
    std::memset(pre + head + lnew, 'A', pa > 0 ? pa : 0);

    // mutated middle (middle-indexed draws, like the chimeric segments)
    {
      char* out = pre + head;
      auto eff_len = [&](int64_t e) -> int64_t {
        const uint32_t w = ev[e];
        const int64_t len = (w >> 17) & 0x1FFF;
        if ((w >> 30) == 1 && e + 1 < ne) {
          const uint32_t w2 = ev[e + 1];
          if ((w2 >> 30) == 1 && (w2 & 0x1FFFF) == (w & 0x1FFFF)) return 0;
        }
        return len;
      };
      auto copy_match = [&](int64_t i0, int64_t i1, int64_t m0) {
        const int64_t n = i1 - i0;
        if (n <= 0) return;
        std::memcpy(out + m0, gseq + i0, static_cast<size_t>(n));
        for (int64_t x = 0; x < n; ++x) {
          const uint8_t c = gseq[i0 + x];
          if (c != 'A' && c != 'C' && c != 'G' && c != 'T')
            out[m0 + x] = kCode2Base[resolve_code(c, k_iu, i0 + x)];
        }
      };
      int64_t i = 0, m = 0;
      for (int64_t e = 0; e < ne; ++e) {
        const uint32_t w = ev[e];
        const int64_t px = w & 0x1FFFF;
        const int32_t t = w >> 30;
        const int64_t len = eff_len(e);
        const int64_t key = (px + 1) / 2;
        const int64_t ref_start = (t == 1) ? key : px / 2;
        copy_match(i, ref_start, m);
        m += ref_start > i ? ref_start - i : 0;
        i = ref_start > i ? ref_start : i;
        if (len == 0) continue;
        if (t == 0) {
          if (cls) std::memset(cls + head + m, 1, len);
          for (int64_t x = 0; x < len; ++x, ++i, ++m) {
            int off = 1 + static_cast<int>(
                u2_hi(bits_at(k_iu, static_cast<uint32_t>(m))) * 3.0f);
            if (off > 3) off = 3;
            out[m] = kCode2Base[(resolve_code(gseq[i], k_iu, i) + off) & 3];
          }
        } else if (t == 1) {
          if (cls) std::memset(cls + head + m, 2, len);
          for (int64_t x = 0; x < len; ++x, ++m) {
            int code = static_cast<int>(
                u2_lo(bits_at(k_in, static_cast<uint32_t>(m))) * 4.0f);
            if (code > 3) code = 3;
            out[m] = kCode2Base[code];
          }
        } else {
          i += len;
        }
      }
      copy_match(i, i + (lnew - m), m);
    }

    // record (strand flip, then the dRNA T->U translation)
    *fp++ = a.fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    if (rev) {
      for (int64_t j = 0; j < total; ++j) {
        char c = g_comp[(uint8_t)pre[total - 1 - j]];
        *fp++ = (a.uracil && c == 'T') ? 'U' : c;
      }
    } else if (a.uracil) {
      for (int64_t j = 0; j < total; ++j) {
        char c = pre[j];
        *fp++ = c == 'T' ? 'U' : c;
      }
    } else {
      fp = put_bytes(fp, pre, total);
    }
    *fp++ = '\n';
    if (a.fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      // uniforms live at counters 0..total-1; when rev they're consumed in
      // descending order, so batch them into a scratch buffer first
      if ((int64_t)uq_buf.size() < total + 8) uq_buf.resize(total + 8);
      for (int64_t j0 = 0; j0 < total; j0 += 8)
        walkreplay::uniform8_at(k_qual, static_cast<uint32_t>(j0), &uq_buf[j0]);
      for (int64_t j = 0; j < total; ++j) {
        const int64_t jj = rev ? total - 1 - j : j;
        const int c = cls[jj];
        const float u = uq_buf[jj];
        const float* br = a.q_breaks + c * a.qK;
        int64_t lo = 0, hi = a.qK;
        while (lo < hi) {
          const int64_t m = (lo + hi) >> 1;
          if (br[m] <= u) lo = m + 1; else hi = m;
        }
        *fp++ = static_cast<char>(a.q_vals[c * a.qK + lo - 1] + 33);
      }
      *fp++ = '\n';
    }

    // error log (reverse event order; ref bases IUPAC-RESOLVED, pre-uracil)
    if (!a.write_errors || ne == 0) continue;
    const char* mid = pre + head;
    if ((int64_t)rpos_buf.size() < ne) rpos_buf.resize(ne);
    int64_t* rpos = rpos_buf.data();
    auto eff_len = [&](int64_t e) -> int64_t {
      const uint32_t w = ev[e];
      const int64_t len = (w >> 17) & 0x1FFF;
      if ((w >> 30) == 1 && e + 1 < ne) {
        const uint32_t w2 = ev[e + 1];
        if ((w2 >> 30) == 1 && (w2 & 0x1FFFF) == (w & 0x1FFFF)) return 0;
      }
      return len;
    };
    {
      int64_t cum_del = 0, cum_ins = 0;
      for (int64_t e = 0; e < ne; ++e) {
        const uint32_t w = ev[e];
        const int32_t t = w >> 30;
        const int64_t key = ((w & 0x1FFFF) + 1) / 2;
        const int64_t ref_start = (t == 1) ? key : (w & 0x1FFFF) / 2;
        rpos[e] = ref_start - cum_del + cum_ins;
        if (t == 1) cum_ins += eff_len(e);
        if (t == 2) cum_del += (w >> 17) & 0x1FFF;
      }
    }
    for (int64_t e = ne - 1; e >= 0; --e) {
      const uint32_t w = ev[e];
      const int32_t t = w >> 30;
      const int64_t len = eff_len(e);
      if (len == 0) continue;
      const int64_t key = ((w & 0x1FFFF) + 1) / 2;
      ep = put_bytes(ep, name, name_len);
      *ep++ = '\t';
      ep = put_i64(ep, key);
      *ep++ = '\t';
      ep = put_bytes(ep, kTypeNames[t], 3);
      *ep++ = '\t';
      ep = put_i64(ep, len);
      *ep++ = '\t';
      if (t == 1) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        for (int64_t j = 0; j < len; ++j) {
          const uint8_t c = gseq[key + j];
          *ep++ = (c == 'A' || c == 'C' || c == 'G' || c == 'T')
              ? static_cast<char>(c)
              : kCode2Base[resolve_code(c, k_iu, key + j)];
        }
      }
      *ep++ = '\t';
      if (t == 2) {
        std::memset(ep, '-', len);
        ep += len;
      } else {
        ep = put_bytes(ep, mid + rpos[e], len);
      }
      *ep++ = '\n';
    }
  }
  *fw = fp - fp0;
  *ew = ep - ep0;
}

int64_t emit_trx_recon(
    int64_t seed, int64_t stream, int64_t site_iupac, int64_t site_ins,
    int64_t site_ht, int64_t site_qual, int64_t ht_cap, int64_t k,
    const int64_t* slots, const char* names_buf, const int64_t* name_off,
    const int64_t* total_len, const int64_t* head, const int64_t* tail,
    const int64_t* pa_len, const int64_t* l_new, const int64_t* middle_ref,
    const uint8_t* rev,
    const uint32_t* ev_flat, const int64_t* ev_off, const int64_t* n_events,
    const uint8_t* src_a, const uint8_t* src_b,
    const uint8_t* use_b, const int64_t* src_off,
    const int64_t* ubf, const int64_t* ube,
    char* fastx_out, int64_t* fastx_written,
    char* err_out, int64_t* err_written,
    int32_t fastq, int32_t uracil, int32_t write_errors,
    const float* q_breaks, const int32_t* q_vals, int64_t qK,
    int32_t n_threads) {
  init_comp();
  TrxReconArgs a{seed, stream, site_iupac, site_ins, site_ht, site_qual,
                 ht_cap, slots, names_buf, name_off, total_len, head, tail,
                 pa_len, l_new, middle_ref, rev, ev_flat, ev_off, n_events,
                 src_a, src_b, use_b, src_off, ubf, ube, fastx_out, err_out,
                 static_cast<int>(fastq), static_cast<int>(uracil),
                 static_cast<int>(write_errors), q_breaks, q_vals, qK};
  int T = n_threads < 1 ? 1 : static_cast<int>(n_threads);
  if (T > k) T = static_cast<int>(k < 1 ? 1 : k);
  std::vector<int64_t> r0s(T + 1);
  for (int t = 0; t <= T; ++t) r0s[t] = k * t / T;
  std::vector<int64_t> fws(T, 0), ews(T, 0);
  if (T == 1) {
    recon_trx_range(a, 0, k, &fws[0], &ews[0]);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(T);
    for (int t = 0; t < T; ++t)
      threads.emplace_back([&, t]() { recon_trx_range(a, r0s[t], r0s[t + 1], &fws[t], &ews[t]); });
    for (auto& th : threads) th.join();
  }
  int64_t fpos = fws[0], epos = ews[0];
  for (int t = 1; t < T; ++t) {
    std::memmove(fastx_out + fpos, fastx_out + a.ubf[r0s[t]], fws[t]);
    fpos += fws[t];
    std::memmove(err_out + epos, err_out + a.ube[r0s[t]], ews[t]);
    epos += ews[t];
  }
  *fastx_written = fpos;
  *err_written = epos;
  return 0;
}

// --- chimeric host reconstruction -------------------------------------------
//
// A chimeric read is head | seg0 | gap0 | seg1 | ... | tail (pre-reverse).
// Segments reconstruct with per-(slot, segment) part keys and MIDDLE-indexed
// mutation draws (chimeric_mode materializes via build_gather_map +
// materialize_read: iupac = SITE_IUPAC lo @ ref index, mis = SITE_IUPAC hi @
// middle index, ins = SITE_INS_BASE lo @ middle index); gaps reconstruct
// with the unaligned presentation semantics under per-(slot, gap) keys.
// FASTQ: per-position class (head/tail 3, gap 4, segment 0/1/2) + SITE_QUAL
// draws at PRE-REVERSE indices (the device reverses the qual string).

struct ChiReconArgs {
  int64_t seed, stream, site_iupac, site_ins, site_ht, site_qual;
  int64_t part_seg_base, part_gap_base, ht_cap;
  int64_t S;
  const int64_t* slots;
  const char* names_buf;
  const int64_t* name_off;
  const int64_t* total_len;
  const int64_t* head;
  const int64_t* tail;
  const int64_t* n_seg;
  const uint8_t* rev;
  const int64_t* seg_part_off;  // [k*S]
  const int64_t* seg_lnew;
  const int64_t* seg_mid;
  const int64_t* seg_goff;
  const int64_t* seg_spos;
  const uint32_t* seg_ev_flat;
  const int64_t* seg_ev_off;
  const int64_t* seg_n_ev;
  const int64_t* gap_part_off;  // [k*(S-1)]
  const int64_t* gap_lnew;
  const int64_t* gap_mid;
  const int64_t* gap_goff;
  const int64_t* gap_spos;
  const uint32_t* gap_ev_flat;
  const int64_t* gap_ev_off;
  const int64_t* gap_n_steps;
  const uint8_t* genome_flat;
  const int64_t* ubf;
  const int64_t* ube;
  char* fastx_out;
  char* err_out;
  int fastq;
  int write_errors;
  const float* q_breaks;
  const int32_t* q_vals;
  int64_t qK;
};

// Gap bytes via the presentation-space semantics (same algorithm as
// recon_unaligned_range; sim/reconstruct.reconstruct_unaligned_lane is the
// numpy spec).
static void recon_gap_part(const uint32_t* ev, int64_t ns, int64_t mid,
                           int64_t lnew, const uint8_t* gseq,
                           walkreplay::Key k_iu, walkreplay::Key k_in,
                           char* out, std::vector<uint8_t>& flags_buf) {
  constexpr uint8_t F_DEAD = 1, F_INS = 2, F_MIS = 4;
  int64_t tot_ins = 0;
  for (int64_t e = 0; e < ns; ++e) {
    const uint32_t w = ev[e];
    if ((w >> 30) == 1 && ((w >> 17) & 0x1FFF)) tot_ins += (w >> 17) & 0x1FFF;
  }
  const int64_t P = mid + tot_ins;
  if ((int64_t)flags_buf.size() < P + 1) flags_buf.resize(P + 1);
  uint8_t* flags = flags_buf.data();
  std::memset(flags, 0, P);
  int64_t prior_ins = 0, k_same = 0;
  for (int64_t e = 0; e < ns; ++e) {
    const uint32_t w = ev[e];
    const int64_t px = w & 0x1FFFF;
    const int32_t t = w >> 30;
    const int64_t len = (w >> 17) & 0x1FFF;
    const int64_t pos = px >> 1;
    if (len == 0) { k_same = 0; continue; }
    if (t == 1) {
      const int64_t ps = pos + prior_ins + 1;
      for (int64_t x = 0; x < len && ps + x < P; ++x) flags[ps + x] |= F_INS;
      prior_ins += len;
      k_same += len;
    } else {
      const int64_t ps = pos + (prior_ins - k_same);
      const uint8_t f = (t == 0) ? F_MIS : F_DEAD;
      for (int64_t x = 0; x < len && ps + x < P; ++x) flags[ps + x] |= f;
      k_same = 0;
    }
  }
  int64_t j = 0, ref_idx = 0;
  for (int64_t p = 0; p < P && j < lnew; ++p) {
    const uint8_t f = flags[p];
    const bool is_ins = f & F_INS;
    if (f & F_DEAD) {
      if (!is_ins) ++ref_idx;
      continue;
    }
    int code;
    if (is_ins) {
      code = static_cast<int>(u2_lo(bits_at(k_in, static_cast<uint32_t>(j))) * 4.0f);
      if (code > 3) code = 3;
    } else {
      code = resolve_code(gseq[ref_idx], k_iu, ref_idx);
      ++ref_idx;
    }
    if (f & F_MIS) {
      int off = 1 + static_cast<int>(u2_hi(bits_at(k_iu, static_cast<uint32_t>(j))) * 3.0f);
      if (off > 3) off = 3;
      code = (code + off) & 3;
    }
    out[j++] = kCode2Base[code];
  }
}

void recon_chimeric_range(const ChiReconArgs& a, int64_t r0, int64_t r1,
                          int64_t* fw, int64_t* ew) {
  using walkreplay::Key;
  Key seed_key{static_cast<uint32_t>(static_cast<uint64_t>(a.seed) >> 32),
               static_cast<uint32_t>(static_cast<uint64_t>(a.seed) & 0xFFFFFFFFu)};
  Key base = walkreplay::fold_in(seed_key, static_cast<uint32_t>(a.stream));

  std::vector<char> pre_buf;
  std::vector<uint8_t> cls_buf, gap_flags;
  std::vector<int64_t> rpos_buf;
  std::vector<float> uq_buf;
  char* fp = a.fastx_out + a.ubf[r0];
  char* ep = a.err_out + a.ube[r0];
  char* const fp0 = fp;
  char* const ep0 = ep;

  for (int64_t r = r0; r < r1; ++r) {
    const int64_t total = a.total_len[r];
    const int64_t head = a.head[r];
    const int64_t tail = a.tail[r];
    const int64_t ns = a.n_seg[r];
    const bool rev = a.rev[r] != 0;
    const char* name = a.names_buf + a.name_off[r];
    const int64_t name_len = a.name_off[r + 1] - a.name_off[r];

    Key ks = walkreplay::fold_in(base, static_cast<uint32_t>(a.slots[r]));
    Key k_ht = walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_ht));
    Key k_qual = a.fastq
        ? walkreplay::fold_in(ks, static_cast<uint32_t>(a.site_qual))
        : ks;

    if ((int64_t)pre_buf.size() < total + 4) pre_buf.resize(total + 4);
    char* pre = pre_buf.data();
    uint8_t* cls = nullptr;
    if (a.fastq) {
      if ((int64_t)cls_buf.size() < total + 4) cls_buf.resize(total + 4);
      cls = cls_buf.data();
    }

    // head / tail random bases (pool index clipped to ht_cap - 1)
    fill_ht_bases(k_ht, 0, head, a.ht_cap, pre);
    fill_ht_bases(k_ht, head, tail, a.ht_cap, pre + total - tail);
    if (cls) {
      std::memset(cls, 3, head > 0 ? head : 0);
      if (tail > 0) std::memset(cls + total - tail, 3, tail);
    }

    // segments
    for (int64_t s = 0; s < ns; ++s) {
      const int64_t rs = r * a.S + s;
      const int64_t ne = a.seg_n_ev[rs];
      const int64_t lnew = a.seg_lnew[rs];
      const uint32_t* ev = a.seg_ev_flat + a.seg_ev_off[rs];
      const uint8_t* gseq = a.genome_flat + a.seg_goff[rs] + a.seg_spos[rs];
      char* out = pre + a.seg_part_off[rs];
      Key pk = walkreplay::fold_in(ks, static_cast<uint32_t>(a.part_seg_base + s));
      Key k_iu = walkreplay::fold_in(pk, static_cast<uint32_t>(a.site_iupac));
      Key k_in = walkreplay::fold_in(pk, static_cast<uint32_t>(a.site_ins));
      if (cls) std::memset(cls + a.seg_part_off[rs], 0, lnew > 0 ? lnew : 0);

      auto eff_len = [&](int64_t e) -> int64_t {
        const uint32_t w = ev[e];
        const int64_t len = (w >> 17) & 0x1FFF;
        if ((w >> 30) == 1 && e + 1 < ne) {
          const uint32_t w2 = ev[e + 1];
          if ((w2 >> 30) == 1 && (w2 & 0x1FFFF) == (w & 0x1FFFF)) return 0;
        }
        return len;
      };
      auto copy_match = [&](int64_t i0, int64_t i1, int64_t m0) {
        const int64_t n = i1 - i0;
        if (n <= 0) return;
        std::memcpy(out + m0, gseq + i0, static_cast<size_t>(n));
        for (int64_t x = 0; x < n; ++x) {
          const uint8_t c = gseq[i0 + x];
          if (c != 'A' && c != 'C' && c != 'G' && c != 'T')
            out[m0 + x] = kCode2Base[resolve_code(c, k_iu, i0 + x)];
        }
      };
      int64_t i = 0, m = 0;
      for (int64_t e = 0; e < ne; ++e) {
        const uint32_t w = ev[e];
        const int64_t px = w & 0x1FFFF;
        const int32_t t = w >> 30;
        const int64_t len = eff_len(e);
        const int64_t key = (px + 1) / 2;
        const int64_t ref_start = (t == 1) ? key : px / 2;
        copy_match(i, ref_start, m);
        m += ref_start > i ? ref_start - i : 0;
        i = ref_start > i ? ref_start : i;
        if (len == 0) continue;
        if (t == 0) {  // mis: MIDDLE-indexed hi half of SITE_IUPAC
          if (cls) std::memset(cls + a.seg_part_off[rs] + m, 1, len);
          for (int64_t x = 0; x < len; ++x, ++i, ++m) {
            int off = 1 + static_cast<int>(
                u2_hi(bits_at(k_iu, static_cast<uint32_t>(m))) * 3.0f);
            if (off > 3) off = 3;
            out[m] = kCode2Base[(resolve_code(gseq[i], k_iu, i) + off) & 3];
          }
        } else if (t == 1) {  // ins: MIDDLE-indexed lo half of SITE_INS_BASE
          if (cls) std::memset(cls + a.seg_part_off[rs] + m, 2, len);
          for (int64_t x = 0; x < len; ++x, ++m) {
            int code = static_cast<int>(
                u2_lo(bits_at(k_in, static_cast<uint32_t>(m))) * 4.0f);
            if (code > 3) code = 3;
            out[m] = kCode2Base[code];
          }
        } else {
          i += len;
        }
      }
      copy_match(i, i + (lnew - m), m);
    }

    // gaps
    for (int64_t g = 0; g < ns - 1; ++g) {
      const int64_t rg = r * (a.S - 1) + g;
      const int64_t glnew = a.gap_lnew[rg];
      Key pk = walkreplay::fold_in(ks, static_cast<uint32_t>(a.part_gap_base + g));
      Key k_iu = walkreplay::fold_in(pk, static_cast<uint32_t>(a.site_iupac));
      Key k_in = walkreplay::fold_in(pk, static_cast<uint32_t>(a.site_ins));
      recon_gap_part(a.gap_ev_flat + a.gap_ev_off[rg], a.gap_n_steps[rg],
                     a.gap_mid[rg], glnew,
                     a.genome_flat + a.gap_goff[rg] + a.gap_spos[rg],
                     k_iu, k_in, pre + a.gap_part_off[rg], gap_flags);
      if (cls) std::memset(cls + a.gap_part_off[rg], 4, glnew > 0 ? glnew : 0);
    }

    // record
    *fp++ = a.fastq ? '@' : '>';
    fp = put_bytes(fp, name, name_len);
    *fp++ = '\n';
    if (rev) {
      for (int64_t j = 0; j < total; ++j)
        *fp++ = g_comp[(uint8_t)pre[total - 1 - j]];
    } else {
      fp = put_bytes(fp, pre, total);
    }
    *fp++ = '\n';
    if (a.fastq) {
      *fp++ = '+';
      *fp++ = '\n';
      // uniforms live at counters 0..total-1; when rev they're consumed in
      // descending order, so batch them into a scratch buffer first
      if ((int64_t)uq_buf.size() < total + 8) uq_buf.resize(total + 8);
      for (int64_t j0 = 0; j0 < total; j0 += 8)
        walkreplay::uniform8_at(k_qual, static_cast<uint32_t>(j0), &uq_buf[j0]);
      for (int64_t j = 0; j < total; ++j) {
        const int64_t jj = rev ? total - 1 - j : j;
        const int c = cls[jj];
        const float u = uq_buf[jj];
        const float* br = a.q_breaks + c * a.qK;
        int64_t lo = 0, hi = a.qK;
        while (lo < hi) {
          const int64_t m = (lo + hi) >> 1;
          if (br[m] <= u) lo = m + 1; else hi = m;
        }
        *fp++ = static_cast<char>(a.q_vals[c * a.qK + lo - 1] + 33);
      }
      *fp++ = '\n';
    }

    // per-segment error log (reverse event order; gaps are never logged)
    if (!a.write_errors) continue;
    for (int64_t s = 0; s < ns; ++s) {
      const int64_t rs = r * a.S + s;
      const int64_t ne = a.seg_n_ev[rs];
      if (ne == 0) continue;
      const char* mid = pre + a.seg_part_off[rs];
      const uint32_t* ev = a.seg_ev_flat + a.seg_ev_off[rs];
      const uint8_t* gseq = a.genome_flat + a.seg_goff[rs] + a.seg_spos[rs];
      if ((int64_t)rpos_buf.size() < ne) rpos_buf.resize(ne);
      int64_t* rpos = rpos_buf.data();
      auto eff_len = [&](int64_t e) -> int64_t {
        const uint32_t w = ev[e];
        const int64_t len = (w >> 17) & 0x1FFF;
        if ((w >> 30) == 1 && e + 1 < ne) {
          const uint32_t w2 = ev[e + 1];
          if ((w2 >> 30) == 1 && (w2 & 0x1FFFF) == (w & 0x1FFFF)) return 0;
        }
        return len;
      };
      {
        int64_t cum_del = 0, cum_ins = 0;
        for (int64_t e = 0; e < ne; ++e) {
          const uint32_t w = ev[e];
          const int32_t t = w >> 30;
          const int64_t key = ((w & 0x1FFFF) + 1) / 2;
          const int64_t ref_start = (t == 1) ? key : (w & 0x1FFFF) / 2;
          rpos[e] = ref_start - cum_del + cum_ins;
          if (t == 1) cum_ins += eff_len(e);
          if (t == 2) cum_del += (w >> 17) & 0x1FFF;
        }
      }
      for (int64_t e = ne - 1; e >= 0; --e) {
        const uint32_t w = ev[e];
        const int32_t t = w >> 30;
        const int64_t len = eff_len(e);
        if (len == 0) continue;
        const int64_t key = ((w & 0x1FFFF) + 1) / 2;
        ep = put_bytes(ep, name, name_len);
        *ep++ = '\t';
        ep = put_i64(ep, key);
        *ep++ = '\t';
        ep = put_bytes(ep, kTypeNames[t], 3);
        *ep++ = '\t';
        ep = put_i64(ep, len);
        *ep++ = '\t';
        if (t == 1) {
          std::memset(ep, '-', len);
          ep += len;
        } else {
          ep = put_bytes(ep, gseq + key, len);
        }
        *ep++ = '\t';
        if (t == 2) {
          std::memset(ep, '-', len);
          ep += len;
        } else {
          ep = put_bytes(ep, mid + rpos[e], len);
        }
        *ep++ = '\n';
      }
    }
  }
  *fw = fp - fp0;
  *ew = ep - ep0;
}

int64_t emit_chimeric_recon(
    int64_t seed, int64_t stream,
    int64_t site_iupac, int64_t site_ins, int64_t site_ht, int64_t site_qual,
    int64_t part_seg_base, int64_t part_gap_base, int64_t ht_cap,
    int64_t k, int64_t S,
    const int64_t* slots, const char* names_buf, const int64_t* name_off,
    const int64_t* total_len, const int64_t* head, const int64_t* tail,
    const int64_t* n_seg, const uint8_t* rev,
    const int64_t* seg_part_off, const int64_t* seg_lnew, const int64_t* seg_mid,
    const int64_t* seg_goff, const int64_t* seg_spos,
    const uint32_t* seg_ev_flat, const int64_t* seg_ev_off, const int64_t* seg_n_ev,
    const int64_t* gap_part_off, const int64_t* gap_lnew, const int64_t* gap_mid,
    const int64_t* gap_goff, const int64_t* gap_spos,
    const uint32_t* gap_ev_flat, const int64_t* gap_ev_off, const int64_t* gap_n_steps,
    const uint8_t* genome_flat,
    const int64_t* ubf, const int64_t* ube,
    char* fastx_out, int64_t* fastx_written,
    char* err_out, int64_t* err_written,
    int32_t fastq, int32_t write_errors,
    const float* q_breaks, const int32_t* q_vals, int64_t qK,
    int32_t n_threads) {
  init_comp();
  ChiReconArgs a{seed, stream, site_iupac, site_ins, site_ht, site_qual,
                 part_seg_base, part_gap_base, ht_cap, S,
                 slots, names_buf, name_off, total_len, head, tail, n_seg, rev,
                 seg_part_off, seg_lnew, seg_mid, seg_goff, seg_spos,
                 seg_ev_flat, seg_ev_off, seg_n_ev,
                 gap_part_off, gap_lnew, gap_mid, gap_goff, gap_spos,
                 gap_ev_flat, gap_ev_off, gap_n_steps,
                 genome_flat, ubf, ube, fastx_out, err_out,
                 static_cast<int>(fastq), static_cast<int>(write_errors),
                 q_breaks, q_vals, qK};
  int T = n_threads < 1 ? 1 : static_cast<int>(n_threads);
  if (T > k) T = static_cast<int>(k < 1 ? 1 : k);
  std::vector<int64_t> r0s(T + 1);
  for (int t = 0; t <= T; ++t) r0s[t] = k * t / T;
  std::vector<int64_t> fws(T, 0), ews(T, 0);
  if (T == 1) {
    recon_chimeric_range(a, 0, k, &fws[0], &ews[0]);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(T);
    for (int t = 0; t < T; ++t)
      threads.emplace_back([&, t]() { recon_chimeric_range(a, r0s[t], r0s[t + 1], &fws[t], &ews[t]); });
    for (auto& th : threads) th.join();
  }
  int64_t fpos = fws[0], epos = ews[0];
  for (int t = 1; t < T; ++t) {
    std::memmove(fastx_out + fpos, fastx_out + a.ubf[r0s[t]], fws[t]);
    fpos += fws[t];
    std::memmove(err_out + epos, err_out + a.ube[r0s[t]], ews[t]);
    epos += ews[t];
  }
  *fastx_written = fpos;
  *err_written = epos;
  return 0;
}

}  // extern "C"
