// kart_post.cpp — native post-seeding pipeline for kart-tpu.
//
// Everything downstream of the TPU seeding kernels: candidate clustering,
// paired-end pairing + rescue, the divide (seed filters + normal-pair
// synthesis) and conquer (8-mer repartition + Needleman-Wunsch) steps,
// report/CIGAR/coordinate generation, SAM flags/MAPQ and record text.
//
// This is a fresh C++ implementation of the semantics validated in
// kart_tpu/pipeline/*.py (which mirror the reference aligner exactly:
// src/AlignmentCandidates.cpp, src/Mapping.cpp, src/tools.cpp,
// src/nw_alignment.cpp, src/KmerAnalysis.cpp, src/AlignmentRescue.cpp).
// Output is bit-identical to both.
//
// Exposed via a C ABI loaded with ctypes (see kart_tpu/native/post.py).

#include <algorithm>
#include <cctype>
#include <cstdlib>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

#include <atomic>
#include <ctime>

#include <sys/mman.h>

namespace {

// Back the big random-access tables (13-mer table, suffix array, genome
// text) with 2MB pages: the 13-mer direct table alone is 4^13*4B = 268MB,
// so every lookup is a TLB miss on 4KB pages.  THP here is madvise-mode;
// MADV_COLLAPSE (Linux 6.1+) collapses the already-faulted numpy pages
// synchronously.
#ifndef MADV_COLLAPSE
#define MADV_COLLAPSE 25
#endif
static void hint_hugepages(const void* p, size_t len) {
  uintptr_t a = ((uintptr_t)p + 4095) & ~(uintptr_t)4095;
  uintptr_t e = ((uintptr_t)p + len) & ~(uintptr_t)4095;
  if (e <= a) return;
  madvise((void*)a, e - a, MADV_HUGEPAGE);
  madvise((void*)a, e - a, MADV_COLLAPSE);  // best-effort; EINVAL is fine
}

// --- stage profiling (KART_PROF=1): ns accumulators dumped at ctx destroy ---
struct Prof {
  std::atomic<int64_t> seed{0}, cand{0}, pair{0}, report{0}, fmt{0}, reads{0};
  // report sub-stages (KART_PROF=1): divide filters, conquer DP, cigar/coords
  std::atomic<int64_t> rep_np{0}, rep_conq{0}, rep_coord{0};
  // deterministic work counters (robust to wall-clock noise)
  std::atomic<int64_t> nw_calls{0}, nw_cells{0}, repart_calls{0}, repart_bases{0},
      shortcut_calls{0};
};
static Prof g_prof;
static bool prof_on() {
  static int v = [] {
    const char* e = getenv("KART_PROF");
    return e && *e == '1';
  }();
  return v;
}
static inline int64_t now_ns() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1000000000LL + ts.tv_nsec;
}
static void prof_dump() {
  int64_t n = g_prof.reads.load();
  if (!n) return;
  fprintf(stderr,
          "[kart_prof] reads=%lld  per-read ns (summed over threads): "
          "seed=%lld cand=%lld pair=%lld report=%lld fmt=%lld\n",
          (long long)n, (long long)(g_prof.seed / n), (long long)(g_prof.cand / n),
          (long long)(g_prof.pair / n), (long long)(g_prof.report / n),
          (long long)(g_prof.fmt / n));
  fprintf(stderr,
          "[kart_prof]   report breakdown: normal_pairs=%lld conquer=%lld "
          "coord=%lld\n",
          (long long)(g_prof.rep_np / n), (long long)(g_prof.rep_conq / n),
          (long long)(g_prof.rep_coord / n));
  fprintf(stderr,
          "[kart_prof]   conquer work: nw_calls=%lld nw_cells=%lld "
          "repart_calls=%lld repart_bases=%lld shortcut_calls=%lld (totals)\n",
          (long long)g_prof.nw_calls.load(), (long long)g_prof.nw_cells.load(),
          (long long)g_prof.repart_calls.load(),
          (long long)g_prof.repart_bases.load(),
          (long long)g_prof.shortcut_calls.load());
}

// ---------------------------------------------------------------------------
// Basic tables
// ---------------------------------------------------------------------------

static uint8_t NT4[256];
static char COMP[256];

// Word-at-a-time sequence compares (hot in seeding LCPs and the conquer
// mismatch fast path).

static int count_mismatches(const char* a, const char* b, int len) {
  // count nonzero bytes of a^b (SWAR zero-byte trick)
  int c = 0, i = 0;
  const uint64_t L7 = 0x7F7F7F7F7F7F7F7FULL, H8 = 0x8080808080808080ULL;
  for (; i + 8 <= len; i += 8) {
    uint64_t x, y;
    memcpy(&x, a + i, 8);
    memcpy(&y, b + i, 8);
    uint64_t d = x ^ y;
    if (!d) continue;
    uint64_t t = ~(((d & L7) + L7) | d | L7);  // 0x80 per ZERO byte
    c += 8 - __builtin_popcountll(t & H8);
  }
  for (; i < len; i++)
    if (a[i] != b[i]) c++;
  return c;
}

// Longest common prefix of a[0..maxl) and b[0..maxl), 8 bytes at a time.
static inline int lcp_bytes(const int8_t* a, const int8_t* b, int maxl) {
  int l = 0;
  for (; l + 8 <= maxl; l += 8) {
    uint64_t x, y;
    memcpy(&x, a + l, 8);
    memcpy(&y, b + l, 8);
    uint64_t d = x ^ y;
    if (d) return l + (__builtin_ctzll(d) >> 3);
  }
  while (l < maxl && a[l] == b[l]) l++;
  return l;
}

struct TableInit {
  TableInit() {
    memset(NT4, 4, sizeof(NT4));
    const char* b = "ACGT";
    for (int i = 0; i < 4; i++) {
      NT4[(uint8_t)b[i]] = i;
      NT4[(uint8_t)tolower(b[i])] = i;
    }
    NT4[(uint8_t)'-'] = 5;
    memset(COMP, 'N', sizeof(COMP));
    const char* x = "ACGTacgt";
    const char* y = "TGCATGCA";
    for (int i = 0; i < 8; i++) COMP[(uint8_t)x[i]] = y[i];
  }
} table_init;

// ---------------------------------------------------------------------------
// Context
// ---------------------------------------------------------------------------


// Direct 13-mer lookup seeding tables (same structure as the TPU engine in
// kart_tpu/ops/kmer_seed.py; see its docstring for the exactness argument).
struct SeedTables {
  const int32_t* table_lo = nullptr;  // 4^13 + 1 entries
  const int32_t* sa_full = nullptr;   // seq_len + 1 rows
  std::vector<const uint32_t*> bitmaps;  // per k in bitmap_ks
  std::vector<int> bitmap_ks;
  int64_t seq_len = 0;
  std::vector<int8_t> ref_codes;  // 2L codes 0..3 (derived from ref_seq)
  // padded 13-mer ids of the <=13 sub-13 tail suffixes (sorted): intervals
  // containing one of these "bogus" rows must use the linear extension
  // scan (the rows' table ids don't reflect real 13-mers)
  std::vector<uint32_t> bogus_km;
  bool ready = false;
};

static inline bool km_is_bogus(const SeedTables& st, uint32_t km) {
  for (uint32_t b : st.bogus_km)
    if (b == km) return true;
  return false;
}

// Native FM-index over the .bwt/.sa arrays (de-interleaved layout): the
// memory-frugal seeding + sampled-SA resolution scheme of the reference
// (src/bwt_search.cpp:44-184, src/BWT_Index/bwt.c:101-123).  This is the
// pure-CPU path at human scale: no 13-mer direct tables (they need the
// full SA) and no .saf sidecar — only .bwt/.sa-class memory (VERDICT r4
// missing #2).  Arrays are caller-owned (numpy, via ctypes).
struct FMTables {
  const int64_t* occ_cp = nullptr;      // n_blocks * 4 checkpoint counts
  const uint32_t* bwt_words = nullptr;  // n_blocks * 8, 16 bases/word
  const int64_t* sa_samples = nullptr;  // seq_len/sa_intv + 1
  int64_t L2[5] = {0, 0, 0, 0, 0};
  int64_t primary = 0, seq_len = 0;
  int32_t sa_intv = 32;
  bool ready = false;
};

struct Ctx {
  const uint8_t* ref_seq;  // ASCII fwd+rc text, length two_genome_size
  int64_t two_genome_size;
  int64_t genome_size;
  int32_t n_chrom;
  std::vector<std::string> chrom_names;
  std::vector<int64_t> chrom_lens, fwd_loc, rev_loc;
  std::vector<int64_t> chr_keys;  // sorted boundary keys
  std::vector<int64_t> chr_vals;
  int32_t max_gaps, max_insert_size, min_seed_len;
  bool pacbio, multi_hit;
  int n_threads;
  SeedTables seed_tables;
  FMTables fm;  // fallback seeder when the direct tables are absent
  std::string out_buf;  // last chunk's SAM text (valid until the next call)
};

// ---------------------------------------------------------------------------
// Native direct-lookup seeding (mirror of ops/kmer_seed.py, exact FastMode)
// ---------------------------------------------------------------------------

static const int SEED_K = 13;
static const int SEED_OCC_THR = 50;

struct RawSeed {
  int32_t rpos, len;
  int64_t gpos;
};

static inline bool bitmap_has(const uint32_t* bm, uint32_t idx) {
  return (bm[idx >> 5] >> (idx & 31)) & 1u;
}

// Bulk ASCII -> 2-bit-code encode (the per-chunk arena encode is ~10% of
// the seeding stage at 1 byte/cycle).  SIMD path: low-nibble shuffle gives
// the candidate code, a second shuffle reconstructs the expected uppercase
// letter to validate it (so 'Q' (nibble 1) does not alias 'A'); non-ACGT
// falls back to 4, '-' to 5 — byte-for-byte identical to the NT4 table.
#if defined(__SSE4_1__) && defined(__SSSE3__)
#include <smmintrin.h>
static inline void encode_bulk(const uint8_t* src, int8_t* dst, int64_t n) {
  const __m128i code_tbl =
      _mm_setr_epi8(4, 0, 4, 1, 3, 4, 4, 2, 4, 4, 4, 4, 4, 4, 4, 4);
  const __m128i chr_tbl =
      _mm_setr_epi8(0, 'A', 0, 'C', 'T', 0, 0, 'G', 0, 0, 0, 0, 0, 0, 0, 0);
  const __m128i mask_low = _mm_set1_epi8(0x0F);
  const __m128i upper = _mm_set1_epi8((char)0xDF);
  const __m128i dash = _mm_set1_epi8('-');
  const __m128i five = _mm_set1_epi8(5);
  const __m128i four = _mm_set1_epi8(4);
  int64_t i = 0;
  for (; i + 16 <= n; i += 16) {
    __m128i v = _mm_loadu_si128((const __m128i*)(src + i));
    __m128i nib = _mm_and_si128(v, mask_low);
    __m128i code = _mm_shuffle_epi8(code_tbl, nib);
    __m128i expect = _mm_shuffle_epi8(chr_tbl, nib);
    __m128i isacgt = _mm_cmpeq_epi8(_mm_and_si128(v, upper), expect);
    __m128i r = _mm_blendv_epi8(four, code, isacgt);
    r = _mm_blendv_epi8(r, five, _mm_cmpeq_epi8(v, dash));
    _mm_storeu_si128((__m128i*)(dst + i), r);
  }
  for (; i < n; i++) dst[i] = (int8_t)NT4[src[i]];
}
#else
static inline void encode_bulk(const uint8_t* src, int8_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; i++) dst[i] = (int8_t)NT4[src[i]];
}
#endif

#if defined(__BMI2__)
#include <immintrin.h>
// Extract the 13-mer id from 13 unambiguous codes in one shot: two
// overlapping 8-byte loads, byte-swap so code 0 lands most-significant,
// PEXT gathers the low 2 bits of every byte.  Returns false when any code
// is ambiguous (>=4) — caller falls back to the scalar loop for amb_off.
// Requires pos+13 <= rlen (guaranteed: pos < rlen - min_seed, min_seed>=13).
static inline bool km13_fast(const int8_t* enc, uint32_t& km) {
  uint64_t w0, w1;
  memcpy(&w0, enc, 8);
  memcpy(&w1, enc + 5, 8);
  if ((w0 | w1) & 0xFCFCFCFCFCFCFCFCULL) return false;
  uint64_t p0 = _pext_u64(__builtin_bswap64(w0), 0x0303030303030303ULL);
  uint64_t p1 = _pext_u64(__builtin_bswap64(w1), 0x0303030303030303ULL);
  km = (uint32_t)((p0 << 10) | (p1 & 0x3FF));
  return true;
}
#else
static inline bool km13_fast(const int8_t*, uint32_t&) { return false; }
#endif

// Compare the read remainder (r, rrem) against the text suffix (t, trem),
// both already offset past the shared 13-mer.  Returns +1 when read >
// suffix, -1 when read < suffix, 0 when the read is exhausted first or
// both end together (suffix-sort order: a string that is a prefix of
// another sorts FIRST).  *lcp_out gets the common-prefix length capped at
// min(rrem, trem) — exactly the maximal-extension length contribution.
static inline int suffix_cmp(const int8_t* r, int rrem, const int8_t* t,
                             int64_t trem, int* lcp_out) {
  int m = trem < rrem ? (int)trem : rrem;
  int l = lcp_bytes(r, t, m);
  if (lcp_out) *lcp_out = l;
  if (l < m) return r[l] < t[l] ? -1 : 1;
  if (m < rrem) return 1;  // suffix exhausted first => suffix sorts before
  return 0;
}

// Maximal-extension block of a big SA interval by BINARY SEARCH instead of
// the linear per-row scan: suffixes in [lo, hi) are sorted, so the rows
// achieving the maximal LCP with the read are the neighbors of the read's
// insertion point, and the full maximizer block is contiguous — 3 log(cnt)
// capped compares instead of cnt (a 500-copy repeat family interval costs
// ~27 cache-missing compares instead of ~300).  Caller must ensure no
// bogus (sub-13 tail) row is in the interval.  Output: best = extension
// length beyond the 13-mer, [blo, bhi) = maximizer rows in SA order —
// byte-identical semantics to the linear scan.
static void ext_interval_bin(const SeedTables& st, const int8_t* renc13,
                             int rrem, const int8_t* text, int32_t lo,
                             int32_t hi, int64_t seq_len, int& best,
                             int32_t& blo, int32_t& bhi) {
  auto tptr = [&](int32_t row, int64_t& trem) {
    int64_t loc = st.sa_full[row];
    trem = seq_len - loc - SEED_K;
    return text + loc + SEED_K;
  };
  int32_t a = lo, b = hi;  // insertion point: first row with read <= suffix
  while (a < b) {
    int32_t mid = a + ((b - a) >> 1);
    int64_t trem;
    const int8_t* t = tptr(mid, trem);
    if (suffix_cmp(renc13, rrem, t, trem, nullptr) > 0)
      a = mid + 1;
    else
      b = mid;
  }
  best = 0;
  for (int32_t row : {a, a - 1}) {
    if (row < lo || row >= hi) continue;
    int64_t trem;
    const int8_t* t = tptr(row, trem);
    int l;
    suffix_cmp(renc13, rrem, t, trem, &l);
    if (l > best) best = l;
  }
  // maximizer block: rows whose suffix starts with read[0..best)
  auto pcmp = [&](int32_t row) {  // -1 suffix<key, 0 match, +1 suffix>key
    int64_t trem;
    const int8_t* t = tptr(row, trem);
    int m = trem < best ? (int)trem : best;
    int l = lcp_bytes(renc13, t, m);
    if (l < m) return t[l] < renc13[l] ? -1 : 1;
    if (m < best) return -1;  // shorter suffix sorts first
    return 0;
  };
  a = lo;
  b = hi;
  while (a < b) {
    int32_t mid = a + ((b - a) >> 1);
    if (pcmp(mid) < 0)
      a = mid + 1;
    else
      b = mid;
  }
  blo = a;
  b = hi;
  while (a < b) {
    int32_t mid = a + ((b - a) >> 1);
    if (pcmp(mid) <= 0)
      a = mid + 1;
    else
      b = mid;
  }
  bhi = a;
}

// linear-scan threshold: below this the per-row scan with its prefetch
// pipeline wins; above it the binary block search does
// (KART_EXT_BIN_THR overrides for A/B measurement; 1<<30 disables)
static const int32_t EXT_BIN_THR = [] {
  const char* e = getenv("KART_EXT_BIN_THR");
  return e ? atoi(e) : 48;
}();

// Capped maximal extension at `pos` with window end `stop` (BWT_Search's
// [start, stop) semantics): returns length and appends the occurrences of
// the maximal (possibly window-capped) prefix when it qualifies as a seed.
static int extend_at(const Ctx& ctx, const int8_t* enc, int rlen, int pos, int stop,
                     std::vector<RawSeed>& out, bool& emitted) {
  const SeedTables& st = ctx.seed_tables;
  const int8_t* text = st.ref_codes.data();
  int64_t last_valid = st.seq_len - SEED_K;
  int min_seed = ctx.min_seed_len;
  emitted = false;

  uint32_t km = 0;
  int amb_off = SEED_K + 1;
  if (pos + SEED_K > rlen || !km13_fast(enc + pos, km)) {
    km = 0;
    for (int i = 0; i < SEED_K; i++) {
      int8_t c = (pos + i < rlen) ? enc[pos + i] : (int8_t)4;
      if (c > 3) {
        if (amb_off > SEED_K) amb_off = i;
        km = km << 2;
      } else
        km = (km << 2) | (uint32_t)c;
    }
  }
  if (stop - pos < SEED_K && amb_off > stop - pos) amb_off = stop - pos;
  if (amb_off > SEED_K && stop - pos >= SEED_K) {
    int32_t lo = st.table_lo[km];
    int32_t hi = st.table_lo[km + 1];
    int best = -1;
    int64_t freq = 0;
    thread_local std::vector<int64_t> max_locs;
    max_locs.clear();
    int l_cap = stop - pos;
    if (hi - lo > EXT_BIN_THR && !km_is_bogus(st, km)) {
      int ebest;
      int32_t blo, bhi;
      ext_interval_bin(st, enc + pos + SEED_K, l_cap - SEED_K, text, lo, hi,
                       st.seq_len, ebest, blo, bhi);
      best = SEED_K + ebest;
      freq = bhi - blo;
      if (freq <= SEED_OCC_THR)
        for (int32_t row = blo; row < bhi; row++)
          max_locs.push_back(st.sa_full[row]);
    } else {
      for (int32_t row = lo; row < hi; row++) {
        if (row + 8 < hi) {
          int64_t nloc = st.sa_full[row + 8];
          if (nloc <= last_valid) __builtin_prefetch(&text[nloc + SEED_K], 0, 1);
        }
        int64_t loc = st.sa_full[row];
        if (loc > last_valid) continue;
        int maxl = l_cap;
        if (loc + maxl > st.seq_len) maxl = (int)(st.seq_len - loc);
        // interval rows share the window's 13-mer prefix; maxl >= SEED_K here
        int l = SEED_K + lcp_bytes(enc + pos + SEED_K, text + loc + SEED_K,
                                   maxl - SEED_K);
        if (l > best) {
          best = l;
          max_locs.clear();
          max_locs.push_back(loc);
        } else if (l == best)
          max_locs.push_back(loc);
      }
      freq = (int64_t)max_locs.size();
    }
    if (best >= SEED_K) {
      if (best >= min_seed && freq <= SEED_OCC_THR) {
        emitted = true;
        for (int64_t loc : max_locs) out.push_back({pos, best, loc});
      }
      return best;
    }
  }
  // sub-13 restart length from presence bitmaps (descending k), also capped
  // by the window (a window shorter than k cannot certify a k-match)
  int sub_cap = std::min(amb_off, stop - pos);
  const SeedTables& st2 = ctx.seed_tables;
  for (size_t bi = 0; bi < st2.bitmap_ks.size(); bi++) {
    int k = st2.bitmap_ks[bi];
    if (sub_cap >= k && bitmap_has(st2.bitmaps[bi], km >> (2 * (SEED_K - k))))
      return k;
  }
  return 0;
}

// IdentifySeedPairs_SensitiveMode via the direct table (reference:
// src/AlignmentCandidates.cpp:132-169): 30-base window, advance len on
// success, MinSeedLength on failure.
static void seed_read_sensitive(const Ctx& ctx, const uint8_t* seq, int rlen,
                                std::vector<RawSeed>& out) {
  int min_seed = ctx.min_seed_len;
  out.clear();
  thread_local std::vector<int8_t> enc;
  enc.resize(rlen);
  encode_bulk(seq, enc.data(), rlen);
  int pos = 0, stop_pos = 30, end_pos = rlen - min_seed;
  while (pos < end_pos) {
    if (enc[pos] > 3) {
      pos++;
      stop_pos++;
      continue;
    }
    bool emitted = false;
    int len = extend_at(ctx, enc.data(), rlen, pos, std::min(stop_pos, rlen), out,
                        emitted);
    // BWT_Search returns freq>0 iff len >= MinSeedLength AND freq <= OCC_Thr
    if (emitted) {
      pos += len;
      stop_pos += len;
    } else {
      pos += min_seed;
      stop_pos += min_seed;
    }
    if (stop_pos > rlen) stop_pos = rlen;
  }
}

// IdentifySeedPairs_FastMode via the direct table: identical seed stream to
// BWT_Search chains (reference src/AlignmentCandidates.cpp:49-80).
static void seed_read_direct(const Ctx& ctx, const uint8_t* seq, int rlen,
                             std::vector<RawSeed>& out) {
  const SeedTables& st = ctx.seed_tables;
  const int8_t* text = st.ref_codes.data();
  int64_t last_valid = st.seq_len - SEED_K;
  int min_seed = ctx.min_seed_len;
  int end_pos = rlen - min_seed;
  out.clear();

  // encode once
  thread_local std::vector<int8_t> enc;
  enc.resize(rlen);
  encode_bulk(seq, enc.data(), rlen);

  thread_local std::vector<int64_t> max_locs;
  int pos = 0;
  while (pos < end_pos) {
    if (enc[pos] > 3) {
      pos++;
      continue;
    }
    // 13-mer id and first ambiguous offset within the window
    uint32_t km = 0;
    int amb_off = SEED_K + 1;  // > 12: no amb in the sub-13 relevant range
    if (!km13_fast(enc.data() + pos, km)) {
      km = 0;
      for (int i = 0; i < SEED_K; i++) {
        int8_t c = (pos + i < rlen) ? enc[pos + i] : (int8_t)4;
        if (c > 3) {
          if (amb_off > SEED_K) amb_off = i;
          km = km << 2;
        } else
          km = (km << 2) | (uint32_t)c;
      }
    }
    bool valid13 = amb_off > SEED_K;
    if (valid13) {
      int32_t lo = st.table_lo[km];
      int32_t hi = st.table_lo[km + 1];
      int best = -1;
      int64_t freq = 0;
      max_locs.clear();
      if (hi - lo > EXT_BIN_THR && !km_is_bogus(st, km)) {
        int ebest;
        int32_t blo, bhi;
        ext_interval_bin(st, enc.data() + pos + SEED_K, (rlen - pos) - SEED_K,
                         text, lo, hi, st.seq_len, ebest, blo, bhi);
        best = SEED_K + ebest;
        freq = bhi - blo;
        if (freq <= SEED_OCC_THR)
          for (int32_t row = blo; row < bhi; row++)
            max_locs.push_back(st.sa_full[row]);
      } else {
        for (int32_t row = lo; row < hi; row++) {
          if (row + 8 < hi) {
            int64_t nloc = st.sa_full[row + 8];
            if (nloc <= last_valid) __builtin_prefetch(&text[nloc + SEED_K], 0, 1);
          }
          int64_t loc = st.sa_full[row];
          if (loc > last_valid) continue;  // bogus short-suffix entry
          int maxl = rlen - pos;
          if (loc + maxl > st.seq_len) maxl = (int)(st.seq_len - loc);
          // interval rows share the 13-mer prefix; maxl >= SEED_K here
          int l = SEED_K + lcp_bytes(enc.data() + pos + SEED_K, text + loc + SEED_K,
                                     maxl - SEED_K);
          if (l > best) {
            best = l;
            max_locs.clear();
            max_locs.push_back(loc);
          } else if (l == best)
            max_locs.push_back(loc);
        }
        freq = (int64_t)max_locs.size();
      }
      if (best >= SEED_K) {
        if (best >= min_seed && freq <= SEED_OCC_THR)
          for (int64_t loc : max_locs) out.push_back({pos, best, loc});
        pos += best + 1;
        continue;
      }
    }
    // sub-13: exact restart length from presence bitmaps (descending k)
    int sub_len = 0;
    for (size_t bi = 0; bi < st.bitmap_ks.size(); bi++) {
      int k = st.bitmap_ks[bi];
      if (amb_off >= k && bitmap_has(st.bitmaps[bi], km >> (2 * (SEED_K - k)))) {
        sub_len = k;
        break;
      }
    }
    pos += sub_len + 1;
  }
}

// ---------------------------------------------------------------------------
// Native FM seeder: BWT backward search + inverse-Psi sampled-SA walks.
// Exact mirror of the executable spec (kart_tpu/ops/fm_ref.py) and hence of
// the reference (src/bwt_search.cpp:44-184, bwt.c:101-123).  Used when the
// 13-mer direct tables are not attached: KART_SA_MODE=sampled, or genomes
// past the kmer-table gate — the configurations where the reference's
// memory footprint (no full SA anywhere) is the point.
// ---------------------------------------------------------------------------

static inline int fm_count_word(uint32_t w, int c) {
  uint32_t y2 = (c & 2) ? w : ~w;
  uint32_t y1 = (c & 1) ? w : ~w;
  return __builtin_popcount((y2 >> 1) & y1 & 0x55555555u);
}

static inline void fm_count4_word(uint32_t w, int64_t cnt[4]) {
  uint32_t nw = ~w;
  cnt[0] += __builtin_popcount((nw >> 1) & nw & 0x55555555u);
  cnt[1] += __builtin_popcount((nw >> 1) & w & 0x55555555u);
  cnt[2] += __builtin_popcount((w >> 1) & nw & 0x55555555u);
  cnt[3] += __builtin_popcount((w >> 1) & w & 0x55555555u);
}

// bwt_occ4(k): counts of each code in bwt[0..k] (fm_ref.py::occ4)
static void fm_occ4(const FMTables& fm, int64_t k, int64_t cnt[4]) {
  if (k == -1) {
    cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0;
    return;
  }
  k -= (k >= fm.primary);
  int64_t blk = k >> 7;
  const int64_t* base = fm.occ_cp + blk * 4;
  const uint32_t* w = fm.bwt_words + blk * 8;
  for (int c = 0; c < 4; c++) cnt[c] = base[c];
  int jk = (int)((k & 0x7F) >> 4);
  for (int j = 0; j < jk; j++) fm_count4_word(w[j], cnt);
  int sh = (int)((~k & 0xF) << 1);
  fm_count4_word(w[jk] & ~((1u << sh) - 1u), cnt);
  cnt[0] -= (~k & 0xF);
}

// bwt_occ(k, c) with the sentinel-position handling (fm_ref.py::occ)
static int64_t fm_occ(const FMTables& fm, int64_t k, int c) {
  if (k == fm.seq_len) return fm.L2[c + 1] - fm.L2[c];
  if (k == -1) return 0;
  k -= (k >= fm.primary);
  int64_t blk = k >> 7;
  int64_t n = fm.occ_cp[blk * 4 + c];
  const uint32_t* w = fm.bwt_words + blk * 8;
  int jk = (int)((k & 0x7F) >> 4);
  for (int j = 0; j < jk; j++) n += fm_count_word(w[j], c);
  int sh = (int)((~k & 0xF) << 1);
  n += fm_count_word(w[jk] & ~((1u << sh) - 1u), c);
  if (c == 0) n -= (~k & 0xF);
  return n;
}

static inline int fm_bwt_char(const FMTables& fm, int64_t x) {
  uint32_t w = fm.bwt_words[(x >> 7) * 8 + ((x & 0x7F) >> 4)];
  return (int)((w >> ((~x & 0xF) << 1)) & 3u);
}

static inline int64_t fm_inv_psi(const FMTables& fm, int64_t k) {
  if (k == fm.primary) return 0;
  int64_t x = k - (k > fm.primary);
  int c = fm_bwt_char(fm, x);
  return fm.L2[c] + fm_occ(fm, k, c);
}

// bwt_sa(k): text position via inverse-Psi walk to the nearest sampled row
// (geometric(1/sa_intv) steps; reference bwt.c:101-123 + bwt_search.cpp:128)
static int64_t fm_sa(const FMTables& fm, int64_t k) {
  int64_t mask = fm.sa_intv - 1, add = 0;
  while (k & mask) {
    add++;
    k = fm_inv_psi(fm, k);
  }
  return add + fm.sa_samples[k / fm.sa_intv];
}

// BWT_Search maximal extension of enc[start:stop); appends one RawSeed per
// occurrence (SA-row order, like the reference's resolution loop) iff the
// extension qualifies (len >= min_seed, freq <= OCC_Thr).  Returns the
// extension length; *emitted reports qualification.
static int fm_search(const FMTables& fm, int min_seed, const int8_t* enc,
                     int start, int stop, std::vector<RawSeed>& out,
                     bool* emitted) {
  int p = enc[start];
  int64_t x0 = fm.L2[p] + 1;
  int64_t x1 = fm.L2[3 - p] + 1;
  int64_t x2 = fm.L2[p + 1] - fm.L2[p];
  int pos = start + 1;
  int64_t tk[4], tl[4];
  while (pos < stop) {
    if (enc[pos] > 3) break;
    fm_occ4(fm, x1 - 1, tk);
    fm_occ4(fm, x1 - 1 + x2, tl);
    int i = 3 - enc[pos];
    int64_t n_x2 = tl[i] - tk[i];
    if (n_x2 == 0) break;
    // ok_x0[i] = x0 + primary-straddle + sum of complement-interval sizes
    // of codes > i (fm_ref.py::search's stacked sums, evaluated directly)
    int64_t s = x0 + ((x1 <= fm.primary && x1 + x2 - 1 >= fm.primary) ? 1 : 0);
    for (int c = 3; c > i; c--) s += tl[c] - tk[c];
    x0 = s;
    x1 = fm.L2[i] + 1 + tk[i];
    x2 = n_x2;
    pos++;
  }
  int length = pos - start;
  bool ok = length >= min_seed && x2 <= SEED_OCC_THR;
  if (ok)
    for (int64_t o = 0; o < x2; o++)
      out.push_back({start, length, fm_sa(fm, x0 + o)});
  if (emitted) *emitted = ok && x2 > 0;
  return length;
}

// IdentifySeedPairs_FastMode over the FM index (fm_ref.py::
// identify_seed_pairs_fast; reference src/AlignmentCandidates.cpp:49-80)
static void seed_read_fm_fast(const Ctx& ctx, const uint8_t* seq, int rlen,
                              std::vector<RawSeed>& out) {
  out.clear();
  thread_local std::vector<int8_t> enc;
  enc.resize(rlen);
  encode_bulk(seq, enc.data(), rlen);
  int end_pos = rlen - ctx.min_seed_len, pos = 0;
  while (pos < end_pos) {
    if (enc[pos] > 3) {
      pos++;
      continue;
    }
    int len = fm_search(ctx.fm, ctx.min_seed_len, enc.data(), pos, rlen, out,
                        nullptr);
    pos += len + 1;
  }
}

// IdentifySeedPairs_SensitiveMode over the FM index (mapper.py::
// _seed_sensitive_flat; reference src/AlignmentCandidates.cpp:132-169)
static void seed_read_fm_sensitive(const Ctx& ctx, const uint8_t* seq, int rlen,
                                   std::vector<RawSeed>& out) {
  out.clear();
  thread_local std::vector<int8_t> enc;
  enc.resize(rlen);
  encode_bulk(seq, enc.data(), rlen);
  int min_seed = ctx.min_seed_len;
  int pos = 0, stop_pos = 30, end_pos = rlen - min_seed;
  while (pos < end_pos) {
    if (enc[pos] > 3) {
      pos++;
      stop_pos++;
      continue;
    }
    bool emitted = false;
    int len = fm_search(ctx.fm, min_seed, enc.data(), pos,
                        std::min(stop_pos, rlen), out, &emitted);
    if (emitted) {
      pos += len;
      stop_pos += len;
    } else {
      pos += min_seed;
      stop_pos += min_seed;
    }
    if (stop_pos > rlen) stop_pos = rlen;
  }
}

// ---------------------------------------------------------------------------
// Software-pipelined FastMode seeding: W independent per-read restart
// machines advance round-robin through explicit stages, so each machine's
// table / suffix-array / text cache misses overlap the other machines'
// compute (the per-restart dependency chain table_lo[km] -> sa_full[row] ->
// text[loc] is ~3 serial memory latencies otherwise).  Seed streams per
// read are identical to seed_read_direct.
// ---------------------------------------------------------------------------

struct SeedMachine {
  enum Stage { KM, TBL, LOC, EXT, SUB, IDLE } stage = IDLE;
  const int8_t* enc = nullptr;
  int rlen = 0, pos = 0, end_pos = 0;
  int read_idx = -1;
  uint32_t km = 0;
  int amb_off = 0;
  int32_t lo = 0, hi = 0;
};

static const int SEED_PIPE_W = 32;

static void seed_reads_direct_batch(const Ctx& ctx, const int8_t* enc_arena,
                                    const int64_t* enc_off, int n_reads,
                                    std::vector<std::vector<RawSeed>>& out) {
  const SeedTables& st = ctx.seed_tables;
  const int8_t* text = st.ref_codes.data();
  int64_t last_valid = st.seq_len - SEED_K;
  int min_seed = ctx.min_seed_len;

  SeedMachine mach[SEED_PIPE_W];
  thread_local std::vector<int64_t> max_locs;
  int next_read = 0;
  int live = 0;

  auto refill = [&](SeedMachine& m) {
    while (next_read < n_reads) {
      int i = next_read++;
      int rlen = (int)(enc_off[i + 1] - enc_off[i]);
      if (rlen - min_seed <= 0) continue;  // no restarts possible
      m.enc = enc_arena + enc_off[i];
      m.rlen = rlen;
      m.pos = 0;
      m.end_pos = rlen - min_seed;
      m.read_idx = i;
      m.stage = SeedMachine::KM;
      live++;
      return;
    }
    m.stage = SeedMachine::IDLE;
  };

  auto prefetch_bitmaps = [&](uint32_t km) {
    for (size_t bi = 0; bi < st.bitmap_ks.size(); bi++) {
      uint32_t idx = km >> (2 * (SEED_K - st.bitmap_ks[bi]));
      __builtin_prefetch(&st.bitmaps[bi][idx >> 5], 0, 1);
    }
  };

  for (int w = 0; w < SEED_PIPE_W && next_read < n_reads; w++) refill(mach[w]);

  while (live > 0) {
    for (int w = 0; w < SEED_PIPE_W; w++) {
      SeedMachine& m = mach[w];
      switch (m.stage) {
        case SeedMachine::IDLE:
          break;
        case SeedMachine::KM: {
          while (m.pos < m.end_pos && m.enc[m.pos] > 3) m.pos++;
          if (m.pos >= m.end_pos) {
            live--;  // retire; refill() re-increments on success
            refill(m);
            break;
          }
          uint32_t km = 0;
          int amb_off = SEED_K + 1;
          if (!km13_fast(m.enc + m.pos, km)) {
            km = 0;
            for (int i = 0; i < SEED_K; i++) {
              int8_t c = (m.pos + i < m.rlen) ? m.enc[m.pos + i] : (int8_t)4;
              if (c > 3) {
                if (amb_off > SEED_K) amb_off = i;
                km <<= 2;
              } else
                km = (km << 2) | (uint32_t)c;
            }
          }
          m.km = km;
          m.amb_off = amb_off;
          if (amb_off > SEED_K) {
            __builtin_prefetch(&st.table_lo[km], 0, 1);
            __builtin_prefetch(&st.table_lo[km + 1], 0, 1);
            m.stage = SeedMachine::TBL;
          } else {
            prefetch_bitmaps(km);
            m.stage = SeedMachine::SUB;
          }
          break;
        }
        case SeedMachine::TBL: {
          m.lo = st.table_lo[m.km];
          m.hi = st.table_lo[m.km + 1];
          if (m.lo == m.hi) {
            prefetch_bitmaps(m.km);
            m.stage = SeedMachine::SUB;
            break;
          }
          int cnt = m.hi - m.lo;
          int pf = cnt < 64 ? cnt : 64;
          for (int r = 0; r < pf; r += 16)
            __builtin_prefetch(&st.sa_full[m.lo + r], 0, 1);
          m.stage = SeedMachine::LOC;
          break;
        }
        case SeedMachine::LOC: {
          int cnt = m.hi - m.lo;
          int pf = cnt < 16 ? cnt : 16;
          for (int r = 0; r < pf; r++) {
            int64_t loc = st.sa_full[m.lo + r];
            if (loc <= last_valid) __builtin_prefetch(&text[loc + SEED_K], 0, 1);
          }
          m.stage = SeedMachine::EXT;
          break;
        }
        case SeedMachine::EXT: {
          int best = -1;
          int64_t freq = 0;
          max_locs.clear();
          if (m.hi - m.lo > EXT_BIN_THR && !km_is_bogus(st, m.km)) {
            // big (repeat-family) interval: binary block search, 3 log(cnt)
            // compares instead of cnt
            int ebest;
            int32_t blo, bhi;
            ext_interval_bin(st, m.enc + m.pos + SEED_K,
                             (m.rlen - m.pos) - SEED_K, text, m.lo, m.hi,
                             st.seq_len, ebest, blo, bhi);
            best = SEED_K + ebest;
            freq = bhi - blo;
            if (freq <= SEED_OCC_THR)
              for (int32_t row = blo; row < bhi; row++)
                max_locs.push_back(st.sa_full[row]);
          } else {
            for (int32_t row = m.lo; row < m.hi; row++) {
              // stream-prefetch the extension point 8 rows ahead (sa_full
              // itself is sequential)
              if (row + 8 < m.hi) {
                int64_t nloc = st.sa_full[row + 8];
                if (nloc <= last_valid) __builtin_prefetch(&text[nloc + SEED_K], 0, 1);
              }
              int64_t loc = st.sa_full[row];
              if (loc > last_valid) continue;
              int maxl = m.rlen - m.pos;
              if (loc + maxl > st.seq_len) maxl = (int)(st.seq_len - loc);
              // every row in the interval starts with the same 13-mer as the
              // read window (table construction + amb_off>13), so compare
              // from offset SEED_K; maxl >= SEED_K always (see last_valid)
              int l = SEED_K + lcp_bytes(m.enc + m.pos + SEED_K, text + loc + SEED_K,
                                         maxl - SEED_K);
              if (l > best) {
                best = l;
                max_locs.clear();
                max_locs.push_back(loc);
              } else if (l == best)
                max_locs.push_back(loc);
            }
            freq = (int64_t)max_locs.size();
          }
          if (best >= SEED_K) {
            if (best >= min_seed && freq <= SEED_OCC_THR) {
              auto& dst = out[m.read_idx];
              for (int64_t loc : max_locs)
                dst.push_back({m.pos, best, loc});
            }
            m.pos += best + 1;
            m.stage = SeedMachine::KM;
          } else {
            prefetch_bitmaps(m.km);
            m.stage = SeedMachine::SUB;
          }
          break;
        }
        case SeedMachine::SUB: {
          int sub_len = 0;
          for (size_t bi = 0; bi < st.bitmap_ks.size(); bi++) {
            int k = st.bitmap_ks[bi];
            if (m.amb_off >= k &&
                bitmap_has(st.bitmaps[bi], m.km >> (2 * (SEED_K - k)))) {
              sub_len = k;
              break;
            }
          }
          m.pos += sub_len + 1;
          m.stage = SeedMachine::KM;
          break;
        }
      }
    }
  }
}

// std::map::lower_bound equivalent over the sorted boundary keys
static inline int chr_lower_bound(const Ctx& c, int64_t g) {
  return (int)(std::lower_bound(c.chr_keys.begin(), c.chr_keys.end(), g) -
               c.chr_keys.begin());
}

// -d debug mode (reference: bDebugMode, active printfs only).  Process-wide
// like the reference's global; -d also forces one thread so there is no
// interleaving concern.
static bool g_debug = false;


// ---------------------------------------------------------------------------
// Core structs (mirror pipeline/candidates.py)
// ---------------------------------------------------------------------------

struct Seed {
  bool simple;
  int32_t rpos;
  int64_t gpos;
  int32_t rlen;
  int32_t glen;
  int64_t posdiff;
};

struct Cand {
  int32_t score = 0;
  int64_t posdiff = 0;
  int32_t paired_idx = -1;
  std::vector<Seed> seeds;
};

struct Coord {
  bool bdir = true;
  std::string cigar;
  int64_t gpos = 0;
  int32_t chrom_idx = 0;
};

struct Report {
  int32_t aln_score = 0;
  int32_t sam_flag = 0;
  int32_t paired_idx = -1;
  Coord coor;
};

struct ReadState {
  const char* header;
  int32_t header_len;
  const uint8_t* seq;
  const uint8_t* qual;  // may be null
  int32_t rlen;
  int32_t qual_len = 0;  // min(quality line len, rlen) — reference strncpy
  int32_t mapq = 0, score = 0, sub_score = 0, can_num = 0, best_idx = 0;
  std::vector<Report> reports;
};

using Cigar = std::vector<std::pair<int, char>>;

// ---------------------------------------------------------------------------
// -d verbose dumps (reference: tools.cpp:106-140 ShowSeedInfo /
// ShowSeedLocationInfo / ShowAlignmentCandidateInfo; byte-identical formats)
// ---------------------------------------------------------------------------

static void show_seed_info(const std::vector<Seed>& v) {
  for (size_t k = 0; k < v.size(); k++) {
    const Seed& s = v[k];
    if (s.rlen > 0 || s.glen > 0)
      printf("\t\tseed#%d: R[%d-%d]=%d G[%lld-%lld]=%d Diff=%lld %s\n",
             (int)(k + 1), s.rpos, s.rpos + s.rlen - 1, s.rlen, (long long)s.gpos,
             (long long)(s.gpos + s.glen - 1), s.glen, (long long)s.posdiff,
             (s.simple ? "Simple" : "Normal"));
  }
  printf("\n\n");
  fflush(stdout);
}

static void show_seed_location_info(const Ctx& c, int64_t pos) {
  int lb = chr_lower_bound(c, pos);
  int chr = lb < (int)c.chr_vals.size() ? (int)c.chr_vals[lb] : 0;
  int64_t gpos;
  if (pos < c.genome_size)
    gpos = pos - c.fwd_loc[chr];
  else
    gpos = (lb < (int)c.chr_keys.size() ? c.chr_keys[lb] : 0) - pos;
  printf("\t\tChr [%s, %lld]\n", c.chrom_names[chr].c_str(), (long long)gpos);
}

static void show_alignment_candidate_info(const Ctx& c, bool first,
                                          const char* header, int header_len,
                                          const std::vector<Cand>& cands) {
  std::string line(100, '-');
  printf("\n%s\n", line.c_str());
  printf("Alignment Candidate for read_%d: %.*s\n", first ? 1 : 2, header_len,
         header);
  for (size_t i = 0; i < cands.size(); i++) {
    if (cands[i].score == 0) continue;
    printf("\tcandidate#%d: Score=%d\n", (int)(i + 1), cands[i].score);
    show_seed_location_info(c, cands[i].posdiff);
    show_seed_info(cands[i].seeds);
  }
  printf("%s\n\n", line.c_str());
  fflush(stdout);
}

// ---------------------------------------------------------------------------
// Candidate generation (pipeline/candidates.py)
// ---------------------------------------------------------------------------

// Per-thread pool of seed buffers: Cand vectors are cleared per read, but
// their seeds' heap blocks are recycled here instead of freed.
static thread_local std::vector<std::vector<Seed>> g_seedbuf_pool;

static inline std::vector<Seed> take_seedbuf() {
  if (!g_seedbuf_pool.empty()) {
    std::vector<Seed> b = std::move(g_seedbuf_pool.back());
    g_seedbuf_pool.pop_back();
    b.clear();
    return b;
  }
  return {};
}

static inline void recycle_cands(std::vector<Cand>& v) {
  for (auto& c : v)
    if (c.seeds.capacity()) g_seedbuf_pool.push_back(std::move(c.seeds));
  v.clear();
}

static void gen_candidates_illumina(const Ctx& c, int rlen, std::vector<Seed>& seeds,
                                    std::vector<Cand>& out) {
  int thr = (int)(rlen * 0.2);
  if (thr > 50) thr = 50;
  int num = (int)seeds.size();
  int i = 0;
  while (i < num && seeds[i].posdiff < 0) i++;
  while (i < num) {
    int score = seeds[i].rlen;
    int lb = chr_lower_bound(c, seeds[i].gpos);
    int64_t gpos_end = lb < (int)c.chr_keys.size() ? c.chr_keys[lb] : (int64_t)1 << 62;
    int j = i, k = i + 1;
    for (; k < num; k++) {
      if (seeds[k].gpos > gpos_end || (seeds[k].posdiff - seeds[j].posdiff) > c.max_gaps)
        break;
      score += seeds[k].rlen;
      j = k;
    }
    if (score > thr) {
      out.emplace_back();
      Cand& cand = out.back();
      cand.score = score;
      cand.seeds = take_seedbuf();
      cand.seeds.assign(seeds.begin() + i, seeds.begin() + k);
      if (score - 50 > thr) thr = score - 50;
      cand.posdiff = cand.seeds[0].posdiff;
      if (cand.posdiff < 0) cand.posdiff = 0;
      std::sort(cand.seeds.begin(), cand.seeds.end(), [](const Seed& a, const Seed& b) {
        return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
      });
    }
    i = k;
  }
}

static void gen_candidates_pacbio(int rlen, std::vector<Seed>& seeds,
                                  std::vector<Cand>& out) {
  (void)rlen;
  int num = (int)seeds.size();
  if (num == 0) return;
  int thr = 0;
  std::vector<char> taken(num, 0);
  int start = 0;
  while (start < num && seeds[start].posdiff < 0) start++;
  for (int i = start; i < num; i++) {
    if (taken[i]) continue;
    int score = seeds[i].rlen;
    taken[i] = 1;
    std::vector<Seed> sel = take_seedbuf();
    sel.push_back(seeds[i]);
    int j = i;
    for (int k = i + 1; k < num; k++) {
      if (taken[k]) continue;
      if (std::llabs(seeds[k].posdiff - seeds[j].posdiff) < 300) {
        if (seeds[k].rpos > seeds[j].rpos) {
          score += seeds[k].rlen;
          sel.push_back(seeds[k]);
          taken[k] = 1;
          j = k;
        }
      } else if (seeds[k].gpos - seeds[j].gpos > 1000)
        break;
    }
    if (score >= thr) {
      thr = score;
      out.emplace_back();
      Cand& cand = out.back();
      cand.score = score;
      cand.posdiff = seeds[i].posdiff < 0 ? 0 : seeds[i].posdiff;
      cand.seeds = std::move(sel);
    }
  }
}

static void remove_redundant(std::vector<Cand>& v, bool pacbio) {
  if (v.size() <= 1) return;
  int s1 = 0, s2 = 0;
  for (auto& c : v) {
    if (c.score > s2) {
      if (c.score >= s1) {
        s2 = s1;
        s1 = c.score;
      } else
        s2 = c.score;
    }
  }
  int thr = (pacbio || s1 == s2 || s1 - s2 > 20) ? s1 : s2;
  for (auto& c : v)
    if (c.score < thr) c.score = 0;
}

// ---------------------------------------------------------------------------
// Divide step: filters + normal-pair synthesis (pipeline/candidates.py)
// ---------------------------------------------------------------------------

static void remove_null_seeds(std::vector<Seed>& v) {
  v.erase(std::remove_if(v.begin(), v.end(), [](const Seed& s) { return s.rlen == 0; }),
          v.end());
}

static void remove_tandem_repeats(std::vector<Seed>& v) {
  int num = (int)v.size();
  if (num < 2) return;
  std::vector<int> order(num);
  for (int i = 0; i < num; i++) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return v[a].rpos < v[b].rpos; });
  bool found = false;
  int i = 0;
  while (i < num) {
    int j = i + 1;
    while (j < num && v[order[j]].rpos == v[order[i]].rpos) j++;
    if (j - i > 1) {
      found = true;
      for (int k = i; k < j; k++) v[order[k]].rlen = v[order[k]].glen = 0;
    }
    i = j;
  }
  if (found) remove_null_seeds(v);
}

static void remove_translocated(std::vector<Seed>& v) {
  int num = (int)v.size();
  if (num < 2) return;
  std::vector<std::pair<int32_t, int>> vec(num);
  for (int i = 0; i < num; i++) vec[i] = {v[i].rpos, i};
  std::sort(vec.begin(), vec.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  bool found = false;
  for (int i = 0; i < num; i++) {
    if (vec[i].first != v[i].rpos) {
      found = true;
      int max_idx = vec[i].second;
      for (int jj = i + 1; jj <= max_idx; jj++)
        if (vec[jj].second > max_idx) max_idx = vec[jj].second;
      int j = max_idx;
      int s1 = 0, s2 = 0;
      for (int k = i; k <= j; k++) {
        if (k < vec[k].second)
          s1 += v[vec[k].second].rlen;
        else
          s2 += v[vec[k].second].rlen;
      }
      if (s1 > s2) {
        for (int k = i; k <= j; k++)
          if (k > vec[k].second) v[vec[k].second].rlen = v[vec[k].second].glen = 0;
      } else {
        for (int k = i; k <= j; k++)
          if (k < vec[k].second) v[vec[k].second].rlen = v[vec[k].second].glen = 0;
      }
      i = j;
    }
  }
  if (found) remove_null_seeds(v);
}

static bool check_seed_overlapping(Seed& p1, Seed& p2) {
  bool master = true;
  int32_t overlap = p1.rpos + p1.rlen - p2.rpos;
  if (overlap > 0) {
    if (p1.rlen < p2.rlen) {
      master = false;
      if (p1.rlen > overlap) {
        p1.rlen -= overlap;
        p1.glen = p1.rlen;
      } else
        p1.rlen = p1.glen = 0;
    } else {
      if (p2.rlen > overlap) {
        p2.rpos += overlap;
        p2.gpos += overlap;
        p2.rlen -= overlap;
        p2.glen = p2.rlen;
      } else
        p2.rlen = p2.glen = 0;
    }
  }
  if (p1.rlen > 0 && p2.rlen > 0) {
    int64_t overlap_g = p1.gpos + p1.glen - p2.gpos;
    if (overlap_g > 0) {
      if (p1.glen < p2.glen) {
        master = false;
        if (p1.rlen > overlap_g) {
          p1.rlen -= (int32_t)overlap_g;
          p1.glen = p1.rlen;
        } else
          p1.rlen = p1.glen = 0;
      } else {
        if (p2.rlen > overlap_g) {
          p2.rpos += (int32_t)overlap_g;
          p2.gpos += overlap_g;
          p2.rlen -= (int32_t)overlap_g;
          p2.glen = p2.rlen;
        } else
          p2.rlen = p2.glen = 0;
      }
    }
  }
  return master;
}

static void check_overlapping_seeds(std::vector<Seed>& v) {
  int num = (int)v.size();
  if (num < 2) return;
  bool null_seed = false;
  int i = 0;
  while (i < num) {
    if (v[i].rlen > 0) {
      int32_t r_end = v[i].rpos + v[i].rlen - 1;
      int64_t g_end = v[i].gpos + v[i].glen - 1;
      for (int j = i + 1; j < num; j++) {
        if (v[j].rlen == 0) continue;
        if (r_end < v[j].rpos && g_end < v[j].gpos) break;
        if (!check_seed_overlapping(v[i], v[j])) break;
      }
      if (v[i].rlen == 0) {
        null_seed = true;
        i -= 1;
        while (i > 0 && v[i].rlen == 0) i--;
        if (i < 0) i = 0;
      } else
        i++;
    } else {
      null_seed = true;
      i++;
    }
  }
  if (null_seed) remove_null_seeds(v);
}

static void identify_normal_pairs(int rlen, int glen, std::vector<Seed>& seeds) {
  // The reference's tail filler never assigns SeedPair.PosDiff
  // (AlignmentCandidates.cpp:479-487), so it reuses the local's last value:
  // the head filler's or the last gap filler's PosDiff written earlier in
  // the SAME call, or stack garbage when no filler preceded.  Replicate the
  // deterministic carry; INT64_MIN stands in for the garbage case (the value
  // is dead downstream — only -d ShowSeedInfo prints it, and the golden
  // debug test masks the garbage case).
  int64_t pd_carry = INT64_MIN;
  if (seeds.size() > 1) {
    remove_tandem_repeats(seeds);
    remove_translocated(seeds);
    check_overlapping_seeds(seeds);
    int num = (int)seeds.size();
    thread_local std::vector<Seed> added;
    added.clear();
    for (int i = 0; i + 1 < num; i++) {
      int j = i + 1;
      int32_t r_gaps = seeds[j].rpos - (seeds[i].rpos + seeds[i].rlen);
      if (r_gaps < 0) r_gaps = 0;
      int64_t g_gaps = seeds[j].gpos - (seeds[i].gpos + seeds[i].glen);
      if (g_gaps < 0) g_gaps = 0;
      if (r_gaps > 0 || g_gaps > 0) {
        int32_t rp = seeds[i].rpos + seeds[i].rlen;
        int64_t gp = seeds[i].gpos + seeds[i].glen;
        added.push_back({false, rp, gp, r_gaps, (int32_t)g_gaps, gp - rp});
        pd_carry = gp - rp;
      }
    }
    if (!added.empty()) {
      // stable merge by (gpos, rpos), equal keys keep originals first —
      // the reference's inplace_merge with CompByGenomePos
      // (AlignmentCandidates.cpp:449).  Both runs are normally already
      // sorted (candidates are gpos-sorted at clustering, fillers are
      // emitted left-to-right), so a linear merge into per-thread scratch
      // replaces stable_sort's per-call temp-buffer allocation.
      auto cmp = [](const Seed& a, const Seed& b) {
        return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
      };
      if (std::is_sorted(seeds.begin(), seeds.end(), cmp) &&
          std::is_sorted(added.begin(), added.end(), cmp)) {
        thread_local std::vector<Seed> merged;
        merged.clear();
        merged.reserve(seeds.size() + added.size());
        std::merge(seeds.begin(), seeds.end(), added.begin(), added.end(),
                   std::back_inserter(merged), cmp);
        seeds.swap(merged);
      } else {
        seeds.insert(seeds.end(), added.begin(), added.end());
        std::stable_sort(seeds.begin(), seeds.end(), cmp);
      }
    }
  }
  if (!seeds.empty()) {
    const Seed& s0 = seeds.front();
    int32_t r_gaps = s0.rpos > 0 ? s0.rpos : 0;
    int64_t g_gaps = glen > 0 ? s0.gpos : (int64_t)r_gaps;
    if (r_gaps > 0 || g_gaps > 0) {
      int64_t gp = s0.gpos - g_gaps;
      if (gp < 0) gp = 0;  // gGaps unchanged (reference no-op, see python spec)
      seeds.insert(seeds.begin(), {false, 0, gp, r_gaps, (int32_t)g_gaps, gp});
      pd_carry = gp;
    }
    const Seed& sl = seeds.back();
    r_gaps = rlen - (sl.rpos + sl.rlen);
    int64_t g_gaps2 = glen > 0 ? (int64_t)glen - (sl.gpos + sl.glen) : (int64_t)r_gaps;
    if (r_gaps > 0 || g_gaps2 > 0) {
      int32_t rp = sl.rpos + sl.rlen;
      int64_t gp = sl.gpos + sl.glen;
      seeds.push_back({false, rp, gp, r_gaps, (int32_t)g_gaps2, pd_carry});
    }
  }
}

// ---------------------------------------------------------------------------
// Needleman-Wunsch (pipeline/conquer.py / reference nw_alignment.cpp)
// ---------------------------------------------------------------------------

// Integer DP with the reference's float semantics: every score the float
// recurrence can produce is a multiple of 0.5 (match +1.5 / mismatch -1.5 /
// NEW_GAP -1.5 / EXTEND_GAP -0.5 / OPEN_GAP -1, nw_alignment.cpp:3-6), so
// doubling maps them to exactly-represented int32s and every max() and
// backtrace equality compares identically — bit-identical CIGARs.  The DP
// keeps ROLLING value rows and stores only a 2-bit DECISION plane
// (S==R, S==T) for the backtrace: 1 byte/cell of memory traffic instead
// of three 4-byte planes.  (The conquer stage was ~95% NW at ~20 ns/cell;
// r5 KART_PROF.)
static const int32_t I_MAX_PENALTY = -131072;  // 2 * -65536
static const int32_t I_OPEN_GAP = -2;
static const int32_t I_EXTEND_GAP = -1;
static const int32_t I_NEW_GAP = -3;

static inline int32_t imax2(int32_t x, int32_t y) { return x > y ? x : y; }

#if defined(__AVX2__)
// Anti-diagonal AVX2 int16 NW: cells on diagonal d = i + j depend only on
// diagonals d-1 and d-2, so 16 cells compute per vector with the same
// integer semantics as the scalar DP (scores are small: fragments are
// <= ~600 bp after the conquer recursion, so |score| < 2000 and the
// int16 MAX_PENALTY sentinel of -20000 can never equal a real value).
// Decision bits store in diagonal-major layout; the backtrace re-indexes
// by (i+j, i).  Returns false when the problem shape prefers scalar.
static const int16_t D_MAX_PENALTY = -20000;

static bool nw_alignment_diag(std::string& s1, std::string& s2) {
  int m = (int)s1.size() + 1, n = (int)s2.size() + 1;
  if (m < 8 || n < 8) return false;  // vector overhead beats tiny DPs
  if ((int64_t)(m - 1) * 3 + (n - 1) * 3 > 15000) return false;  // int16 margin
  int nd = m + n - 1;  // diagonals 0..m+n-2
  thread_local std::vector<int16_t> sd0, sd1, sd2, rd0, rd1, td0, td1;
  thread_local std::vector<uint8_t> decd, c1v, c2r;
  thread_local std::vector<int32_t> off;
  int md = m + 17;  // i-indexed diagonal arrays + vector-tail padding
  if ((int)sd0.size() < md) {
    sd0.resize(md); sd1.resize(md); sd2.resize(md);
    rd0.resize(md); rd1.resize(md); td0.resize(md); td1.resize(md);
  }
  if ((int)off.size() < nd + 1) off.resize(nd + 1);
  if ((int)c1v.size() < m + 16) c1v.resize(m + 16);
  if ((int)c2r.size() < n + m + 32) c2r.resize(n + m + 32);
  for (int i = 1; i < m; i++) c1v[i] = NT4[(uint8_t)s1[i - 1]];
  // c2 reversed with an i-aligned window: sub at (i, d-i) compares
  // c1v[i] vs c2 code at j-1 = d-i-1; lay out c2r so c2r[base_d + i]
  // equals it: c2r[(n - 1 - d) + m + i] = code(d - i - 1)
  // => c2r[m + n - 1 - 1 - (j-1) ... ] i.e. c2r[m + n - 2 - k] = code(k)
  for (int k = 0; k < n - 1; k++) c2r[m + n - 2 - k] = NT4[(uint8_t)s2[k]];
  // (indices m+n-2-k for k in [0, n-1) lie within [m, m+n-2]; slots below
  // m are read only via the masked/garbage vector tails)
  off[0] = 0;
  for (int d = 0; d < nd; d++) {
    int ilo = d - (n - 1) > 0 ? d - (n - 1) : 0;
    int ihi = d < m - 1 ? d : m - 1;
    off[d + 1] = off[d] + (ihi - ilo + 1);
  }
  // +32: the last diagonal's vector tail writes past its slot (earlier
  // diagonals' tails land in later slots that are overwritten in order)
  if (decd.size() < (size_t)off[nd] + 32) decd.resize(off[nd] + 32);

  int16_t* Sd = sd0.data(); int16_t* Sd1 = sd1.data(); int16_t* Sd2 = sd2.data();
  int16_t* Rd = rd0.data(); int16_t* Rd1 = rd1.data();
  int16_t* Td = td0.data(); int16_t* Td1 = td1.data();
  // d = 0: cell (0,0)
  Sd1[0] = 0; Rd1[0] = 0; Td1[0] = 0;  // R/T at (0,0) unused by interior
  decd[0] = 1;
  // d = 1: borders (0,1) and (1,0)
  Sd[0] = (int16_t)(I_OPEN_GAP + I_EXTEND_GAP); Rd[0] = Sd[0]; Td[0] = D_MAX_PENALTY;
  Sd[1] = Sd[0]; Td[1] = Sd[0]; Rd[1] = D_MAX_PENALTY;
  decd[off[1] + 0] = 1;  // (0,1): S==R
  decd[off[1] + 1] = 2;  // (1,0): S==T
  std::swap(Sd2, Sd1); std::swap(Sd1, Sd);
  std::swap(Rd1, Rd); std::swap(Td1, Td);
  const __m256i vE = _mm256_set1_epi16((int16_t)I_EXTEND_GAP);
  const __m256i vN = _mm256_set1_epi16((int16_t)I_NEW_GAP);
  const __m256i vMatch = _mm256_set1_epi16(3);
  const __m256i vMis = _mm256_set1_epi16(-3);
  for (int d = 2; d < nd; d++) {
    int ilo = d - (n - 1) > 0 ? d - (n - 1) : 0;
    int ihi = d < m - 1 ? d : m - 1;
    uint8_t* drow = decd.data() + off[d] - ilo;
    // interior cells: i in [max(1, ilo), min(d-1, ihi)]
    int a = ilo > 1 ? ilo : 1;
    int b = (d - 1 < ihi ? d - 1 : ihi);
    int c2base = (n - 1 - d) + m;  // c2r[c2base + i] == code of s2[d-i-1]
    for (int i = a; i <= b; i += 16) {
      __m256i sd1v = _mm256_loadu_si256((const __m256i*)(Sd1 + i));
      __m256i sd1m = _mm256_loadu_si256((const __m256i*)(Sd1 + i - 1));
      __m256i rd1v = _mm256_loadu_si256((const __m256i*)(Rd1 + i));
      __m256i td1m = _mm256_loadu_si256((const __m256i*)(Td1 + i - 1));
      __m256i sd2m = _mm256_loadu_si256((const __m256i*)(Sd2 + i - 1));
      __m256i rv = _mm256_max_epi16(_mm256_add_epi16(rd1v, vE),
                                    _mm256_add_epi16(sd1v, vN));
      __m256i tv = _mm256_max_epi16(_mm256_add_epi16(td1m, vE),
                                    _mm256_add_epi16(sd1m, vN));
      __m128i c1b = _mm_loadu_si128((const __m128i*)(c1v.data() + i));
      __m128i c2b = _mm_loadu_si128((const __m128i*)(c2r.data() + c2base + i));
      __m256i eq16 = _mm256_cvtepi8_epi16(_mm_cmpeq_epi8(c1b, c2b));
      __m256i sub = _mm256_blendv_epi8(vMis, vMatch, eq16);
      __m256i sv = _mm256_max_epi16(_mm256_max_epi16(_mm256_add_epi16(sd2m, sub), rv), tv);
      _mm256_storeu_si256((__m256i*)(Rd + i), rv);
      _mm256_storeu_si256((__m256i*)(Td + i), tv);
      _mm256_storeu_si256((__m256i*)(Sd + i), sv);
      __m256i eqr = _mm256_and_si256(_mm256_cmpeq_epi16(sv, rv), _mm256_set1_epi16(1));
      __m256i eqt = _mm256_and_si256(_mm256_cmpeq_epi16(sv, tv), _mm256_set1_epi16(2));
      __m256i bits = _mm256_or_si256(eqr, eqt);
      __m256i packed = _mm256_packus_epi16(bits, bits);  // per-128 lanes
      __m256i perm = _mm256_permute4x64_epi64(packed, 0x08);
      _mm_storeu_si128((__m128i*)(drow + i), _mm256_castsi256_si128(perm));
    }
    // border cells overwrite any vector-tail garbage
    if (ilo == 0) {  // (0, d): top row
      int16_t v = (int16_t)(I_OPEN_GAP + d * I_EXTEND_GAP);
      Sd[0] = v; Rd[0] = v; Td[0] = D_MAX_PENALTY;
      drow[0] = 1;
    }
    if (ihi == d) {  // (d, 0): left column
      int16_t v = (int16_t)(I_OPEN_GAP + d * I_EXTEND_GAP);
      Sd[d] = v; Td[d] = v; Rd[d] = D_MAX_PENALTY;
      drow[d] = 2;
    }
    // rotate: Sd2 <- Sd1 <- Sd; Rd1 <- Rd; Td1 <- Td
    int16_t* tmp = Sd2; Sd2 = Sd1; Sd1 = Sd; Sd = tmp;
    tmp = Rd1; Rd1 = Rd; Rd = tmp;
    tmp = Td1; Td1 = Td; Td = tmp;
  }
  // backtrace from the diagonal-major decision plane
  thread_local std::string o1, o2;
  o1.clear(); o2.clear();
  int i = m - 1, j = n - 1;
  while (i > 0 || j > 0) {
    int d = i + j;
    int ilo = d - (n - 1) > 0 ? d - (n - 1) : 0;
    uint8_t dc = decd[off[d] + (i - ilo)];
    if (dc & 1) {
      o1.push_back('-'); o2.push_back(s2[j - 1]); j--;
    } else if (dc & 2) {
      o1.push_back(s1[i - 1]); o2.push_back('-'); i--;
    } else {
      o1.push_back(s1[i - 1]); o2.push_back(s2[j - 1]); i--; j--;
    }
  }
  s1.assign(o1.rbegin(), o1.rend());
  s2.assign(o2.rbegin(), o2.rend());
  return true;
}
#else
static bool nw_alignment_diag(std::string&, std::string&) { return false; }
#endif

static void nw_alignment_scalar(std::string& s1, std::string& s2) {
  int m = (int)s1.size() + 1, n = (int)s2.size() + 1;
  // rolling rows + decision plane are per-thread scratch: fragments are
  // ~20 bp on average and nw runs for every gapped fragment, so per-call
  // heap traffic dominated the conquer stage
  thread_local std::vector<int32_t> srow_a, srow_b, trow_a, trow_b;
  thread_local std::vector<uint8_t> dec;  // bit0: S==R, bit1: S==T
  thread_local std::vector<uint8_t> c2v;
  if ((int)srow_a.size() < n) {
    srow_a.resize(n);
    srow_b.resize(n);
    trow_a.resize(n);
    trow_b.resize(n);
  }
  if (dec.size() < (size_t)m * n) dec.resize((size_t)m * n);
  if ((int)c2v.size() < n) c2v.resize(n);
  for (int j = 1; j < n; j++) c2v[j] = NT4[(uint8_t)s2[j - 1]];

  int32_t* sprev = srow_a.data();
  int32_t* scur = srow_b.data();
  int32_t* tprev = trow_a.data();
  int32_t* tcur = trow_b.data();
  // row 0: S == R everywhere (T is MAX_PENALTY)
  sprev[0] = 0;
  tprev[0] = 0;
  dec[0] = 1;
  for (int j = 1; j < n; j++) {
    sprev[j] = I_OPEN_GAP + j * I_EXTEND_GAP;
    tprev[j] = I_MAX_PENALTY;
    dec[j] = 1;  // S(0,j) == R(0,j)
  }
  for (int i = 1; i < m; i++) {
    uint8_t c1 = NT4[(uint8_t)s1[i - 1]];
    int32_t sdiag = sprev[0];  // S(i-1, 0)
    int32_t s0 = I_OPEN_GAP + i * I_EXTEND_GAP;
    scur[0] = s0;  // S(i,0) == T(i,0); R(i,0) is MAX_PENALTY
    tcur[0] = s0;
    int32_t rprev = I_MAX_PENALTY;
    uint8_t* drow = dec.data() + (size_t)i * n;
    drow[0] = 2;
    for (int j = 1; j < n; j++) {
      int32_t rv = imax2(rprev + I_EXTEND_GAP, scur[j - 1] + I_NEW_GAP);
      int32_t tv = imax2(tprev[j] + I_EXTEND_GAP, sprev[j] + I_NEW_GAP);
      int32_t sub = (c1 == c2v[j]) ? 3 : -3;
      int32_t sv = imax2(imax2(sdiag + sub, rv), tv);
      sdiag = sprev[j];
      scur[j] = sv;
      tcur[j] = tv;
      rprev = rv;
      drow[j] = (uint8_t)((sv == rv) | ((sv == tv) << 1));
    }
    std::swap(sprev, scur);
    std::swap(tprev, tcur);
  }
  // backtrace from the decision plane: prefer r, then t
  // (nw_alignment.cpp:61-68)
  thread_local std::string o1, o2;
  o1.clear();
  o2.clear();
  int i = m - 1, j = n - 1;
  while (i > 0 || j > 0) {
    uint8_t d = dec[(size_t)i * n + j];
    if (d & 1) {
      o1.push_back('-');
      o2.push_back(s2[j - 1]);
      j--;
    } else if (d & 2) {
      o1.push_back(s1[i - 1]);
      o2.push_back('-');
      i--;
    } else {
      o1.push_back(s1[i - 1]);
      o2.push_back(s2[j - 1]);
      i--;
      j--;
    }
  }
  s1.assign(o1.rbegin(), o1.rend());
  s2.assign(o2.rbegin(), o2.rend());
}

static void nw_alignment(std::string& s1, std::string& s2) {
  int m = (int)s1.size() + 1, n = (int)s2.size() + 1;
  if (prof_on()) {
    g_prof.nw_calls++;
    g_prof.nw_cells += (int64_t)m * n;
  }
  if (m == 2 && n == 2) {
    // single-base fragments (the dominant case: a lone mismatch between two
    // exact seeds) always backtrace diagonally — S(1,1)=±1.5 strictly beats
    // both gap matrices (R(1,1)=T(1,1)=-3.0) — so the strings are returned
    // unchanged; skip the DP entirely (bit-exact with nw_alignment.cpp:18)
    return;
  }
  if (nw_alignment_diag(s1, s2)) return;
  nw_alignment_scalar(s1, s2);
}

// ---------------------------------------------------------------------------
// 8-mer repartition (pipeline/conquer.py / reference KmerAnalysis.cpp)
// ---------------------------------------------------------------------------

static const int KMER_SIZE = 8;
static const uint32_t KMER_POWER = 0x3FFF;

struct KmerItem {
  uint32_t wid;
  uint32_t pos;
};

static void create_kmer_vec(const char* seq, int len, std::vector<KmerItem>& vec) {
  vec.clear();
  int tail = 0, count = 0;
  while (count < KMER_SIZE && tail < len) {
    if (seq[tail] != 'N')
      count++;
    else
      count = 0;
    tail++;
  }
  if (count != KMER_SIZE) return;
  int head = tail - KMER_SIZE;
  uint32_t wid = 0;
  for (int q = head; q < head + KMER_SIZE; q++) wid = (wid << 2) + NT4[(uint8_t)seq[q]];
  vec.push_back({wid, (uint32_t)head});
  head++;
  while (tail < len) {
    if (seq[tail] != 'N') {
      wid = ((wid & KMER_POWER) << 2) + NT4[(uint8_t)seq[tail]];
      vec.push_back({wid, (uint32_t)head});
      head++;
      tail++;
    } else {
      count = 0;
      tail++;
      while (count < KMER_SIZE && tail < len) {
        if (seq[tail] != 'N')
          count++;
        else
          count = 0;
        tail++;
      }
      if (count == KMER_SIZE) {
        head = tail - KMER_SIZE;
        wid = 0;
        for (int q = head; q < head + KMER_SIZE; q++)
          wid = (wid << 2) + NT4[(uint8_t)seq[q]];
        vec.push_back({wid, (uint32_t)head});
        // reference's for-increment advances head AND tail after an
        // N-restart, skipping one char (KmerAnalysis.cpp:74,91-95)
        head++;
        tail++;
      } else
        break;
    }
  }
  std::sort(vec.begin(), vec.end(),
            [](const KmerItem& a, const KmerItem& b) { return a.wid < b.wid; });
}

struct KmerPair {
  int32_t posdiff;
  uint32_t rpos, gpos;
};

static void identify_common_kmers(int max_shift, const std::vector<KmerItem>& v1,
                                  const std::vector<KmerItem>& v2,
                                  std::vector<KmerPair>& out) {
  out.clear();
  for (const auto& it : v1) {
    auto p = std::lower_bound(
        v2.begin(), v2.end(), it,
        [](const KmerItem& a, const KmerItem& b) { return a.wid < b.wid; });
    while (p != v2.end() && p->wid == it.wid) {
      uint32_t g = p->pos, r = it.pos;
      if ((g >= r && g - r < (uint32_t)max_shift) || (g < r && r - g < (uint32_t)max_shift))
        out.push_back({(int32_t)(g - r), r, g});
      ++p;
    }
  }
  std::sort(out.begin(), out.end(), [](const KmerPair& a, const KmerPair& b) {
    return a.posdiff == b.posdiff ? a.rpos < b.rpos : a.posdiff < b.posdiff;
  });
}

static void simple_pairs_from_common_kmers(int min_seed_len,
                                           const std::vector<KmerPair>& pairs,
                                           std::vector<Seed>& out) {
  out.clear();
  int num = (int)pairs.size();
  int i = 0;
  while (i < num) {
    int32_t pd = pairs[i].posdiff;
    uint32_t n_pos = pairs[i].rpos + 1;
    int j = i + 1;
    while (j < num) {
      if (pairs[j].rpos != n_pos || pairs[j].posdiff != pd) break;
      n_pos++;
      j++;
    }
    int len = KMER_SIZE + (j - 1 - i);
    if (len >= min_seed_len)
      out.push_back({true, (int32_t)pairs[i].rpos, (int64_t)pairs[i].gpos, len, len, pd});
    i = j;
  }
}

static void simple_pairs_from_fragment_pair(int max_dist, const char* f1, int l1,
                                            const char* f2, int l2,
                                            std::vector<Seed>& out) {
  if (prof_on()) {
    g_prof.repart_calls++;
    g_prof.repart_bases += l1 + l2;
  }
  // per-thread scratch (consumed before any recursive re-entry)
  thread_local std::vector<KmerItem> v1, v2;
  create_kmer_vec(f1, l1, v1);
  create_kmer_vec(f2, l2, v2);
  thread_local std::vector<KmerPair> pairs;
  identify_common_kmers(max_dist, v1, v2, pairs);
  simple_pairs_from_common_kmers(8, pairs, out);
  std::sort(out.begin(), out.end(), [](const Seed& a, const Seed& b) {
    return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
  });
}

// ---------------------------------------------------------------------------
// Conquer (pipeline/conquer.py / reference tools.cpp)
// ---------------------------------------------------------------------------


static int add_new_cigar_elements(const std::string& a1, const std::string& a2,
                                  Cigar& cigar) {
  char state = '*';
  int c = 0, score = 0;
  for (size_t i = 0; i < a1.size(); i++) {
    char op;
    if (a1[i] == '-')
      op = 'D';
    else if (a2[i] == '-')
      op = 'I';
    else {
      if (a1[i] == a2[i]) score++;
      op = 'M';
    }
    if (op == state)
      c++;
    else {
      if (c > 0) cigar.push_back({c, state});
      c = 1;
      state = op;
    }
  }
  if (c > 0) cigar.push_back({c, state});
  return score;
}

static bool check_local_alignment_quality(const std::string& a1, const std::string& a2) {
  int aln_type = -1, n = 0, mis = 0, status = 0;
  for (size_t i = 0; i < a1.size(); i++) {
    if (a1[i] == '-') {
      if (aln_type != 0) {
        aln_type = 0;
        status++;
      }
    } else if (a2[i] == '-') {
      if (aln_type != 1) {
        aln_type = 1;
        status++;
      }
    } else {
      n++;
      if (a1[i] != a2[i]) mis++;
      if (aln_type != 2) {
        aln_type = 2;
        status++;
      }
    }
  }
  return !(status >= 4 || (mis >= 3 && mis >= (int)(n * 0.3)));
}

static void normal_pair_alignment(const Ctx& c, int rlen, std::string& frag1, int glen,
                                  std::string& frag2) {
  bool run_nw = true;
  if (rlen > 30 && glen > 30) {
    int max_shift;
    if (c.pacbio) {
      max_shift = rlen > glen ? (int)(rlen * 0.2) : (int)(glen * 0.2);
      if (max_shift > 50) max_shift = 50;
    } else
      max_shift = c.max_gaps;
    std::vector<Seed> parts;
    simple_pairs_from_fragment_pair(max_shift, frag1.c_str(), rlen, frag2.c_str(), glen,
                                    parts);
    if (!parts.empty()) identify_normal_pairs(rlen, glen, parts);
    if (!parts.empty()) {
      run_nw = false;
      if (g_debug) {  // tools.cpp:164
        printf("NormalPair Partition1: len1=%d len2=%d\n", rlen, glen);
        show_seed_info(parts);
      }
      std::string a1, a2;
      for (auto& p : parts) {
        if (p.rlen == 0 && p.glen == 0) continue;
        if (p.glen == 0) {
          a1.append(frag1, p.rpos, p.rlen);
          a2.append((size_t)p.rlen, '-');
        } else if (p.rlen == 0) {
          a1.append((size_t)p.glen, '-');
          a2.append(frag2, (size_t)p.gpos, p.glen);
        } else if (p.rlen == 1 && p.glen == 1) {
          a1.append(frag1, p.rpos, 1);
          a2.append(frag2, (size_t)p.gpos, 1);
        } else {
          std::string s1 = frag1.substr(p.rpos, p.rlen);
          std::string s2 = frag2.substr((size_t)p.gpos, p.glen);
          if (!p.simple) {
            if (c.pacbio && (p.rlen > 300 || p.glen > 300))
              normal_pair_alignment(c, p.rlen, s1, p.glen, s2);
            else
              nw_alignment(s1, s2);
          }
          a1 += s1;
          a2 += s2;
        }
      }
      frag1 = std::move(a1);
      frag2 = std::move(a2);
    }
  }
  if (run_nw) nw_alignment(frag1, frag2);
}

static int process_normal(const Ctx& c, const uint8_t* seq, Seed& sp, Cigar& cigar) {
  if (sp.rlen == 0 || sp.glen == 0) {
    if (sp.rlen > 0)
      cigar.push_back({sp.rlen, 'I'});
    else if (sp.glen > 0)
      cigar.push_back({sp.glen, 'D'});
    return 0;
  }
  if (sp.rlen == sp.glen) {
    int n = count_mismatches((const char*)seq + sp.rpos,
                             (const char*)c.ref_seq + sp.gpos, sp.rlen);
    if (n <= 2 && n <= (int)(sp.rlen * 0.2)) {
      cigar.push_back({sp.rlen, 'M'});
      if (prof_on()) g_prof.shortcut_calls++;
      if (g_debug)  // tools.cpp:250 (shortcut branch prints raw fragments)
        printf("NormalPair:\n%.*s #read[%d-%d]=%d\n%.*s #chr[%lld-%lld]=%d\nScore=%d\n\n",
               sp.rlen, (const char*)seq + sp.rpos, sp.rpos, sp.rpos + sp.rlen - 1,
               sp.rlen, sp.glen, (const char*)c.ref_seq + sp.gpos, (long long)sp.gpos,
               (long long)(sp.gpos + sp.glen - 1), sp.glen, sp.rlen - n);
      return sp.rlen - n;
    }
  }
  if (sp.rlen == 1 && sp.glen == 1) {
    // lone mismatch between two exact seeds (the dominant normal pair, and
    // always a mismatch here: a match passed the <=2-mismatch shortcut).
    // nw_alignment on 1x1 is the identity (diagonal backtrace) and
    // AddNewCigarElements emits one M scoring 0 — skip the whole chain.
    cigar.push_back({1, 'M'});
    if (g_debug)
      printf("NormalPair:\n%c #read[%d-%d]=1\n%c #chr[%lld-%lld]=1\nScore=0\n\n",
             seq[sp.rpos], sp.rpos, sp.rpos, c.ref_seq[sp.gpos],
             (long long)sp.gpos, (long long)sp.gpos);
    return 0;
  }
  std::string f1((const char*)seq + sp.rpos, sp.rlen);
  std::string f2((const char*)c.ref_seq + sp.gpos, sp.glen);
  normal_pair_alignment(c, sp.rlen, f1, sp.glen, f2);
  int score = add_new_cigar_elements(f1, f2, cigar);
  if (g_debug)  // tools.cpp:250
    printf("NormalPair:\n%s #read[%d-%d]=%d\n%s #chr[%lld-%lld]=%d\nScore=%d\n\n",
           f1.c_str(), sp.rpos, sp.rpos + sp.rlen - 1, sp.rlen, f2.c_str(),
           (long long)sp.gpos, (long long)(sp.gpos + sp.glen - 1), sp.glen, score);
  return score;
}

static int process_head(const Ctx& c, const uint8_t* seq, Seed& sp, Cigar& cigar) {
  if (!c.pacbio && sp.rlen == sp.glen) {
    int n = count_mismatches((const char*)seq + sp.rpos,
                             (const char*)c.ref_seq + sp.gpos, sp.rlen);
    if (n <= 2 && n <= (int)(sp.rlen * 0.2)) {
      cigar.push_back({sp.rlen, 'M'});
      return sp.rlen - n;
    }
  }
  if (!c.pacbio && sp.rlen > 50) {
    cigar.push_back({sp.rlen, 'S'});
    return 0;
  }
  std::string f1((const char*)seq + sp.rpos, sp.rlen);
  std::string f2((const char*)c.ref_seq + sp.gpos, sp.glen);
  normal_pair_alignment(c, sp.rlen, f1, sp.glen, f2);
  if (!check_local_alignment_quality(f1, f2)) {
    cigar.push_back({sp.rlen, 'S'});
    return 0;
  }
  size_t p = 0;
  while (p < f1.size() && f1[p] == '-') p++;
  if (p > 0) {
    f1.erase(0, p);
    f2.erase(0, p);
    sp.gpos += p;
    sp.glen -= (int32_t)p;
  }
  p = 0;
  while (p < f2.size() && f2[p] == '-') p++;
  if (p > 0) {
    f1.erase(0, p);
    f2.erase(0, p);
    sp.rpos += (int32_t)p;
    sp.rlen -= (int32_t)p;
    cigar.push_back({(int)p, 'S'});
  }
  int score = add_new_cigar_elements(f1, f2, cigar);
  if (g_debug)  // tools.cpp:338
    printf("Head2:\n%s #read[%d-%d]=%d\n%s #chr[%lld-%lld]=%d\nScore=%d\n\n",
           f1.c_str(), sp.rpos, sp.rpos + sp.rlen - 1, sp.rlen, f2.c_str(),
           (long long)sp.gpos, (long long)(sp.gpos + sp.glen - 1), sp.glen, score);
  return score;
}

static int process_tail(const Ctx& c, const uint8_t* seq, Seed& sp, Cigar& cigar) {
  if (!c.pacbio && sp.rlen == sp.glen) {
    int n = count_mismatches((const char*)seq + sp.rpos,
                             (const char*)c.ref_seq + sp.gpos, sp.rlen);
    if (n <= 2 && n <= (int)(sp.rlen * 0.2)) {
      cigar.push_back({sp.rlen, 'M'});
      return sp.rlen - n;
    }
  }
  if (!c.pacbio && sp.rlen > 100) {
    cigar.push_back({sp.rlen, 'S'});
    return 0;
  }
  std::string f1((const char*)seq + sp.rpos, sp.rlen);
  std::string f2((const char*)c.ref_seq + sp.gpos, sp.glen);
  normal_pair_alignment(c, sp.rlen, f1, sp.glen, f2);
  if (!check_local_alignment_quality(f1, f2)) {
    cigar.push_back({sp.rlen, 'S'});
    return 0;
  }
  int cc = 0;
  int pp = (int)f1.size() - 1;
  while (pp >= 0 && f1[pp] == '-') {
    cc++;
    pp--;
  }
  if (cc > 0) {
    f1.resize(f1.size() - cc);
    f2.resize(f2.size() - cc);
    sp.glen -= cc;
  }
  cc = 0;
  pp = (int)f2.size() - 1;
  while (pp >= 0 && f2[pp] == '-') {
    cc++;
    pp--;
  }
  if (cc > 0) {
    f1.resize(f1.size() - cc);
    f2.resize(f2.size() - cc);
    sp.rlen -= cc;
  }
  int score = add_new_cigar_elements(f1, f2, cigar);
  if (cc > 0) cigar.push_back({cc, 'S'});
  return score;
}

// ---------------------------------------------------------------------------
// Report generation (pipeline/report.py)
// ---------------------------------------------------------------------------

static inline void append_uint_c(std::string& out, uint32_t u, char op) {
  char tmp[12];
  char* p = tmp + 12;
  do {
    *--p = (char)('0' + (u % 10));
    u /= 10;
  } while (u);
  out.append(p, tmp + 12 - p);
  out += op;
}

static std::string generate_cigar_str(const Cigar& vec, bool reversed) {
  std::string out;
  char state = '\0';
  int c = 0;
  int n = (int)vec.size();
  for (int k = 0; k < n; k++) {
    const auto& e = vec[reversed ? n - 1 - k : k];
    if (e.second != state) {
      if (c > 0) append_uint_c(out, (uint32_t)c, state);
      c = e.first;
      state = e.second;
    } else
      c += e.first;
  }
  if (c > 0) append_uint_c(out, (uint32_t)c, state);
  if (g_debug) printf("CIGAR=%s\n\n\n", out.c_str());  // AlignmentCandidates.cpp:510
  return out;
}

static Coord gen_coordinate_info(const Ctx& ctx, bool first_read, int64_t gpos,
                                 int64_t end_gpos, const Cigar& cigar_vec) {
  Coord coor;
  bool rev = false;
  if (gpos < ctx.genome_size) {
    coor.bdir = first_read;
    if (ctx.n_chrom == 1) {
      coor.chrom_idx = 0;
      coor.gpos = gpos + 1;
    } else {
      int lb = chr_lower_bound(ctx, gpos);
      coor.chrom_idx = (int32_t)ctx.chr_vals[lb];
      coor.gpos = gpos + 1 - ctx.fwd_loc[coor.chrom_idx];
    }
  } else {
    coor.bdir = !first_read;
    rev = true;
    if (ctx.n_chrom == 1) {
      coor.chrom_idx = 0;
      coor.gpos = ctx.two_genome_size - end_gpos;
    } else {
      int lb = chr_lower_bound(ctx, gpos);
      coor.gpos = ctx.chr_keys[lb] - end_gpos + 1;
      coor.chrom_idx = (int32_t)ctx.chr_vals[lb];
    }
  }
  coor.cigar = generate_cigar_str(cigar_vec, rev);
  return coor;
}

static bool check_coordinate_validity(const Ctx& ctx, const std::vector<Seed>& seeds) {
  int64_t g1 = 0, g2 = ctx.two_genome_size;
  for (const auto& s : seeds)
    if (s.glen > 0) {
      g1 = s.gpos;
      break;
    }
  for (auto it = seeds.rbegin(); it != seeds.rend(); ++it)
    if (it->glen > 0) {
      g2 = it->gpos + it->glen - 1;
      break;
    }
  if ((g1 < ctx.genome_size) != (g2 < ctx.genome_size)) return false;
  if (ctx.n_chrom == 1) return g2 < ctx.two_genome_size;
  int lb1 = chr_lower_bound(ctx, g1), lb2 = chr_lower_bound(ctx, g2);
  int nk = (int)ctx.chr_keys.size();
  if (lb1 >= nk || lb2 >= nk || ctx.chr_vals[lb1] != ctx.chr_vals[lb2]) return false;
  return true;
}

static int gap_penalty(const Cigar& vec) {
  int gp = 0;
  for (const auto& e : vec)
    if (e.second == 'I' || e.second == 'D') gp += e.first;
  return gp;
}

static void gen_mapping_report(const Ctx& ctx, bool first_read, ReadState& read,
                               std::vector<Cand>& cands) {
  read.score = read.sub_score = read.best_idx = 0;
  read.can_num = (int32_t)cands.size();
  if (read.can_num > 0) {
    read.reports.assign(read.can_num, Report());
    for (int i = 0; i < read.can_num; i++) {
      Report& rep = read.reports[i];
      rep.paired_idx = cands[i].paired_idx;
      if (cands[i].score == 0) continue;
      if (ctx.pacbio && read.score > 0) {
        read.sub_score = read.score;
        continue;
      }
      bool prof = prof_on();
      int64_t tnp = prof ? now_ns() : 0;
      identify_normal_pairs(read.rlen, -1, cands[i].seeds);
      if (prof) {
        int64_t t = now_ns();
        g_prof.rep_np += t - tnp;
        tnp = t;
      }
      if (g_debug) {  // AlignmentCandidates.cpp:649-653
        printf("Process candidate#%d (Score = %d, SegmentPair#=%d): \n", i + 1,
               cands[i].score, (int)cands[i].seeds.size());
        show_seed_info(cands[i].seeds);
      }
      if (!check_coordinate_validity(ctx, cands[i].seeds)) continue;
      thread_local Cigar cigar;
      cigar.clear();
      auto& seeds = cands[i].seeds;
      int num = (int)seeds.size();
      for (int j = 0; j < num; j++) {
        Seed& sp = seeds[j];
        if (sp.rlen == 0 && sp.glen == 0) continue;
        if (sp.simple) {
          cigar.push_back({sp.rlen, 'M'});
          rep.aln_score += sp.rlen;
        } else if (j == 0) {
          if (sp.rlen > 3000) {
            cigar.push_back({sp.rlen, 'S'});
            sp.gpos = seeds[1].gpos;
            sp.glen = 0;
          } else {
            int s = process_head(ctx, read.seq, sp, cigar);
            rep.aln_score += s;
            if (s == 0) {
              sp.gpos = seeds[1].gpos;
              sp.glen = 0;
            }
          }
        } else if (j == num - 1) {
          if (sp.rlen > 3000) {
            cigar.push_back({sp.rlen, 'S'});
            sp.gpos = seeds[j - 1].gpos + seeds[j - 1].glen;
            sp.glen = 0;
          } else {
            int s = process_tail(ctx, read.seq, sp, cigar);
            rep.aln_score += s;
            if (s == 0) {
              sp.gpos = seeds[j - 1].gpos + seeds[j - 1].glen;
              sp.glen = 0;
            }
          }
        } else
          rep.aln_score += process_normal(ctx, read.seq, sp, cigar);
      }
      if (prof) {
        int64_t t = now_ns();
        g_prof.rep_conq += t - tnp;
        tnp = t;
      }
      if (!ctx.pacbio && cigar.size() > 1) {
        rep.aln_score -= gap_penalty(cigar);
        if (rep.aln_score <= 0) {
          rep.aln_score = 0;
          continue;
        }
      }
      if (cigar.empty())
        rep.aln_score = 0;
      else {
        rep.coor = gen_coordinate_info(ctx, first_read, seeds[0].gpos,
                                       seeds[num - 1].gpos + seeds[num - 1].glen - 1,
                                       cigar);
        if (rep.coor.gpos <= 0) rep.aln_score = 0;
      }
      if (prof) g_prof.rep_coord += now_ns() - tnp;
      if (rep.aln_score > read.score) {
        read.best_idx = i;
        read.sub_score = read.score;
        read.score = rep.aln_score;
      } else if (rep.aln_score == read.score) {
        read.sub_score = read.score;
        if (!ctx.multi_hit && read.score > 0 &&
            ctx.chrom_lens[rep.coor.chrom_idx] >
                ctx.chrom_lens[read.reports[read.best_idx].coor.chrom_idx])
          read.best_idx = i;
      }
    }
  } else {
    read.can_num = 1;
    read.best_idx = 0;
    read.reports.assign(1, Report());
  }
}

// ---------------------------------------------------------------------------
// Pairing + rescue (pipeline/pairing.py)
// ---------------------------------------------------------------------------

static bool check_paired_candidates(const Ctx& ctx, int64_t est, std::vector<Cand>& v1,
                                    std::vector<Cand>& v2) {
  int num1 = (int)v1.size(), num2 = (int)v2.size();
  if ((int64_t)num1 * num2 > 1000) {
    remove_redundant(v1, false);
    remove_redundant(v2, false);
  }
  bool pairing = false;
  for (int i = 0; i < num1; i++) {
    if (v1[i].score == 0) continue;
    int best_mate = -1, s = 0;
    for (int j = 0; j < num2; j++) {
      if (v2[j].score == 0 || v2[j].posdiff < v1[i].posdiff) continue;
      int64_t dist = v2[j].posdiff - v1[i].posdiff;
      if (dist < est) {
        if (v2[j].score > s) {
          best_mate = j;
          s = v2[j].score;
        } else if (v2[j].score == s)
          best_mate = -1;
      }
    }
    if (s > 0 && best_mate != -1) {
      int j = best_mate;
      if (v2[j].paired_idx == -1) {
        pairing = true;
        v1[i].paired_idx = j;
        v2[j].paired_idx = i;
      } else if (v1[i].score > v1[v2[j].paired_idx].score) {
        v1[v2[j].paired_idx].paired_idx = -1;
        v1[i].paired_idx = j;
        v2[j].paired_idx = i;
      }
    }
  }
  return pairing;
}

static void remove_unmated(std::vector<Cand>& v1, std::vector<Cand>& v2) {
  for (auto& c1 : v1) {
    if (c1.paired_idx == -1)
      c1.score = 0;
    else {
      Cand& c2 = v2[c1.paired_idx];
      c1.score = c2.score = c1.score + c2.score;
    }
  }
  for (auto& c2 : v2)
    if (c2.paired_idx == -1) c2.score = 0;
  if (g_debug) {  // Mapping.cpp:419-426
    for (size_t i = 0; i < v1.size(); i++) {
      int j = v1[i].paired_idx;
      if (j != -1)
        printf("#%d(s=%d) and #%d(s=%d) are pairing\n", (int)(i + 1), v1[i].score,
               j + 1, v2[j].score);
    }
  }
}

static void check_paired_final(const Ctx& ctx, ReadState& r1, ReadState& r2) {
  bool mated = false;
  if (r1.best_idx != -1 && r2.best_idx != -1)
    mated = r1.reports[r1.best_idx].paired_idx == r2.best_idx;
  if (!ctx.multi_hit && mated) return;
  if (!mated && r1.score > 0 && r2.score > 0) {
    int s = 0;
    for (int i = 0; i < r1.can_num; i++) {
      int j = r1.reports[i].paired_idx;
      if (r1.reports[i].aln_score > 0 && j != -1 && r2.reports[j].aln_score > 0) {
        mated = true;
        int tot = r1.reports[i].aln_score + r2.reports[j].aln_score;
        if (s < tot) {
          s = tot;
          r1.best_idx = i;
          r1.score = r1.reports[i].aln_score;
          r2.best_idx = j;
          r2.score = r2.reports[j].aln_score;
        }
      }
    }
  }
  if (mated) {
    for (int i = 0; i < r1.can_num; i++) {
      Report& rep = r1.reports[i];
      int j = rep.paired_idx;
      if (rep.aln_score != r1.score ||
          (j != -1 && r2.reports[j].aln_score != r2.score)) {
        rep.aln_score = 0;
        rep.paired_idx = -1;
      }
    }
  } else {
    for (auto& rep : r1.reports) {
      rep.paired_idx = -1;
      if (rep.aln_score > 0 && rep.aln_score != r1.score) rep.aln_score = 0;
    }
    for (auto& rep : r2.reports) {
      rep.paired_idx = -1;
      if (rep.aln_score > 0 && rep.aln_score != r2.score) rep.aln_score = 0;
    }
  }
}

static int max_cand_score(const std::vector<Cand>& v) {
  int s = 0;
  for (const auto& c : v)
    if (c.score > s) s = c.score;
  return s;
}

static Cand identify_rescue_candidate(const Ctx& ctx, int64_t gpos,
                                      std::vector<Seed>& seeds) {
  Cand cand;
  int num = (int)seeds.size();
  int i = 0;
  while (i < num) {
    seeds[i].gpos += gpos;
    int s = seeds[i].rlen;
    int first = i;
    int j = i + 1;
    while (j < num) {
      if (seeds[j].posdiff - seeds[first].posdiff < ctx.max_gaps) {
        seeds[j].gpos += gpos;
        s += seeds[j].rlen;
        j++;
      } else
        break;
    }
    if (s > cand.score) {
      cand.score = s;
      cand.posdiff = seeds[first].posdiff + gpos;
      cand.seeds.assign(seeds.begin() + first, seeds.begin() + j);
    }
    i = j;
  }
  std::sort(cand.seeds.begin(), cand.seeds.end(), [](const Seed& a, const Seed& b) {
    return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
  });
  for (auto& sp : cand.seeds) sp.posdiff += gpos;
  if (g_debug && cand.score > 0) {  // AlignmentRescue.cpp:64-69
    printf("\n\nCandidate score = %d\n", cand.score);
    show_seed_location_info(ctx, cand.posdiff);
    show_seed_info(cand.seeds);
  }
  return cand;
}

static bool rescue_unpaired(const Ctx& ctx, int64_t est, ReadState& r1, ReadState& r2,
                            std::vector<Cand>& v1, std::vector<Cand>& v2) {
  int score1 = max_cand_score(v1);
  int score2 = max_cand_score(v2);
  if (score1 == 0 && score2 == 0) return false;
  int strategy;
  if (score1 < (int)(r1.rlen * 0.1) && score2 < (int)(r2.rlen * 0.1))
    strategy = 4;
  else if (score1 > score2 && score1 - score2 > 50)
    strategy = 1;
  else if (score2 > score1 && score2 - score1 > 50)
    strategy = 2;
  else
    strategy = 3;
  if (est > ctx.max_insert_size) est = ctx.max_insert_size;
  if (g_debug) {  // AlignmentRescue.cpp:96 (incl. the "EsitDistance" typo)
    printf("\n\nStart FixUnpairedAlignment with strategy %d (%d vs %d) and "
           "EsitDistance=%d\n\n",
           strategy, score1, score2, (int)est);
    fflush(stdout);
  }
  bool mated = false;
  int num1 = (int)v1.size(), num2 = (int)v2.size();

  std::vector<KmerItem> kvec1, kvec2;
  std::vector<KmerPair> pairs;
  std::vector<Seed> simple;

  if (strategy == 1 || strategy == 3) {
    int thr = std::max(score1 - 30, 50);
    create_kmer_vec((const char*)r2.seq, r2.rlen, kvec1);
    int j = num2;
    for (int i = 0; i < num1; i++) {
      if (v1[i].score < thr) continue;
      int64_t left = v1[i].posdiff;
      int64_t right = v1[i].posdiff + est + r2.rlen;
      int lb = chr_lower_bound(ctx, left);
      int chr_id = lb < (int)ctx.chr_vals.size() ? (int)ctx.chr_vals[lb] : 0;
      int64_t fwd = ctx.fwd_loc[chr_id], rev = ctx.rev_loc[chr_id];
      if (right < ctx.genome_size && right > fwd)
        right = fwd - 1;
      else if (right >= ctx.genome_size && right > rev)
        right = rev - 1;
      int64_t slen = right - left;
      if (slen < r2.rlen) continue;
      if (g_debug) {  // AlignmentRescue.cpp:118
        printf("\n\nAnchor1-Candidate#%d (Score=%d) pos=%lld, Search region = "
               "[%lld - %lld], len = %d\n\n",
               i + 1, v1[i].score, (long long)v1[i].posdiff, (long long)left,
               (long long)right, (int)slen);
        fflush(stdout);
      }
      create_kmer_vec((const char*)ctx.ref_seq + left, (int)slen, kvec2);
      identify_common_kmers((int)slen, kvec1, kvec2, pairs);
      simple_pairs_from_common_kmers(10, pairs, simple);
      Cand cand = identify_rescue_candidate(ctx, left, simple);
      if (cand.score > score2) {
        mated = true;
        cand.paired_idx = i;
        v1[i].paired_idx = j++;
        v2.push_back(std::move(cand));
      }
    }
  }
  if (strategy == 2 || strategy == 3) {
    int thr = std::max(max_cand_score(v2) - 30, 50);
    // NOTE: reference computes the anchor threshold over the (possibly
    // grown) AlignmentVec2 — but strategy 3 ran the v1 loop first; the
    // reference calls DetermineAnchorThreshold(AlignmentVec2) after
    // rescue candidates may have been appended, so recompute from
    // current v2 (matches AlignmentRescue.cpp:137).
    create_kmer_vec((const char*)r1.seq, r1.rlen, kvec1);
    int i = num1;
    for (int j2 = 0; j2 < num2; j2++) {
      if (v2[j2].score < thr) continue;
      int64_t left = v2[j2].posdiff - est;
      int64_t right = v2[j2].posdiff + r2.rlen;
      int lb = chr_lower_bound(ctx, right);
      int chr_id = lb < (int)ctx.chr_vals.size() ? (int)ctx.chr_vals[lb] : 0;
      int64_t fwd = ctx.fwd_loc[chr_id], rev = ctx.rev_loc[chr_id];
      int64_t cl = ctx.chrom_lens[chr_id];
      if (left < ctx.genome_size && left < fwd - cl)
        left = fwd - cl + 1;
      else if (right >= ctx.genome_size && left < rev - cl)
        left = rev - cl + 1;
      int64_t slen = right - left;
      if (slen < r1.rlen) continue;
      if (g_debug) {
        // AlignmentRescue.cpp:153 indexes AlignmentVec2[i] where i counts v1
        // candidates (a reference bug — out-of-bounds when i >= |v2|); print
        // the same in-bounds values, zeros when the reference would read OOB
        // (the golden debug test filters Anchor2 lines for this reason).
        int s = i < (int)v2.size() ? v2[i].score : 0;
        long long pd = i < (int)v2.size() ? (long long)v2[i].posdiff : 0;
        printf("\n\nAnchor2-Candidate#%d (Score=%d) pos=%lld, Search region = "
               "[%lld - %lld], len = %d\n\n",
               i + 1, s, pd, (long long)left, (long long)right, (int)slen);
      }
      create_kmer_vec((const char*)ctx.ref_seq + left, (int)slen, kvec2);
      identify_common_kmers((int)slen, kvec1, kvec2, pairs);
      simple_pairs_from_common_kmers(10, pairs, simple);
      Cand cand = identify_rescue_candidate(ctx, left, simple);
      if (cand.score > score1) {
        mated = true;
        cand.paired_idx = j2;
        v2[j2].paired_idx = i++;
        v1.push_back(std::move(cand));
      }
    }
  }
  return mated;
}

// ---------------------------------------------------------------------------
// Flags / MAPQ / SAM output (pipeline/sam.py)
// ---------------------------------------------------------------------------

static const int MAPQ_COEF = 30;
static const int MAX_MAPQ = 60;

static void set_single_flag(ReadState& r) {
  if (r.score > r.sub_score) {
    Report& rep = r.reports[r.best_idx];
    rep.sam_flag = rep.coor.bdir ? 0 : 0x10;
  } else if (r.score > 0) {
    for (auto& rep : r.reports)
      if (rep.aln_score > 0) rep.sam_flag = rep.coor.bdir ? 0 : 0x10;
  } else
    r.reports[0].sam_flag = 0x4;
}

static void set_paired_flags(ReadState& r1, ReadState& r2) {
  if (r1.score > r1.sub_score && r2.score > r2.sub_score) {
    Report& a = r1.reports[r1.best_idx];
    Report& b = r2.reports[r2.best_idx];
    a.sam_flag = 0x41;
    b.sam_flag = 0x81;
    if (r2.best_idx == a.paired_idx) {
      a.sam_flag |= 0x2;
      b.sam_flag |= 0x2;
    }
    a.sam_flag |= a.coor.bdir ? 0x20 : 0x10;
    b.sam_flag |= b.coor.bdir ? 0x20 : 0x10;
    return;
  }
  if (r1.score > r1.sub_score) {
    Report& a = r1.reports[r1.best_idx];
    a.sam_flag = 0x41 | (a.coor.bdir ? 0x20 : 0x10);
    int j = a.paired_idx;
    if (j != -1 && r2.reports[j].aln_score > 0)
      a.sam_flag |= 0x2;
    else
      a.sam_flag |= 0x8;
  } else if (r1.score > 0) {
    for (auto& a : r1.reports)
      if (a.aln_score > 0) {
        a.sam_flag = 0x41 | (a.coor.bdir ? 0x20 : 0x10);
        int j = a.paired_idx;
        if (j != -1 && r2.reports[j].aln_score > 0)
          a.sam_flag |= 0x2;
        else
          a.sam_flag |= 0x8;
      }
  } else {
    Report& a = r1.reports[0];
    a.sam_flag = 0x41 | 0x4;
    if (r2.score == 0)
      a.sam_flag |= 0x8;
    else
      a.sam_flag |= r2.reports[r2.best_idx].coor.bdir ? 0x10 : 0x20;
  }
  if (r2.score > r2.sub_score) {
    Report& b = r2.reports[r2.best_idx];
    b.sam_flag = 0x81 | (b.coor.bdir ? 0x20 : 0x10);
    int i = b.paired_idx;
    if (i != -1 && r1.reports[i].aln_score > 0)
      b.sam_flag |= 0x2;
    else
      b.sam_flag |= 0x8;
  } else if (r2.score > 0) {
    for (auto& b : r2.reports)
      if (b.aln_score > 0) {
        b.sam_flag = 0x81 | (b.coor.bdir ? 0x20 : 0x10);
        int i = b.paired_idx;
        if (i != -1 && r1.reports[i].aln_score > 0)
          b.sam_flag |= 0x2;
        else
          b.sam_flag |= 0x8;
      }
  } else {
    Report& b = r2.reports[0];
    b.sam_flag = 0x81 | 0x4;
    if (r1.score == 0)
      b.sam_flag |= 0x8;
    else
      b.sam_flag |= r1.reports[r1.best_idx].coor.bdir ? 0x10 : 0x20;
  }
}

static void evaluate_mapq(const Ctx& ctx, ReadState& r) {
  if (r.score == 0 || r.score == r.sub_score) {
    r.mapq = 0;
    return;
  }
  if (ctx.pacbio) {
    double f_scale = 85.0 * (int)(ceil(r.rlen / 100 + 0.5));
    if (f_scale > 2000) f_scale = 2000;
    r.mapq = (int)(MAX_MAPQ * (r.score / f_scale));
  } else if (r.sub_score == 0 || r.score - r.sub_score > 5)
    r.mapq = MAX_MAPQ;
  else
    r.mapq = (int)(MAPQ_COEF * (1 - (float)(r.score - r.sub_score) / r.score) *
                       log(r.score) +
                   0.4999);
  if (r.mapq > MAX_MAPQ) r.mapq = MAX_MAPQ;
}

struct OutStats {
  int64_t unique = 0, unmapped = 0, paired = 0, distance = 0;
};

#if defined(__SSE4_1__) && defined(__SSSE3__)
// SIMD reverse-complement: byte-reverse shuffle + the same
// nibble-map/validate scheme as encode_bulk ('A'<->'T', 'C'<->'G',
// everything else 'N' — byte-for-byte identical to the COMP table).
static void revcomp_into(const uint8_t* seq, int len, std::string& out) {
  out.resize(len);
  char* dst = &out[0];
  const __m128i rev =
      _mm_setr_epi8(15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
  const __m128i comp_tbl = _mm_setr_epi8(  // low nibble -> complement char
      'N', 'T', 'N', 'G', 'A', 'N', 'N', 'C', 'N', 'N', 'N', 'N', 'N', 'N',
      'N', 'N');
  const __m128i chr_tbl =
      _mm_setr_epi8(0, 'A', 0, 'C', 'T', 0, 0, 'G', 0, 0, 0, 0, 0, 0, 0, 0);
  const __m128i mask_low = _mm_set1_epi8(0x0F);
  const __m128i upper = _mm_set1_epi8((char)0xDF);
  const __m128i enn = _mm_set1_epi8('N');
  int i = 0;
  for (; i + 16 <= len; i += 16) {
    __m128i v = _mm_loadu_si128((const __m128i*)(seq + len - i - 16));
    v = _mm_shuffle_epi8(v, rev);
    __m128i nib = _mm_and_si128(v, mask_low);
    __m128i comp = _mm_shuffle_epi8(comp_tbl, nib);
    __m128i expect = _mm_shuffle_epi8(chr_tbl, nib);
    __m128i isacgt = _mm_cmpeq_epi8(_mm_and_si128(v, upper), expect);
    _mm_storeu_si128((__m128i*)(dst + i), _mm_blendv_epi8(enn, comp, isacgt));
  }
  for (; i < len; i++) dst[i] = COMP[seq[len - 1 - i]];
}
#else
static void revcomp_into(const uint8_t* seq, int len, std::string& out) {
  out.resize(len);
  for (int i = 0; i < len; i++) out[i] = COMP[seq[len - 1 - i]];
}
#endif

static inline void append_int(std::string& out, int64_t v) {
  char tmp[24];
  char* p = tmp + 24;
  bool neg = v < 0;
  uint64_t u = neg ? (uint64_t)(-(v + 1)) + 1 : (uint64_t)v;
  do {
    *--p = (char)('0' + (u % 10));
    u /= 10;
  } while (u);
  if (neg) *--p = '-';
  out.append(p, tmp + 24 - p);
}

static inline char* write_int(char* p, int64_t v) {
  char tmp[24];
  char* q = tmp + 24;
  bool neg = v < 0;
  uint64_t u = neg ? (uint64_t)(-(v + 1)) + 1 : (uint64_t)v;
  do {
    *--q = (char)('0' + (u % 10));
    u /= 10;
  } while (u);
  if (neg) *--q = '-';
  size_t n = (size_t)(tmp + 24 - q);
  memcpy(p, q, n);
  return p + n;
}

static void append_record(std::string& out, const ReadState& r, const Report& rep,
                          const Ctx& ctx, const char* seq_s, const char* qual_s,
                          bool qual_star, const char* rnext, int64_t pnext,
                          int64_t tlen) {
  // one resize, raw pointer writes (field count is fixed; 96 covers every
  // integer, tab and tag literal)
  const std::string& chrom = ctx.chrom_names[rep.coor.chrom_idx];
  size_t base = out.size();
  out.resize(base + (size_t)r.header_len + chrom.size() + rep.coor.cigar.size() +
             (size_t)r.rlen + (size_t)r.qual_len + 112);
  char* p = &out[base];
  memcpy(p, r.header, r.header_len);
  p += r.header_len;
  *p++ = '\t';
  p = write_int(p, rep.sam_flag);
  *p++ = '\t';
  memcpy(p, chrom.data(), chrom.size());
  p += chrom.size();
  *p++ = '\t';
  p = write_int(p, rep.coor.gpos);
  *p++ = '\t';
  p = write_int(p, r.mapq);
  *p++ = '\t';
  memcpy(p, rep.coor.cigar.data(), rep.coor.cigar.size());
  p += rep.coor.cigar.size();
  *p++ = '\t';
  *p++ = rnext[0];
  *p++ = '\t';
  p = write_int(p, pnext);
  *p++ = '\t';
  p = write_int(p, tlen);
  *p++ = '\t';
  memcpy(p, seq_s, r.rlen);
  p += r.rlen;
  *p++ = '\t';
  if (qual_star)
    *p++ = '*';
  else {
    memcpy(p, qual_s, r.qual_len);
    p += r.qual_len;
  }
  memcpy(p, "\tNM:i:", 6);
  p += 6;
  p = write_int(p, r.rlen - r.score);
  memcpy(p, "\tAS:i:", 6);
  p += 6;
  p = write_int(p, r.score);
  memcpy(p, "\tXS:i:", 6);
  p += 6;
  p = write_int(p, r.sub_score);
  *p++ = '\n';
  out.resize((size_t)(p - out.data()));
}

static void append_unmapped(std::string& out, const ReadState& r) {
  size_t base = out.size();
  out.resize(base + (size_t)r.header_len + (size_t)r.rlen + (size_t)r.qual_len + 64);
  char* p = &out[base];
  memcpy(p, r.header, r.header_len);
  p += r.header_len;
  *p++ = '\t';
  p = write_int(p, r.reports[0].sam_flag);
  memcpy(p, "\t*\t0\t0\t*\t*\t0\t0\t", 15);
  p += 15;
  memcpy(p, r.seq, r.rlen);
  p += r.rlen;
  *p++ = '\t';
  if (r.qual) {
    memcpy(p, r.qual, r.qual_len);
    p += r.qual_len;
  } else
    *p++ = '*';
  memcpy(p, "\tAS:i:0\tXS:i:0\n", 15);
  p += 15;
  out.resize((size_t)(p - out.data()));
}

static void output_single(const Ctx& ctx, ReadState& r, bool fastq, OutStats& st,
                          std::string& out) {
  if (r.score == 0) {
    st.unmapped++;
    append_unmapped(out, r);
    return;
  }
  if (r.mapq == MAX_MAPQ) st.unique++;
  const char* fwd = (const char*)r.seq;
  const char* qual = (fastq && r.qual) ? (const char*)r.qual : "*";
  bool ql_star = !(fastq && r.qual);
  thread_local std::string rseq, rqual;
  bool have_rev = false;
  for (int i = r.best_idx; i < r.can_num; i++) {
    Report& rep = r.reports[i];
    if (rep.aln_score == r.score) {
      if (!rep.coor.bdir && !have_rev) {
        revcomp_into(r.seq, r.rlen, rseq);
        rqual.assign(qual, ql_star ? 1 : r.qual_len);
        if (fastq) std::reverse(rqual.begin(), rqual.end());
        have_rev = true;
      }
      const char* sq = rep.coor.bdir ? fwd : rseq.c_str();
      const char* ql = fastq ? (rep.coor.bdir ? qual : rqual.c_str()) : "*";
      append_record(out, r, rep, ctx, sq, ql, ql_star, "*", 0, 0);
      if (!ctx.multi_hit) break;
    }
  }
}

static void output_paired(const Ctx& ctx, ReadState& r1, ReadState& r2, bool fastq,
                          OutStats& st, std::string& out) {
  // read 1
  if (r1.score == 0) {
    st.unmapped++;
    append_unmapped(out, r1);
  } else {
    if (r1.mapq == MAX_MAPQ) st.unique++;
    const char* fwd = (const char*)r1.seq;
    const char* qual = (fastq && r1.qual) ? (const char*)r1.qual : "*";
    bool ql_star = !(fastq && r1.qual);
    thread_local std::string rseq, rqual;
    bool have_rev = false;
    for (int i = r1.best_idx; i < r1.can_num; i++) {
      Report& rep = r1.reports[i];
      if (rep.aln_score > 0) {
        if (!rep.coor.bdir && !have_rev) {
          revcomp_into(r1.seq, r1.rlen, rseq);
          rqual.assign(qual, ql_star ? 1 : r1.qual_len);
          if (fastq) std::reverse(rqual.begin(), rqual.end());
          have_rev = true;
        }
        const char* sq = rep.coor.bdir ? fwd : rseq.c_str();
        const char* ql = fastq ? (rep.coor.bdir ? qual : rqual.c_str()) : "*";
        int j = rep.paired_idx;
        if (j != -1 && r2.reports[j].aln_score > 0) {
          int64_t dist = r2.reports[j].coor.gpos - rep.coor.gpos +
                         (rep.coor.bdir ? r2.rlen : -r1.rlen);
          if (i == r1.best_idx) {
            st.paired += 2;
            if (llabs(dist) < 10000) st.distance += llabs(dist);
          }
          append_record(out, r1, rep, ctx, sq, ql, ql_star, "=", r2.reports[j].coor.gpos, dist);
        } else
          append_record(out, r1, rep, ctx, sq, ql, ql_star, "*", 0, 0);
      }
      if (!ctx.multi_hit) break;
    }
  }
  // read 2 (stored reverse-complemented)
  if (r2.score == 0) {
    st.unmapped++;
    append_unmapped(out, r2);
  } else {
    if (r2.mapq == MAX_MAPQ) st.unique++;
    const char* stored = (const char*)r2.seq;
    const char* qual = (fastq && r2.qual) ? (const char*)r2.qual : "*";
    bool ql_star = !(fastq && r2.qual);
    thread_local std::string orig, rqual;
    bool have_fwd = false;
    for (int j = r2.best_idx; j < r2.can_num; j++) {
      Report& rep = r2.reports[j];
      if (rep.aln_score > 0) {
        if (rep.coor.bdir && !have_fwd) {
          revcomp_into(r2.seq, r2.rlen, orig);
          rqual.assign(qual, ql_star ? 1 : r2.qual_len);
          if (fastq) std::reverse(rqual.begin(), rqual.end());
          have_fwd = true;
        }
        const char* sq = rep.coor.bdir ? orig.c_str() : stored;
        const char* ql = fastq ? (rep.coor.bdir ? rqual.c_str() : qual) : "*";
        int i = rep.paired_idx;
        if (i != -1 && r1.reports[i].aln_score > 0) {
          int64_t dist = -(rep.coor.gpos - r1.reports[i].coor.gpos +
                           (r1.reports[i].coor.bdir ? r2.rlen : -r1.rlen));
          append_record(out, r2, rep, ctx, sq, ql, ql_star, "=", r1.reports[i].coor.gpos, dist);
        } else
          append_record(out, r2, rep, ctx, sq, ql, ql_star, "*", 0, 0);
      }
      if (!ctx.multi_hit) break;
    }
  }
}

// ---------------------------------------------------------------------------
// Chunk driver
// ---------------------------------------------------------------------------

struct ChunkIn {
  int32_t n_reads;
  bool pair_end, fastq;
  const uint8_t* seq_concat;
  const int64_t* seq_off;
  const uint8_t* qual_concat;
  const int64_t* qual_off;
  const char* header_concat;
  const int64_t* header_off;
  const int32_t* seed_cnt;
  const int32_t* seed_rpos;
  const int32_t* seed_len;
  const int64_t* seed_gpos;
};

static void make_read_state(const ChunkIn& in, int i, ReadState& r) {
  r.header = in.header_concat + in.header_off[i];
  r.header_len = (int32_t)(in.header_off[i + 1] - in.header_off[i]);
  r.seq = in.seq_concat + in.seq_off[i];
  r.rlen = (int32_t)(in.seq_off[i + 1] - in.seq_off[i]);
  r.qual = in.qual_concat ? in.qual_concat + in.qual_off[i] : nullptr;
  r.qual_len = in.qual_concat ? (int32_t)(in.qual_off[i + 1] - in.qual_off[i]) : 0;
}

// Build PosDiff-sorted (Illumina) or gPos-sorted (PacBio) seed vector for
// read i from the flat seed arrays.
static void collect_seeds(const Ctx& ctx, const ChunkIn& in, int i, int64_t base,
                          std::vector<Seed>& seeds) {
  seeds.clear();
  if (in.seed_cnt == nullptr) {
    // internal seeding: direct 13-mer tables when attached, else the FM
    // stepper + sampled-SA walks (reference-class memory, no full SA)
    thread_local std::vector<RawSeed> raw;
    const uint8_t* seq = in.seq_concat + in.seq_off[i];
    int rlen = (int)(in.seq_off[i + 1] - in.seq_off[i]);
    if (ctx.pacbio)
      ctx.seed_tables.ready ? seed_read_sensitive(ctx, seq, rlen, raw)
                            : seed_read_fm_sensitive(ctx, seq, rlen, raw);
    else if (ctx.seed_tables.ready)
      seed_read_direct(ctx, seq, rlen, raw);
    else
      seed_read_fm_fast(ctx, seq, rlen, raw);
    seeds.reserve(raw.size());
    for (const auto& r : raw)
      seeds.push_back({true, r.rpos, r.gpos, r.len, r.len, r.gpos - r.rpos});
    if (ctx.pacbio)
      std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
        return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
      });
    else
      std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
        return a.posdiff == b.posdiff ? a.rpos < b.rpos : a.posdiff < b.posdiff;
      });
    return;
  }
  int cnt = in.seed_cnt[i];
  seeds.reserve(cnt);
  for (int k = 0; k < cnt; k++) {
    int64_t idx = base + k;
    int32_t rp = in.seed_rpos[idx];
    int64_t gp = in.seed_gpos[idx];
    int32_t ln = in.seed_len[idx];
    seeds.push_back({true, rp, gp, ln, ln, gp - rp});
  }
  if (ctx.pacbio)
    std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
      return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
    });
  else
    std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
      return a.posdiff == b.posdiff ? a.rpos < b.rpos : a.posdiff < b.posdiff;
    });
}

static void output_single(const Ctx& ctx, ReadState& r, bool fastq, OutStats& st,
                          std::string& out);
static void output_paired(const Ctx& ctx, ReadState& r1, ReadState& r2, bool fastq,
                          OutStats& st, std::string& out);

static void raw_to_sorted_seeds(bool pacbio, const std::vector<RawSeed>& raw,
                                std::vector<Seed>& seeds) {
  seeds.clear();
  seeds.reserve(raw.size());
  for (const auto& r : raw)
    seeds.push_back({true, r.rpos, r.gpos, r.len, r.len, r.gpos - r.rpos});
  if (pacbio)
    std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
      return a.gpos == b.gpos ? a.rpos < b.rpos : a.gpos < b.gpos;
    });
  else
    std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
      return a.posdiff == b.posdiff ? a.rpos < b.rpos : a.posdiff < b.posdiff;
    });
}

// Pre-seed a read range with the pipelined batch engine (FastMode internal
// seeding only).  Returns false when inputs call for another path.
static bool preseed_range(const Ctx& ctx, const ChunkIn& in, int lo, int hi,
                          std::vector<std::vector<RawSeed>>& raw) {
  if (in.seed_cnt != nullptr || ctx.pacbio || !ctx.seed_tables.ready) return false;
  int n = hi - lo;
  int64_t total = in.seq_off[hi] - in.seq_off[lo];
  thread_local std::vector<int8_t> arena;
  thread_local std::vector<int64_t> offs;
  arena.resize(total);
  offs.resize(n + 1);
  const uint8_t* base = in.seq_concat + in.seq_off[lo];
  encode_bulk(base, arena.data(), total);
  for (int i = 0; i <= n; i++) offs[i] = in.seq_off[lo + i] - in.seq_off[lo];
  if ((int)raw.size() < n) raw.resize(n);
  for (int i = 0; i < n; i++) raw[i].clear();
  seed_reads_direct_batch(ctx, arena.data(), offs.data(), n, raw);
  return true;
}

// Each worker maps AND formats its read range into its own buffer (the
// reference's OutputLock serialization becomes an in-order concat of
// per-thread buffers; record order is identical).
static void process_pair_range(const Ctx& ctx, const ChunkIn& in,
                               const std::vector<int64_t>& seed_base, int64_t est,
                               int lo, int hi, OutStats& ost, std::string& out) {
  // reused across blocks: the ReadStates' report vectors (and their
  // Coord strings) keep their capacity
  thread_local std::vector<ReadState> states;
  if ((int)states.size() < hi - lo) states.resize(hi - lo);
  for (int i = lo; i < hi; i++) make_read_state(in, i, states[i - lo]);
  std::vector<Seed> seeds1, seeds2;
  std::vector<Cand> cands1, cands2;
  bool prof = prof_on();
  int64_t t0 = 0, t1 = 0, t2 = 0, t3 = 0, t4 = 0, t5 = 0;
  out.reserve((size_t)(hi - lo) * 200);
  thread_local std::vector<std::vector<RawSeed>> raw;
  int64_t tp = prof ? now_ns() : 0;
  bool pre = preseed_range(ctx, in, lo, hi, raw);
  if (prof && pre) {
    g_prof.seed += now_ns() - tp;
  }
  for (int i = lo; i < hi; i += 2) {
    int j = i + 1;
    ReadState& st1 = states[i - lo];
    ReadState& st2 = states[j - lo];
    if (prof) t0 = now_ns();
    if (pre) {
      raw_to_sorted_seeds(false, raw[i - lo], seeds1);
      raw_to_sorted_seeds(false, raw[j - lo], seeds2);
    } else {
      collect_seeds(ctx, in, i, seed_base[i], seeds1);
      collect_seeds(ctx, in, j, seed_base[j], seeds2);
    }
    if (prof) t1 = now_ns();
    recycle_cands(cands1);
    recycle_cands(cands2);
    gen_candidates_illumina(ctx, st1.rlen, seeds1, cands1);
    gen_candidates_illumina(ctx, st2.rlen, seeds2, cands2);
    if (prof) t2 = now_ns();
    bool pairing = check_paired_candidates(ctx, est, cands1, cands2);
    if (!pairing) pairing = rescue_unpaired(ctx, est, st1, st2, cands1, cands2);
    if (pairing) remove_unmated(cands1, cands2);
    remove_redundant(cands1, false);
    remove_redundant(cands2, false);
    if (prof) t3 = now_ns();
    gen_mapping_report(ctx, true, st1, cands1);
    gen_mapping_report(ctx, false, st2, cands2);
    check_paired_final(ctx, st1, st2);
    set_paired_flags(st1, st2);
    evaluate_mapq(ctx, st1);
    evaluate_mapq(ctx, st2);
    if (prof) t4 = now_ns();
    output_paired(ctx, st1, st2, in.fastq, ost, out);
    if (prof) {
      t5 = now_ns();
      g_prof.seed += t1 - t0;
      g_prof.cand += t2 - t1;
      g_prof.pair += t3 - t2;
      g_prof.report += t4 - t3;
      g_prof.fmt += t5 - t4;
      g_prof.reads += 2;
    }
  }
}

static void process_single_range(const Ctx& ctx, const ChunkIn& in,
                                 const std::vector<int64_t>& seed_base, int lo, int hi,
                                 OutStats& ost, std::string& out) {
  thread_local std::vector<ReadState> states;
  if ((int)states.size() < hi - lo) states.resize(hi - lo);
  for (int i = lo; i < hi; i++) make_read_state(in, i, states[i - lo]);
  std::vector<Seed> seeds;
  out.reserve((size_t)(hi - lo) * 200);
  thread_local std::vector<std::vector<RawSeed>> raw;
  std::vector<Cand> cands;
  bool pre = preseed_range(ctx, in, lo, hi, raw);
  for (int i = lo; i < hi; i++) {
    ReadState& st = states[i - lo];
    if (g_debug) {  // Mapping.cpp:517 / :584
      if (ctx.pacbio)
        printf("\n\n\nMapping pacbio read#%d %.*s (len=%d):\n", i + 1,
               st.header_len, st.header, st.rlen);
      else
        printf("Mapping single read#%d %.*s (len=%d):\n", i + 1, st.header_len,
               st.header, st.rlen);
    }
    bool prof = prof_on();
    int64_t t0 = prof ? now_ns() : 0;
    if (pre)
      raw_to_sorted_seeds(false, raw[i - lo], seeds);
    else
      collect_seeds(ctx, in, i, seed_base[i], seeds);
    int64_t t1 = prof ? now_ns() : 0;
    recycle_cands(cands);
    if (ctx.pacbio) {
      gen_candidates_pacbio(st.rlen, seeds, cands);
      remove_redundant(cands, true);
    } else {
      gen_candidates_illumina(ctx, st.rlen, seeds, cands);
      remove_redundant(cands, false);
    }
    int64_t t2 = prof ? now_ns() : 0;
    if (g_debug)  // Mapping.cpp:524 / :589
      show_alignment_candidate_info(ctx, true, st.header, st.header_len, cands);
    gen_mapping_report(ctx, true, st, cands);
    int64_t t3 = prof ? now_ns() : 0;
    set_single_flag(st);
    evaluate_mapq(ctx, st);
    if (g_debug && !ctx.pacbio)  // Mapping.cpp:594
      printf("\nEnd of mapping for read#%.*s\n%s\n", st.header_len, st.header,
             std::string(100, '=').c_str());
    output_single(ctx, st, in.fastq, ost, out);
    if (prof) {
      int64_t t4 = now_ns();
      g_prof.seed += t1 - t0;
      g_prof.cand += t2 - t1;
      g_prof.report += t3 - t2;
      g_prof.fmt += t4 - t3;
      g_prof.reads += 1;
    }
  }
}

// ---------------------------------------------------------------------------
// Chunked FASTA/FASTQ reader (mirror of src/GetData.cpp) with one-chunk
// prefetch: a background thread parses chunk k+1 while the caller maps
// chunk k.  gzopen reads both plain and gzip-compressed files, matching
// the reference's FILE*/gzFile dual paths with a single implementation.
// ---------------------------------------------------------------------------

struct GzLineReader {
  gzFile f = nullptr;
  FILE* plain = nullptr;  // fast path: uncompressed files skip zlib's copy
  std::vector<char> buf;
  size_t pos = 0, avail = 0;
  bool pending = false;  // FASTA '>' pushback
  std::string pushback;

  bool open(const char* path) {
    buf.resize(1 << 20);
    FILE* probe = fopen(path, "rb");
    if (!probe) return false;
    unsigned char magic[2];
    size_t got = fread(magic, 1, 2, probe);
    if (got == 2 && magic[0] == 0x1f && magic[1] == 0x8b) {
      fclose(probe);
      f = gzopen(path, "rb");
      return f != nullptr;
    }
    rewind(probe);
    setvbuf(probe, nullptr, _IONBF, 0);  // we buffer ourselves
    plain = probe;
    return true;
  }
  int refill() {
    int n = plain ? (int)fread(buf.data(), 1, buf.size(), plain)
                  : gzread(f, buf.data(), (unsigned)buf.size());
    if (n > 0) {
      pos = 0;
      avail = (size_t)n;
    }
    return n;
  }
  void close() {
    if (f) {
      gzclose(f);
      f = nullptr;
    }
    if (plain) {
      fclose(plain);
      plain = nullptr;
    }
  }
  // One line INCLUDING the trailing '\n' when present (getline semantics,
  // GetData.cpp GetNextEntry).  Returns length, 0 at EOF.
  int64_t getline(std::string& out) {
    if (pending) {
      out = pushback;
      pending = false;
      return (int64_t)out.size();
    }
    out.clear();
    while (true) {
      if (pos == avail) {
        if (refill() <= 0) return (int64_t)out.size();
      }
      char* start = buf.data() + pos;
      char* nl = (char*)memchr(start, '\n', avail - pos);
      if (nl) {
        out.append(start, nl - start + 1);
        pos += (size_t)(nl - start) + 1;
        return (int64_t)out.size();
      }
      out.append(start, avail - pos);
      pos = avail;
    }
  }
  void unread(const std::string& line) {
    pushback = line;
    pending = true;
  }

  // Zero-copy line: returns a pointer to the line INCLUDING its '\n'
  // (valid only until the next getline/getline_ptr call); falls back to
  // assembling into `scratch` when the line spans a refill boundary.
  // len == 0 at EOF (matching getline()).
  const char* getline_ptr(int64_t& len, std::string& scratch) {
    if (pending) {
      scratch = pushback;
      pending = false;
      len = (int64_t)scratch.size();
      return scratch.data();
    }
    if (pos == avail) {
      if (refill() <= 0) {
        len = 0;
        return scratch.data();
      }
    }
    char* start = buf.data() + pos;
    char* nl = (char*)memchr(start, '\n', avail - pos);
    if (nl) {
      len = nl - start + 1;
      pos += (size_t)len;
      return start;
    }
    // spans the buffer boundary: assemble (rare with a 1MB buffer)
    scratch.assign(start, avail - pos);
    pos = avail;
    while (true) {
      if (refill() <= 0) break;
      char* s2 = buf.data();
      char* nl2 = (char*)memchr(s2, '\n', avail);
      if (nl2) {
        scratch.append(s2, nl2 - s2 + 1);
        pos = (size_t)(nl2 - s2) + 1;
        break;
      }
      scratch.append(s2, avail);
      pos = avail;
    }
    len = (int64_t)scratch.size();
    return scratch.data();
  }
};

struct ChunkBufs {
  std::vector<uint8_t> seq, qual;  // concatenated bases / quality strings
  std::string headers;             // concatenated trimmed headers
  // qual has its own offsets: the reference stores min(line len, rlen)
  // quality bytes (GetData.cpp GetNextEntry strncpy semantics), so a
  // malformed short quality line yields a short qual, newline included
  std::vector<int64_t> seq_off, qual_off, header_off;
  int32_t n = 0;
  void reset() {
    seq.clear();
    qual.clear();
    headers.clear();
    seq_off.assign(1, 0);
    qual_off.assign(1, 0);
    header_off.assign(1, 0);
    n = 0;
  }
};

struct NativeReader {
  GzLineReader f1, f2;
  bool sep = false, fastq = true, pair_end = false;
  int limit = 4000;  // ReadChunkSize (structure.h:21); 10 for PacBio
  // Ring of n_bufs buffers: the chunk returned by next_chunk stays valid
  // across n_bufs - 2 further next_chunk calls while the prefetch thread
  // fills the next slot.  Default 3 = depth-1 pipelining (device-seed
  // chunk k+1 while post-processing chunk k); the group-fused device mode
  // opens with a larger ring so a whole dispatch group stays alive.
  std::vector<ChunkBufs> bufs;
  int n_bufs = 3;
  int cur = 0;
  std::thread th;
  bool th_active = false;
  bool exhausted = false;
  std::string line, seqline, qline, fa_seq;

  // Parse one entry (GetNextEntry, GetData.cpp:51-107).  Appends to b and
  // returns rlen; 0 = EOF / empty read (entry not appended).
  int parse_entry(GzLineReader& rd, ChunkBufs& b) {
    int64_t len;
    const char* hline = rd.getline_ptr(len, line);
    if (len <= 0) return 0;
    // IdentifyHeaderBegPos / IdentifyHeaderEndPos on the line including
    // its '\n' (defaults len-1, i.e. the newline position)
    int64_t p1 = len - 1, p2 = len - 1;
    for (int64_t i = 1; i < len; i++)
      if (hline[i] != '>' && hline[i] != '@') {
        p1 = i;
        break;
      }
    for (int64_t i = 1; i < len; i++)
      if (hline[i] == ' ' || hline[i] == '/' || hline[i] == '\t') {
        p2 = i;
        break;
      }
    // copy the header before the next line read invalidates hline
    b.headers.append(hline + p1, p2 - p1);
    int rlen = 0;
    if (fastq) {
      int64_t slen;
      const char* sline = rd.getline_ptr(slen, seqline);
      if (slen <= 0) { b.headers.resize(b.header_off.back()); return 0; }
      rlen = (int)(slen - 1);  // reference: rlen = getline len - 1
      if (rlen <= 0) { b.headers.resize(b.header_off.back()); return 0; }
      b.seq.insert(b.seq.end(), sline, sline + rlen);
      int64_t plen;
      rd.getline_ptr(plen, qline);  // '+' separator
      int64_t qlen;
      const char* qln = rd.getline_ptr(qlen, qline);
      int64_t qn = qlen < rlen ? qlen : rlen;
      b.qual.insert(b.qual.end(), qln, qln + qn);
    } else {
      fa_seq.clear();
      while (true) {
        int64_t l2 = rd.getline(seqline);
        if (l2 <= 0) break;
        if (seqline[0] == '>') {
          rd.unread(seqline);
          break;
        }
        fa_seq.append(seqline.data(), l2 - 1);  // drop trailing '\n'
      }
      rlen = (int)fa_seq.size();
      if (rlen == 0) {
        b.headers.resize(b.header_off.back());
        return 0;
      }
      b.seq.insert(b.seq.end(), fa_seq.begin(), fa_seq.end());
    }
    b.header_off.push_back((int64_t)b.headers.size());
    b.seq_off.push_back((int64_t)b.seq.size());
    b.qual_off.push_back((int64_t)b.qual.size());
    b.n++;
    return rlen;
  }

  // Mate-2 loaded reverse-complemented, qual reversed (GetData.cpp:125-135)
  void revcomp_last(ChunkBufs& b) {
    int64_t s = b.seq_off[b.n - 1], e = b.seq_off[b.n];
    thread_local std::string tmp;
    revcomp_into(b.seq.data() + s, (int)(e - s), tmp);  // SIMD path
    memcpy(b.seq.data() + s, tmp.data(), (size_t)(e - s));
    if (fastq)
      std::reverse(b.qual.begin() + b.qual_off[b.n - 1],
                   b.qual.begin() + b.qual_off[b.n]);
  }

  // GetNextChunk loop (GetData.cpp:109-143)
  void fill_chunk(ChunkBufs& b) {
    b.reset();
    while (true) {
      if (parse_entry(f1, b) == 0) break;
      if (parse_entry(sep ? f2 : f1, b) == 0) break;
      if (pair_end) revcomp_last(b);
      if (b.n == limit) break;
    }
  }

  void start_prefetch() {
    int tgt = (cur + 1) % n_bufs;
    th = std::thread([this, tgt]() { fill_chunk(bufs[tgt]); });
    th_active = true;
  }
  void join_prefetch() {
    if (th_active) {
      th.join();
      th_active = false;
    }
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* kart_ctx_create(const uint8_t* ref_seq, int64_t two_genome_size,
                      int64_t genome_size, int32_t n_chrom,
                      const char* chrom_names_concat, const int64_t* chrom_name_off,
                      const int64_t* chrom_lens, const int64_t* fwd_loc,
                      const int64_t* rev_loc, const int64_t* chr_keys,
                      const int64_t* chr_vals, int32_t n_keys, int32_t max_gaps,
                      int32_t max_insert_size, int32_t min_seed_len, int32_t pacbio,
                      int32_t multi_hit, int32_t n_threads) {
  Ctx* c = new Ctx();
  c->ref_seq = ref_seq;
  c->two_genome_size = two_genome_size;
  c->genome_size = genome_size;
  c->n_chrom = n_chrom;
  for (int i = 0; i < n_chrom; i++)
    c->chrom_names.emplace_back(chrom_names_concat + chrom_name_off[i],
                                chrom_name_off[i + 1] - chrom_name_off[i]);
  c->chrom_lens.assign(chrom_lens, chrom_lens + n_chrom);
  c->fwd_loc.assign(fwd_loc, fwd_loc + n_chrom);
  c->rev_loc.assign(rev_loc, rev_loc + n_chrom);
  c->chr_keys.assign(chr_keys, chr_keys + n_keys);
  c->chr_vals.assign(chr_vals, chr_vals + n_keys);
  c->max_gaps = max_gaps;
  c->max_insert_size = max_insert_size;
  c->min_seed_len = min_seed_len;
  c->pacbio = pacbio != 0;
  c->multi_hit = multi_hit != 0;
  c->n_threads = n_threads > 0 ? n_threads : 1;
  return c;
}

// -d verbose dumps; process-wide like the reference's bDebugMode global
// (main.cpp:164).  -d also forces one mapping thread.
void kart_set_debug(int32_t on) { g_debug = on != 0; }

void kart_ctx_destroy(void* ctx) {
  if (prof_on()) prof_dump();
  delete (Ctx*)ctx;
}

// Attach direct-lookup seeding tables (caller keeps arrays alive).
void kart_ctx_set_seed_tables(void* vctx, const int32_t* table_lo,
                              const int32_t* sa_full, int64_t seq_len,
                              const uint32_t* bitmaps_concat,
                              const int64_t* bitmap_word_off,
                              const int32_t* bitmap_ks, int32_t n_bitmaps) {
  Ctx& c = *(Ctx*)vctx;
  SeedTables& st = c.seed_tables;
  st.table_lo = table_lo;
  st.sa_full = sa_full;
  st.seq_len = seq_len;
  st.bitmaps.clear();
  st.bitmap_ks.clear();
  for (int i = 0; i < n_bitmaps; i++) {
    st.bitmaps.push_back(bitmaps_concat + bitmap_word_off[i]);
    st.bitmap_ks.push_back(bitmap_ks[i]);
  }
  st.ref_codes.resize(seq_len);
  for (int64_t i = 0; i < seq_len; i++) st.ref_codes[i] = (int8_t)NT4[c.ref_seq[i]];
  // padded 13-mer ids of sub-13 tail suffixes (rows with loc > seq_len-13):
  // their table ids are zero-padded garbage, so intervals holding one must
  // take the linear extension path (see km_is_bogus / ext_interval_bin)
  st.bogus_km.clear();
  for (int64_t loc = seq_len - SEED_K + 1; loc <= seq_len; loc++) {
    uint32_t km2 = 0;
    for (int i = 0; i < SEED_K; i++) {
      int64_t p2 = loc + i;
      int8_t cc = p2 < seq_len ? st.ref_codes[p2] : (int8_t)0;
      km2 = (km2 << 2) | (uint32_t)(cc & 3);
    }
    st.bogus_km.push_back(km2);
  }
  hint_hugepages(st.table_lo, ((size_t)1 << 26) * 4 + 4);  // 4^13+1 int32
  hint_hugepages(st.sa_full, (size_t)(seq_len + 1) * 4);
  hint_hugepages(st.ref_codes.data(), st.ref_codes.size());
  hint_hugepages(c.ref_seq, (size_t)c.two_genome_size);
  st.ready = true;
}

static int64_t process_chunk_impl(Ctx& ctx, const ChunkIn& in, int64_t* stats,
                                  char** sam_out) {
  int n_reads = in.n_reads;
  std::vector<int64_t> seed_base(n_reads, 0);
  if (in.seed_cnt != nullptr) {
    int64_t acc = 0;
    for (int i = 0; i < n_reads; i++) {
      seed_base[i] = acc;
      acc += in.seed_cnt[i];
    }
  }
  bool do_pairs = in.pair_end && n_reads % 2 == 0 && !ctx.pacbio;
  int64_t est = 0;
  if (do_pairs) {
    // EstDistance from running stats (Mapping.cpp:533-540)
    if (stats[0] >= 1000) {
      est = stats[1] / (stats[0] >> 2);
      est = est + (est >> 1);
    } else
      est = ctx.max_insert_size;
  }

  int nt = ctx.n_threads;
  OutStats st;
  std::string out;
  // PacBio chunks hold only 10 reads (GetData.cpp:140) but each read costs
  // ~1 ms — without the small block size they fell under the threading
  // threshold and the whole PacBio pipeline ran single-threaded (r5
  // KART_PROF: summed-stage time was half the wall time)
  int min_par = ctx.pacbio ? 2 : 64;
  if (nt > 1 && n_reads >= min_par && !g_debug) {
    // work stealing over fixed blocks: no straggler tail, and the block
    // table keeps output order deterministic (in-order concat)
    const int BS = ctx.pacbio ? 2 : 128;  // reads per block (even: pairs stay together)
    int n_blocks = (n_reads + BS - 1) / BS;
    std::vector<std::string> bouts(n_blocks);
    std::vector<OutStats> tstats(nt);
    std::atomic<int> next{0};
    auto worker = [&](int tid) {
      while (true) {
        int b = next.fetch_add(1, std::memory_order_relaxed);
        if (b >= n_blocks) break;
        int lo = b * BS;
        int hi = std::min(n_reads, lo + BS);
        if (do_pairs)
          process_pair_range(ctx, in, seed_base, est, lo, hi, tstats[tid],
                             bouts[b]);
        else
          process_single_range(ctx, in, seed_base, lo, hi, tstats[tid],
                               bouts[b]);
      }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t + 1 < nt; t++) threads.emplace_back(worker, t);
    worker(nt - 1);  // the calling thread participates
    for (auto& th : threads) th.join();
    size_t total = 0;
    for (auto& b : bouts) total += b.size();
    out.reserve(total);
    for (auto& b : bouts) out += b;
    for (int t = 0; t < nt; t++) {
      st.paired += tstats[t].paired;
      st.distance += tstats[t].distance;
      st.unique += tstats[t].unique;
      st.unmapped += tstats[t].unmapped;
    }
  } else {
    out.reserve((size_t)n_reads * 200);
    if (do_pairs)
      process_pair_range(ctx, in, seed_base, est, 0, n_reads, st, out);
    else
      process_single_range(ctx, in, seed_base, 0, n_reads, st, out);
  }

  stats[0] += st.paired;
  stats[1] += st.distance;
  stats[2] += st.unique;
  stats[3] += st.unmapped;

  // hand back a pointer into the ctx-owned buffer (no extra copy);
  // valid until the next process_chunk* call on this ctx
  ctx.out_buf.swap(out);
  *sam_out = const_cast<char*>(ctx.out_buf.data());
  return (int64_t)ctx.out_buf.size();
}

// Attach the FM index (.bwt/.sa arrays, de-interleaved layout) as the
// seeding engine when the 13-mer direct tables are absent: pure-CPU
// human-scale mapping in reference-class memory (no .saf, no full SA —
// VERDICT r4 missing #2).  Caller keeps the arrays alive.
void kart_ctx_set_fm_index(void* vctx, const int64_t* occ_cp,
                           const uint32_t* bwt_words, const int64_t* sa_samples,
                           const int64_t* L2, int64_t primary, int64_t seq_len,
                           int32_t sa_intv) {
  Ctx& c = *(Ctx*)vctx;
  FMTables& fm = c.fm;
  fm.occ_cp = occ_cp;
  fm.bwt_words = bwt_words;
  fm.sa_samples = sa_samples;
  for (int i = 0; i < 5; i++) fm.L2[i] = L2[i];
  fm.primary = primary;
  fm.seq_len = seq_len;
  fm.sa_intv = sa_intv;
  int64_t n_blocks = (seq_len >> 7) + 1;
  hint_hugepages(fm.occ_cp, (size_t)n_blocks * 4 * 8);
  hint_hugepages(fm.bwt_words, (size_t)n_blocks * 8 * 4);
  hint_hugepages(fm.sa_samples, (size_t)(seq_len / sa_intv + 1) * 8);
  fm.ready = true;
}

// Attach only the full suffix array (occurrence expansion for device-seeded
// chunks) without the direct-lookup seeding tables — used when the genome
// is too large for the 13-mer table gate but device seeding still applies.
void kart_ctx_set_sa_full(void* vctx, const int32_t* sa_full, int64_t seq_len) {
  Ctx& c = *(Ctx*)vctx;
  c.seed_tables.sa_full = sa_full;
  c.seed_tables.seq_len = seq_len;
  hint_hugepages(sa_full, (size_t)(seq_len + 1) * 4);
}

// stats layout: [0]=paired, [1]=distance, [2]=unique, [3]=unmapped (in/out)
int64_t kart_process_chunk(void* vctx, int32_t n_reads, int32_t pair_end,
                           int32_t fastq, const uint8_t* seq_concat,
                           const int64_t* seq_off, const uint8_t* qual_concat,
                           const int64_t* qual_off, const char* header_concat,
                           const int64_t* header_off, const int32_t* seed_cnt,
                           const int32_t* seed_rpos, const int32_t* seed_len,
                           const int64_t* seed_gpos, int64_t* stats, char** sam_out) {
  Ctx& ctx = *(Ctx*)vctx;
  ChunkIn in{n_reads,      pair_end != 0, fastq != 0, seq_concat,  seq_off,
             qual_concat,  qual_off,      header_concat, header_off, seed_cnt,
             seed_rpos,    seed_len,      seed_gpos};
  return process_chunk_impl(ctx, in, stats, sam_out);
}

// Device-seeded chunk: seeds arrive as the packed (B, 1+4*max_seeds) int32
// matrix produced by the TPU seeding kernels (seed_scan layout:
// [n_seeds | rpos | len | k0 | freq] with k0 a suffix-array row).  The
// occurrence expansion (gpos = sa_full[k0+o], o < freq, SA-row order —
// reference bwt_search.cpp:176-179) happens here, off the device, against
// the same full SA the direct-lookup tables use.
int64_t kart_process_chunk_packed(void* vctx, int32_t n_reads, int32_t pair_end,
                                  int32_t fastq, const uint8_t* seq_concat,
                                  const int64_t* seq_off, const uint8_t* qual_concat,
                                  const int64_t* qual_off, const char* header_concat,
                                  const int64_t* header_off, const int32_t* packed,
                                  int32_t max_seeds, int64_t* stats, char** sam_out) {
  Ctx& ctx = *(Ctx*)vctx;
  const SeedTables& st = ctx.seed_tables;
  int stride = 1 + 4 * max_seeds;
  std::vector<int32_t> cnt(n_reads);
  std::vector<int32_t> rpos, slen;
  std::vector<int64_t> gpos;
  size_t guess = (size_t)n_reads * 4;
  rpos.reserve(guess);
  slen.reserve(guess);
  gpos.reserve(guess);
  for (int i = 0; i < n_reads; i++) {
    const int32_t* row = packed + (int64_t)i * stride;
    int ns = row[0];
    const int32_t* rp = row + 1;
    const int32_t* ln = row + 1 + max_seeds;
    const int32_t* k0 = row + 1 + 2 * max_seeds;
    const int32_t* fq = row + 1 + 3 * max_seeds;
    int total = 0;
    for (int t = 0; t < ns; t++) {
      for (int o = 0; o < fq[t]; o++) {
        rpos.push_back(rp[t]);
        slen.push_back(ln[t]);
        gpos.push_back((int64_t)st.sa_full[k0[t] + o]);
      }
      total += fq[t];
    }
    cnt[i] = total;
  }
  ChunkIn in{n_reads,       pair_end != 0, fastq != 0,    seq_concat,
             seq_off,       qual_concat,   qual_off,      header_concat,
             header_off,    cnt.data(),    rpos.data(),   slen.data(),
             gpos.data()};
  return process_chunk_impl(ctx, in, stats, sam_out);
}

// Encode reads into a (rows x l_max) int8 matrix of 2-bit codes padded
// with 4 (the device kernels' input layout) + per-read lengths.  `out`
// must hold rows*l_max bytes, rows >= n; rows beyond n are left as given.
void kart_encode_reads(const uint8_t* seq_concat, const int64_t* seq_off,
                       int32_t n, int32_t l_max, int8_t* out, int32_t* rlens) {
  for (int i = 0; i < n; i++) {
    const uint8_t* s = seq_concat + seq_off[i];
    int len = (int)(seq_off[i + 1] - seq_off[i]);
    if (len > l_max) len = l_max;
    int8_t* row = out + (int64_t)i * l_max;
    encode_bulk(s, row, len);
    if (len < l_max) memset(row + len, 4, l_max - len);
    rlens[i] = len;
  }
}

// 2-bit-pack an encoded (B x l_max) int8 code matrix into (B x nw) uint32
// words (16 bases/word, code 0 for ambiguous positions) + a sparse
// (row, pos) ambiguity list — the device-upload layout of
// ops/pack.pack_reads_2bit, built in one pass instead of numpy's
// shift/reshape pipeline (measured 124 ms per 32k-read group in numpy —
// the largest serial host stage of the device pipeline).  Returns the
// ambiguity count; when it exceeds amb_cap the caller must fall back
// (entries past amb_cap are dropped).
int64_t kart_pack_reads_2bit(const int8_t* reads, int32_t B, int32_t l_max,
                             uint32_t* words, int32_t nw, int32_t* amb_r,
                             int32_t* amb_p, int64_t amb_cap) {
  int64_t n_amb = 0;
  for (int32_t i = 0; i < B; i++) {
    const int8_t* row = reads + (int64_t)i * l_max;
    uint32_t* wrow = words + (int64_t)i * nw;
    int32_t p = 0;
    for (int32_t w = 0; w < nw; w++) {
      uint32_t acc = 0;
      int32_t lim = l_max - p < 16 ? l_max - p : 16;
      for (int32_t j = 0; j < lim; j++, p++) {
        uint32_t c = (uint32_t)(uint8_t)row[p];
        if (c > 3) {
          if (n_amb < amb_cap) {
            amb_r[n_amb] = i;
            amb_p[n_amb] = p;
          }
          n_amb++;
          c = 0;
        }
        acc |= c << (2 * j);
      }
      wrow[w] = acc;
    }
  }
  return n_amb;
}

// Test-only: run one NW alignment, forcing the scalar DP when `scalar`
// is nonzero (else the production dispatch: AVX2 anti-diagonal with
// scalar fallback), returning the aligned pair null-joined in `out`
// (caller provides cap bytes; returns the needed size).  Lets the pytest
// fuzz harness compare the two implementations pair-for-pair
// (tests/test_nw_kernel.py).
int64_t kart_nw_debug(const char* a, const char* b, int32_t scalar,
                      char* out, int64_t cap) {
  std::string s1(a), s2(b);
  int m = (int)s1.size() + 1, n = (int)s2.size() + 1;
  if (!(m == 2 && n == 2)) {
    if (scalar)
      nw_alignment_scalar(s1, s2);
    else
      nw_alignment(s1, s2);
  }
  int64_t need = (int64_t)s1.size() + 1 + (int64_t)s2.size() + 1;
  if (need <= cap) {
    memcpy(out, s1.data(), s1.size());
    out[s1.size()] = '\0';
    memcpy(out + s1.size() + 1, s2.data(), s2.size());
    out[s1.size() + 1 + s2.size()] = '\0';
  }
  return need;
}

void kart_free(char* p) { free(p); }

// --- chunked reader ---------------------------------------------------------

void* kart_reader_open(const char* path1, const char* path2, int32_t fastq,
                       int32_t pair_end, int32_t pacbio, int32_t n_bufs) {
  NativeReader* r = new NativeReader();
  r->fastq = fastq != 0;
  r->pair_end = pair_end != 0;
  r->limit = pacbio ? 10 : 4000;
  r->n_bufs = n_bufs >= 3 ? n_bufs : 3;
  r->bufs.resize(r->n_bufs);
  if (!r->f1.open(path1)) {
    delete r;
    return nullptr;
  }
  r->sep = path2 != nullptr && path2[0] != '\0';
  if (r->sep && !r->f2.open(path2)) {
    r->f1.close();
    delete r;
    return nullptr;
  }
  r->cur = r->n_bufs - 1;  // first next_chunk advances to 0
  r->start_prefetch();     // fills bufs[0]
  return r;
}

// Returns n_reads (0 at end of input).  Pointers stay valid until the next
// kart_reader_next_chunk / kart_reader_close call.  *qual is NULL for FASTA.
int32_t kart_reader_next_chunk(void* h, const uint8_t** seq,
                               const int64_t** seq_off, const uint8_t** qual,
                               const int64_t** qual_off, const char** headers,
                               const int64_t** header_off) {
  NativeReader* r = (NativeReader*)h;
  if (r->exhausted) return 0;
  r->join_prefetch();
  r->cur = (r->cur + 1) % r->n_bufs;
  ChunkBufs& b = r->bufs[r->cur];
  if (b.n == r->limit)
    r->start_prefetch();  // full chunk: more may follow
  else
    r->exhausted = true;  // partial chunk: input ended
  *seq = b.seq.data();
  *seq_off = b.seq_off.data();
  *qual = (r->fastq && !b.qual.empty()) ? b.qual.data() : nullptr;
  *qual_off = b.qual_off.data();
  *headers = b.headers.data();
  *header_off = b.header_off.data();
  return b.n;
}

void kart_reader_close(void* h) {
  NativeReader* r = (NativeReader*)h;
  r->join_prefetch();
  r->f1.close();
  r->f2.close();
  delete r;
}

}  // extern "C"
