// Native VCF GT parser (mixmogam_tpu.native.parse_vcf).
//
// Same data-plane role as fast_parse.cpp's CSV parser: the Python VCF
// reader (data/vcf.py) is line-by-line pure Python — fine for toy files,
// a bottleneck at cohort scale where the GT matrix is GBs. This parses
// the GT field of a PLAIN-TEXT VCF (gzip falls back to Python) into the
// package's row-major (M, n) int8 dosage layout with the EXACT semantics
// of data/vcf.py (parity-pinned in tests/test_vcf.py):
//   - dosage = sum of allele indices; any allele >= 2 (2nd ALT) or a
//     non-integer allele token -> missing (-1); '.'-only calls missing;
//     partial './1' keeps the observed allele; '|' == '/'.
//   - records whose FORMAT lacks GT are skipped.
//   - ploidy = max observed call arity.
//   - CHROM: 'chr' prefix stripped; numeric -> its value; non-numeric ->
//     code -1 + the raw name (Python assigns first-appearance codes).
// Any structural surprise returns -2 and the caller falls back to the
// Python parser, which raises a descriptive error.
//
// Build: make -C native (g++ -O3 -shared -fPIC, no deps).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

inline bool is_ws(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// one genotype call string [b, e) -> dosage (-1 missing); arity out
inline int8_t parse_gt_token(const char* b, const char* e, int* arity) {
  int dos = 0, n_alleles = 0;
  bool bad = false;
  const char* p = b;
  while (p < e) {
    const char* q = p;
    while (q < e && *q != '/' && *q != '|') q++;
    if (q == p + 1 && *p == '.') {
      // unobserved allele: skip
    } else {
      int v = 0;
      bool digit = false;
      for (const char* r = p; r < q; r++) {
        if (*r < '0' || *r > '9') { bad = true; break; }
        v = v * 10 + (*r - '0');
        digit = true;
      }
      if (!digit) bad = true;
      if (bad) break;
      if (v > 1) bad = true;  // touches a 2nd ALT -> missing
      dos += v;
      n_alleles++;
    }
    p = (q < e) ? q + 1 : e;
  }
  if (bad || n_alleles == 0) {
    *arity = 0;
    return -1;
  }
  *arity = n_alleles;
  return (int8_t)dos;
}

struct LineSpan {
  const char* p;
  const char* e;
};

}  // namespace

extern "C" {

// Pass 1: sample count from the #CHROM header, candidate record count,
// and an exact byte budget for the REF/ALT0 string arena
// (len(REF) + len(first ALT) + 2 NULs per record). Returns 0 on
// success, 1 on I/O error, 2 on a malformed/missing header.
int count_vcf(const char* path, int64_t* n_rows, int64_t* n_samples,
              int64_t* allele_bytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  std::string line;
  line.reserve(1 << 16);
  int c;
  int64_t samples = -1, rows = 0, abytes = 0;
  while (true) {
    line.clear();
    while ((c = fgetc(f)) != EOF && c != '\n') line.push_back((char)c);
    if (line.empty() && c == EOF) break;
    if (line.empty()) continue;
    if (line[0] == '#') {
      if (line.rfind("#CHROM", 0) == 0) {
        // 9 fixed columns + samples
        int64_t tabs = 0;
        for (char ch : line)
          if (ch == '\t') tabs++;
        samples = tabs - 8;
        if (samples < 1) { fclose(f); return 2; }
      }
      if (c == EOF) break;
      continue;
    }
    bool content = false;
    for (char ch : line)
      if (!is_ws(ch)) { content = true; break; }
    if (content) {
      rows++;
      // REF = field 3, ALT = field 4 (0-based tab split)
      int field = 0;
      int64_t ref_len = 0, alt_len = 0;
      for (size_t i = 0; i < line.size() && field <= 4; i++) {
        if (line[i] == '\t') {
          field++;
          continue;
        }
        if (field == 3) ref_len++;
        if (field == 4) {
          if (line[i] == ',') field = 5;  // first ALT only
          else alt_len++;
        }
      }
      abytes += ref_len + alt_len + 2;
    }
    if (c == EOF) break;
  }
  fclose(f);
  if (samples < 0) return 2;
  *n_rows = rows;
  *n_samples = samples;
  *allele_bytes = abytes;
  return 0;
}

// Pass 2: parse records. Outputs (all preallocated by the caller):
//   mat          (n_rows_cap, n_samples) int8 dosages
//   poss         (n_rows_cap) int64
//   chrom_codes  (n_rows_cap) int32 — numeric value, or -1 (see names)
//   chrom_names  (n_rows_cap * 16) char — raw CHROM token, NUL-padded
//   ref_alt      arena of NUL-terminated REF,ALT strings per kept row
//   ref_alt_off  (2*n_rows_cap) int64 — offsets of REF and ALT in arena
//   max_arity    int32 — observed ploidy
// Returns kept rows (records with GT), -1 on I/O error, -2 on anything
// malformed (caller falls back to Python).
int64_t parse_vcf(const char* path, int64_t n_rows_cap, int64_t n_samples,
                  int64_t allele_cap, int8_t* mat, int64_t* poss,
                  int32_t* chrom_codes, char* chrom_names, char* ref_alt,
                  int64_t* ref_alt_off, int32_t* max_arity,
                  int n_threads) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data((size_t)sz);
  if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -1;
  }
  fclose(f);
  const char* p = data.data();
  const char* eof = p + sz;

  // index candidate record lines (skip headers/blank)
  std::vector<LineSpan> lines;
  lines.reserve((size_t)n_rows_cap);
  while (p < eof && (int64_t)lines.size() < n_rows_cap) {
    const char* nl = (const char*)memchr(p, '\n', (size_t)(eof - p));
    const char* e = nl ? nl : eof;
    while (e > p && (e[-1] == '\n' || e[-1] == '\r')) e--;
    bool content = false;
    for (const char* q = p; q < e; q++)
      if (!is_ws(*q)) { content = true; break; }
    if (content && *p != '#') lines.push_back({p, e});
    p = nl ? nl + 1 : eof;
  }
  int64_t nlines = (int64_t)lines.size();

  // parallel parse into per-line slots + keep flags
  std::vector<uint8_t> keep((size_t)nlines, 0);
  std::vector<int> arities((size_t)nlines, 1);
  // per-line REF/ALT spans, arena-compacted after the join
  std::vector<const char*> refs((size_t)nlines), alts((size_t)nlines);
  std::vector<int32_t> ref_lens((size_t)nlines), alt_lens((size_t)nlines);
  std::atomic<bool> bad(false);

  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; r++) {
      if (bad.load(std::memory_order_relaxed)) return;
      const char* q = lines[(size_t)r].p;
      const char* e = lines[(size_t)r].e;
      // split the 9 fixed fields
      const char* fb[9];
      const char* fe[9];
      int field = 0;
      fb[0] = q;
      for (const char* s = q; s < e && field < 9; s++) {
        if (*s == '\t') {
          fe[field++] = s;
          if (field < 9) fb[field] = s + 1;
        }
      }
      if (field < 9) { bad.store(true); return; }  // no sample columns
      // CHROM
      const char* cb = fb[0];
      const char* ce = fe[0];
      if (ce - cb >= 3 && (cb[0] == 'c' || cb[0] == 'C') &&
          (cb[1] == 'h' || cb[1] == 'H') && (cb[2] == 'r' || cb[2] == 'R'))
        cb += 3;
      int64_t cv = 0;
      bool cnum = cb < ce;
      for (const char* s = cb; s < ce; s++) {
        if (*s < '0' || *s > '9') { cnum = false; break; }
        cv = cv * 10 + (*s - '0');
      }
      chrom_codes[r] = cnum ? (int32_t)cv : -1;
      size_t name_len = (size_t)(fe[0] - fb[0]);
      if (name_len >= 16) { bad.store(true); return; }
      char* nm = chrom_names + r * 16;
      memcpy(nm, fb[0], name_len);
      memset(nm + name_len, 0, 16 - name_len);
      // POS
      int64_t pos = 0;
      bool pnum = fb[1] < fe[1];
      for (const char* s = fb[1]; s < fe[1]; s++) {
        if (*s < '0' || *s > '9') { pnum = false; break; }
        pos = pos * 10 + (*s - '0');
      }
      if (!pnum) { bad.store(true); return; }
      poss[r] = pos;
      // REF / first ALT spans
      refs[(size_t)r] = fb[3];
      ref_lens[(size_t)r] = (int32_t)(fe[3] - fb[3]);
      const char* ab = fb[4];
      const char* ae = ab;
      while (ae < fe[4] && *ae != ',') ae++;
      alts[(size_t)r] = ab;
      alt_lens[(size_t)r] = (int32_t)(ae - ab);
      // FORMAT: locate GT subfield index
      int gt_idx = -1, idx = 0;
      const char* s = fb[8];
      while (s <= fe[8]) {
        const char* t = s;
        while (t < fe[8] && *t != ':') t++;
        if (t - s == 2 && s[0] == 'G' && s[1] == 'T') {
          gt_idx = idx;
          break;
        }
        idx++;
        s = t + 1;
        if (t >= fe[8]) break;
      }
      if (gt_idx < 0) continue;  // record skipped (no GT)
      keep[(size_t)r] = 1;
      // samples
      int8_t* out = mat + r * n_samples;
      const char* sp = fe[8] + 1;
      int64_t i = 0;
      int row_arity = 1;
      while (i < n_samples && sp <= e) {
        const char* t = sp;
        bool has_colon = false;
        while (t < e && *t != '\t') {
          if (*t == ':') has_colon = true;
          t++;
        }
        // gt_idx-th ':'-separated subfield; a call WITHOUT subfields is
        // used whole regardless of gt_idx (data/vcf.py `_parse_gt` via
        // `call.split(":")[gt_idx] if ":" in call else call`)
        const char* gb = sp;
        if (has_colon) {
          for (int k = 0; k < gt_idx && gb < t; k++) {
            while (gb < t && *gb != ':') gb++;
            if (gb < t) gb++;
          }
        }
        const char* ge = gb;
        while (ge < t && *ge != ':') ge++;
        int ar = 0;
        out[i++] = parse_gt_token(gb, ge, &ar);
        if (ar > row_arity) row_arity = ar;
        sp = (t < e) ? t + 1 : e + 1;
      }
      if (i != n_samples) { bad.store(true); return; }
      arities[(size_t)r] = row_arity;
    }
  };

  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > nlines) nt = (int)(nlines > 0 ? nlines : 1);
  std::vector<std::thread> th;
  int64_t per = nt > 0 ? (nlines + nt - 1) / nt : 0;
  for (int t = 0; t < nt; t++) {
    int64_t lo = t * per, hi = std::min(nlines, lo + per);
    if (lo >= hi) break;
    th.emplace_back(work, lo, hi);
  }
  for (auto& x : th) x.join();
  if (bad.load()) return -2;

  // serial compaction of kept rows + arena fill
  int64_t w = 0, aoff = 0;
  int32_t arity = 1;
  for (int64_t r = 0; r < nlines; r++) {
    if (!keep[(size_t)r]) continue;
    if (w != r) {
      memmove(mat + w * n_samples, mat + r * n_samples,
              (size_t)n_samples);
      poss[w] = poss[r];
      chrom_codes[w] = chrom_codes[r];
      memcpy(chrom_names + w * 16, chrom_names + r * 16, 16);
    }
    if (aoff + ref_lens[(size_t)r] + alt_lens[(size_t)r] + 2 > allele_cap)
      return -2;
    ref_alt_off[2 * w] = aoff;
    memcpy(ref_alt + aoff, refs[(size_t)r], (size_t)ref_lens[(size_t)r]);
    aoff += ref_lens[(size_t)r];
    ref_alt[aoff++] = 0;
    ref_alt_off[2 * w + 1] = aoff;
    memcpy(ref_alt + aoff, alts[(size_t)r], (size_t)alt_lens[(size_t)r]);
    aoff += alt_lens[(size_t)r];
    ref_alt[aoff++] = 0;
    if (arities[(size_t)r] > arity) arity = arities[(size_t)r];
    w++;
  }
  *max_arity = arity;
  return w;
}

}  // extern "C"
