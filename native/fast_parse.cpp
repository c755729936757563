// Native genotype parsing + packing (mixmogam_tpu.native).
//
// The reference parses genotype CSVs line-by-line in pure Python
// (dataParsers.py, SURVEY.md §2.1) — fine for 200k rows on 2008 hardware,
// a bottleneck for the 1M-SNP configs this framework targets. This module
// is the host-side data-plane in C++: a threaded CSV->int8 dosage parser
// and a 2-bit genotype packer/unpacker, exposed through a C ABI consumed
// via ctypes (no pybind11 in this image).
//
// Layout contract (shared with data/genotype.py): row-major (M, n) int8,
// missing = -1; chromosomes int32, positions int64.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no deps)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Count data lines and detect the number of comma-separated fields in the
// header. Returns 0 on success.
int count_csv(const char* path, int64_t* n_rows, int64_t* n_fields) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  // header
  int64_t fields = 1;
  int c;
  while ((c = fgetc(f)) != EOF && c != '\n')
    if (c == ',') fields++;
  if (c == EOF) { fclose(f); return 2; }
  // count remaining newlines (buffered)
  std::vector<char> buf(1 << 20);
  int64_t rows = 0;
  size_t got;
  bool last_was_nl = true;
  while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; i++) {
      if (buf[i] == '\n') rows++;
      last_was_nl = (buf[i] == '\n');
    }
  }
  if (!last_was_nl) rows++;  // file without trailing newline
  fclose(f);
  *n_rows = rows;
  *n_fields = fields;
  return 0;
}

namespace {

// parse one data line "chrom,pos,v,v,..." into row-major outputs
inline bool parse_line(const char* p, const char* end, int64_t row,
                       int64_t n_samples, int8_t* mat, int32_t* chroms,
                       int64_t* poss) {
  // chromosome
  int64_t chrom = 0;
  while (p < end && *p != ',') {
    if (*p >= '0' && *p <= '9') chrom = chrom * 10 + (*p - '0');
    p++;
  }
  if (p >= end) return false;
  p++;
  // position
  int64_t pos = 0;
  while (p < end && *p != ',') {
    if (*p >= '0' && *p <= '9') pos = pos * 10 + (*p - '0');
    p++;
  }
  if (p >= end) return false;
  p++;
  chroms[row] = (int32_t)chrom;
  poss[row] = pos;
  int8_t* out = mat + row * n_samples;
  int64_t i = 0;
  while (i < n_samples && p <= end) {
    // token until ',' or line end
    const char* tok = p;
    while (p < end && *p != ',') p++;
    // parse token: integer dosage or NA/missing
    int v = -1;
    bool neg = false;
    bool digit = false;
    const char* q = tok;
    if (q < p && *q == '-') { neg = true; q++; }
    int acc = 0;
    while (q < p) {
      if (*q >= '0' && *q <= '9') { acc = acc * 10 + (*q - '0'); digit = true; }
      else { digit = false; break; }
      q++;
    }
    v = digit ? (neg ? -acc : acc) : -1;
    out[i++] = (int8_t)(v < 0 || v > 127 ? -1 : v);
    if (p < end) p++;  // skip comma
    else break;
  }
  while (i < n_samples) out[i++] = -1;
  return true;
}

}  // namespace

// Parse the data body of a dosage CSV (after the header line) into
// preallocated arrays. n_threads <= 0 -> hardware concurrency.
// Returns number of rows parsed, or -1 on error.
int64_t parse_dosage_csv(const char* path, int64_t n_rows,
                         int64_t n_samples, int8_t* mat, int32_t* chroms,
                         int64_t* poss, int n_threads) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // slurp whole file (SNP CSVs are <=GBs; bounded by container RAM)
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data((size_t)sz);
  if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -1;
  }
  fclose(f);
  const char* base = data.data();
  const char* eof = base + sz;
  // skip header
  const char* body = (const char*)memchr(base, '\n', (size_t)sz);
  if (!body) return -1;
  body++;

  // index line starts
  std::vector<const char*> starts;
  starts.reserve((size_t)n_rows + 1);
  const char* p = body;
  while (p < eof && (int64_t)starts.size() < n_rows) {
    starts.push_back(p);
    const char* nl = (const char*)memchr(p, '\n', (size_t)(eof - p));
    p = nl ? nl + 1 : eof;
  }
  int64_t rows = (int64_t)starts.size();
  starts.push_back(p);

  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > rows) nt = (int)rows;
  std::vector<std::thread> th;
  int64_t per = (rows + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t lo = t * per, hi = std::min(rows, lo + per);
    if (lo >= hi) break;
    th.emplace_back([&, lo, hi]() {
      for (int64_t r = lo; r < hi; r++) {
        const char* s = starts[(size_t)r];
        const char* e = starts[(size_t)r + 1];
        while (e > s && (e[-1] == '\n' || e[-1] == '\r')) e--;
        parse_line(s, e, r, n_samples, mat, chroms, poss);
      }
    });
  }
  for (auto& x : th) x.join();
  return rows;
}

// ---- 2-bit genotype packing (dosage 0..2 + missing) ------------------
// Codes: 0->0b00, 1->0b01, 2->0b10, missing->0b11. 4 genotypes/byte along
// the sample axis; rows padded to a multiple of 4 samples.

int64_t packed_row_bytes(int64_t n_samples) { return (n_samples + 3) / 4; }

void pack_2bit(const int8_t* mat, int64_t n_rows, int64_t n_samples,
               uint8_t* out) {
  int64_t rb = packed_row_bytes(n_samples);
  for (int64_t r = 0; r < n_rows; r++) {
    const int8_t* row = mat + r * n_samples;
    uint8_t* orow = out + r * rb;
    for (int64_t b = 0; b < rb; b++) {
      uint8_t v = 0;
      for (int k = 0; k < 4; k++) {
        int64_t i = b * 4 + k;
        uint8_t code = 3;
        if (i < n_samples) {
          int8_t g = row[i];
          code = (g >= 0 && g <= 2) ? (uint8_t)g : 3;
        }
        v |= (uint8_t)(code << (2 * k));
      }
      orow[b] = v;
    }
  }
}

void unpack_2bit(const uint8_t* packed, int64_t n_rows, int64_t n_samples,
                 int8_t* out) {
  int64_t rb = packed_row_bytes(n_samples);
  for (int64_t r = 0; r < n_rows; r++) {
    const uint8_t* prow = packed + r * rb;
    int8_t* orow = out + r * n_samples;
    for (int64_t i = 0; i < n_samples; i++) {
      uint8_t code = (uint8_t)((prow[i / 4] >> (2 * (i % 4))) & 3);
      orow[i] = code == 3 ? -1 : (int8_t)code;
    }
  }
}

}  // extern "C"
