// Native LOBSTER CSV parser.
//
// Host-side replacement for the pandas read_csv stage of the data pipeline
// (reference: lobster_loader.py:726-889 reads message/orderbook CSV pairs
// with a pandas ThreadPool). Parsing is the dominant cost of a cache-miss
// load — a year of one stock is tens of GB of CSV — so it is done here in
// C++: the file is read once into memory, split into per-thread chunks at
// line boundaries, and parsed with branch-light scalar code. The numpy
// preprocessing that follows (session filter, type-4 merge, windowing) stays
// in Python and is bit-identical regardless of which parser produced the
// arrays.
//
// Exactness note: LOBSTER time stamps have a <=5-digit integer part and a
// 9-digit fraction — 14 significant digits, so the integer mantissa is
// exact in double and one correctly-rounded division by 1e9 yields the same
// double as pandas' precise_xstrtod and glibc strtod. We parse digits
// manually and divide once, which matches both.
//
// Build: make native  (g++ -O3 -shared -fPIC -pthread)
// Python binding: ctypes (jaxmarl_hft_tpu/data/native_csv.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  const char* begin;
  const char* end;
  int64_t rows;       // lines with content in this chunk
  int64_t row_offset; // global row index of this chunk's first line
};

// Split [data, data+size) into nthreads chunks at line boundaries and count
// non-empty lines per chunk.
std::vector<Chunk> split_chunks(const char* data, size_t size, int nthreads) {
  std::vector<Chunk> chunks;
  size_t target = size / (size_t)nthreads + 1;
  const char* p = data;
  const char* end = data + size;
  while (p < end) {
    const char* cend = p + target < end ? p + target : end;
    // advance to the next newline (chunk ends after it)
    while (cend < end && *cend != '\n') ++cend;
    if (cend < end) ++cend;
    chunks.push_back(Chunk{p, cend, 0, 0});
    p = cend;
  }
  return chunks;
}

inline bool line_has_content(const char* p, const char* eol) {
  for (; p < eol; ++p)
    if (*p != '\r' && *p != ' ' && *p != '\t') return true;
  return false;
}

void count_rows(Chunk* c) {
  int64_t rows = 0;
  const char* p = c->begin;
  while (p < c->end) {
    const char* eol = (const char*)memchr(p, '\n', (size_t)(c->end - p));
    const char* line_end = eol ? eol : c->end;
    if (line_has_content(p, line_end)) ++rows;
    p = eol ? eol + 1 : c->end;
  }
  c->rows = rows;
}

// Parse a signed integer; advances *pp past the number. No overflow checks
// (LOBSTER fields fit int64 comfortably).
inline int64_t parse_i64(const char** pp, const char* end) {
  const char* p = *pp;
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
  *pp = p;
  return neg ? -v : v;
}

static const double kPow10[19] = {
    1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,
    1e10, 1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18};

// Parse a decimal like 34200.004241176 exactly (integer mantissa in double,
// one division). Falls back to strtod for exotic input (exponents, >18
// digits).
inline double parse_time(const char** pp, const char* end) {
  const char* p = *pp;
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  const char* start = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  uint64_t mant = 0;
  int digits = 0, frac = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    mant = mant * 10 + (uint64_t)(*p - '0');
    ++digits; ++p;
  }
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') {
      mant = mant * 10 + (uint64_t)(*p - '0');
      ++digits; ++frac; ++p;
    }
  }
  if (digits > 0 && digits <= 18 &&
      (p == end || *p == ',' || *p == '\r' || *p == '\n' || *p == ' ')) {
    *pp = p;
    double v = (double)mant / kPow10[frac];
    return neg ? -v : v;
  }
  // slow path
  char* q;
  double v = strtod(start, &q);
  *pp = q;
  return v;
}

inline void skip_field_sep(const char** pp, const char* end) {
  const char* p = *pp;
  while (p < end && *p != ',' && *p != '\n') ++p;
  if (p < end && *p == ',') ++p;
  *pp = p;
}

// Parse message-chunk lines: col0 -> time[row], cols 1..5 -> ints[row*5..].
void parse_msg_chunk(const Chunk* c, double* time_out, int64_t* int_out) {
  int64_t row = c->row_offset;
  const char* p = c->begin;
  while (p < c->end) {
    const char* eol = (const char*)memchr(p, '\n', (size_t)(c->end - p));
    const char* line_end = eol ? eol : c->end;
    if (line_has_content(p, line_end)) {
      const char* q = p;
      time_out[row] = parse_time(&q, line_end);
      skip_field_sep(&q, line_end);
      for (int col = 0; col < 5; ++col) {
        int_out[row * 5 + col] = parse_i64(&q, line_end);
        skip_field_sep(&q, line_end);
      }
      ++row;
    }
    p = eol ? eol + 1 : c->end;
  }
}

// Parse book-chunk lines: ncols int64 fields per line.
void parse_book_chunk(const Chunk* c, int ncols, int64_t* out) {
  int64_t row = c->row_offset;
  const char* p = c->begin;
  while (p < c->end) {
    const char* eol = (const char*)memchr(p, '\n', (size_t)(c->end - p));
    const char* line_end = eol ? eol : c->end;
    if (line_has_content(p, line_end)) {
      const char* q = p;
      for (int col = 0; col < ncols; ++col) {
        out[row * ncols + col] = parse_i64(&q, line_end);
        skip_field_sep(&q, line_end);
      }
      ++row;
    }
    p = eol ? eol + 1 : c->end;
  }
}

char* read_file(const char* path, size_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 0) { fclose(f); return nullptr; }
  char* buf = (char*)malloc((size_t)sz);
  if (buf && sz > 0 && fread(buf, 1, (size_t)sz, f) != (size_t)sz) {
    free(buf);
    buf = nullptr;
  }
  fclose(f);
  *size_out = (size_t)sz;
  return buf;
}

int pick_threads(size_t size) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  // ~4MB minimum per thread; tiny files parse single-threaded
  size_t by_size = size / (4u << 20) + 1;
  return (int)(by_size < hw ? by_size : hw);
}

template <typename F>
void run_parallel(std::vector<Chunk>& chunks, F fn) {
  if (chunks.size() == 1) {
    fn(&chunks[0]);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(chunks.size());
  for (auto& c : chunks) ts.emplace_back([&c, fn] { fn(&c); });
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Parse a LOBSTER message CSV: [time, type, order_id, qty, price, direction]
// (extra trailing columns ignored, matching pandas usecols=range(6)).
// On success returns n_rows and mallocs *time_out (n,) double and
// *int_out (n, 5) int64 row-major. Returns -1 on IO error.
int64_t lobster_parse_messages(const char* path, double** time_out,
                               int64_t** int_out) {
  size_t size = 0;
  char* data = read_file(path, &size);
  if (!data) return -1;
  auto chunks = split_chunks(data, size, pick_threads(size));
  run_parallel(chunks, count_rows);
  int64_t total = 0;
  for (auto& c : chunks) { c.row_offset = total; total += c.rows; }
  double* times = (double*)malloc(sizeof(double) * (size_t)(total ? total : 1));
  int64_t* ints =
      (int64_t*)malloc(sizeof(int64_t) * 5 * (size_t)(total ? total : 1));
  if (!times || !ints) {
    free(times); free(ints); free(data);
    return -1;
  }
  run_parallel(chunks,
               [&](Chunk* c) { parse_msg_chunk(c, times, ints); });
  free(data);
  *time_out = times;
  *int_out = ints;
  return total;
}

// Parse an all-integer CSV (orderbook files). Column count is taken from the
// first line. Returns n_rows, sets *ncols_out, mallocs *out (n, ncols) int64
// row-major. Returns -1 on IO error, -2 on empty file.
int64_t lobster_parse_book(const char* path, int32_t* ncols_out,
                           int64_t** out) {
  size_t size = 0;
  char* data = read_file(path, &size);
  if (!data) return -1;
  if (size == 0) { free(data); return -2; }
  // column count from the first line
  const char* eol = (const char*)memchr(data, '\n', size);
  const char* line_end = eol ? eol : data + size;
  int ncols = 1;
  for (const char* p = data; p < line_end; ++p)
    if (*p == ',') ++ncols;
  auto chunks = split_chunks(data, size, pick_threads(size));
  run_parallel(chunks, count_rows);
  int64_t total = 0;
  for (auto& c : chunks) { c.row_offset = total; total += c.rows; }
  int64_t* vals = (int64_t*)malloc(sizeof(int64_t) * (size_t)ncols *
                                   (size_t)(total ? total : 1));
  if (!vals) { free(data); return -1; }
  run_parallel(chunks,
               [&](Chunk* c) { parse_book_chunk(c, ncols, vals); });
  free(data);
  *ncols_out = ncols;
  *out = vals;
  return total;
}

void lobster_free(void* p) { free(p); }

}  // extern "C"
