// Fast CSV track parser for extrack-tpu.
//
// The reference reads tracks through pandas + a Python loop per track
// (extrack/readers.py:101-221).  For production-scale inputs (10^6+ tracks)
// parsing dominates wall-clock, so this native loader memory-maps the file,
// parses the selected numeric columns in one multithreaded pass, and hands
// flat arrays back to NumPy through ctypes (no pybind11 in this toolchain).
//
// Exposed C ABI:
//   tr_parse_csv(path, sep, col_idx[n_cols], n_cols, out*)   -> handle
//   tr_rows(handle), tr_data(handle)  (row-major doubles, n_cols per row)
//   tr_free(handle)
// Non-numeric cells parse as NaN (callers treat NaN track IDs as missing).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Parsed {
  std::vector<double> data;  // row-major [rows x n_cols]
  int64_t rows = 0;
  int n_cols = 0;
};

// fast positive/negative decimal parse; falls back to strtod for exponents
inline double parse_num(const char* b, const char* e) {
  if (b == e) return NAN;
  const char* p = b;
  bool neg = false;
  if (*p == '-' || *p == '+') { neg = (*p == '-'); ++p; }
  if (p == e) return NAN;
  double v = 0.0;
  bool any = false;
  while (p < e && *p >= '0' && *p <= '9') { v = v * 10.0 + (*p - '0'); ++p; any = true; }
  if (p < e && *p == '.') {
    ++p;
    double scale = 0.1;
    while (p < e && *p >= '0' && *p <= '9') { v += (*p - '0') * scale; scale *= 0.1; ++p; any = true; }
  }
  if (p < e && (*p == 'e' || *p == 'E')) {
    char buf[64];
    size_t n = std::min<size_t>(e - b, 63);
    memcpy(buf, b, n);
    buf[n] = 0;
    char* endp = nullptr;
    double r = strtod(buf, &endp);
    return endp == buf ? NAN : r;
  }
  if (!any || p != e) {
    // trim trailing spaces / \r
    while (p < e && (*p == ' ' || *p == '\r')) ++p;
    if (!any || p != e) return NAN;
  }
  return neg ? -v : v;
}

void parse_range(const char* data, const char* end, char sep,
                 const int* col_idx, int n_cols, int max_col,
                 std::vector<double>* out) {
  std::vector<const char*> starts(max_col + 2);
  const char* p = data;
  while (p < end) {
    const char* line_end = static_cast<const char*>(
        memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    // split into fields up to max_col; a quote anywhere in this span can
    // embed the separator (RFC-4180 quoting) and silently shift columns —
    // emit NaNs so the Python wrapper falls back to the pandas reader
    int f = 0;
    bool quoted = false;
    starts[0] = p;
    const char* q = p;
    while (q < line_end && f <= max_col) {
      if (*q == sep) starts[++f] = q + 1;
      else if (*q == '"') quoted = true;
      ++q;
    }
    if (quoted) {
      for (int c = 0; c < n_cols; ++c) out->push_back(NAN);
      p = line_end + 1;
      continue;
    }
    if (f >= 0 && p < line_end) {
      // field c spans [starts[c], next sep or line end)
      for (int c = 0; c < n_cols; ++c) {
        int idx = col_idx[c];
        if (idx > f) { out->push_back(NAN); continue; }
        const char* fb = starts[idx];
        const char* fe = line_end;
        for (const char* r = fb; r < line_end; ++r) {
          if (*r == sep) { fe = r; break; }
        }
        if (fe > fb && fe[-1] == '\r') --fe;
        out->push_back(parse_num(fb, fe));
      }
    }
    p = line_end + 1;
  }
}

}  // namespace

extern "C" {

void* tr_parse_csv(const char* path, char sep, const int* col_idx,
                   int n_cols, int skip_header, int n_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) { close(fd); return nullptr; }
  size_t size = static_cast<size_t>(st.st_size);
  const char* base = static_cast<const char*>(
      mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) return nullptr;

  const char* begin = base;
  const char* end = base + size;
  for (int s = 0; s < skip_header && begin < end; ++s) {
    const char* nl = static_cast<const char*>(memchr(begin, '\n', end - begin));
    begin = nl ? nl + 1 : end;
  }
  int max_col = 0;
  for (int c = 0; c < n_cols; ++c) max_col = std::max(max_col, col_idx[c]);

  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  size_t span = end - begin;
  if (span < (1 << 20)) n_threads = 1;

  // chunk at line boundaries
  std::vector<const char*> bounds(n_threads + 1);
  bounds[0] = begin;
  bounds[n_threads] = end;
  for (int i = 1; i < n_threads; ++i) {
    const char* guess = begin + span * i / n_threads;
    const char* nl = static_cast<const char*>(
        memchr(guess, '\n', end - guess));
    bounds[i] = nl ? nl + 1 : end;
  }
  std::vector<std::vector<double>> parts(n_threads);
  std::vector<std::thread> threads;
  for (int i = 0; i < n_threads; ++i) {
    threads.emplace_back([&, i] {
      if (bounds[i] < bounds[i + 1])
        parse_range(bounds[i], bounds[i + 1], sep, col_idx, n_cols, max_col,
                    &parts[i]);
    });
  }
  for (auto& t : threads) t.join();
  munmap(const_cast<char*>(base), size);

  auto* out = new Parsed();
  out->n_cols = n_cols;
  size_t total = 0;
  for (auto& p : parts) total += p.size();
  out->data.reserve(total);
  for (auto& p : parts)
    out->data.insert(out->data.end(), p.begin(), p.end());
  out->rows = static_cast<int64_t>(out->data.size() / n_cols);
  return out;
}

int64_t tr_rows(void* handle) {
  return handle ? static_cast<Parsed*>(handle)->rows : -1;
}

const double* tr_data(void* handle) {
  return handle ? static_cast<Parsed*>(handle)->data.data() : nullptr;
}

void tr_free(void* handle) { delete static_cast<Parsed*>(handle); }

}  // extern "C"
