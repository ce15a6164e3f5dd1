// Fast ASCII-table loader for training grids and EOS tables.
//
// Native counterpart of the reference's hot host-side IO: NMMA reads
// thousands of whitespace photometry/EOS tables per training or
// EOS-to-RAM run through pandas/np.loadtxt
// (nmma/em/io.py:read_photometry_files, nmma/eos/eos_processing.py
// tabulated loaders). This library mmaps each file, parses floats with a
// branch-light scanner, and fans file parsing out over a thread pool;
// Python binds it with ctypes (no pybind11 dependency).
//
// Exported C ABI:
//   nmma_parse_table(path, &rows, &cols) -> double*  (caller frees)
//   nmma_free(ptr)
//   nmma_parse_many(paths, n, out_ptrs, out_rows, out_cols, n_threads)

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Table {
  double *data = nullptr;
  int64_t rows = 0;
  int64_t cols = 0;
};

// parse one whitespace-separated numeric table; '#' starts a comment line,
// non-numeric header lines are skipped (bulla grids carry a '# t[days] ...'
// header; some files have bare-word headers)
Table parse_buffer(const char *buf, size_t len) {
  Table t;
  std::vector<double> values;
  values.reserve(4096);
  int64_t cols = 0;
  size_t i = 0;
  while (i < len) {
    // one line
    size_t line_end = i;
    while (line_end < len && buf[line_end] != '\n') line_end++;
    size_t j = i;
    while (j < line_end && std::isspace((unsigned char)buf[j])) j++;
    bool comment = (j < line_end && buf[j] == '#');
    if (!comment && j < line_end) {
      int64_t line_cols = 0;
      size_t save_size = values.size();
      bool bad = false;
      while (j < line_end) {
        while (j < line_end && std::isspace((unsigned char)buf[j])) j++;
        if (j >= line_end) break;
        char *endp = nullptr;
        double v = std::strtod(buf + j, &endp);
        if (endp == buf + j || endp > buf + line_end) {
          bad = true;  // non-numeric token: treat the line as a header
          break;
        }
        values.push_back(v);
        line_cols++;
        j = endp - buf;
      }
      if (bad) {
        values.resize(save_size);
      } else if (line_cols > 0) {
        if (cols == 0) cols = line_cols;
        if (line_cols == cols) {
          t.rows++;
        } else {
          values.resize(values.size() - line_cols);  // ragged line: drop
        }
      }
    }
    i = line_end + 1;
  }
  t.cols = cols;
  if (t.rows * t.cols > 0) {
    t.data = (double *)std::malloc(sizeof(double) * t.rows * t.cols);
    std::memcpy(t.data, values.data(), sizeof(double) * t.rows * t.cols);
  }
  return t;
}

Table parse_file(const char *path) {
  Table t;
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return t;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    ::close(fd);
    return t;
  }
  void *mapped = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (mapped == MAP_FAILED) return t;
  t = parse_buffer((const char *)mapped, st.st_size);
  ::munmap(mapped, st.st_size);
  return t;
}

}  // namespace

extern "C" {

double *nmma_parse_table(const char *path, int64_t *rows, int64_t *cols) {
  Table t = parse_file(path);
  *rows = t.rows;
  *cols = t.cols;
  return t.data;
}

void nmma_free(double *ptr) { std::free(ptr); }

void nmma_parse_many(const char **paths, int64_t n, double **out_data,
                     int64_t *out_rows, int64_t *out_cols,
                     int64_t n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      Table t = parse_file(paths[i]);
      out_data[i] = t.data;
      out_rows[i] = t.rows;
      out_cols[i] = t.cols;
    }
  };
  std::vector<std::thread> threads;
  int64_t spawn = std::min<int64_t>(n_threads, n);
  for (int64_t k = 0; k < spawn; k++) threads.emplace_back(worker);
  for (auto &th : threads) th.join();
}

}  // extern "C"
