// n2nmn_io: native data-loading runtime for the TPU NMN framework.
//
// The reference's input hot path is one numpy np.load per example per batch
// over a 29 GB (CLEVR) / 307 GB (VQA) tree of per-image feature files
// (reference util/clevr_train/data_reader.py:58, SURVEY.md hard part e).
// This library replaces it with:
//   * a memory-mapped packed feature store with multi-threaded row gather
//   * a multi-threaded per-file .npy batch reader (reference layout compat)
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// build image).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct NpyInfo {
  size_t data_offset = 0;   // byte offset of raw data
  size_t total_floats = 0;  // product of shape
  int64_t rows = 0;         // first dim (1 for per-image files)
  bool ok = false;
};

// Minimal .npy v1/v2 header parser for little-endian float32 C-order
// arrays (the only format the framework writes).
NpyInfo parse_npy_header(const uint8_t* buf, size_t size) {
  NpyInfo info;
  if (size < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return info;
  uint8_t major = buf[6];
  size_t header_len, header_start;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    header_start = 10;
  } else {
    header_len = buf[8] | (buf[9] << 8) | (buf[10] << 16) |
                 ((size_t)buf[11] << 24);
    header_start = 12;
  }
  if (header_start + header_len > size) return info;
  std::string header((const char*)buf + header_start, header_len);
  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos)
    return info;  // only float32 supported
  if (header.find("'fortran_order': True") != std::string::npos)
    return info;
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return info;
  size_t lp = header.find('(', sp);
  size_t rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) return info;
  std::string dims = header.substr(lp + 1, rp - lp - 1);
  info.total_floats = 1;
  info.rows = 0;
  size_t pos = 0;
  bool first = true;
  while (pos < dims.size()) {
    while (pos < dims.size() && (dims[pos] == ' ' || dims[pos] == ','))
      ++pos;
    if (pos >= dims.size()) break;
    int64_t d = strtoll(dims.c_str() + pos, nullptr, 10);
    if (d <= 0) return info;
    info.total_floats *= (size_t)d;
    if (first) { info.rows = d; first = false; }
    while (pos < dims.size() && dims[pos] != ',') ++pos;
  }
  info.data_offset = header_start + header_len;
  info.ok = info.total_floats > 0;
  return info;
}

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  size_t data_offset = 0;
  int64_t rows = 0;
  size_t row_floats = 0;
};

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  int workers = std::min(num_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    threads.emplace_back([=, &fn]() {
      for (int i = w; i < n; i += workers) fn(i);
    });
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

void* n2nmn_open_store(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { close(fd); return nullptr; }
  NpyInfo info = parse_npy_header((const uint8_t*)base, st.st_size);
  if (!info.ok || info.rows == 0) {
    munmap(base, st.st_size); close(fd); return nullptr;
  }
  auto* s = new Store;
  s->fd = fd;
  s->base = (const uint8_t*)base;
  s->size = st.st_size;
  s->data_offset = info.data_offset;
  s->rows = info.rows;
  s->row_floats = info.total_floats / info.rows;
  madvise(base, st.st_size, MADV_RANDOM);
  return s;
}

int64_t n2nmn_store_rows(void* h) { return ((Store*)h)->rows; }
int64_t n2nmn_store_row_floats(void* h) {
  return (int64_t)((Store*)h)->row_floats;
}

void n2nmn_close_store(void* h) {
  auto* s = (Store*)h;
  munmap((void*)s->base, s->size);
  close(s->fd);
  delete s;
}

// Gather rows idx[0..n) from the packed store into out [n, row_floats].
int n2nmn_gather(void* h, const int64_t* idx, int n, float* out,
                 int num_threads) {
  auto* s = (Store*)h;
  const size_t row_bytes = s->row_floats * sizeof(float);
  for (int i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= s->rows) return -1;
  parallel_for(n, num_threads, [&](int i) {
    memcpy(out + (size_t)i * s->row_floats,
           s->base + s->data_offset + (size_t)idx[i] * row_bytes,
           row_bytes);
  });
  return 0;
}

// Load n per-image .npy files (each [1, ...] or [...] float32 with
// floats_per_file elements) into out [n, floats_per_file], in parallel.
int n2nmn_load_npy_batch(const char** paths, int n, float* out,
                         int64_t floats_per_file, int num_threads) {
  std::vector<int> status(n, 0);
  parallel_for(n, num_threads, [&](int i) {
    int fd = open(paths[i], O_RDONLY);
    if (fd < 0) { status[i] = -1; return; }
    uint8_t header[128];
    ssize_t got = pread(fd, header, sizeof(header), 0);
    NpyInfo info = parse_npy_header(header, got);
    if (!info.ok || (int64_t)info.total_floats != floats_per_file) {
      close(fd); status[i] = -2; return;
    }
    size_t bytes = info.total_floats * sizeof(float);
    uint8_t* dst = (uint8_t*)(out + (size_t)i * floats_per_file);
    size_t off = 0;
    while (off < bytes) {
      ssize_t r = pread(fd, dst + off, bytes - off,
                        info.data_offset + off);
      if (r <= 0) { status[i] = -3; break; }
      off += r;
    }
    close(fd);
  });
  for (int i = 0; i < n; ++i)
    if (status[i] != 0) return status[i];
  return 0;
}

}  // extern "C"
