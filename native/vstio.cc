// vstio — native flow-file decoding + parallel batch prefetch.
//
// The training data path reads thousands of PFM/FLO optical-flow files per
// epoch (SceneFlow ground-truth flow, ReCoNet/datasets.py sample layout).
// This library decodes them in C++ (header parse, endian conversion,
// bottom-up row flip) and fans a batch of files across a thread pool into
// one caller-provided contiguous buffer, bypassing per-file Python
// overhead.  Exposed through ctypes (vst_tpu/data/native.py) with a pure
// numpy fallback when the shared library is absent.
//
// Build:  make -C native   (produces libvstio.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

bool host_is_little_endian() {
  const uint16_t probe = 1;
  return *reinterpret_cast<const uint8_t*>(&probe) == 1;
}

void byteswap32(float* data, size_t count) {
  auto* words = reinterpret_cast<uint32_t*>(data);
  for (size_t i = 0; i < count; ++i) {
    words[i] = __builtin_bswap32(words[i]);
  }
}

struct File {
  FILE* f = nullptr;
  explicit File(const char* path) : f(std::fopen(path, "rb")) {}
  ~File() {
    if (f) std::fclose(f);
  }
};

bool read_line(FILE* f, std::string* out) {
  out->clear();
  int c;
  while ((c = std::fgetc(f)) != EOF) {
    if (c == '\n') return true;
    out->push_back(static_cast<char>(c));
  }
  return !out->empty();
}

}  // namespace

extern "C" {

// Parse a PFM header.  Returns 0 on success; fills height/width/channels and
// the absolute data offset and scale (sign encodes endianness as in the
// format spec).
int vstio_pfm_header(const char* path, int64_t* height, int64_t* width,
                     int64_t* channels, double* scale) {
  File file(path);
  if (!file.f) return -1;
  std::string line;
  if (!read_line(file.f, &line)) return -2;
  int ch;
  if (line == "PF") {
    ch = 3;
  } else if (line == "Pf") {
    ch = 1;
  } else {
    return -3;
  }
  if (!read_line(file.f, &line)) return -2;
  long w = 0, h = 0;
  if (std::sscanf(line.c_str(), "%ld %ld", &w, &h) != 2) return -4;
  if (!read_line(file.f, &line)) return -2;
  double sc = std::atof(line.c_str());
  if (sc == 0.0) return -5;
  *height = h;
  *width = w;
  *channels = ch;
  *scale = sc;
  return 0;
}

// Decode a PFM file into `out` (H, W, C) float32, top-down row order
// (i.e. already flipped from the format's bottom-up scanlines), converting
// endianness if needed.  `out` must hold height*width*channels floats as
// reported by vstio_pfm_header.  Returns 0 on success.
int vstio_read_pfm(const char* path, float* out, int64_t out_count) {
  int64_t h, w, ch;
  double scale;
  int rc = vstio_pfm_header(path, &h, &w, &ch, &scale);
  if (rc != 0) return rc;
  if (out_count != h * w * ch) return -6;

  File file(path);
  if (!file.f) return -1;
  // Skip the three header lines again.
  std::string line;
  for (int i = 0; i < 3; ++i) {
    if (!read_line(file.f, &line)) return -2;
  }
  const size_t row = static_cast<size_t>(w) * ch;
  std::vector<float> buf(row);
  const bool data_le = scale < 0.0;
  const bool swap = data_le != host_is_little_endian();
  // PFM rows are bottom-up: read row r into output row (h-1-r).
  for (int64_t r = 0; r < h; ++r) {
    if (std::fread(buf.data(), sizeof(float), row, file.f) != row) return -7;
    if (swap) byteswap32(buf.data(), row);
    std::memcpy(out + (h - 1 - r) * row, buf.data(), row * sizeof(float));
  }
  return 0;
}

// Middlebury .flo: "PIEH" magic, little-endian int32 width/height, then
// H*W*2 float32.  Fills height/width on success.
int vstio_flo_header(const char* path, int64_t* height, int64_t* width) {
  File file(path);
  if (!file.f) return -1;
  char magic[4];
  if (std::fread(magic, 1, 4, file.f) != 4) return -2;
  if (std::memcmp(magic, "PIEH", 4) != 0) return -3;
  int32_t w, h;
  if (std::fread(&w, 4, 1, file.f) != 1) return -2;
  if (std::fread(&h, 4, 1, file.f) != 1) return -2;
  *height = h;
  *width = w;
  return 0;
}

int vstio_read_flo(const char* path, float* out, int64_t out_count) {
  int64_t h, w;
  int rc = vstio_flo_header(path, &h, &w);
  if (rc != 0) return rc;
  if (out_count != h * w * 2) return -6;
  File file(path);
  if (!file.f) return -1;
  std::fseek(file.f, 12, SEEK_SET);
  const size_t count = static_cast<size_t>(h) * w * 2;
  if (std::fread(out, sizeof(float), count, file.f) != count) return -7;
  return 0;
}

// Decode a batch of same-shaped flow files (".pfm" → first 2 of 3 channels
// are NOT sliced here; caller slices) in parallel into `out`
// (n, per_file_count) float32.  `paths` is a NUL-separated string of n
// paths.  kind: 0 = pfm, 1 = flo.  Returns 0 if every file decoded.
int vstio_read_flow_batch(const char* paths, int64_t n, int kind,
                          float* out, int64_t per_file_count,
                          int64_t num_threads) {
  std::vector<const char*> files;
  files.reserve(n);
  const char* p = paths;
  for (int64_t i = 0; i < n; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  std::atomic<int64_t> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      const int rc =
          kind == 0
              ? vstio_read_pfm(files[i], out + i * per_file_count,
                               per_file_count)
              : vstio_read_flo(files[i], out + i * per_file_count,
                               per_file_count);
      if (rc != 0) status.store(rc);
    }
  };
  if (num_threads <= 1 || n <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int64_t count = std::min<int64_t>(num_threads, n);
    pool.reserve(count);
    for (int64_t t = 0; t < count; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

}  // extern "C"
