// Native data-path helpers for point_dae_tpu.
//
// Role of the reference's native runtime pieces on the IO side: the torch
// DataLoader's C++ worker pool + the .npy decoding that dominated its
// dataloader hot loop. Exposed through a minimal C ABI consumed via ctypes
// (point_dae_tpu/data/native_io.py).
//
// - pdae_load_npy_batch: parse + copy a list of float32 .npy point-cloud
//   files into one preallocated (B, N, C) buffer on a std::thread pool,
//   with random subsampling to N when the stored cloud is larger.
// - pdae_render_balls: z-buffered sphere-impostor rasterizer, the equivalent
//   of visualizer/render_balls_so.cpp's role in the interactive viewer.
//
// Build: make -C native   (produces libpointdae_native.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal .npy (v1/v2) header parse for little-endian float32/float64 C-order
// arrays. Returns element count per row (cols) and rows, leaves the stream
// positioned at the data start. Returns false on any mismatch.
bool parse_npy_header(FILE* f, int64_t* rows, int64_t* cols, bool* is_f64) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t len16;
    if (fread(&len16, 2, 1, f) != 1) return false;
    header_len = len16;
  } else {
    if (fread(&header_len, 4, 1, f) != 1) return false;
  }
  std::string header(header_len, '\0');
  if (fread(header.data(), 1, header_len, f) != header_len) return false;

  if (header.find("'fortran_order': True") != std::string::npos) return false;
  bool f64 = header.find("'descr': '<f8'") != std::string::npos;
  if (!f64 && header.find("'descr': '<f4'") == std::string::npos) return false;
  *is_f64 = f64;

  size_t sp = header.find("'shape': (");
  if (sp == std::string::npos) return false;
  sp += 10;
  int64_t r = 0, c = 1;
  if (sscanf(header.c_str() + sp, "%ld, %ld", &r, &c) < 1) return false;
  *rows = r;
  *cols = c;
  return true;
}

bool load_one(const char* path, float* dst, int64_t n_points, int64_t n_cols,
              uint64_t seed) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  int64_t rows = 0, cols = 0;
  bool is_f64 = false;
  if (!parse_npy_header(f, &rows, &cols, &is_f64) || cols < n_cols) {
    fclose(f);
    return false;
  }
  const size_t esz = is_f64 ? 8 : 4;
  std::vector<unsigned char> raw(static_cast<size_t>(rows) * cols * esz);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return false;
  }
  fclose(f);

  auto read_val = [&](int64_t r, int64_t c) -> float {
    const unsigned char* p = raw.data() + (static_cast<size_t>(r) * cols + c) * esz;
    if (is_f64) {
      double v;
      memcpy(&v, p, 8);
      return static_cast<float>(v);
    }
    float v;
    memcpy(&v, p, 4);
    return v;
  };

  if (rows == n_points) {
    for (int64_t r = 0; r < n_points; ++r)
      for (int64_t c = 0; c < n_cols; ++c) dst[r * n_cols + c] = read_val(r, c);
    return true;
  }
  // subsample without replacement when larger; repeat-pad when smaller
  // (the reference's random_sample semantics, ShapeNet55Dataset.py:76-88)
  std::mt19937_64 rng(seed);
  if (rows > n_points) {
    std::vector<int64_t> idx(rows);
    for (int64_t i = 0; i < rows; ++i) idx[i] = i;
    for (int64_t i = 0; i < n_points; ++i) {
      std::uniform_int_distribution<int64_t> d(i, rows - 1);
      std::swap(idx[i], idx[d(rng)]);
      for (int64_t c = 0; c < n_cols; ++c)
        dst[i * n_cols + c] = read_val(idx[i], c);
    }
  } else {
    for (int64_t i = 0; i < n_points; ++i) {
      int64_t r = i < rows ? i
                           : std::uniform_int_distribution<int64_t>(0, rows - 1)(rng);
      for (int64_t c = 0; c < n_cols; ++c)
        dst[i * n_cols + c] = read_val(r, c);
    }
  }
  return true;
}

}  // namespace

extern "C" {

// paths: array of B null-terminated file paths.
// out:   preallocated (B * n_points * n_cols) float32 buffer.
// ok:    per-file success flags (B bytes).
// Returns number of successfully loaded files.
int64_t pdae_load_npy_batch(const char** paths, int64_t batch,
                            float* out, int64_t n_points, int64_t n_cols,
                            uint64_t seed, int n_threads,
                            unsigned char* ok) {
  if (n_threads <= 0) n_threads = static_cast<int>(
      std::max(1u, std::thread::hardware_concurrency()));
  std::atomic<int64_t> next(0), loaded(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= batch) return;
      bool good = load_one(paths[i], out + i * n_points * n_cols, n_points,
                           n_cols, seed * 1000003ULL + i);
      ok[i] = good ? 1 : 0;
      if (good) loaded.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min<int64_t>(n_threads, batch);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return loaded.load();
}

// Z-buffered sphere-impostor splatting (role of render_balls_so.cpp):
// points (N,3) in view space (x right, y down, z depth), colors (N,3) in
// [0,1], writes an (H,W,3) float image. Orthographic.
void pdae_render_balls(const float* points, const float* colors, int64_t n,
                       float* image, int h, int w, float radius,
                       float scale, float cx, float cy) {
  std::vector<float> zbuf(static_cast<size_t>(h) * w, 1e30f);
  memset(image, 0, sizeof(float) * h * w * 3);
  const int r = std::max(1, static_cast<int>(radius));
  for (int64_t i = 0; i < n; ++i) {
    const float px = points[i * 3 + 0] * scale + cx;
    const float py = points[i * 3 + 1] * scale + cy;
    const float pz = points[i * 3 + 2];
    const int x0 = static_cast<int>(px);
    const int y0 = static_cast<int>(py);
    for (int dy = -r; dy <= r; ++dy) {
      const int y = y0 + dy;
      if (y < 0 || y >= h) continue;
      for (int dx = -r; dx <= r; ++dx) {
        const int x = x0 + dx;
        if (x < 0 || x >= w) continue;
        const float d2 = static_cast<float>(dx * dx + dy * dy);
        if (d2 > static_cast<float>(r) * r) continue;
        // sphere impostor depth + lambert-ish shade
        const float dz = std::sqrt(static_cast<float>(r) * r - d2);
        const float z = pz - dz / r * radius * 0.01f;
        const size_t pix = static_cast<size_t>(y) * w + x;
        if (z < zbuf[pix]) {
          zbuf[pix] = z;
          const float shade = 0.4f + 0.6f * (dz / r);
          image[pix * 3 + 0] = colors[i * 3 + 0] * shade;
          image[pix * 3 + 1] = colors[i * 3 + 1] * shade;
          image[pix * 3 + 2] = colors[i * 3 + 2] * shade;
        }
      }
    }
  }
}

}  // extern "C"
