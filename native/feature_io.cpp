// Native data-plane kernels for the feature input pipeline.
//
// The reference rides PyTorch's C++ DataLoader machinery for its input
// pipeline (multi-worker .npy loading + scipy interp1d resampling,
// reference data/video_dataset.py + train.py:71-75).  This library is the
// TPU framework's native equivalent: .npy parsing, nearest/linear temporal
// resampling, and an OpenMP-parallel batch assembler that fills the
// static-shape (B, T, C) tensor + mask directly, called from Python via
// ctypes (no pybind11 in the image).
//
// Build: make -C native  (produces libdvc_feature_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <string>
#include <vector>
#include <thread>

extern "C" {

// ---------------------------------------------------------------------------
// .npy loading (C-order float32/float64 2-D arrays; the feature dumps)
// ---------------------------------------------------------------------------

// Parses the npy header; returns 0 on success and fills rows/cols/offset/
// dtype ('f' float32, 'd' float64).
static int parse_npy_header(FILE* f, long* rows, long* cols, long* offset,
                            char* dtype) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -2;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t hl;
    if (fread(&hl, 2, 1, f) != 1) return -3;
    header_len = hl;
    *offset = 10 + header_len;
  } else {
    if (fread(&header_len, 4, 1, f) != 1) return -3;
    *offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return -4;
  if (header.find("'fortran_order': True") != std::string::npos) return -5;
  size_t dp = header.find("'descr':");
  if (dp == std::string::npos) return -6;
  if (header.find("<f4", dp) != std::string::npos) *dtype = 'f';
  else if (header.find("<f8", dp) != std::string::npos) *dtype = 'd';
  else return -7;
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return -8;
  size_t lp = header.find('(', sp);
  long r = 0, c = 1;
  int n = sscanf(header.c_str() + lp, "(%ld, %ld", &r, &c);
  if (n < 1) return -9;
  if (n == 1) c = 1;
  *rows = r;
  *cols = c;
  return 0;
}

// Loads a 2-D npy into out (must hold rows*cols floats).  Returns 0 ok.
int dvc_load_npy(const char* path, float* out, long out_rows, long out_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  long rows, cols, offset;
  char dtype;
  int rc = parse_npy_header(f, &rows, &cols, &offset, &dtype);
  if (rc != 0) { fclose(f); return rc; }
  if (rows != out_rows || cols != out_cols) { fclose(f); return -101; }
  fseek(f, offset, SEEK_SET);
  size_t n = (size_t)rows * cols;
  if (dtype == 'f') {
    size_t got = fread(out, sizeof(float), n, f);
    fclose(f);
    return got == n ? 0 : -102;
  }
  std::vector<double> tmp(n);
  size_t got = fread(tmp.data(), sizeof(double), n, f);
  fclose(f);
  if (got != n) return -102;
  for (size_t i = 0; i < n; ++i) out[i] = (float)tmp[i];
  return 0;
}

// Returns rows/cols of an npy without loading (shape probe).
int dvc_npy_shape(const char* path, long* rows, long* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  long offset;
  char dtype;
  int rc = parse_npy_header(f, rows, cols, &offset, &dtype);
  fclose(f);
  return rc;
}

// ---------------------------------------------------------------------------
// temporal resampling (reference resizeFeature semantics,
// video_dataset.py:386-397: x_new = i*(orig-1)/(new-1))
// ---------------------------------------------------------------------------

void dvc_resize_feature(const float* in, long in_rows, long cols,
                        float* out, long out_rows, int linear) {
  if (in_rows == 1) {
    for (long i = 0; i < out_rows; ++i)
      memcpy(out + i * cols, in, cols * sizeof(float));
    return;
  }
  for (long i = 0; i < out_rows; ++i) {
    double x = (out_rows == 1) ? 0.0
               : (double)i * (in_rows - 1) / (double)(out_rows - 1);
    if (!linear) {
      long idx = (long)llround(x);
      if (idx < 0) idx = 0;
      if (idx > in_rows - 1) idx = in_rows - 1;
      memcpy(out + i * cols, in + idx * cols, cols * sizeof(float));
    } else {
      long lo = (long)floor(x);
      if (lo > in_rows - 1) lo = in_rows - 1;
      long hi = lo + 1 > in_rows - 1 ? in_rows - 1 : lo + 1;
      float w = (float)(x - lo);
      const float* a = in + lo * cols;
      const float* b = in + hi * cols;
      float* o = out + i * cols;
      for (long c = 0; c < cols; ++c) o[c] = a[c] * (1.0f - w) + b[c] * w;
    }
  }
}

// ---------------------------------------------------------------------------
// parallel batch assembly: load + resample B videos into (B, T, C) + mask
// ---------------------------------------------------------------------------

// paths: B C-strings.  out: (B, T, C) zero-filled by caller.  mask: (B, T)
// uint8.  lengths: (B,) true (pre-resample) lengths.  Returns number of
// successfully loaded videos; missing files leave zero rows (the
// reference's zero-pad degradation).
int dvc_load_batch(const char** paths, long B, long T, long C,
                   int rescale, int linear, float* out, uint8_t* mask,
                   long* lengths) {
  std::vector<int> oks((size_t)B, 0);
  long n_threads = std::min<long>(B, (long)std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  auto work = [&](long b0, long step) {
    for (long b = b0; b < B; b += step) {
      long rows, cols;
      if (dvc_npy_shape(paths[b], &rows, &cols) != 0 || cols != C) {
        lengths[b] = 0;
        continue;
      }
      std::vector<float> buf((size_t)rows * cols);
      if (dvc_load_npy(paths[b], buf.data(), rows, cols) != 0) {
        lengths[b] = 0;
        continue;
      }
      lengths[b] = rows;
      float* dst = out + (size_t)b * T * C;
      if (rescale) {
        dvc_resize_feature(buf.data(), rows, cols, dst, T, linear);
        memset(mask + b * T, 1, T);
      } else {
        long n = rows < T ? rows : T;
        memcpy(dst, buf.data(), (size_t)n * C * sizeof(float));
        memset(mask + b * T, 0, T);
        memset(mask + b * T, 1, n);
      }
      oks[b] = 1;
    }
  };
  for (long t = 0; t < n_threads; ++t) threads.emplace_back(work, t, n_threads);
  for (auto& th : threads) th.join();
  int total = 0;
  for (long b = 0; b < B; ++b) total += oks[b];
  return total;
}

}  // extern "C"
