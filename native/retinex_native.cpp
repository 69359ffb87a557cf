// retinex_native: host-side image pipeline in C++ (decode + letterbox, threaded).
//
// The TPU-native runtime component replacing the reference's torch DataLoader
// worker-process pool (reference: datasets/dataset.py:291-298) and its
// PIL/OpenCV decode path: JPEG (libjpeg-turbo SIMD) / PNG (libpng) decode,
// half-pixel bilinear resize, gray-114 letterbox padding, assembled into a
// caller-provided NHWC uint8 batch buffer by a std::thread pool — no GIL, no
// process forks, no per-sample Python.
//
// C ABI only (loaded via ctypes from retinex_tpu/data/native_loader.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC RGB
  int h = 0, w = 0;
};

// ---------------- JPEG ----------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- PNG ----------------

bool decode_png(FILE* f, Image* out) {
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  std::vector<png_bytep> rows;  // before setjmp: longjmp must not skip its dtor
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  // Normalize everything to 8-bit RGB.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = int(w);
  out->h = int(h);
  out->data.resize(size_t(h) * w * 3);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// PNG encode: 8-bit RGB, tunable zlib level / filter strategy. PIL's default
// encode (zlib-6, adaptive filters) measures ~390 ms per 1080p frame — 60x
// the device work per frame — so the production save path uses this instead
// (level 1; filters=0 -> NONE for speed, 1 -> SUB: cheap and recovers most
// of the photographic compression).
bool encode_png_file(const char* path, const uint8_t* data, int h, int w, int level,
                     int filters, int strategy) {
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(f);
    return false;
  }
  // Declared BEFORE setjmp: a libpng error longjmp must not jump over a live
  // object whose lifetime began after the setjmp (UB + leak per failure).
  std::vector<png_bytep> rows(h);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_compression_level(png, level);
  if (strategy == 1) {
    png_set_compression_strategy(png, 3 /* Z_RLE */);
  } else if (strategy == 2) {
    png_set_compression_strategy(png, 2 /* Z_HUFFMAN_ONLY */);
  }
  if (filters == 0) {
    png_set_filter(png, 0, PNG_FILTER_NONE);
  } else if (filters == 1) {
    png_set_filter(png, 0, PNG_FILTER_SUB);
  }  // else: libpng default (all filters, adaptive)
  png_set_IHDR(png, info, png_uint_32(w), png_uint_32(h), 8, PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(data + size_t(y) * w * 3);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->h > 0 && out->w > 0;
}

// ---------------- Bilinear resize (half-pixel centers, matches
// retinex_tpu.ops.letterbox._resize_bilinear_np_u8) ----------------

void resize_bilinear_u8(const Image& src, int out_h, int out_w, uint8_t* dst,
                        size_t dst_stride /*bytes per row*/) {
  const int in_h = src.h, in_w = src.w;
  std::vector<int> x0(out_w), x1(out_w);
  std::vector<float> wx(out_w);
  for (int x = 0; x < out_w; ++x) {
    double sx = (x + 0.5) * (double(in_w) / out_w) - 0.5;
    double fx = std::floor(sx);
    int xi = std::min(std::max(int(fx), 0), in_w - 1);
    x0[x] = xi;
    x1[x] = std::min(xi + 1, in_w - 1);
    wx[x] = float(std::min(std::max(sx - xi, 0.0), 1.0));
  }
  for (int y = 0; y < out_h; ++y) {
    double sy = (y + 0.5) * (double(in_h) / out_h) - 0.5;
    double fy = std::floor(sy);
    int y0 = std::min(std::max(int(fy), 0), in_h - 1);
    int y1 = std::min(y0 + 1, in_h - 1);
    float wy = float(std::min(std::max(sy - y0, 0.0), 1.0));
    const uint8_t* r0 = src.data.data() + size_t(y0) * in_w * 3;
    const uint8_t* r1 = src.data.data() + size_t(y1) * in_w * 3;
    uint8_t* drow = dst + size_t(y) * dst_stride;
    for (int x = 0; x < out_w; ++x) {
      const float fx1 = wx[x], fx0 = 1.0f - fx1;
      const float fy1 = wy, fy0 = 1.0f - fy1;
      const uint8_t* p00 = r0 + x0[x] * 3;
      const uint8_t* p01 = r0 + x1[x] * 3;
      const uint8_t* p10 = r1 + x0[x] * 3;
      const uint8_t* p11 = r1 + x1[x] * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * fx0 + p01[c] * fx1;
        float bot = p10[c] * fx0 + p11[c] * fx1;
        float v = top * fy0 + bot * fy1;
        drow[x * 3 + c] = uint8_t(std::min(std::max(std::lround(v), 0L), 255L));
      }
    }
  }
}

// Letterbox one decoded image into an out_h x out_w canvas slice of the batch
// buffer (gray-114 padding, centered like the reference's plan geometry).
bool letterbox_into(const Image& img, int new_shape, bool auto_pad, bool scaleup,
                    uint8_t* dst, int out_h, int out_w) {
  // Geometry mirrors retinex_tpu.ops.letterbox.plan_letterbox.
  double r = std::min(double(new_shape) / img.h, double(new_shape) / img.w);
  if (!scaleup) r = std::min(r, 1.0);
  int uw = int(std::lround(img.w * r));
  int uh = int(std::lround(img.h * r));
  int dw = new_shape - uw, dh = new_shape - uh;
  if (auto_pad) {
    dw %= 32;
    dh %= 32;
  }
  int top = int(std::lround(dh / 2.0 - 0.1));
  int left = int(std::lround(dw / 2.0 - 0.1));
  if (uh + top > out_h || uw + left > out_w) return false;

  std::memset(dst, 114, size_t(out_h) * out_w * 3);
  uint8_t* origin = dst + (size_t(top) * out_w + left) * 3;
  if (uh == img.h && uw == img.w) {
    for (int y = 0; y < uh; ++y)
      std::memcpy(origin + size_t(y) * out_w * 3, img.data.data() + size_t(y) * img.w * 3,
                  size_t(uw) * 3);
  } else {
    resize_bilinear_u8(img, uh, uw, origin, size_t(out_w) * 3);
  }
  return true;
}

// ---------------- Thread pool ----------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// One pool per requested size, never deleted: replacing a live pool when a
// concurrent caller asks for a different num_threads would destroy a pool the
// first caller is still submitting to (use-after-free / deadlock in ~ThreadPool).
// Distinct sizes are rare in practice, so the map stays tiny; pools leak at
// process exit by design (their threads are joined only in the destructor).
std::mutex g_pool_mu;
std::unordered_map<int, ThreadPool*>* g_pools = nullptr;

ThreadPool* pool(int n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pools == nullptr) g_pools = new std::unordered_map<int, ThreadPool*>();
  ThreadPool*& p = (*g_pools)[n];
  if (p == nullptr) p = new ThreadPool(n);
  return p;
}

}  // namespace

extern "C" {

// Decode + letterbox a batch of image files into out[batch, out_h, out_w, 3]
// uint8 NHWC. paths: array of C strings. Returns the number of successfully
// processed images; failed slots are filled with gray-114.
int rtx_decode_letterbox_batch(const char** paths, int count, int new_shape,
                               int auto_pad, int scaleup, uint8_t* out, int out_h,
                               int out_w, int num_threads) {
  std::atomic<int> ok_count{0};
  std::atomic<int> remaining{count};
  std::mutex done_mu;
  std::condition_variable done_cv;

  ThreadPool* p = pool(std::max(num_threads, 1));
  const size_t slice = size_t(out_h) * out_w * 3;
  for (int i = 0; i < count; ++i) {
    p->submit([&, i] {
      Image img;
      uint8_t* dst = out + size_t(i) * slice;
      bool ok = decode_file(paths[i], &img) &&
                letterbox_into(img, new_shape, auto_pad != 0, scaleup != 0, dst, out_h, out_w);
      if (!ok) std::memset(dst, 114, slice);
      if (ok) ok_count.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return ok_count.load();
}

// Decode a single image; returns 1 on success and writes (h, w) to dims.
// Call rtx_copy_last is not provided — use rtx_decode_into with a buffer of
// h*w*3 from a prior rtx_probe call.
int rtx_probe(const char* path, int* dims) {
  Image img;
  if (!decode_file(path, &img)) return 0;
  dims[0] = img.h;
  dims[1] = img.w;
  return 1;
}

int rtx_decode_into(const char* path, uint8_t* out, int h, int w) {
  Image img;
  if (!decode_file(path, &img) || img.h != h || img.w != w) return 0;
  std::memcpy(out, img.data.data(), size_t(h) * w * 3);
  return 1;
}

// Encode one HWC RGB uint8 image as a PNG file. level: zlib 1-9;
// filters: 0=NONE (fastest), 1=SUB, 2=libpng adaptive default.
int rtx_encode_png(const uint8_t* img, int h, int w, const char* path, int level,
                   int filters, int strategy) {
  return encode_png_file(path, img, h, w, level, filters, strategy) ? 1 : 0;
}

// (A batched threaded encoder was removed: ctypes releases the GIL during
// rtx_encode_png, so the Python-side saver pool already runs N encodes
// concurrently — one thread pool is enough.)

}  // extern "C"
