// npcd_tpu native runtime: threaded host-side data plumbing.
//
// The reference's native code is all CUDA compute (torch_knnquery,
// flash-attn); on TPU those live in Pallas/XLA. What remains host-side and
// benefits from native code is the data path feeding the chips: PNG decode +
// resize, batch collation, and farthest-point sampling, all GIL-free and
// thread-pooled. Exposed as a C ABI consumed via ctypes
// (npcd_tpu/runtime/__init__.py), with pure-python fallbacks when the
// library is not built.
//
// Build: g++ -O3 -march=native -fPIC -shared -o libnpcd_runtime.so
//        npcd_runtime.cpp -lpng -lz -lpthread

#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int threads) : stop_(false) {
    for (int i = 0; i < threads; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Run(int n, const std::function<void(int)>& fn) {
    if (n <= 0) return;
    std::atomic<int> next(0), done(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    int shards = std::min<int>(n, static_cast<int>(workers_.size()));
    if (shards == 0) {  // zero-thread pool: run inline
      for (int i = 0; i < n; ++i) fn(i);
      return;
    }
    for (int s = 0; s < shards; ++s) {
      Submit([&, n] {
        int i;
        while ((i = next.fetch_add(1)) < n) fn(i);
        {
          std::lock_guard<std::mutex> lock(done_mu);
          done.fetch_add(1);
        }
        done_cv.notify_one();
      });
    }
    std::unique_lock<std::mutex> lock(done_mu);
    done_cv.wait(lock, [&] { return done.load() == shards; });
  }

 private:
  void Submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// Decode one PNG to RGB uint8. Returns true on success.
bool DecodePng(const char* path, std::vector<uint8_t>* rgb, int* w, int* h) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // composite alpha over white (SRN images are white-background renders;
  // PIL convert("RGB") drops alpha, which for white bg is equivalent)
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = rgb->data() + static_cast<size_t>(y) * *w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// Nearest-neighbor resize matching PIL Image.resize default for downscale
// parity is bilinear; use a simple box-free bilinear.
void ResizeBilinear(const uint8_t* src, int sw, int sh, float* dst, int dw,
                    int dh) {
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sh / dh - 0.5f;
    int y0 = std::max(0, static_cast<int>(std::floor(fy)));
    int y1 = std::min(sh - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sw / dw - 0.5f;
      int x0 = std::max(0, static_cast<int>(std::floor(fx)));
      int x1 = std::min(sw - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] = v / 255.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

void* nr_create_pool(int threads) { return new ThreadPool(threads); }

void nr_destroy_pool(void* pool) { delete static_cast<ThreadPool*>(pool); }

// Decode n PNGs in parallel into out [n, size, size, 3] float32 in [0, 1].
// Returns the number of successfully decoded images.
int nr_decode_png_batch(void* pool, const char** paths, int n, int size,
                        float* out) {
  std::atomic<int> ok(0);
  auto work = [&](int i) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    if (!DecodePng(paths[i], &rgb, &w, &h)) return;
    ResizeBilinear(rgb.data(), w, h,
                   out + static_cast<size_t>(i) * size * size * 3, size, size);
    ok.fetch_add(1);
  };
  static_cast<ThreadPool*>(pool)->Run(n, work);
  return ok.load();
}

// Parallel batch collation: copy n sources of elem_count floats into dst.
void nr_collate_f32(void* pool, const float** srcs, int n, long elem_count,
                    float* dst) {
  auto work = [&](int i) {
    std::memcpy(dst + static_cast<size_t>(i) * elem_count, srcs[i],
                sizeof(float) * elem_count);
  };
  static_cast<ThreadPool*>(pool)->Run(n, work);
}

// Farthest point sampling: points [n, 3] -> idx_out [k].
void nr_fps(const float* points, long n, int k, int start, int* idx_out) {
  std::vector<float> min_d2(n, 1e30f);
  idx_out[0] = start;
  for (int j = 1; j < k; ++j) {
    const float* last = points + static_cast<size_t>(idx_out[j - 1]) * 3;
    float best = -1.0f;
    long best_i = 0;
    for (long i = 0; i < n; ++i) {
      const float* p = points + static_cast<size_t>(i) * 3;
      float dx = p[0] - last[0], dy = p[1] - last[1], dz = p[2] - last[2];
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < min_d2[i]) min_d2[i] = d2;
      if (min_d2[i] > best) {
        best = min_d2[i];
        best_i = i;
      }
    }
    idx_out[j] = static_cast<int>(best_i);
  }
}

}  // extern "C"
