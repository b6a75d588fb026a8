// Native host-side image loader for the data pipeline.
//
// The hot host work in training is: decode PNG/JPEG once, then slice many
// random crop windows per epoch. Python/PIL serializes this on the GIL; this
// library does it in C++ — libpng/libjpeg decoding, an LRU decode cache, and
// a persistent thread pool that fills a caller-provided float32 crop batch
// buffer in parallel. Exposed through a minimal C ABI consumed via ctypes
// (simplesr_tpu/data/native_loader.py).
//
// The reference has no native tier at all (SURVEY.md §2: 100 % Python, tf.data
// does its decoding in the TF runtime); this is the TPU-framework equivalent
// of that C++ runtime work.
//
// Build: g++ -O3 -fPIC -shared loader.cpp -o libssrloader.so -lpng -ljpeg -lpthread

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <functional>
#include <list>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
  size_t bytes() const { return rgb.size(); }
};

// ----------------------------------------------------------------- decoding

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->rgb.resize(static_cast<size_t>(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

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
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->rgb.resize(static_cast<size_t>(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->rgb.data() +
                   static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg reports truncated/corrupt streams as WARNINGS and fills the
  // missing scanlines gray — silently poisoned training data. Strict mode:
  // any recoverable corruption is a decode failure.
  bool clean = (jerr.pub.num_warnings == 0);
  jpeg_destroy_decompress(&cinfo);
  return clean;
}

bool decode_file(const std::string& path, Image* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  size_t got = std::fread(magic, 1, 4, f);
  std::rewind(f);
  bool ok = false;
  if (got == 4 && magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  }
  std::fclose(f);
  return ok;
}

// ---------------------------------------------------------------- threadpool

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
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
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// -------------------------------------------------------------------- loader

class Loader {
 public:
  Loader(int threads, size_t cache_bytes)
      : pool_(threads > 0 ? threads
                          : std::max(2u, std::thread::hardware_concurrency())),
        cache_limit_(cache_bytes) {}

  std::shared_ptr<Image> get(const std::string& path) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      auto it = cache_.find(path);
      if (it != cache_.end()) {
        lru_.splice(lru_.begin(), lru_, it->second.second);
        return it->second.first;
      }
    }
    auto img = std::make_shared<Image>();
    if (!decode_file(path, img.get())) return nullptr;
    std::lock_guard<std::mutex> lock(mu_);
    auto it = cache_.find(path);
    if (it != cache_.end()) return it->second.first;  // raced; keep existing
    lru_.push_front(path);
    cache_[path] = {img, lru_.begin()};
    cache_bytes_ += img->bytes();
    while (cache_bytes_ > cache_limit_ && lru_.size() > 1) {
      const std::string& victim = lru_.back();
      auto vit = cache_.find(victim);
      cache_bytes_ -= vit->second.first->bytes();
      cache_.erase(vit);
      lru_.pop_back();
    }
    return img;
  }

  // Fill out[n, ph, pw, 3] with crop windows, in parallel. T is float
  // (converted) or uint8_t (straight row memcpy — the cheaper carrier for
  // host→device transfer: 1 byte/channel instead of 4).
  template <typename T>
  int load_crops(const char** paths, const int* tops, const int* lefts, int n,
                 int ph, int pw, T* out) {
    std::atomic<int> failures{0};
    std::atomic<int> remaining{n};
    std::mutex done_mu;
    std::condition_variable done_cv;
    for (int i = 0; i < n; ++i) {
      std::string path = paths[i];
      int top = tops[i], left = lefts[i];
      T* dst = out + static_cast<size_t>(i) * ph * pw * 3;
      pool_.submit([this, path, top, left, ph, pw, dst, &failures, &remaining,
                    &done_mu, &done_cv] {
        auto img = get(path);
        if (!img || top < 0 || left < 0 || top + ph > img->h ||
            left + pw > img->w) {
          failures.fetch_add(1);
        } else {
          for (int y = 0; y < ph; ++y) {
            const uint8_t* src = img->rgb.data() +
                (static_cast<size_t>(top + y) * img->w + left) * 3;
            T* row = dst + static_cast<size_t>(y) * pw * 3;
            copy_row(src, row, pw * 3);
          }
        }
        if (remaining.fetch_sub(1) == 1) {
          std::lock_guard<std::mutex> lock(done_mu);
          done_cv.notify_all();
        }
      });
    }
    std::unique_lock<std::mutex> lock(done_mu);
    done_cv.wait(lock, [&remaining] { return remaining.load() == 0; });
    return failures.load();
  }

  int image_size(const char* path, int* h, int* w) {
    auto img = get(path);
    if (!img) return 1;
    *h = img->h;
    *w = img->w;
    return 0;
  }

  // Decode a whole image into out[h*w*3] (float32 or uint8).
  template <typename T>
  int load_image(const char* path, T* out) {
    auto img = get(path);
    if (!img) return 1;
    copy_row(img->rgb.data(), out, img->rgb.size());
    return 0;
  }

 private:
  static void copy_row(const uint8_t* src, float* dst, size_t n) {
    for (size_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
  }
  static void copy_row(const uint8_t* src, uint8_t* dst, size_t n) {
    std::memcpy(dst, src, n);
  }

  ThreadPool pool_;
  size_t cache_limit_;
  size_t cache_bytes_ = 0;
  std::mutex mu_;
  std::list<std::string> lru_;
  std::unordered_map<std::string,
                     std::pair<std::shared_ptr<Image>,
                               std::list<std::string>::iterator>>
      cache_;
};

}  // namespace

extern "C" {

void* ssr_create_loader(int num_threads, size_t cache_bytes) {
  return new Loader(num_threads, cache_bytes ? cache_bytes : (2ull << 30));
}

void ssr_destroy_loader(void* loader) { delete static_cast<Loader*>(loader); }

int ssr_image_size(void* loader, const char* path, int* h, int* w) {
  return static_cast<Loader*>(loader)->image_size(path, h, w);
}

int ssr_load_image(void* loader, const char* path, float* out) {
  return static_cast<Loader*>(loader)->load_image(path, out);
}

int ssr_load_crops(void* loader, const char** paths, const int* tops,
                   const int* lefts, int n, int ph, int pw, float* out) {
  return static_cast<Loader*>(loader)->load_crops(paths, tops, lefts, n, ph,
                                                  pw, out);
}

int ssr_load_image_u8(void* loader, const char* path, uint8_t* out) {
  return static_cast<Loader*>(loader)->load_image(path, out);
}

int ssr_load_crops_u8(void* loader, const char** paths, const int* tops,
                      const int* lefts, int n, int ph, int pw, uint8_t* out) {
  return static_cast<Loader*>(loader)->load_crops(paths, tops, lefts, n, ph,
                                                  pw, out);
}

}  // extern "C"
