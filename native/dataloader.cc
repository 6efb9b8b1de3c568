// Native RGB-D frame loader: libpng decoding + prefetching thread pool.
//
// TPU-native equivalent of the reference's native data path
// (/root/reference/libvis/src/libvis/image_io_libpng.cc PNG decoding and
// applications/badslam/src/badslam/pre_load_thread.{h,cc} disk prefetch):
// frames ahead of the SLAM cursor are decoded off the main thread so
// ProcessFrame never blocks on disk I/O or PNG inflation.
//
// C ABI (consumed via ctypes from badslam_tpu/io/native_loader.py):
//   void* loader_create(int frame_count, const char** depth_paths,
//                       const char** rgb_paths, int prefetch, int threads);
//   int   loader_get(void* h, int index,
//                    uint16_t* depth_out, int* dh, int* dw,
//                    uint8_t* rgb_out, int* ch, int* cw);   // 0 on success
//   void  loader_destroy(void* h);
//   int   decode_png(const char* path, void* out, int* h, int* w,
//                    int* channels, int* bit_depth);        // one-shot
//
// Buffers passed to loader_get must be large enough for the dataset's image
// size (the Python wrapper probes the first frame with decode_png).

#include <png.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int height = 0;
  int width = 0;
  int channels = 0;
  int bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // row-major, native endian for 16-bit
  bool ok = false;
};

// Decodes an 8- or 16-bit gray/RGB/RGBA PNG. 16-bit values are converted
// from PNG network byte order to host order. Palette images expand to RGB.
Image DecodePng(const std::string& path) {
  Image img;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return img;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return Image{};
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // network -> little endian
  png_read_update_info(png, info);

  bit_depth = png_get_bit_depth(png, info);
  color_type = png_get_color_type(png, info);
  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  img.height = static_cast<int>(h);
  img.width = static_cast<int>(w);
  img.channels = channels;
  img.bit_depth = bit_depth;
  img.data.resize(rowbytes * h);

  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = img.data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  img.ok = true;
  return img;
}

struct Frame {
  Image depth;
  Image rgb;
};

class Loader {
 public:
  Loader(std::vector<std::string> depth_paths,
         std::vector<std::string> rgb_paths, int prefetch, int threads)
      : depth_paths_(std::move(depth_paths)),
        rgb_paths_(std::move(rgb_paths)),
        prefetch_(prefetch < 1 ? 1 : prefetch) {
    int n = threads < 1 ? 1 : threads;
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { WorkerMain(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lock(mutex_);
      quit_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocks until frame `index` is decoded; moves it out of the cache.
  std::shared_ptr<Frame> Get(int index) {
    std::unique_lock<std::mutex> lock(mutex_);
    Schedule(index);
    cv_.wait(lock, [&] { return done_.count(index) > 0 || quit_; });
    if (quit_) return nullptr;
    auto frame = done_[index];
    // Evict frames at or before the cursor; keep the lookahead warm.
    for (auto it = done_.begin(); it != done_.end();) {
      if (it->first <= index) it = done_.erase(it); else ++it;
    }
    cursor_ = index;
    Schedule(index + 1);
    return frame;
  }

 private:
  // Must hold mutex_. Enqueues [index, index+prefetch) if not yet handled.
  void Schedule(int index) {
    bool added = false;
    int end = index + prefetch_;
    if (end > static_cast<int>(depth_paths_.size()))
      end = static_cast<int>(depth_paths_.size());
    for (int i = index; i < end; ++i) {
      if (i < 0 || scheduled_.count(i) || done_.count(i)) continue;
      scheduled_.insert(i);
      queue_.push_back(i);
      added = true;
    }
    if (added) cv_.notify_all();
  }

  void WorkerMain() {
    while (true) {
      int index;
      {
        std::unique_lock<std::mutex> lock(mutex_);
        cv_.wait(lock, [&] { return !queue_.empty() || quit_; });
        if (quit_) return;
        index = queue_.front();
        queue_.pop_front();
      }
      auto frame = std::make_shared<Frame>();
      frame->depth = DecodePng(depth_paths_[index]);
      frame->rgb = DecodePng(rgb_paths_[index]);
      {
        std::lock_guard<std::mutex> lock(mutex_);
        done_[index] = std::move(frame);
        scheduled_.erase(index);
      }
      cv_.notify_all();
    }
  }

  std::vector<std::string> depth_paths_;
  std::vector<std::string> rgb_paths_;
  int prefetch_;
  int cursor_ = -1;

  std::mutex mutex_;
  std::condition_variable cv_;
  std::deque<int> queue_;
  std::map<int, std::shared_ptr<Frame>> done_;
  std::set<int> scheduled_;
  std::vector<std::thread> workers_;
  bool quit_ = false;
};

// Copies only if the decoded image fits in the caller's buffer capacity.
bool CopyImage(const Image& img, void* out, size_t out_capacity, int* oh,
               int* ow) {
  *oh = img.height;
  *ow = img.width;
  if (!img.ok || !out) return false;
  if (img.data.size() > out_capacity) return false;
  std::memcpy(out, img.data.data(), img.data.size());
  return true;
}

}  // namespace

extern "C" {

void* loader_create(int frame_count, const char** depth_paths,
                    const char** rgb_paths, int prefetch, int threads) {
  std::vector<std::string> d(frame_count), c(frame_count);
  for (int i = 0; i < frame_count; ++i) {
    d[i] = depth_paths[i];
    c[i] = rgb_paths[i];
  }
  return new Loader(std::move(d), std::move(c), prefetch, threads);
}

int loader_get(void* handle, int index, uint16_t* depth_out,
               long depth_capacity_bytes, int* dh, int* dw, uint8_t* rgb_out,
               long rgb_capacity_bytes, int* ch, int* cw) {
  auto* loader = static_cast<Loader*>(handle);
  auto frame = loader->Get(index);
  if (!frame || !frame->depth.ok || !frame->rgb.ok) return 1;
  // A frame whose decoded size/format differs from the caller's buffers
  // (e.g. RGBA after an RGB first frame) is an error, never an overflow.
  if (!CopyImage(frame->depth, depth_out,
                 static_cast<size_t>(depth_capacity_bytes), dh, dw)) return 2;
  if (!CopyImage(frame->rgb, rgb_out,
                 static_cast<size_t>(rgb_capacity_bytes), ch, cw)) return 2;
  return 0;
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

int decode_png(const char* path, void* out, int* h, int* w, int* channels,
               int* bit_depth) {
  Image img = DecodePng(path);
  if (!img.ok) return 1;
  *h = img.height;
  *w = img.width;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  if (out) std::memcpy(out, img.data.data(), img.data.size());
  return 0;
}

}  // extern "C"
