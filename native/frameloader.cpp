// Native RGB-D frame loader: prefetching PNG decoder with a ring buffer.
//
// TPU-native equivalent of the reference's C++ ingress runtime (the
// Camera capture thread + latest-frame mailbox, Camera.cpp:26-106):
// a background thread pool decodes 8-bit RGB and 16-bit depth PNGs
// (libpng) into a fixed ring of pre-allocated frame buffers, so the
// Python host shell / JAX device feed never blocks on file IO or
// decode. Exposed as a plain C API consumed via ctypes
// (kbslam/io/native_loader.py) — no pybind11 dependency.
//
// Semantics differ from the reference mailbox deliberately: datasets
// need every frame in order (no frame dropping), so this is a bounded
// FIFO, not a latest-wins mailbox. The ZMQ live path keeps the
// latest-wins mailbox semantics on the Python side.

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<uint8_t> rgb;     // h*w*3
  std::vector<uint16_t> depth;  // h*w
  int index = -1;
  bool ok = false;
};

bool decode_png_rgb(const char* path, int h, int w, uint8_t* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  const int ih = png_get_image_height(png, info);
  const int iw = png_get_image_width(png, info);
  bool ok = (ih == h && iw == w && png_get_rowbytes(png, info) == size_t(w) * 3);
  if (ok) {
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) rows[y] = out + size_t(y) * w * 3;
    png_read_image(png, rows.data());
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return ok;
}

bool decode_png_depth16(const char* path, int h, int w, uint16_t* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  // PNG stores 16-bit big-endian; swap to host little-endian.
  png_set_swap(png);
  png_read_update_info(png, info);
  const int ih = png_get_image_height(png, info);
  const int iw = png_get_image_width(png, info);
  const int depth_bits = png_get_bit_depth(png, info);
  bool ok = (ih == h && iw == w &&
             png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY);
  if (ok && depth_bits == 16) {
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out + size_t(y) * w);
    png_read_image(png, rows.data());
  } else if (ok && depth_bits == 8) {
    std::vector<uint8_t> tmp(size_t(h) * w);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) rows[y] = tmp.data() + size_t(y) * w;
    png_read_image(png, rows.data());
    for (size_t i = 0; i < tmp.size(); ++i) out[i] = tmp[i];
  } else {
    ok = false;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return ok;
}

}  // namespace

struct FrameLoader {
  int h, w, n_frames, capacity;
  std::vector<std::string> rgb_paths, depth_paths;
  std::vector<Frame> ring;

  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  int next_to_decode = 0;   // next frame index a worker will claim
  int next_to_deliver = 0;  // next frame index the consumer wants
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  Frame* slot(int frame_idx) { return &ring[frame_idx % capacity]; }

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_produce.wait(lk, [&] {
          return stop.load() ||
                 (next_to_decode < n_frames &&
                  next_to_decode - next_to_deliver < capacity);
        });
        if (stop.load()) return;
        idx = next_to_decode++;
      }
      Frame* f = slot(idx);
      bool ok_rgb = decode_png_rgb(rgb_paths[idx].c_str(), h, w, f->rgb.data());
      bool ok_d =
          decode_png_depth16(depth_paths[idx].c_str(), h, w, f->depth.data());
      {
        std::lock_guard<std::mutex> lk(mu);
        f->index = idx;
        f->ok = ok_rgb && ok_d;
        cv_consume.notify_all();
      }
    }
  }
};

extern "C" {

FrameLoader* fl_create(const char** rgb_paths, const char** depth_paths,
                       int n_frames, int h, int w, int ring_capacity,
                       int n_threads) {
  auto* fl = new FrameLoader();
  fl->h = h;
  fl->w = w;
  fl->n_frames = n_frames;
  fl->capacity = ring_capacity > 0 ? ring_capacity : 4;
  for (int i = 0; i < n_frames; ++i) {
    fl->rgb_paths.emplace_back(rgb_paths[i]);
    fl->depth_paths.emplace_back(depth_paths[i]);
  }
  fl->ring.resize(fl->capacity);
  for (auto& f : fl->ring) {
    f.rgb.resize(size_t(h) * w * 3);
    f.depth.resize(size_t(h) * w);
  }
  const int nt = n_threads > 0 ? n_threads : 1;
  for (int i = 0; i < nt; ++i)
    fl->workers.emplace_back(&FrameLoader::worker, fl);
  return fl;
}

// Blocks until frame `next_to_deliver` is decoded; copies it out.
// Returns the frame index, or -1 past the end, or -2 on decode failure.
int fl_next(FrameLoader* fl, uint8_t* rgb_out, uint16_t* depth_out) {
  int want;
  {
    std::lock_guard<std::mutex> lk(fl->mu);
    want = fl->next_to_deliver;
  }
  if (want >= fl->n_frames) return -1;
  Frame* f = fl->slot(want);
  {
    std::unique_lock<std::mutex> lk(fl->mu);
    // stop check: fl_destroy must be able to unblock a waiting consumer
    fl->cv_consume.wait(lk, [&] { return fl->stop.load() || f->index == want; });
    if (fl->stop.load() && f->index != want) return -1;
  }
  int rc = f->ok ? want : -2;
  if (f->ok) {
    std::memcpy(rgb_out, f->rgb.data(), f->rgb.size());
    std::memcpy(depth_out, f->depth.data(),
                f->depth.size() * sizeof(uint16_t));
  }
  {
    std::lock_guard<std::mutex> lk(fl->mu);
    fl->next_to_deliver = want + 1;
    fl->cv_produce.notify_all();
  }
  return rc;
}

void fl_destroy(FrameLoader* fl) {
  fl->stop.store(true);
  fl->cv_produce.notify_all();
  fl->cv_consume.notify_all();  // unblock a consumer stuck in fl_next
  for (auto& t : fl->workers) t.join();
  delete fl;
}

}  // extern "C"
