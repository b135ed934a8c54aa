// Native data-loading runtime for threedgrut_tpu.
//
// Replaces the reference's torch DataLoader worker processes
// (threedgrut/datasets/utils.py:163 MultiEpochsDataLoader + CPU workers)
// with an in-process C++ thread pool: JPEG/PNG decode (libjpeg/libpng),
// box-filter downsampling, and an async prefetch queue, exposed through a
// minimal C ABI consumed via ctypes (threedgrut_tpu/data/native_loader.py).
//
// Build: make -C native   (produces libdataio.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
  bool ok = false;
  std::string error;
};

// ---------------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

Image decode_jpeg(const uint8_t* buf, size_t len) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    img.error = "jpeg decode failed";
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.width = cinfo.output_width;
  img.height = cinfo.output_height;
  img.channels = 3;
  img.data.resize(size_t(img.width) * img.height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) *
                                         img.width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->offset + n > ctx->size) {
    png_error(png, "png: read past end");
  }
  memcpy(out, ctx->data + ctx->offset, n);
  ctx->offset += n;
}

Image decode_png(const uint8_t* buf, size_t len) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    img.error = "png decode failed";
    return img;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  img.width = png_get_image_width(png, info);
  img.height = png_get_image_height(png, info);
  img.channels = png_get_channels(png, info);
  img.data.resize(size_t(img.width) * img.height * img.channels);
  std::vector<png_bytep> rows(img.height);
  for (int y = 0; y < img.height; ++y)
    rows[y] = img.data.data() + size_t(y) * img.width * img.channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_buffer(const uint8_t* buf, size_t size, const char* label);

// box-filter downsample by integer factor (in place)
void box_downsample(Image& img, int downsample) {
  if (!img.ok || downsample <= 1) return;
  int w2 = img.width / downsample, h2 = img.height / downsample;
  int c = img.channels;
  std::vector<uint8_t> out(size_t(w2) * h2 * c);
  for (int y = 0; y < h2; ++y) {
    for (int x = 0; x < w2; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        uint32_t acc = 0;
        for (int dy = 0; dy < downsample; ++dy) {
          const uint8_t* row = img.data.data() +
              (size_t(y * downsample + dy) * img.width) * c;
          for (int dx = 0; dx < downsample; ++dx)
            acc += row[(x * downsample + dx) * c + ch];
        }
        out[(size_t(y) * w2 + x) * c + ch] =
            uint8_t(acc / (downsample * downsample));
      }
    }
  }
  img.data = std::move(out);
  img.width = w2;
  img.height = h2;
}

Image decode_file(const std::string& path, int downsample) {
  Image img;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    img.error = "open failed: " + path;
    return img;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != size_t(size)) {
    fclose(f);
    img.error = "read failed: " + path;
    return img;
  }
  fclose(f);

  img = decode_buffer(buf.data(), buf.size(), path.c_str());
  box_downsample(img, downsample);
  return img;
}

// format-sniffing decode of an in-memory buffer (JPEG/PNG); the NCore
// loader path hands encoded frame bytes straight from the SDK
Image decode_buffer(const uint8_t* buf, size_t size, const char* label) {
  Image img;
  if (size >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    img = decode_jpeg(buf, size);
  } else if (size >= 8 && buf[0] == 0x89 && buf[1] == 'P') {
    img = decode_png(buf, size);
  } else {
    img.error = std::string("unknown image format: ") + label;
  }
  return img;
}

// ---------------------------------------------------------------------------
// prefetching loader
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  int downsample = 1;
  std::vector<std::thread> workers;
  std::deque<int> queue;                 // indices to decode
  std::map<int, Image> ready;
  std::mutex mu;
  std::condition_variable cv_work, cv_ready;
  std::atomic<bool> stop{false};
  size_t max_ready = 64;

  explicit Loader(std::vector<std::string> p, int ds, int n_threads)
      : paths(std::move(p)), downsample(ds) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { worker(); });
  }

  ~Loader() {
    stop = true;
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker() {
    while (!stop) {
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] {
          return stop || (!queue.empty() && ready.size() < max_ready);
        });
        if (stop) return;
        idx = queue.front();
        queue.pop_front();
      }
      Image img = decode_file(paths[idx], downsample);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready[idx] = std::move(img);
      }
      cv_ready.notify_all();
    }
  }

  void request(const int* indices, int n) {
    {
      std::lock_guard<std::mutex> lk(mu);
      for (int i = 0; i < n; ++i) {
        if (!ready.count(indices[i])) queue.push_back(indices[i]);
      }
    }
    cv_work.notify_all();
  }

  bool get(int idx, Image& out) {
    std::unique_lock<std::mutex> lk(mu);
    if (!ready.count(idx)) {
      // demand-load if not queued
      queue.push_front(idx);
      cv_work.notify_all();
    }
    cv_ready.wait(lk, [&] { return stop || ready.count(idx); });
    if (stop) return false;
    out = std::move(ready[idx]);
    ready.erase(idx);
    return true;
  }
};

}  // namespace

extern "C" {

void* dataio_create(const char** paths, int n_paths, int downsample,
                    int n_threads) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), downsample, n_threads);
}

void dataio_destroy(void* handle) { delete static_cast<Loader*>(handle); }

void dataio_prefetch(void* handle, const int* indices, int n) {
  static_cast<Loader*>(handle)->request(indices, n);
}

// Returns 0 on success; fills dims. Caller then calls dataio_copy.
int dataio_get_dims(void* handle, int index, int* width, int* height,
                    int* channels) {
  auto* loader = static_cast<Loader*>(handle);
  Image img;
  if (!loader->get(index, img) || !img.ok) {
    if (!img.error.empty()) fprintf(stderr, "dataio: %s\n",
                                    img.error.c_str());
    return 1;
  }
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  // stash for the copy call (single-consumer contract)
  std::lock_guard<std::mutex> lk(loader->mu);
  loader->ready[-1 - index] = std::move(img);
  return 0;
}

int dataio_copy(void* handle, int index, uint8_t* out, int64_t out_size) {
  auto* loader = static_cast<Loader*>(handle);
  std::lock_guard<std::mutex> lk(loader->mu);
  auto it = loader->ready.find(-1 - index);
  if (it == loader->ready.end()) return 1;
  const Image& img = it->second;
  int64_t need = int64_t(img.width) * img.height * img.channels;
  if (out_size < need) return 2;
  memcpy(out, img.data.data(), need);
  loader->ready.erase(it);
  return 0;
}

// one-shot synchronous decode (no loader instance)
int dataio_decode(const char* path, int downsample, uint8_t* out,
                  int64_t out_capacity, int* width, int* height,
                  int* channels) {
  Image img = decode_file(path, downsample);
  if (!img.ok) {
    fprintf(stderr, "dataio: %s\n", img.error.c_str());
    return 1;
  }
  int64_t need = int64_t(img.width) * img.height * img.channels;
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  if (out == nullptr) return 0;  // size query
  if (out_capacity < need) return 2;
  memcpy(out, img.data.data(), need);
  return 0;
}

// one-shot decode of in-memory encoded bytes (NCore SDK frame handles
// hand encoded JPEG bytes; reference uses simplejpeg/libjpeg-turbo,
// datasetNcore.py:703-721 - this is the same libjpeg path in-process)
int dataio_decode_bytes(const uint8_t* data, int64_t data_len,
                        int downsample, uint8_t* out, int64_t out_capacity,
                        int* width, int* height, int* channels) {
  Image img = decode_buffer(data, size_t(data_len), "<bytes>");
  box_downsample(img, downsample);
  if (!img.ok) {
    fprintf(stderr, "dataio: %s\n", img.error.c_str());
    return 1;
  }
  int64_t need = int64_t(img.width) * img.height * img.channels;
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  if (out == nullptr) return 0;  // size query
  if (out_capacity < need) return 2;
  memcpy(out, img.data.data(), need);
  return 0;
}

}  // extern "C"
