// Native image IO for the data pipeline: threaded PNG/JPEG decode + resize.
//
// The reference does all decoding in Python DataLoader worker processes
// (PIL in torch workers); here a small C++ library decodes a whole batch
// with a thread pool and writes directly into one contiguous buffer the
// Python loader hands to the device. Exposed as a C ABI consumed via ctypes
// (geomapnet_tpu/native/__init__.py) — no pybind dependency.
//
// Decoding: libpng (8/16-bit gray/RGB/RGBA -> RGB8) and libjpeg.
// Resize: bilinear, with a 2x2 box prefilter per octave when downscaling
// by more than 2x (cheap antialiasing approximating PIL's filter).

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB8, row-major
  int h = 0;
  int w = 0;
};

bool decode_png(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes < static_cast<size_t>(out->w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  out->data.resize(rowbytes * out->h);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  // compact rows to tight RGB8 if rowbytes > w*3
  if (rowbytes != static_cast<size_t>(out->w) * 3) {
    for (int y = 1; y < out->h; ++y) {
      memmove(out->data.data() + static_cast<size_t>(y) * out->w * 3,
              out->data.data() + static_cast<size_t>(y) * rowbytes,
              static_cast<size_t>(out->w) * 3);
    }
    out->data.resize(static_cast<size_t>(out->h) * out->w * 3);
  }
  return true;
}

// Single-channel decode preserving the raw sensor values (RobotCar Bayer
// mosaics are stored as grayscale PNGs; demosaic happens on the TPU, so any
// host-side channel promotion or resize would corrupt the mosaic).
bool decode_png_gray(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  int color = png_get_color_type(png, info);
  if (color != PNG_COLOR_TYPE_GRAY && color != PNG_COLOR_TYPE_GRAY_ALPHA) {
    // mosaic files are grayscale; anything else is not a raw Bayer frame
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->h);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  if (rowbytes != static_cast<size_t>(out->w)) {
    for (int y = 1; y < out->h; ++y) {
      memmove(out->data.data() + static_cast<size_t>(y) * out->w,
              out->data.data() + static_cast<size_t>(y) * rowbytes,
              static_cast<size_t>(out->w));
    }
    out->data.resize(static_cast<size_t>(out->h) * out->w);
  }
  return true;
}

// 16-bit single-channel decode (7Scenes depth frames are 16-bit gray PNGs
// holding millimeters). Values land in native byte order.
bool decode_png_gray16(const char* path, std::vector<uint16_t>* data, int* h,
                       int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (color != PNG_COLOR_TYPE_GRAY || depth != 16) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  const uint16_t one = 1;
  if (*reinterpret_cast<const uint8_t*>(&one)) {
    png_set_swap(png);  // PNG is big-endian; host is little-endian
  }
  png_read_update_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(*w) * 2) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  data->resize(static_cast<size_t>(*h) * *w);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) {
    rows[y] = reinterpret_cast<png_bytep>(data->data() +
                                          static_cast<size_t>(y) * *w);
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(static_cast<size_t>(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        out->data.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_any(const char* path, Image* out) {
  size_t n = strlen(path);
  if (n > 4 && (strcmp(path + n - 4, ".jpg") == 0 ||
                strcmp(path + n - 5, ".jpeg") == 0)) {
    return decode_jpeg(path, out);
  }
  if (decode_png(path, out)) return true;
  return decode_jpeg(path, out);
}

// 2x2 box downsample (one octave of antialias prefilter)
void box_halve(Image* img) {
  int nh = img->h / 2, nw = img->w / 2;
  std::vector<uint8_t> out(static_cast<size_t>(nh) * nw * 3);
  for (int y = 0; y < nh; ++y) {
    const uint8_t* r0 = img->data.data() + static_cast<size_t>(2 * y) * img->w * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(img->w) * 3;
    uint8_t* dst = out.data() + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      for (int c = 0; c < 3; ++c) {
        int s = r0[(2 * x) * 3 + c] + r0[(2 * x + 1) * 3 + c] +
                r1[(2 * x) * 3 + c] + r1[(2 * x + 1) * 3 + c];
        dst[x * 3 + c] = static_cast<uint8_t>((s + 2) >> 2);
      }
    }
  }
  img->data.swap(out);
  img->h = nh;
  img->w = nw;
}

void resize_bilinear(const Image& src, uint8_t* dst, int oh, int ow) {
  const float sy = static_cast<float>(src.h) / oh;
  const float sx = static_cast<float>(src.w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > src.h - 2) y0 = src.h - 2;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    if (wy > 1) wy = 1;
    const uint8_t* r0 = src.data.data() + static_cast<size_t>(y0) * src.w * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(src.w) * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > src.w - 2) x0 = src.w - 2;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      if (wx > 1) wx = 1;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * r0[x0 * 3 + c] + wx * r0[(x0 + 1) * 3 + c]) +
                  wy * ((1 - wx) * r1[x0 * 3 + c] + wx * r1[(x0 + 1) * 3 + c]);
        drow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

bool load_one(const char* path, uint8_t* dst, int oh, int ow) {
  Image img;
  if (!decode_any(path, &img) || img.h < 2 || img.w < 2) return false;
  // antialias prefilter: halve while the downscale factor exceeds 2x
  while (img.h >= 2 * oh && img.w >= 2 * ow && img.h >= 4 && img.w >= 4) {
    box_halve(&img);
  }
  resize_bilinear(img, dst, oh, ow);
  return true;
}

}  // namespace

extern "C" {

// Decode one image, resized to (out_h, out_w), RGB8 into `out`.
// Returns 1 on success, 0 on failure.
int gm_decode_image(const char* path, uint8_t* out, int out_h, int out_w) {
  return load_one(path, out, out_h, out_w) ? 1 : 0;
}

// Decode `n` images with `n_threads` workers into one contiguous
// (n, out_h, out_w, 3) uint8 buffer. `ok` (length n) receives per-image
// success flags. Returns the number of successfully decoded images.
int gm_decode_batch(const char** paths, int n, uint8_t* out, int out_h,
                    int out_w, int n_threads, uint8_t* ok) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), good(0);
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      bool success = load_one(paths[i], out + i * stride, out_h, out_w);
      if (ok) ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return good.load();
}

// Decode `n` single-channel (Bayer-mosaic) PNGs at NATIVE resolution into a
// contiguous (n, h, w) uint8 buffer — no resize, no channel promotion (the
// mosaic goes to the accelerator raw). Images whose dimensions differ from
// (h, w) are flagged failed. Returns the number decoded successfully.
int gm_decode_batch_gray(const char** paths, int n, uint8_t* out, int h,
                         int w, int n_threads, uint8_t* ok) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), good(0);
  const size_t stride = static_cast<size_t>(h) * w;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Image img;
      bool success = decode_png_gray(paths[i], &img) && img.h == h && img.w == w;
      if (success) memcpy(out + i * stride, img.data.data(), stride);
      if (ok) ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return good.load();
}

// Decode `n` 16-bit single-channel PNGs (7Scenes depth) at NATIVE resolution
// into a contiguous (n, h, w) uint16 buffer in host byte order. Images whose
// dimensions/bit depth differ are flagged failed. Returns the number decoded.
int gm_decode_batch_gray16(const char** paths, int n, uint16_t* out, int h,
                           int w, int n_threads, uint8_t* ok) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), good(0);
  const size_t stride = static_cast<size_t>(h) * w;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      std::vector<uint16_t> data;
      int ih = 0, iw = 0;
      bool success =
          decode_png_gray16(paths[i], &data, &ih, &iw) && ih == h && iw == w;
      if (success) memcpy(out + i * stride, data.data(), stride * 2);
      if (ok) ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return good.load();
}

// Probe the (h, w) of an image without full decode (PNG header only; JPEG
// requires header parse). Returns 1 on success.
int gm_image_size(const char* path, int* h, int* w) {
  Image img;  // header-only fast path for PNG
  FILE* fp = fopen(path, "rb");
  if (!fp) return 0;
  uint8_t header[8];
  if (fread(header, 1, 8, fp) == 8 && !png_sig_cmp(header, 0, 8)) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (png && info && !setjmp(png_jmpbuf(png))) {
      png_init_io(png, fp);
      png_set_sig_bytes(png, 8);
      png_read_info(png, info);
      *w = png_get_image_width(png, info);
      *h = png_get_image_height(png, info);
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return 1;
    }
    png_destroy_read_struct(&png, &info, nullptr);
  }
  fclose(fp);
  if (!decode_any(path, &img)) return 0;
  *h = img.h;
  *w = img.w;
  return 1;
}

}  // extern "C"
