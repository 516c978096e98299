// Native host-side image loader: decode (PNG/JPEG) + bilinear resize to the
// standard input height, emitting float32 RGB in [0, 1].
//
// This is the TPU-native framework's C++ replacement for the reference's
// multiprocess torch DataLoader workers (`utils/learning.py:250-252`): image
// decode dominates host time, and a ctypes call releases the GIL, so a
// Python thread pool over these entry points gets true parallel decode
// without process-fork overhead. Exposed via a plain C ABI (no pybind11).
//
// Build: crossloc_tpu/native/build.sh (g++ -O3 -shared, links png/jpeg/z).

#include <cstdio>  // must precede jpeglib.h (it references FILE unqualified)

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h * w * 3
};

bool has_suffix(const std::string& s, const char* suf) {
  std::string l = s;
  std::transform(l.begin(), l.end(), l.begin(), ::tolower);
  std::string t(suf);
  return l.size() >= t.size() && l.compare(l.size() - t.size(), t.size(), t) == 0;
}

bool decode_png(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  // normalize every input to 8-bit RGB (gray->RGB, RGBA->RGB, palette->RGB)
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize((size_t)out->w * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; y++) rows[y] = out->rgb.data() + (size_t)y * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_any(const char* path, Image* out) {
  std::string p(path);
  if (has_suffix(p, ".png")) return decode_png(path, out);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg")) return decode_jpeg(path, out);
  // try both on unknown extensions
  return decode_png(path, out) || decode_jpeg(path, out);
}

// Header-only size reads: cl_image_dims is called before EVERY image load
// (the wrapper needs the source dims to preserve aspect ratio), so reading
// just the IHDR / SOF marker instead of decoding the full bitstream halves
// the per-image cost of the hot loader path.
bool png_dims(const char* path, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  *w = (int)png_get_image_width(png, info);
  *h = (int)png_get_image_height(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool jpeg_dims(const char* path, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  *w = (int)cinfo.image_width;
  *h = (int)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

// Separable triangle-filter resampling with half-pixel centers and
// antialiasing on downscale — the algorithm PIL's BILINEAR resize uses,
// which is what the reference host pipeline runs (torchvision Resize ->
// PIL, `dataloader/dataloader.py:172-211`).
struct FilterTaps {
  std::vector<int> start;     // first source index per output index
  std::vector<int> count;     // taps per output index
  std::vector<float> weight;  // flattened [out, max_count] weights
  int max_count = 0;
};

FilterTaps make_taps(int in_size, int out_size) {
  FilterTaps t;
  const double scale = (double)in_size / out_size;
  const double fscale = std::max(scale, 1.0);
  const double support = 1.0 * fscale;  // triangle filter support
  t.max_count = (int)std::ceil(2.0 * support) + 2;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign((size_t)out_size * t.max_count, 0.0f);
  for (int o = 0; o < out_size; o++) {
    const double center = (o + 0.5) * scale;
    int lo = std::max(0, (int)(center - support + 0.5));
    int hi = std::min(in_size, (int)(center + support + 0.5));
    double sum = 0.0;
    for (int i = lo; i < hi; i++) {
      double u = std::abs((i + 0.5 - center) / fscale);
      double w = u < 1.0 ? 1.0 - u : 0.0;
      t.weight[(size_t)o * t.max_count + (i - lo)] = (float)w;
      sum += w;
    }
    if (sum <= 0.0) {  // degenerate: nearest
      lo = std::min(std::max((int)center, 0), in_size - 1);
      hi = lo + 1;
      t.weight[(size_t)o * t.max_count] = 1.0f;
      sum = 1.0;
    }
    for (int k = 0; k < hi - lo; k++)
      t.weight[(size_t)o * t.max_count + k] /= (float)sum;
    t.start[o] = lo;
    t.count[o] = hi - lo;
  }
  return t;
}

void resize_bilinear_f32(const Image& img, int th, int tw, float* out) {
  const FilterTaps ty = make_taps(img.h, th);
  const FilterTaps tx = make_taps(img.w, tw);
  // horizontal pass: [h, w, 3] -> [h, tw, 3]
  std::vector<float> tmp((size_t)img.h * tw * 3);
  for (int y = 0; y < img.h; y++) {
    const uint8_t* row = img.rgb.data() + (size_t)y * img.w * 3;
    for (int x = 0; x < tw; x++) {
      const float* wts = tx.weight.data() + (size_t)x * tx.max_count;
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < tx.count[x]; k++) {
        const uint8_t* px = row + (size_t)(tx.start[x] + k) * 3;
        acc[0] += wts[k] * px[0];
        acc[1] += wts[k] * px[1];
        acc[2] += wts[k] * px[2];
      }
      float* dst = tmp.data() + ((size_t)y * tw + x) * 3;
      dst[0] = acc[0];
      dst[1] = acc[1];
      dst[2] = acc[2];
    }
  }
  // vertical pass: [h, tw, 3] -> [th, tw, 3], scaled to [0, 1]
  for (int y = 0; y < th; y++) {
    const float* wts = ty.weight.data() + (size_t)y * ty.max_count;
    for (int x = 0; x < tw; x++) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.count[y]; k++) {
        const float* px = tmp.data() + ((size_t)(ty.start[y] + k) * tw + x) * 3;
        acc[0] += wts[k] * px[0];
        acc[1] += wts[k] * px[1];
        acc[2] += wts[k] * px[2];
      }
      float* dst = out + ((size_t)y * tw + x) * 3;
      dst[0] = acc[0] / 255.0f;
      dst[1] = acc[1] / 255.0f;
      dst[2] = acc[2] / 255.0f;
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success and fills (*h, *w) with the stored image size.
// Header-only: does NOT decode the bitstream.
int cl_image_dims(const char* path, int* h, int* w) {
  std::string p(path);
  if (has_suffix(p, ".png")) return png_dims(path, h, w) ? 0 : -1;
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
    return jpeg_dims(path, h, w) ? 0 : -1;
  return (png_dims(path, h, w) || jpeg_dims(path, h, w)) ? 0 : -1;
}

// Decode + resize to exactly (th, tw); out must hold th*tw*3 floats.
// Returns 0 on success.
int cl_load_image(const char* path, int th, int tw, float* out) {
  Image img;
  if (!decode_any(path, &img)) return -1;
  if (img.h == th && img.w == tw) {
    const size_t n = (size_t)th * tw * 3;
    for (size_t i = 0; i < n; i++) out[i] = img.rgb[i] / 255.0f;
    return 0;
  }
  resize_bilinear_f32(img, th, tw, out);
  return 0;
}

}  // extern "C"
