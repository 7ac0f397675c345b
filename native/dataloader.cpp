// stable_nerf_tpu native data loader.
//
// Host-side runtime component: threaded PNG decode + bilinear resize +
// normalization straight into pinned float buffers, replacing the
// reference's PIL/torchvision decode path (reference
// datasets/preprocess.py:45-67,142-159) with native code.  The TPU compute
// path is JAX/XLA/Pallas; this keeps the host input pipeline off the
// Python GIL so device steps never stall on image decode.
//
// Exposed C ABI (ctypes):
//   stn_decode_image(buf, len, out, outH, outW, mean, std)
//       decode one PNG from memory -> normalized CHW float32 [3,outH,outW].
//   stn_load_batch(paths, n, out, outH, outW, mean, std, n_threads, status)
//       threaded decode of n files into out [n,3,outH,outW]; status[i]=0 ok.
//   stn_decode_npy_pose(path, out16)  minimal .npy reader for 4x4 float poses.
//
// PNG support: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced
// (the Objaverse views_release and tiny-NeRF formats). 16-bit and Adam7
// return an error and the Python wrapper falls back to PIL.

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> rgba;  // always expanded to RGBA8
};

// Decode an in-memory PNG into RGBA8. Returns 0 on success.
int decode_png(const uint8_t* buf, size_t len, Image* img) {
  if (len < 8 || memcmp(buf, kPngSig, 8) != 0) return -1;
  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;

  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (!memcmp(type, "IHDR", 4)) {
      if (clen < 13) return -3;
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (bit_depth != 8 || interlace != 0) return -4;  // unsupported
      if (color_type != 0 && color_type != 2 && color_type != 4 &&
          color_type != 6)
        return -5;  // palette unsupported
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (w == 0 || h == 0 || idat.empty()) return -6;

  int ch = (color_type == 0) ? 1 : (color_type == 2) ? 3
           : (color_type == 4) ? 2 : 4;
  size_t stride = size_t(w) * ch;
  std::vector<uint8_t> raw((stride + 1) * h);

  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -7;

  // unfilter scanlines in place into `pix`
  std::vector<uint8_t> pix(stride * h);
  for (uint32_t y = 0; y < h; y++) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = pix.data() + stride * y;
    const uint8_t* up = (y > 0) ? pix.data() + stride * (y - 1) : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = (x >= size_t(ch)) ? dst[x - ch] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(ch)) ? up[x - ch] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -8;
      }
      dst[x] = uint8_t(v);
    }
  }

  // expand to RGBA8
  img->w = int(w);
  img->h = int(h);
  img->channels = ch;
  img->rgba.resize(size_t(w) * h * 4);
  for (size_t i = 0; i < size_t(w) * h; i++) {
    const uint8_t* s = pix.data() + i * ch;
    uint8_t* d = img->rgba.data() + i * 4;
    switch (ch) {
      case 1: d[0] = d[1] = d[2] = s[0]; d[3] = 255; break;
      case 2: d[0] = d[1] = d[2] = s[0]; d[3] = s[1]; break;
      case 3: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = 255; break;
      case 4: memcpy(d, s, 4); break;
    }
  }
  return 0;
}

// PIL-compatible separable triangle ("bilinear") resampling: on downscale
// the filter support scales with the ratio (area averaging), on upscale it
// is classic bilinear — matching torchvision's transforms.Resize via PIL
// that the reference uses (preprocess.py:59-63).
struct FilterTaps {
  std::vector<int> lo;        // first source index per output pixel
  std::vector<int> count;     // tap count per output pixel
  std::vector<float> w;       // weights, ragged rows of max_count
  int max_count = 0;
};

FilterTaps build_taps(int in_size, int out_size) {
  FilterTaps t;
  double scale = double(in_size) / out_size;
  double fscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * fscale;   // triangle filter support
  int max_count = int(2 * support + 3);
  t.lo.resize(out_size);
  t.count.resize(out_size);
  t.w.assign(size_t(out_size) * max_count, 0.0f);
  t.max_count = max_count;
  for (int x = 0; x < out_size; x++) {
    double center = (x + 0.5) * scale;
    int lo = int(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = int(center + support + 0.5);
    if (hi > in_size) hi = in_size;
    double total = 0.0;
    int n = hi - lo;
    for (int i = 0; i < n; i++) {
      double d = (lo + i + 0.5 - center) / fscale;
      double v = d < 0 ? 1.0 + d : 1.0 - d;   // triangle
      if (v < 0) v = 0;
      t.w[size_t(x) * max_count + i] = float(v);
      total += v;
    }
    if (total > 0)
      for (int i = 0; i < n; i++) t.w[size_t(x) * max_count + i] /= float(total);
    t.lo[x] = lo;
    t.count[x] = n;
  }
  return t;
}

void resize_normalize(const Image& img, float* out, int oh, int ow,
                      const float* mean, const float* std_) {
  FilterTaps tx = build_taps(img.w, ow);
  FilterTaps ty = build_taps(img.h, oh);

  // pass 1: horizontal, RGBA8 -> float RGB [img.h, ow, 3]
  std::vector<float> tmp(size_t(img.h) * ow * 3);
  for (int y = 0; y < img.h; y++) {
    const uint8_t* row = img.rgba.data() + size_t(y) * img.w * 4;
    for (int x = 0; x < ow; x++) {
      const float* w = tx.w.data() + size_t(x) * tx.max_count;
      float acc[3] = {0, 0, 0};
      for (int i = 0; i < tx.count[x]; i++) {
        const uint8_t* p = row + size_t(tx.lo[x] + i) * 4;
        acc[0] += w[i] * p[0];
        acc[1] += w[i] * p[1];
        acc[2] += w[i] * p[2];
      }
      float* d = tmp.data() + (size_t(y) * ow + x) * 3;
      d[0] = acc[0]; d[1] = acc[1]; d[2] = acc[2];
    }
  }
  // pass 2: vertical + normalize -> CHW
  for (int y = 0; y < oh; y++) {
    const float* w = ty.w.data() + size_t(y) * ty.max_count;
    for (int x = 0; x < ow; x++) {
      float acc[3] = {0, 0, 0};
      for (int i = 0; i < ty.count[y]; i++) {
        const float* p = tmp.data() + (size_t(ty.lo[y] + i) * ow + x) * 3;
        acc[0] += w[i] * p[0];
        acc[1] += w[i] * p[1];
        acc[2] += w[i] * p[2];
      }
      for (int c = 0; c < 3; c++) {
        float v = acc[c] / 255.0f;
        out[(size_t(c) * oh + y) * ow + x] = (v - mean[c]) / std_[c];
      }
    }
  }
}

int decode_file(const char* path, float* out, int oh, int ow,
                const float* mean, const float* std_) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  size_t rd = fread(buf.data(), 1, n, f);
  fclose(f);
  if (long(rd) != n) return -101;
  Image img;
  int rc = decode_png(buf.data(), buf.size(), &img);
  if (rc != 0) return rc;
  resize_normalize(img, out, oh, ow, mean, std_);
  return 0;
}

}  // namespace

extern "C" {

int stn_decode_image(const uint8_t* buf, size_t len, float* out, int oh,
                     int ow, const float* mean, const float* std_) {
  Image img;
  int rc = decode_png(buf, len, &img);
  if (rc != 0) return rc;
  resize_normalize(img, out, oh, ow, mean, std_);
  return 0;
}

int stn_load_batch(const char** paths, int n, float* out, int oh, int ow,
                   const float* mean, const float* std_, int n_threads,
                   int* status) {
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] =
          decode_file(paths[i], out + size_t(i) * 3 * oh * ow, oh, ow, mean,
                      std_);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  int bad = 0;
  for (int i = 0; i < n; i++)
    if (status[i] != 0) bad++;
  return bad;
}

// Minimal .npy reader for float32/float64 little-endian 4x4 pose arrays
// (the objaverse NNN.npy files, reference preprocess.py:154).
int stn_decode_npy_pose(const char* path, float* out16) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  uint8_t magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return -1;
  }
  uint8_t lenbuf[2];
  if (fread(lenbuf, 1, 2, f) != 2) { fclose(f); return -2; }
  int hlen = lenbuf[0] | (lenbuf[1] << 8);
  std::vector<char> header(hlen + 1, 0);
  if (fread(header.data(), 1, hlen, f) != size_t(hlen)) { fclose(f); return -3; }
  bool f8 = strstr(header.data(), "<f8") != nullptr;
  bool f4 = strstr(header.data(), "<f4") != nullptr;
  if (!f4 && !f8) { fclose(f); return -4; }
  int count = 16;
  if (f4) {
    float tmp[16];
    if (fread(tmp, 4, count, f) != size_t(count)) { fclose(f); return -5; }
    memcpy(out16, tmp, sizeof tmp);
  } else {
    double tmp[16];
    if (fread(tmp, 8, count, f) != size_t(count)) { fclose(f); return -5; }
    for (int i = 0; i < 16; i++) out16[i] = float(tmp[i]);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
