// cvloader: native data-loading runtime for chessvision-tpu.
//
// The reference feeds its models through torch DataLoader worker processes
// (train_unet.py:186-205) and OpenCV image I/O.  This library is the
// TPU-host equivalent: a C++ thread pool that decodes JPEG/PNG, applies
// exact INTER_AREA downscaling, and assembles NHWC uint8 batches into
// caller-provided buffers, plus a background prefetcher with a bounded
// ring of ready batches so device steps never wait on host I/O.
//
// C ABI only — bound from Python via ctypes (chessvision_tpu/native_loader.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <functional>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- decoding

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, BGR for c==3
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, int want_channels, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = want_channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = want_channels;
  out->data.resize(size_t(out->w) * out->h * out->c);
  const int row_stride = out->w * cinfo.output_components;
  std::vector<uint8_t> row(row_stride);
  uint8_t* rp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out->data.data() + size_t(y) * out->w * out->c;
    if (want_channels == 3) {
      // RGB -> BGR to match cv2.imread
      for (int x = 0; x < out->w; ++x) {
        dst[3 * x + 0] = row[3 * x + 2];
        dst[3 * x + 1] = row[3 * x + 1];
        dst[3 * x + 2] = row[3 * x + 0];
      }
    } else {
      std::memcpy(dst, row.data(), out->w);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "read past end");
  }
  std::memcpy(out, ctx->data + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, int want_channels, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  const int color = png_get_color_type(png, info);
  if (want_channels == 1) {
    if (color & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
  } else {
    if (!(color & PNG_COLOR_MASK_COLOR)) png_set_gray_to_rgb(png);
    png_set_bgr(png);  // match cv2 channel order
  }
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = want_channels;
  out->data.resize(size_t(out->w) * out->h * out->c);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * out->c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, int want_channels, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size > 0 ? size_t(size) : 0);
  if (size > 0 && std::fread(buf.data(), 1, size_t(size), f) != size_t(size)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf.data(), buf.size(), want_channels, out);
  return decode_png(buf.data(), buf.size(), want_channels, out);
}

// ---------------------------------------------------------------- resize

// INTER_AREA downscale (box overlap), matching the separable matmul
// semantics of chessvision_tpu/ops/resize.py; bilinear for upscale.
void resize_area_u8(const Image& src, int dst_h, int dst_w, uint8_t* dst) {
  const int c = src.c;
  if (src.h == dst_h && src.w == dst_w) {
    std::memcpy(dst, src.data.data(), size_t(dst_h) * dst_w * c);
    return;
  }
  // horizontal pass into float rows, then vertical pass
  const double sx = double(src.w) / dst_w;
  const double sy = double(src.h) / dst_h;
  std::vector<float> tmp(size_t(src.h) * dst_w * c, 0.f);
  // horizontal
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* srow = src.data.data() + size_t(y) * src.w * c;
    float* trow = tmp.data() + size_t(y) * dst_w * c;
    for (int ox = 0; ox < dst_w; ++ox) {
      if (dst_w < src.w) {
        const double start = ox * sx, end = (ox + 1) * sx;
        for (int ix = int(start); ix < src.w && ix < int(std::ceil(end)); ++ix) {
          const double overlap =
              std::min<double>(end, ix + 1) - std::max<double>(start, ix);
          if (overlap <= 0) continue;
          const float w = float(overlap / sx);
          for (int ch = 0; ch < c; ++ch)
            trow[ox * c + ch] += w * srow[ix * c + ch];
        }
      } else {
        const double pos = (ox + 0.5) * sx - 0.5;
        int x0 = int(std::floor(pos));
        const float fx = float(pos - x0);
        const int xa = std::min(std::max(x0, 0), src.w - 1);
        const int xb = std::min(std::max(x0 + 1, 0), src.w - 1);
        for (int ch = 0; ch < c; ++ch)
          trow[ox * c + ch] =
              (1.f - fx) * srow[xa * c + ch] + fx * srow[xb * c + ch];
      }
    }
  }
  // vertical
  for (int oy = 0; oy < dst_h; ++oy) {
    uint8_t* drow = dst + size_t(oy) * dst_w * c;
    std::vector<float> acc(size_t(dst_w) * c, 0.f);
    if (dst_h < src.h) {
      const double start = oy * sy, end = (oy + 1) * sy;
      for (int iy = int(start); iy < src.h && iy < int(std::ceil(end)); ++iy) {
        const double overlap =
            std::min<double>(end, iy + 1) - std::max<double>(start, iy);
        if (overlap <= 0) continue;
        const float w = float(overlap / sy);
        const float* trow = tmp.data() + size_t(iy) * dst_w * c;
        for (size_t i = 0; i < acc.size(); ++i) acc[i] += w * trow[i];
      }
    } else {
      const double pos = (oy + 0.5) * sy - 0.5;
      int y0 = int(std::floor(pos));
      const float fy = float(pos - y0);
      const int ya = std::min(std::max(y0, 0), src.h - 1);
      const int yb = std::min(std::max(y0 + 1, 0), src.h - 1);
      const float* ra = tmp.data() + size_t(ya) * dst_w * c;
      const float* rb = tmp.data() + size_t(yb) * dst_w * c;
      for (size_t i = 0; i < acc.size(); ++i)
        acc[i] = (1.f - fy) * ra[i] + fy * rb[i];
    }
    for (size_t i = 0; i < acc.size(); ++i) {
      // round half away from zero, like cv2 saturate_cast on this path
      const float v = std::floor(acc[i] + 0.5f);
      drow[i] = uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

// ---------------------------------------------------------------- batch load

struct LoadResult {
  std::atomic<int> failures{0};
};

void load_one(const char* path, int h, int w, int c, uint8_t* dst, LoadResult* res) {
  Image img;
  if (!decode_file(path, c, &img)) {
    std::memset(dst, 0, size_t(h) * w * c);
    res->failures.fetch_add(1);
    return;
  }
  resize_area_u8(img, h, w, dst);
}

// Simple run-once thread pool over a batch of items.
void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  const int workers = std::min(n_threads, n);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& t : threads) t.join();
}

// ---------------------------------------------------------------- prefetcher

struct Prefetcher {
  std::vector<std::string> paths;
  int batch = 0, h = 0, w = 0, c = 0, threads = 0;
  bool shuffle = false;
  uint64_t seed = 0;
  size_t max_ready = 4;

  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::deque<std::vector<uint8_t>> ready;
  std::deque<std::vector<int64_t>> ready_idx;
  bool stop = false;
  std::thread worker;

  void run() {
    std::mt19937_64 rng(seed);
    std::vector<int64_t> order(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = int64_t(i);
    size_t pos = 0;
    if (shuffle) std::shuffle(order.begin(), order.end(), rng);
    while (true) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return stop || ready.size() < max_ready; });
        if (stop) return;
      }
      std::vector<uint8_t> buf(size_t(batch) * h * w * c);
      std::vector<int64_t> idx(batch);
      LoadResult res;
      std::vector<const char*> ptrs(batch);
      for (int i = 0; i < batch; ++i) {
        if (pos >= order.size()) {
          pos = 0;
          if (shuffle) std::shuffle(order.begin(), order.end(), rng);
        }
        idx[i] = order[pos++];
        ptrs[i] = paths[size_t(idx[i])].c_str();
      }
      parallel_for(batch, threads, [&](int i) {
        load_one(ptrs[i], h, w, c, buf.data() + size_t(i) * h * w * c, &res);
      });
      {
        std::unique_lock<std::mutex> lk(mu);
        if (stop) return;
        ready.emplace_back(std::move(buf));
        ready_idx.emplace_back(std::move(idx));
      }
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// Decode one image file into a caller buffer of (h, w, c) uint8 with
// INTER_AREA/bilinear resize.  Returns 0 on success.
int cvl_load_image(const char* path, int h, int w, int c, uint8_t* out) {
  Image img;
  if (!decode_file(path, c, &img)) return 1;
  resize_area_u8(img, h, w, out);
  return 0;
}

// Decode + resize a batch of n files into out (n, h, w, c) uint8 using a
// thread pool.  Returns the number of failed files (their slots zeroed).
int cvl_load_batch(const char** paths, int n, int h, int w, int c,
                   uint8_t* out, int n_threads) {
  LoadResult res;
  parallel_for(n, n_threads, [&](int i) {
    load_one(paths[i], h, w, c, out + size_t(i) * h * w * c, &res);
  });
  return res.failures.load();
}

void* cvl_prefetcher_create(const char** paths, int n, int batch, int h, int w,
                            int c, int n_threads, int shuffle, uint64_t seed,
                            int max_ready) {
  auto* p = new Prefetcher();
  p->paths.reserve(n);
  for (int i = 0; i < n; ++i) p->paths.emplace_back(paths[i]);
  p->batch = batch;
  p->h = h;
  p->w = w;
  p->c = c;
  p->threads = n_threads;
  p->shuffle = shuffle != 0;
  p->seed = seed;
  p->max_ready = size_t(max_ready > 0 ? max_ready : 4);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until a batch is ready; copies pixels into out (batch*h*w*c) and
// the source indices into idx_out (batch).  Returns 0 on success.
int cvl_prefetcher_next(void* handle, uint8_t* out, int64_t* idx_out) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::vector<uint8_t> buf;
  std::vector<int64_t> idx;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_ready.wait(lk, [&] { return p->stop || !p->ready.empty(); });
    if (p->stop && p->ready.empty()) return 1;
    buf = std::move(p->ready.front());
    idx = std::move(p->ready_idx.front());
    p->ready.pop_front();
    p->ready_idx.pop_front();
  }
  p->cv_space.notify_one();
  std::memcpy(out, buf.data(), buf.size());
  std::memcpy(idx_out, idx.data(), idx.size() * sizeof(int64_t));
  return 0;
}

// Fused host-side packing for the engine's bit-exact yuv444 input mode
// (chessvision_tpu/engine.py pack_inputs_yuv444).  For each image: the
// rounded area-mean luma y256r, int8 chroma diffs cb/cr against it, and
// the 4-bit packed green residual against the integer luma-identity
// prediction — ONE cache-friendly pass instead of ~10 numpy array passes
// (measured 2.4 s -> tens of ms per 128 boards on a 1-core host).
// comp: (n, ih, iw, 3) uint8 BGR (exact INTER_AREA);  gray: (n, ih*fh,
// iw*fw) uint8 fixed-point luma.  Outputs: cb/cr (n, ih, iw) uint8,
// gres (n, ih, iw/2) uint8 (low nibble = even column).  Bit-identical to
// the numpy fallback (enforced by tests/test_native_loader.py).
void cvl_pack_yuv444(const uint8_t* comp, const uint8_t* gray, int n, int ih,
                     int iw, int fh, int fw, uint8_t* cb, uint8_t* cr,
                     uint8_t* gres, int n_threads) {
  const int f2 = fh * fw;
  const int gw = iw * fw;  // full-res width
  // Fast path: when f2 is a power of two (true for the common 512/1024
  // frame sizes, NOT guaranteed — the engine guard only enforces
  // divisibility, so e.g. a 768-wide frame gives f2 = 9) the rounded mean
  // is a shift; a per-pixel integer division by a runtime divisor costs
  // ~30 cycles and dominated this loop.  Non-pow2 sizes take the division
  // branch below and stay bit-identical, just slower.
  const bool pow2 = (f2 & (f2 - 1)) == 0;
  const int shift = pow2 ? __builtin_ctz(2 * f2) : 0;
  const size_t comp_img = size_t(ih) * iw * 3;
  const size_t gray_img = size_t(ih) * fh * gw;
  const size_t plane = size_t(ih) * iw;
  parallel_for(n, n_threads, [&](int i) {
    const uint8_t* cimg = comp + size_t(i) * comp_img;
    const uint8_t* gimg = gray + size_t(i) * gray_img;
    uint8_t* cbo = cb + size_t(i) * plane;
    uint8_t* cro = cr + size_t(i) * plane;
    uint8_t* gro = gres + size_t(i) * plane / 2;
    for (int oy = 0; oy < ih; ++oy) {
      const uint8_t* grow0 = gimg + size_t(oy) * fh * gw;
      const uint8_t* crow = cimg + size_t(oy) * iw * 3;
      uint8_t* cbrow = cbo + size_t(oy) * iw;
      uint8_t* crrow = cro + size_t(oy) * iw;
      uint8_t* grow_out = gro + size_t(oy) * iw / 2;
      for (int ox = 0; ox < iw; ++ox) {
        int s = 0;
        const uint8_t* gp = grow0 + size_t(ox) * fw;
        for (int dy = 0; dy < fh; ++dy) {
          const uint8_t* gr = gp + size_t(dy) * gw;
          for (int dx = 0; dx < fw; ++dx) s += gr[dx];
        }
        const int y256r =
            pow2 ? (2 * s + f2) >> shift : (2 * s + f2) / (2 * f2);
        const int b = crow[ox * 3 + 0];
        const int g = crow[ox * 3 + 1];
        const int r = crow[ox * 3 + 2];
        int cbv = b - y256r;
        int crv = r - y256r;
        cbv = cbv < -128 ? -128 : (cbv > 127 ? 127 : cbv);
        crv = crv < -128 ? -128 : (crv > 127 ? 127 : crv);
        cbrow[ox] = uint8_t(cbv + 128);
        crrow[ox] = uint8_t(crv + 128);
        // g_pred = y256r + floor((2m + LG) / 2LG), m = -LR*cr - LB*cb
        const int q = 2 * (-9798 * crv - 3735 * cbv) + 19235;
        const int fd = q >= 0 ? q / 38470 : -((-q + 38470 - 1) / 38470);
        int gp_i = y256r + fd;
        gp_i = gp_i < 0 ? 0 : (gp_i > 255 ? 255 : gp_i);
        int resid = g - gp_i;
        resid = resid < -8 ? -8 : (resid > 7 ? 7 : resid);
        const uint8_t e = uint8_t(resid + 8);
        if (ox & 1)
          grow_out[ox >> 1] = uint8_t(grow_out[ox >> 1] | (e << 4));
        else
          grow_out[ox >> 1] = e;
      }
    }
  });
}

// Fused host-side packing for the engine's approximate 4:2:0 input mode
// (chessvision_tpu/engine.py pack_inputs_yuv): 2x-subsampled chroma
// differences against the (unrounded) luma block mean, in the same pure
// integer arithmetic as the numpy fallback (bit-identical; enforced by
// tests/test_native_loader.py).  comp: (n, ih, iw, 3) uint8 BGR; gray:
// (n, ih*fh, iw*fw) uint8.  Outputs cb/cr: (n, ih/2, iw/2) uint8.
void cvl_pack_yuv420(const uint8_t* comp, const uint8_t* gray, int n, int ih,
                     int iw, int fh, int fw, uint8_t* cb, uint8_t* cr,
                     int n_threads) {
  const int f2 = fh * fw;
  const int th = ih / 2, tw = iw / 2;
  const int gw = iw * fw;
  const int denom = 8 * f2;
  const bool pow2 = (denom & (denom - 1)) == 0;
  int sh = 0;
  for (int d = denom; d > 1; d >>= 1) ++sh;  // log2(denom) when pow2
  const size_t comp_img = size_t(ih) * iw * 3;
  const size_t gray_img = size_t(ih) * fh * gw;
  const size_t plane = size_t(th) * tw;
  parallel_for(n, n_threads, [&](int i) {
    const uint8_t* cimg = comp + size_t(i) * comp_img;
    const uint8_t* gimg = gray + size_t(i) * gray_img;
    uint8_t* cbo = cb + size_t(i) * plane;
    uint8_t* cro = cr + size_t(i) * plane;
    for (int oy = 0; oy < th; ++oy) {
      // ΣS: gray sum over the (2fh)×(2fw) block
      const uint8_t* grow0 = gimg + size_t(oy) * 2 * fh * gw;
      uint8_t* cbrow = cbo + size_t(oy) * tw;
      uint8_t* crrow = cro + size_t(oy) * tw;
      for (int ox = 0; ox < tw; ++ox) {
        int sl = 0;
        const uint8_t* gp = grow0 + size_t(ox) * 2 * fw;
        for (int dy = 0; dy < 2 * fh; ++dy) {
          const uint8_t* gr = gp + size_t(dy) * gw;
          for (int dx = 0; dx < 2 * fw; ++dx) sl += gr[dx];
        }
        int sb = 0, sr = 0;
        for (int dy = 0; dy < 2; ++dy) {
          const uint8_t* c =
              cimg + (size_t(2 * oy + dy) * iw + size_t(2 * ox)) * 3;
          sb += c[0] + c[3];
          sr += c[2] + c[5];
        }
        // round-half-up of (ΣB·f2 − ΣS)/(4f2): floor((2Δ + 4f2)/(8f2))
        for (int ch = 0; ch < 2; ++ch) {
          const int s = ch == 0 ? sb : sr;
          const int num = 2 * (s * f2 - sl) + 4 * f2;
          int q;
          if (pow2)
            q = num >= 0 ? num >> sh : -((-num + denom - 1) >> sh);
          else
            q = num >= 0 ? num / denom : -((-num + denom - 1) / denom);
          q += 128;
          q = q < 0 ? 0 : (q > 255 ? 255 : q);
          if (ch == 0)
            cbrow[ox] = uint8_t(q);
          else
            crrow[ox] = uint8_t(q);
        }
      }
    }
  });
}

void cvl_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
