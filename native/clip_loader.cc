// Native clip loader: multithreaded JPEG decode + bilinear resize + normalize.
//
// The reference's native layer is CUDA ROI/NMS kernels; on TPU those moved
// into Pallas/XLA (see step_tpu/ops). The runtime component that still
// benefits from native code on a TPU host is the input pipeline: decoding
// T JPEG frames per clip and resizing them dominates host time during
// training. This library decodes a whole clip's frames in parallel
// (std::thread) straight into one contiguous [T, H, W, 3] float32 buffer,
// normalized, ready for device transfer — no Python-side per-frame numpy
// traffic.
//
// C ABI (ctypes-friendly):
//   stpu_decode_clip(paths, n_frames, out_h, out_w, mean, std, out, n_threads)
//     -> 0 on success, negative frame index - 1 on failure
//   stpu_version() -> int

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into an RGB byte buffer. Returns true on success.
bool DecodeJpegFile(const char* path, std::vector<uint8_t>* rgb, int* width,
                    int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = cinfo.output_width * cinfo.output_components;
  rgb->resize(static_cast<size_t>(stride) * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB bytes [h, w, 3] -> normalized float [out_h, out_w, 3].
void ResizeNormalize(const uint8_t* src, int h, int w, int out_h, int out_w,
                     const float* mean, const float* stddev, float* out) {
  const float sy = static_cast<float>(h) / out_h;
  const float sx = static_cast<float>(w) / out_w;
  float inv_std[3] = {1.0f / stddev[0], 1.0f / stddev[1], 1.0f / stddev[2]};
  for (int oy = 0; oy < out_h; ++oy) {
    // cv2-compatible half-pixel sampling (INTER_LINEAR)
    float fy = (oy + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > h - 1) y0 = h - 1;
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > w - 1) x0 = w - 1;
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * 3;
      float* dst = out + (static_cast<size_t>(oy) * out_w + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        dst[c] = (v * (1.0f / 255.0f) - mean[c]) * inv_std[c];
      }
    }
  }
}

}  // namespace

extern "C" {

int stpu_version() { return 1; }

// Decode n_frames JPEGs into out [n_frames, out_h, out_w, 3] float32,
// resized and normalized: (pixel/255 - mean) / std per channel.
// Returns 0 on success, or -(frame_index + 1) for the first failed frame.
int stpu_decode_clip(const char** paths, int n_frames, int out_h, int out_w,
                     const float* mean, const float* stddev, float* out,
                     int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> error(0);

  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n_frames || error.load() != 0) return;
      if (!DecodeJpegFile(paths[i], &rgb, &w, &h)) {
        int expected = 0;
        error.compare_exchange_strong(expected, -(i + 1));
        return;
      }
      float* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      ResizeNormalize(rgb.data(), h, w, out_h, out_w, mean, stddev, dst);
    }
  };

  int threads = n_threads < n_frames ? n_threads : n_frames;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return error.load();
}

}  // extern "C"
