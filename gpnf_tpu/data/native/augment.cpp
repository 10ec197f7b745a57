// Native host-side batch augmentation for the input pipeline.
//
// The reference feeds PIL-per-image transforms through DataLoader workers
// (flow_modules/misc.py ShiftTransform + RandomHorizontalFlip); this single
// C++ pass does the edge-pad shift crop and horizontal flip for a whole
// uint8 NCHW batch in one call, keeping the (single-core) host fast enough
// to overlap with the device step. Exposed via ctypes (no pybind11 in the
// image); gpnf_tpu/data/native/__init__.py builds it on demand with g++.
//
// Layout: images (N, C, H, W) uint8 contiguous.
// shifts: per-image crop offset in [0, 2*pixels); axis: 1 = horizontal
// shift, 0 = vertical; flip: 1 = mirror horizontally.

#include <cstdint>
#include <cstring>

extern "C" {

void shift_flip_augment(const uint8_t* src, uint8_t* dst,
                        int64_t n, int64_t c, int64_t h, int64_t w,
                        int64_t pixels,
                        const int32_t* shifts, const uint8_t* horizontal,
                        const uint8_t* flip) {
  const int64_t plane = h * w;
  const int64_t img = c * plane;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s_img = src + i * img;
    uint8_t* d_img = dst + i * img;
    const int64_t shift = shifts[i];
    const bool horiz = horizontal[i] != 0;
    const bool do_flip = flip[i] != 0;
    // source coordinates in the virtually edge-padded image:
    //   horizontal: rows unshifted, cols start at (shift - pixels)
    //   vertical:   rows start at (shift - pixels), cols unshifted
    const int64_t row_off = horiz ? 0 : shift - pixels;
    const int64_t col_off = horiz ? shift - pixels : 0;
    for (int64_t ch = 0; ch < c; ++ch) {
      const uint8_t* s_pl = s_img + ch * plane;
      uint8_t* d_pl = d_img + ch * plane;
      for (int64_t y = 0; y < h; ++y) {
        int64_t sy = y + row_off;
        sy = sy < 0 ? 0 : (sy >= h ? h - 1 : sy);  // edge padding
        const uint8_t* s_row = s_pl + sy * w;
        uint8_t* d_row = d_pl + y * w;
        if (col_off == 0 && !do_flip) {
          std::memcpy(d_row, s_row, static_cast<size_t>(w));
        } else {
          for (int64_t x = 0; x < w; ++x) {
            int64_t sx = (do_flip ? (w - 1 - x) : x) + col_off;
            sx = sx < 0 ? 0 : (sx >= w ? w - 1 : sx);
            d_row[x] = s_row[sx];
          }
        }
      }
    }
  }
}

void u8_to_centered_f32(const uint8_t* src, float* dst, int64_t count) {
  // true division: 255/255.0f == 1.0f exactly, keeping the range in
  // [-0.5, 0.5] (a reciprocal-multiply can overshoot by 1 ulp)
  for (int64_t i = 0; i < count; ++i) {
    dst[i] = static_cast<float>(src[i]) / 255.0f - 0.5f;
  }
}

}  // extern "C"
