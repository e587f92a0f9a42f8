// Overlap-stitch accumulator for tiled SR inference.
//
// The host-side half of the tiled pipeline (infer/tiling.py): SR tiles are
// blended into the output canvas with separable linear seam ramps and later
// normalized. In Python this is two large broadcasted multiply-adds per
// tile; this C++ version fuses weight computation and both accumulations in
// one pass over the tile, halving host memory traffic — the TPU-native
// framework's equivalent of the reference's (absent) native data path
// (SURVEY.md §2.9).
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libstitch.so stitch.cc
// ABI: plain C, used via ctypes.

#include <cstdint>

extern "C" {

// Accumulate one HWC float32 tile into out/acc canvases.
//   out  [H, W, 3]   weighted-sum canvas
//   acc  [H, W, 1]   weight-sum canvas
//   tile [th, tw, 3] SR tile
//   wy   [th]        vertical ramp weights
//   wx   [tw]        horizontal ramp weights
//   y0, x0           top-left placement in the canvas
void stitch_accumulate(float* out, float* acc,
                       const float* tile, const float* wy, const float* wx,
                       int64_t H, int64_t W,
                       int64_t th, int64_t tw,
                       int64_t y0, int64_t x0) {
  for (int64_t i = 0; i < th; ++i) {
    const float wyi = wy[i];
    float* out_row = out + ((y0 + i) * W + x0) * 3;
    float* acc_row = acc + ((y0 + i) * W + x0);
    const float* tile_row = tile + i * tw * 3;
    for (int64_t j = 0; j < tw; ++j) {
      const float wgt = wyi * wx[j];
      out_row[j * 3 + 0] += tile_row[j * 3 + 0] * wgt;
      out_row[j * 3 + 1] += tile_row[j * 3 + 1] * wgt;
      out_row[j * 3 + 2] += tile_row[j * 3 + 2] * wgt;
      acc_row[j] += wgt;
    }
  }
}

// Normalize the canvas in place: out[h,w,c] /= max(acc[h,w], eps).
void stitch_normalize(float* out, const float* acc,
                      int64_t H, int64_t W, float eps) {
  for (int64_t p = 0; p < H * W; ++p) {
    float a = acc[p];
    if (a < eps) a = eps;
    const float inv = 1.0f / a;
    out[p * 3 + 0] *= inv;
    out[p * 3 + 1] *= inv;
    out[p * 3 + 2] *= inv;
  }
}

}  // extern "C"
