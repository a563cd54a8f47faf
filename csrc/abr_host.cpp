// Native host data plane for abr_iod_tpu.
//
// The reference's host-side work lives in torch's C++ DataLoader plus
// CUDA kernels (maskrcnn_benchmark/csrc/).  On a TPU VM the accelerator
// kernels are Pallas/XLA, but the per-iteration host work — assembling
// normalized pixel batches from a decoded image cache, plus box
// utilities — still deserves native code; this library provides it and
// is loaded via ctypes (abr_iod_tpu/data/native.py).
//
// Functions:
//   assemble_batch : uint8 canvas cache -> float32 normalized batch
//                    (optional horizontal flip inside the valid region,
//                    RGB->BGR swap, pixel-mean subtraction) — the hot
//                    per-iteration loop of data/transforms.py, threaded.
//   nms_greedy     : greedy NMS with the +1 pixel convention (semantics
//                    of csrc/cpu/nms_cpu.cpp) for host-side tooling and
//                    as a native parity oracle for the TPU kernel.
//   iou_matrix     : pairwise IoU (+1 convention) for host-side eval.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// cache: [n_cache, H, W, 3] uint8, row-major.  indices: [batch]
// sizes: [n_cache, 2] int32 (valid h, w per image)
// out:   [batch, H, W, 3] float32
// flip:  [batch] uint8 (1 = horizontally flip the valid region)
// mean:  float[3] subtracted after optional BGR swap
void assemble_batch(const uint8_t* cache, const int32_t* sizes,
                    const int64_t* indices, const uint8_t* flip,
                    int batch, int height, int width,
                    const float* mean, int to_bgr, float* out,
                    int num_threads) {
  const int64_t img_elems = (int64_t)height * width * 3;
  auto work = [&](int b) {
    const uint8_t* src = cache + indices[b] * img_elems;
    float* dst = out + (int64_t)b * img_elems;
    const int vh = sizes[indices[b] * 2 + 0];
    const int vw = sizes[indices[b] * 2 + 1];
    const bool do_flip = flip[b] != 0;
    for (int y = 0; y < height; ++y) {
      const uint8_t* srow = src + (int64_t)y * width * 3;
      float* drow = dst + (int64_t)y * width * 3;
      const bool in_valid_rows = y < vh;
      for (int x = 0; x < width; ++x) {
        int sx = x;
        if (do_flip && in_valid_rows && x < vw) sx = vw - 1 - x;
        const uint8_t* p = srow + sx * 3;
        float r = p[0], g = p[1], bl = p[2];
        if (to_bgr) {
          drow[x * 3 + 0] = bl - mean[0];
          drow[x * 3 + 1] = g - mean[1];
          drow[x * 3 + 2] = r - mean[2];
        } else {
          drow[x * 3 + 0] = r - mean[0];
          drow[x * 3 + 1] = g - mean[1];
          drow[x * 3 + 2] = bl - mean[2];
        }
      }
    }
  };
  if (num_threads <= 1 || batch == 1) {
    for (int b = 0; b < batch; ++b) work(b);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  int n = std::min(num_threads, batch);
  threads.reserve(n);
  for (int t = 0; t < n; ++t) {
    threads.emplace_back([&]() {
      int b;
      while ((b = next.fetch_add(1)) < batch) work(b);
    });
  }
  for (auto& th : threads) th.join();
}

// Greedy NMS, +1 pixel convention.  boxes [n,4] xyxy, scores [n].
// keep_out must hold n int64; returns number kept.
int nms_greedy(const float* boxes, const float* scores, int n,
               float iou_threshold, int64_t* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + i * 4;
    areas[i] = (b[2] - b[0] + 1.f) * (b[3] - b[1] + 1.f);
  }
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    const float* bi = boxes + i * 4;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + j * 4;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1.f);
      float h = std::max(0.f, yy2 - yy1 + 1.f);
      float inter = w * h;
      float iou = inter / (areas[i] + areas[j] - inter);
      if (iou > iou_threshold) suppressed[j] = 1;
    }
  }
  return kept;
}

// Pairwise IoU with +1 convention: a [n,4], b [m,4] -> out [n,m]
void iou_matrix(const float* a, int n, const float* b, int m, float* out) {
  std::vector<float> area_b(m);
  for (int j = 0; j < m; ++j) {
    const float* bj = b + j * 4;
    area_b[j] = (bj[2] - bj[0] + 1.f) * (bj[3] - bj[1] + 1.f);
  }
  for (int i = 0; i < n; ++i) {
    const float* ai = a + i * 4;
    float area_a = (ai[2] - ai[0] + 1.f) * (ai[3] - ai[1] + 1.f);
    for (int j = 0; j < m; ++j) {
      const float* bj = b + j * 4;
      float xx1 = std::max(ai[0], bj[0]);
      float yy1 = std::max(ai[1], bj[1]);
      float xx2 = std::min(ai[2], bj[2]);
      float yy2 = std::min(ai[3], bj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1.f);
      float h = std::max(0.f, yy2 - yy1 + 1.f);
      float inter = w * h;
      out[(int64_t)i * m + j] = inter / (area_a + area_b[j] - inter);
    }
  }
}

}  // extern "C"
