// Host-side pairwise IoU — the tdnet analog of the reference's single
// first-party native component (keras_retinanet/utils/compute_overlap.pyx,
// Cython -> C, ~60 LoC; SURVEY.md §2.3).
//
// Semantics match the .pyx exactly: double precision, legacy Fast-R-CNN
// "+1" pixel convention for areas and intersections. Used on the host by
// the mAP evaluator (utils/eval.py) where inputs are small; the training
// hot path uses the on-device XLA IoU (ops/boxes.py) instead.
//
// Built as a plain shared library (no pybind11 in this image) and loaded
// via ctypes — see tdnet/native/__init__.py. OpenMP parallelizes the outer
// loop for large N at eval time.

#include <algorithm>
#include <cstdint>

extern "C" {

// boxes:   N x 4 row-major doubles (x1, y1, x2, y2)
// queries: K x 4 row-major doubles
// out:     N x K row-major doubles (pairwise IoU)
void compute_overlap(const double* boxes, int64_t n,
                     const double* queries, int64_t k,
                     double* out) {
#pragma omp parallel for schedule(static) if (n > 256)
  for (int64_t i = 0; i < n; ++i) {
    const double bx1 = boxes[i * 4 + 0];
    const double by1 = boxes[i * 4 + 1];
    const double bx2 = boxes[i * 4 + 2];
    const double by2 = boxes[i * 4 + 3];
    const double b_area = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0);
    for (int64_t j = 0; j < k; ++j) {
      const double qx1 = queries[j * 4 + 0];
      const double qy1 = queries[j * 4 + 1];
      const double qx2 = queries[j * 4 + 2];
      const double qy2 = queries[j * 4 + 3];
      const double iw = std::min(bx2, qx2) - std::max(bx1, qx1) + 1.0;
      double iou = 0.0;
      if (iw > 0.0) {
        const double ih = std::min(by2, qy2) - std::max(by1, qy1) + 1.0;
        if (ih > 0.0) {
          const double q_area = (qx2 - qx1 + 1.0) * (qy2 - qy1 + 1.0);
          const double ua = b_area + q_area - iw * ih;
          iou = (iw * ih) / ua;
        }
      }
      out[i * k + j] = iou;
    }
  }
}

}  // extern "C"
