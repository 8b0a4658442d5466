// Native core of the COCO evaluator: greedy detection<->GT matching at all
// IoU thresholds. Equivalent role to pycocotools' C `evaluateImg` inner loop
// (the reference depends on pycocotools/COCOeval_opt C++ for this —
// SURVEY.md §2.3). Compiled at import via g++ -shared; called through
// ctypes with zero-copy numpy buffers.
//
// Inputs (row-major):
//   iou      : D x G float64, IoU (crowd columns already use IoA)
//   crowd    : G   uint8
//   ignore   : G   uint8 (crowd | out-of-area-range)
//   thrs     : T   float64
// Outputs:
//   matched  : T x D int64 (1 = matched to a valid GT)
//   ignored  : T x D uint8 (matched to an ignored GT, or unmatched +
//              out-of-range — the area-range part is applied by the caller)
extern "C" {

void coco_match(const double* iou, const unsigned char* crowd,
                const unsigned char* ignore_, const double* thrs,
                long D, long G, long T,
                long* matched, unsigned char* ignored,
                unsigned char* gt_used_scratch) {
  for (long ti = 0; ti < T; ++ti) {
    const double t = thrs[ti];
    unsigned char* gt_used = gt_used_scratch;
    for (long g = 0; g < G; ++g) gt_used[g] = 0;
    for (long d = 0; d < D; ++d) {
      double best = t < (1.0 - 1e-10) ? t : (1.0 - 1e-10);
      long best_g = -1;
      for (long g = 0; g < G; ++g) {
        if (gt_used[g] && !crowd[g]) continue;
        // once matched to a valid GT, never switch to an ignored one
        if (best_g > -1 && !ignore_[best_g] && ignore_[g]) break;
        const double v = iou[d * G + g];
        if (v < best) continue;
        best = v;
        best_g = g;
      }
      if (best_g == -1) continue;
      gt_used[best_g] = 1;
      ignored[ti * D + d] = ignore_[best_g];
      matched[ti * D + d] = ignore_[best_g] ? 0 : 1;
    }
  }
}
}
