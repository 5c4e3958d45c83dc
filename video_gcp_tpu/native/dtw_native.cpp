// Native batched DTW kernels for host-side evaluation.
//
// Rebuilds and extends the reference's only native component — the Cython
// min-cumsum inner loop (gcp/evaluation/cutils.pyx:20-29, compiled -O3
// -fopenmp) — as a standalone C++ library:
//   * min_cumsum_batch: in-place accumulated-cost DP over a batch of padded
//     matrices, OpenMP-parallel over the batch.
//   * dtw_traceback_batch: per-example path traceback + per-frame best-node
//     extraction (the evaluation_matching.py:143-147 post-processing), also
//     batch-parallel.
// Exposed through ctypes (video_gcp_tpu.native.dtw); used by the host-side
// eval path when sequences are too ragged for the device kernel.
//
// Build: cc -O3 -fopenmp -shared -fPIC dtw_native.cpp -o libdtw_native.so

#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// D: [b, (r+1), (c+1)] padded accumulated-cost matrices, modified in place.
// Layout and semantics match dtw_utils.basic_dtw: row/col 0 prefilled with
// inf except D[0,0]=0, D[1:,1:] prefilled with the cost matrix.
void min_cumsum_batch(double* D, int64_t b, int64_t r, int64_t c) {
    const int64_t rows = r + 1, cols = c + 1;
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < b; ++k) {
        double* M = D + k * rows * cols;
        for (int64_t i = 0; i < r; ++i) {
            const double* up = M + i * cols;        // row i
            double* cur = M + (i + 1) * cols;       // row i+1
            for (int64_t j = 0; j < c; ++j) {
                double m = up[j];                   // (i, j)
                if (cur[j] < m) m = cur[j];         // (i+1, j)
                if (up[j + 1] < m) m = up[j + 1];   // (i, j+1)
                cur[j + 1] += m;
            }
        }
    }
}

// Traceback + per-frame best-node extraction.
// D: [b, (r+1), (c+1)] accumulated matrices (after min_cumsum_batch).
// end_inds: [b] last valid frame per example.
// out_inds: [b, c] int64 — per GT frame, the row (node) index whose path
//   cell has minimal accumulated cost (ties -> smallest row index).
// out_dist: [b] normalized DTW distance D[r, end+1] / (r + end + 1).
void dtw_traceback_batch(const double* D, const int64_t* end_inds,
                         int64_t b, int64_t r, int64_t c,
                         int64_t* out_inds, double* out_dist) {
    const int64_t rows = r + 1, cols = c + 1;
    const double INF = std::numeric_limits<double>::infinity();
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < b; ++k) {
        const double* M = D + k * rows * cols;
        const int64_t e = end_inds[k];
        out_dist[k] = M[r * cols + (e + 1)] / double(r + e + 1);

        // best cost / node per column
        double* best_cost = new double[c];
        for (int64_t j = 0; j < c; ++j) {
            best_cost[j] = INF;
            out_inds[k * c + j] = 0;
        }
        // walk back from C-space cell (r-1, e)
        int64_t i = r - 1, j = e;
        while (true) {
            const double cur = M[(i + 1) * cols + (j + 1)];
            if (cur <= best_cost[j]) {  // <= : smaller node wins ties
                best_cost[j] = cur;
                out_inds[k * c + j] = i;
            }
            if (i <= 0 && j <= 0) break;
            const double diag = M[i * cols + j];
            const double up = M[i * cols + (j + 1)];
            const double left = M[(i + 1) * cols + j];
            if (diag <= up && diag <= left) {
                if (i > 0) --i;
                if (j > 0) --j;
            } else if (up <= left) {
                if (i > 0) --i;
            } else {
                if (j > 0) --j;
            }
        }
        // frames past end repeat the last valid match
        for (int64_t t = e + 1; t < c; ++t)
            out_inds[k * c + t] = out_inds[k * c + e];
        delete[] best_cost;
    }
}

}  // extern "C"
