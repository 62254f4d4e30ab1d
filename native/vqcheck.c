/* vqcheck — independent native oracle for nearest-code selection.
 *
 * A deliberately simple C implementation (direct |x - e|^2 accumulated in
 * double, first-index tie-break) used to parity-fuzz the TPU kernels
 * (vqtpu/kernels/distance.py): it shares no code, no algebra (no squared
 * expansion), and no framework with the jax paths, so agreement is real
 * evidence. Exposed via ctypes (vqtpu/kernels/native_check.py); built by
 * vqtpu/models/native_build.py with the system cc.
 *
 * The reference delegates this to torch.cdist/argmin (CUDA);
 * vector_quantize_pytorch.py:729-781 is the hot loop being checked.
 */

#include <stdint.h>

/* x: (n, d) row-major f32; embed: (c, d); out: (n,) int32 argmin indices.
 * euclidean: argmin_c sum_d (x - e)^2 ; cosine (metric=1): argmax_c x.e */
void vq_nearest_ref_f32(const float *x, const float *embed,
                        int64_t n, int64_t c, int64_t d,
                        int metric, int32_t *out) {
    for (int64_t i = 0; i < n; i++) {
        const float *xi = x + i * d;
        double best = metric ? -1.0e300 : 1.0e300;
        int64_t best_j = 0;
        for (int64_t j = 0; j < c; j++) {
            const float *ej = embed + j * d;
            double acc = 0.0;
            if (metric) {
                for (int64_t k = 0; k < d; k++)
                    acc += (double)xi[k] * (double)ej[k];
                if (acc > best) { best = acc; best_j = j; }
            } else {
                for (int64_t k = 0; k < d; k++) {
                    double t = (double)xi[k] - (double)ej[k];
                    acc += t * t;
                }
                if (acc < best) { best = acc; best_j = j; }
            }
        }
        out[i] = (int32_t)best_j;
    }
}
