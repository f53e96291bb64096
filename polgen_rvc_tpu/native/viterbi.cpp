// Banded Viterbi decoder for the CREPE F0 path (models/crepe.py).
//
// The decode semantics mirror torchcrepe's librosa-style dense Viterbi
// (reference pipeline.py:86-117 uses torchcrepe.predict(decoder=viterbi)):
// triangular transition probabilities over 360 pitch bins, log(p + 1e-20)
// smoothing.  The dense formulation is O(T * 360 * 360) and costs ~12 s of
// host time for a 3-minute song; the transition matrix is zero outside
// |from - to| < width, so the true-transition work is a 2*width-1 band.
// Out-of-band transitions are NOT impossible under the 1e-20 smoothing —
// they all score exactly log(1e-20), so their best candidate is the global
// argmax of the previous row.  This keeps the banded recursion bit-identical
// to the dense one (validated in tests/test_f0_methods.py) at
// O(T * 360 * (2*width-1)).
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// One Viterbi step + backtrace over rows served by `obs_row(t)`.
template <typename ObsRow>
void viterbi_core(ObsRow obs_row, int64_t t_len, int32_t n_bins,
                  const double* band, int32_t half,
                  double log_eps, double log_init, int32_t* path_out) {
    if (t_len <= 0) return;
    const int32_t bw = 2 * half + 1;
    std::vector<double> dp_prev(n_bins), dp_cur(n_bins);
    std::vector<int32_t> back((size_t)t_len * n_bins);

    {
        const double* obs0 = obs_row(0);
        for (int32_t j = 0; j < n_bins; ++j)
            dp_prev[j] = log_init + obs0[j];
    }

    for (int64_t t = 1; t < t_len; ++t) {
        // first-index global argmax of dp_prev (numpy argmax tie rule)
        int32_t m = 0;
        double vm = dp_prev[0];
        for (int32_t i = 1; i < n_bins; ++i)
            if (dp_prev[i] > vm) { vm = dp_prev[i]; m = i; }
        const double eps_cand_base = vm + log_eps;

        const double* obs_t = obs_row(t);
        int32_t* back_t = back.data() + (size_t)t * n_bins;
        for (int32_t j = 0; j < n_bins; ++j) {
            const double* bj = band + (size_t)j * bw;
            const int32_t lo = (j - half < 0) ? -j : -half;
            const int32_t hi = (j + half >= n_bins) ? n_bins - 1 - j : half;
            double best = dp_prev[j + lo] + bj[lo + half];
            int32_t bi = j + lo;
            for (int32_t d = lo + 1; d <= hi; ++d) {
                const double s = dp_prev[j + d] + bj[d + half];
                if (s > best) { best = s; bi = j + d; }
            }
            // out-of-band candidate: all such transitions score exactly
            // log_eps, so the winner is the previous row's global argmax.
            // On an exact tie the dense scan keeps the lower index.
            if (eps_cand_base > best ||
                (eps_cand_base == best && m < bi)) {
                best = eps_cand_base;
                bi = m;
            }
            dp_cur[j] = best + obs_t[j];
            back_t[j] = bi;
        }
        dp_prev.swap(dp_cur);
    }

    int32_t m = 0;
    double vm = dp_prev[0];
    for (int32_t i = 1; i < n_bins; ++i)
        if (dp_prev[i] > vm) { vm = dp_prev[i]; m = i; }
    path_out[t_len - 1] = m;
    for (int64_t t = t_len - 2; t >= 0; --t)
        path_out[t] = back[(size_t)(t + 1) * n_bins + path_out[t + 1]];
}

}  // namespace

extern "C" void polgen_viterbi_banded(
    const double* log_obs,  // (T, n_bins) log(normalized obs + 1e-20)
    int64_t t_len, int32_t n_bins,
    const double* band,     // (n_bins, 2*half+1): band[j][d+half] =
                            // log_trans[j+d][j], -inf where j+d invalid
    int32_t half,
    double log_eps,         // log(1e-20): every out-of-band transition
    double log_init,        // log(1/n_bins) uniform prior
    int32_t* path_out)      // (T,)
{
    viterbi_core(
        [&](int64_t t) { return log_obs + (size_t)t * n_bins; },
        t_len, n_bins, band, half, log_eps, log_init, path_out);
}

// Same recursion on raw float32 salience: the observation normalization
// (obs = probs / max(rowsum, 1e-20); log(obs + 1e-20)) happens inline per
// timestep, saving the (T, 360) float64 log-obs materialization (~0.3 s
// of host numpy per 3-minute song). Row sums use pairwise summation so
// the values match numpy's probs.sum(axis=1) bit-for-bit.
extern "C" void polgen_viterbi_banded_probs(
    const float* probs,     // (T, n_bins) masked salience, >= 0
    int64_t t_len, int32_t n_bins,
    const double* band, int32_t half,
    double log_eps, double log_init,
    int32_t* path_out)
{
    std::vector<double> row(n_bins);
    // numpy's float64 pairwise_sum, replicated operation-for-operation
    // (sequential base for n < 8; 8 partial accumulators over blocks of 8
    // with the fixed ((r0+r1)+(r2+r3))+((r4+r5)+(r6+r7)) combine up to a
    // 128-element block; larger n split at n/2 rounded DOWN to a multiple
    // of 8): needed so obs matches probs.astype(f64).sum(axis=1)
    // bit-for-bit — a plain halving recursion differs in the last ulp on
    // ~12% of f16-quantized salience rows, which flips dense-vs-banded
    // parity on exact-tie plateaus.
    struct Pairwise {
        static double sum(const double* a, int32_t n) {
            if (n < 8) {
                double s = 0.0;
                for (int32_t i = 0; i < n; ++i) s += a[i];
                return s;
            }
            if (n <= 128) {
                double r[8] = {a[0], a[1], a[2], a[3],
                               a[4], a[5], a[6], a[7]};
                int32_t i = 8;
                for (; i < n - (n % 8); i += 8)
                    for (int32_t j = 0; j < 8; ++j) r[j] += a[i + j];
                double res = ((r[0] + r[1]) + (r[2] + r[3]))
                           + ((r[4] + r[5]) + (r[6] + r[7]));
                for (; i < n; ++i) res += a[i];
                return res;
            }
            int32_t n2 = n / 2;
            n2 -= n2 % 8;
            return sum(a, n2) + sum(a + n2, n - n2);
        }
    };
    viterbi_core(
        [&](int64_t t) {
            const float* p = probs + (size_t)t * n_bins;
            for (int32_t j = 0; j < n_bins; ++j) row[j] = (double)p[j];
            double s = Pairwise::sum(row.data(), n_bins);
            if (s < 1e-20) s = 1e-20;
            for (int32_t j = 0; j < n_bins; ++j)
                row[j] = std::log(row[j] / s + 1e-20);
            return row.data();
        },
        t_len, n_bins, band, half, log_eps, log_init, path_out);
}
