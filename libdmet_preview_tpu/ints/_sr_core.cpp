// Native core for the periodic short-range Hermite kernel sums
// (the hot loop of ints/pbc.PbcCell._sr_flat_block: Ewald-split nuclear
// attraction and GTH local pseudopotential terms).
//
//   S[t,u,v, img] += sum_{k: kimg[k]=img} w[k] * R_{tuv}(alpha; PC_k)
//
// with R the Hermite derivative table of either the Coulomb kernel
// (Boys functions) or a Gaussian kernel e^{-alpha r^2} (optionally with
// complex alpha for complex-step derivatives w.r.t. the exponent).
// Plain C ABI via ctypes (no pybind11 in scope), same pattern as
// _gto_core.cpp.

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>

namespace {

const int LMAX = 4;            // supports lsum <= 4 (up to d-d pairs)
const int NMAX = 3 * LMAX;     // max Hermite derivative order

// Boys functions F_0..F_n.  Three regimes: exact erf F_0 + upward
// recursion where that is stable (x comfortably above 2n: the series
// needs ~x terms there, so this is also the fast path for the
// mid-range lattice sums), series + downward recursion for small x,
// asymptotic + upward for very large x.
inline void boys(int n, double x, double* F) {
    if (x > 2.0 * n + 12.0 && x > 18.0) {
        double sx = std::sqrt(x);
        double ex = std::exp(-x);
        double tx = 2.0 * x;
        F[0] = 0.886226925452758014 / sx * std::erf(sx);  // sqrt(pi)/2
        for (int m = 0; m < n; ++m)
            F[m + 1] = ((2.0 * m + 1.0) * F[m] - ex) / tx;
    } else if (x < 35.0) {
        double term = 1.0 / (2.0 * n + 1.0);
        double acc = term;
        double tx = 2.0 * x;
        for (int k = 1; k < 140; ++k) {
            term *= tx / (2.0 * n + 2.0 * k + 1.0);
            acc += term;
            if (k > 20 && term < 1e-18) break;
        }
        double ex = std::exp(-x);
        F[n] = ex * acc;
        for (int m = n - 1; m >= 0; --m)
            F[m] = (tx * F[m + 1] + ex) / (2.0 * m + 1.0);
    } else {
        double ex = std::exp(-x);
        F[0] = 0.5 * std::sqrt(M_PI / x);
        for (int m = 0; m < n; ++m)
            F[m + 1] = ((2.0 * m + 1.0) * F[m] - ex) / (2.0 * x);
    }
}

// Hermite derivative table for one point; T = templated scalar
// (double or complex<double>).  R indexed [t][u][v], t,u,v <= lsum.
template <typename T>
inline void r_table_point(int lsum, T alpha, double px, double py,
                          double pz, const T* Fn, T R[LMAX + 1][LMAX + 1][LMAX + 1]) {
    const int nmax = 3 * lsum;
    // Rn[n][t][u][v] built by downward n recursion; small static array
    static thread_local T Rn[NMAX + 1][LMAX + 1][LMAX + 1][LMAX + 1];
    for (int n = 0; n <= nmax; ++n) {
        T f = Fn[n];
        T m2a = 1.0;
        for (int k = 0; k < n; ++k) m2a *= (-2.0) * alpha;
        Rn[n][0][0][0] = m2a * f;
    }
    for (int n = nmax - 1; n >= 0; --n) {
        for (int t = 0; t <= lsum; ++t)
            for (int u = 0; u <= lsum; ++u)
                for (int v = 0; v <= lsum; ++v) {
                    int ord = t + u + v;
                    if (ord == 0 || ord > nmax - n) continue;
                    T val;
                    if (t > 0) {
                        val = px * Rn[n + 1][t - 1][u][v];
                        if (t > 1) val += (double)(t - 1) * Rn[n + 1][t - 2][u][v];
                    } else if (u > 0) {
                        val = py * Rn[n + 1][t][u - 1][v];
                        if (u > 1) val += (double)(u - 1) * Rn[n + 1][t][u - 2][v];
                    } else {
                        val = pz * Rn[n + 1][t][u][v - 1];
                        if (v > 1) val += (double)(v - 1) * Rn[n + 1][t][u][v - 2];
                    }
                    Rn[n][t][u][v] = val;
                }
    }
    for (int t = 0; t <= lsum; ++t)
        for (int u = 0; u <= lsum; ++u)
            for (int v = 0; v <= lsum; ++v)
                R[t][u][v] = Rn[0][t][u][v];
}

}  // namespace

extern "C" {

// kernel = 0: Coulomb (Boys); alpha_im ignored.
// kernel = 1: Gaussian e^{-alpha r^2}, alpha possibly complex
//             (complex-step; imag parts returned in S_im).
// S_re/S_im: ((lsum+1)^3, nimg) row-major, ACCUMULATED (+=).
void sr_hermite_sum(int64_t lsum, int64_t nact, int64_t nimg,
                    const double* PC, const double* wz,
                    const int64_t* kimg,
                    double alpha_re, double alpha_im, int64_t kernel,
                    double* S_re, double* S_im) {
    const int L = (int)lsum;
    const int dim = (L + 1) * (L + 1) * (L + 1);
    const int nmax = 3 * L;
    (void)nimg;

    if (kernel == 0) {
        double Fn[NMAX + 1];
        double R[LMAX + 1][LMAX + 1][LMAX + 1];
        for (int64_t k = 0; k < nact; ++k) {
            double px = PC[3 * k], py = PC[3 * k + 1], pz = PC[3 * k + 2];
            double T = alpha_re * (px * px + py * py + pz * pz);
            boys(nmax, T, Fn);
            r_table_point<double>(L, alpha_re, px, py, pz, Fn, R);
            double w = wz[k];
            double* out = S_re + kimg[k];
            int idx = 0;
            for (int t = 0; t <= L; ++t)
                for (int u = 0; u <= L; ++u)
                    for (int v = 0; v <= L; ++v, ++idx)
                        out[(int64_t)idx * nimg] += w * R[t][u][v];
        }
    } else {
        std::complex<double> alpha(alpha_re, alpha_im);
        std::complex<double> Fn[NMAX + 1];
        std::complex<double> R[LMAX + 1][LMAX + 1][LMAX + 1];
        for (int64_t k = 0; k < nact; ++k) {
            double px = PC[3 * k], py = PC[3 * k + 1], pz = PC[3 * k + 2];
            std::complex<double> T =
                alpha * (px * px + py * py + pz * pz);
            std::complex<double> e = std::exp(-T);
            for (int n = 0; n <= nmax; ++n) Fn[n] = e;
            r_table_point<std::complex<double> >(L, alpha, px, py, pz,
                                                 Fn, R);
            double w = wz[k];
            double* outr = S_re + kimg[k];
            double* outi = S_im + kimg[k];
            int idx = 0;
            for (int t = 0; t <= L; ++t)
                for (int u = 0; u <= L; ++u)
                    for (int v = 0; v <= L; ++v, ++idx) {
                        outr[(int64_t)idx * nimg] += w * R[t][u][v].real();
                        outi[(int64_t)idx * nimg] += w * R[t][u][v].imag();
                    }
        }
    }
    (void)dim;
}

// Fused candidate screen + Hermite kernel sum: moves the per-primitive
// bookkeeping of ints/pbc.PbcCell._sr_flat_block (image remap, product
// center - lattice center differences, exact range screen, weight
// gather) into the same pass as the kernel evaluation, so Python only
// builds the shell-level candidate list once per shell pair.
//
//   for k in candidates:
//     l = inv[cand_img[k]]           (primitive's surviving-image remap)
//     if l < 0: skip
//     PC = P[l] - ctrs[cand_c[k]]
//     if |PC|^2 >= rng2: skip
//     S[:, l] += Zs[cand_c[k]] * R_tuv(alpha; PC)
//
// kernel = 0: Coulomb (Boys); kernel = 1: Gaussian with complex-step
// alpha (imag in S_im).  S_re/S_im: ((lsum+1)^3, nimg_p), ACCUMULATED.
void sr_cand_sum(int64_t lsum, int64_t ncand, int64_t nimg_p,
                 const double* P, const int64_t* inv,
                 const int64_t* cand_img, const int64_t* cand_c,
                 const double* ctrs, const double* Zs, double rng2,
                 double alpha_re, double alpha_im, int64_t kernel,
                 double* S_re, double* S_im) {
    const int L = (int)lsum;
    const int nmax = 3 * L;

    if (kernel == 0) {
        double Fn[NMAX + 1];
        double R[LMAX + 1][LMAX + 1][LMAX + 1];
        for (int64_t k = 0; k < ncand; ++k) {
            int64_t l = inv[cand_img[k]];
            if (l < 0) continue;
            int64_t c = cand_c[k];
            double px = P[3 * l] - ctrs[3 * c];
            double py = P[3 * l + 1] - ctrs[3 * c + 1];
            double pz = P[3 * l + 2] - ctrs[3 * c + 2];
            double r2 = px * px + py * py + pz * pz;
            if (r2 >= rng2) continue;
            boys(nmax, alpha_re * r2, Fn);
            r_table_point<double>(L, alpha_re, px, py, pz, Fn, R);
            double w = Zs[c];
            double* out = S_re + l;
            int idx = 0;
            for (int t = 0; t <= L; ++t)
                for (int u = 0; u <= L; ++u)
                    for (int v = 0; v <= L; ++v, ++idx)
                        out[(int64_t)idx * nimg_p] += w * R[t][u][v];
        }
    } else {
        std::complex<double> alpha(alpha_re, alpha_im);
        std::complex<double> Fn[NMAX + 1];
        std::complex<double> R[LMAX + 1][LMAX + 1][LMAX + 1];
        for (int64_t k = 0; k < ncand; ++k) {
            int64_t l = inv[cand_img[k]];
            if (l < 0) continue;
            int64_t c = cand_c[k];
            double px = P[3 * l] - ctrs[3 * c];
            double py = P[3 * l + 1] - ctrs[3 * c + 1];
            double pz = P[3 * l + 2] - ctrs[3 * c + 2];
            double r2 = px * px + py * py + pz * pz;
            if (r2 >= rng2) continue;
            std::complex<double> e = std::exp(-alpha * r2);
            for (int n = 0; n <= nmax; ++n) Fn[n] = e;
            r_table_point<std::complex<double> >(L, alpha, px, py, pz,
                                                 Fn, R);
            double w = Zs[c];
            double* outr = S_re + l;
            double* outi = S_im + l;
            int idx = 0;
            for (int t = 0; t <= L; ++t)
                for (int u = 0; u <= L; ++u)
                    for (int v = 0; v <= L; ++v, ++idx) {
                        outr[(int64_t)idx * nimg_p] += w * R[t][u][v].real();
                        outi[(int64_t)idx * nimg_p] += w * R[t][u][v].imag();
                    }
        }
    }
}

}  // extern "C"
