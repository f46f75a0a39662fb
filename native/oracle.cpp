// XLA-independent float64 attention oracle (C ABI, loaded via ctypes).
//
// Purpose: a ground truth that shares NOTHING with the JAX/XLA stack — the
// jnp oracle in reference/attention.py runs through the same compiler as the
// kernels under test, so an XLA miscompile could cancel out. This oracle is
// plain C++ in double precision: softmax attention forward plus the exact
// analytic backward (dS = P ∘ (dP − D) — the formula the reference gets
// wrong at attention_bf16.py:421, see SURVEY.md §2.3 Q1).
//
// Layout: row-major [batch, head, tokens, head_dim] throughout, matching
// the framework's public API. Causal convention: k <= q.
//
// Build: g++ -O2 -shared -fPIC -o liboracle.so oracle.cpp
// (see quantizedattention_tpu/reference/native_oracle.py for the loader)

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline int64_t idx4(int64_t b, int64_t h, int64_t t, int64_t d,
                    int64_t H, int64_t T, int64_t D) {
  return ((b * H + h) * T + t) * D + d;
}

}  // namespace

extern "C" {

// O = softmax(Q Kᵀ · sm_scale, causal) V
void attention_fwd_f64(const double* q, const double* k, const double* v,
                       double* o, int64_t B, int64_t H, int64_t Tq, int64_t Tk,
                       int64_t D, int causal, double sm_scale) {
  std::vector<double> s(Tk);
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t h = 0; h < H; ++h) {
      for (int64_t i = 0; i < Tq; ++i) {
        const int64_t kmax = causal ? (i < Tk - 1 ? i + 1 : Tk) : Tk;
        double m = -1e300;
        for (int64_t j = 0; j < kmax; ++j) {
          double acc = 0.0;
          for (int64_t d = 0; d < D; ++d)
            acc += q[idx4(b, h, i, d, H, Tq, D)] * k[idx4(b, h, j, d, H, Tk, D)];
          s[j] = acc * sm_scale;
          if (s[j] > m) m = s[j];
        }
        double l = 0.0;
        for (int64_t j = 0; j < kmax; ++j) {
          s[j] = std::exp(s[j] - m);
          l += s[j];
        }
        for (int64_t d = 0; d < D; ++d) {
          double acc = 0.0;
          for (int64_t j = 0; j < kmax; ++j)
            acc += s[j] * v[idx4(b, h, j, d, H, Tk, D)];
          o[idx4(b, h, i, d, H, Tq, D)] = acc / l;
        }
      }
    }
  }
}

// Analytic backward: given dO, produce (dQ, dK, dV).
void attention_bwd_f64(const double* q, const double* k, const double* v,
                       const double* dout, double* dq, double* dk, double* dv,
                       int64_t B, int64_t H, int64_t Tq, int64_t Tk, int64_t D,
                       int causal, double sm_scale) {
  std::vector<double> p(Tk), dp(Tk), ds(Tk);
  const int64_t nq = B * H * Tq * D;
  const int64_t nk = B * H * Tk * D;
  for (int64_t i = 0; i < nq; ++i) dq[i] = 0.0;
  for (int64_t i = 0; i < nk; ++i) { dk[i] = 0.0; dv[i] = 0.0; }

  for (int64_t b = 0; b < B; ++b) {
    for (int64_t h = 0; h < H; ++h) {
      for (int64_t i = 0; i < Tq; ++i) {
        const int64_t kmax = causal ? (i < Tk - 1 ? i + 1 : Tk) : Tk;
        // recompute the softmax row
        double m = -1e300;
        for (int64_t j = 0; j < kmax; ++j) {
          double acc = 0.0;
          for (int64_t d = 0; d < D; ++d)
            acc += q[idx4(b, h, i, d, H, Tq, D)] * k[idx4(b, h, j, d, H, Tk, D)];
          p[j] = acc * sm_scale;
          if (p[j] > m) m = p[j];
        }
        double l = 0.0;
        for (int64_t j = 0; j < kmax; ++j) { p[j] = std::exp(p[j] - m); l += p[j]; }
        for (int64_t j = 0; j < kmax; ++j) p[j] /= l;

        // dV_j += P_ij dO_i ; dP_ij = dO_i · V_j
        for (int64_t j = 0; j < kmax; ++j) {
          double acc = 0.0;
          for (int64_t d = 0; d < D; ++d) {
            const double go = dout[idx4(b, h, i, d, H, Tq, D)];
            dv[idx4(b, h, j, d, H, Tk, D)] += p[j] * go;
            acc += go * v[idx4(b, h, j, d, H, Tk, D)];
          }
          dp[j] = acc;
        }
        // D_i = Σ_j P_ij dP_ij ; dS = P ∘ (dP − D) · sm_scale
        double di = 0.0;
        for (int64_t j = 0; j < kmax; ++j) di += p[j] * dp[j];
        for (int64_t j = 0; j < kmax; ++j) ds[j] = p[j] * (dp[j] - di) * sm_scale;

        // dQ_i += dS_ij K_j ; dK_j += dS_ij Q_i
        for (int64_t j = 0; j < kmax; ++j) {
          for (int64_t d = 0; d < D; ++d) {
            dq[idx4(b, h, i, d, H, Tq, D)] += ds[j] * k[idx4(b, h, j, d, H, Tk, D)];
            dk[idx4(b, h, j, d, H, Tk, D)] += ds[j] * q[idx4(b, h, i, d, H, Tq, D)];
          }
        }
      }
    }
  }
}

}  // extern "C"
