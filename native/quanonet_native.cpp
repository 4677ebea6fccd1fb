// Native host-side data-generation kernels.
//
// The reference delegates its heavy host numerics to third-party native
// code (SciPy's Fortran RK45 per sample, data_utils/data_generation.py:159;
// MindQuantum's C++ statevector).  The TPU build replaces the simulator
// with JAX/Pallas and offers a device-side datagen path; this library is
// the native HOST path: batched RK4 ODE integration and PDE stencils,
// OpenMP-parallel across samples, exposed through a C ABI consumed via
// ctypes (quanonet_tpu/data/native.py).
//
// Semantics mirror quanonet_tpu/data/device_gen.py: fixed-step RK4 with
// linear interpolation of the high-resolution GRF input, upwind advection
// with CFL 0.8 and periodic boundary, explicit-Euler reaction-diffusion
// with Dirichlet-0 and the early-time subsampling quirk.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// linear interpolation of u (length n, on linspace(0,1,n)) at x in [0,1]
inline double interp(const float* u, int n, double x) {
    double pos = x * (n - 1);
    int lo = static_cast<int>(pos);
    if (lo < 0) lo = 0;
    if (lo > n - 2) lo = n - 2;
    double frac = pos - lo;
    return (1.0 - frac) * u[lo] + frac * u[lo + 1];
}

enum OdeKind : int32_t { IDENTITY = 0, ANTIDERIV = 1, HOMOGENEOUS = 2,
                         NONLINEAR = 3 };

inline double rhs(int32_t kind, double u, double f) {
    switch (kind) {
        case ANTIDERIV:   return f;
        case HOMOGENEOUS: return u + f;
        case NONLINEAR:   return f - u * u * u;
        default:          return 0.0;
    }
}

}  // namespace

extern "C" {

// RK4-integrate du/dx = rhs(u, u0(x)) with y0 = 0 on linspace(0,1,num_cal)
// for `batch` samples.  u0_full: (batch, n_src) row-major; out:
// (batch, num_cal) row-major.
void solve_ode_batch(int32_t kind, const float* u0_full, int32_t batch,
                     int32_t n_src, int32_t num_cal, float* out) {
    const double h = 1.0 / (num_cal - 1);
#pragma omp parallel for schedule(static)
    for (int32_t b = 0; b < batch; ++b) {
        const float* u0 = u0_full + static_cast<int64_t>(b) * n_src;
        float* y = out + static_cast<int64_t>(b) * num_cal;
        if (kind == IDENTITY) {
            for (int32_t i = 0; i < num_cal; ++i)
                y[i] = static_cast<float>(
                    interp(u0, n_src, i * h));
            continue;
        }
        double u = 0.0;
        y[0] = 0.0f;
        for (int32_t i = 0; i < num_cal - 1; ++i) {
            double x = i * h;
            double f0 = interp(u0, n_src, x);
            double fm = interp(u0, n_src, x + 0.5 * h);
            double f1 = interp(u0, n_src, x + h);
            double k1 = rhs(kind, u, f0);
            double k2 = rhs(kind, u + 0.5 * h * k1, fm);
            double k3 = rhs(kind, u + 0.5 * h * k2, fm);
            double k4 = rhs(kind, u + h * k3, f1);
            u += (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4);
            y[i + 1] = static_cast<float>(u);
        }
    }
}

// Upwind advection, CFL 0.8, periodic boundary, c = 1; output resampled
// to num_cal time columns (reference solve_advection_pde semantics).
// u0: (batch, num_cal); out: (batch, num_cal, num_cal) [x, t] row-major.
void solve_advection_batch(const float* u0_in, int32_t batch,
                           int32_t num_cal, float* out) {
    const double c = 1.0;
    const double dx = 1.0 / (num_cal - 1);
    const double dt = 0.8 * dx / c;
    const int32_t num_t = static_cast<int32_t>(1.0 / dt);
    const double lam = c * dt / dx;
#pragma omp parallel for schedule(static)
    for (int32_t b = 0; b < batch; ++b) {
        const float* u0 = u0_in + static_cast<int64_t>(b) * num_cal;
        float* ob = out + static_cast<int64_t>(b) * num_cal * num_cal;
        std::vector<std::vector<float>> traj(
            num_t, std::vector<float>(num_cal));
        std::copy(u0, u0 + num_cal, traj[0].begin());
        for (int32_t j = 1; j < num_t; ++j) {
            const auto& up = traj[j - 1];
            auto& un = traj[j];
            for (int32_t i = 0; i < num_cal; ++i) {
                float prev = up[(i - 1 + num_cal) % num_cal];
                un[i] = static_cast<float>(up[i] - lam * (up[i] - prev));
            }
        }
        if (num_t > num_cal) {
            // integer time indices, like np.linspace(...).astype(int)
            for (int32_t tcol = 0; tcol < num_cal; ++tcol) {
                int32_t tj = static_cast<int32_t>(
                    static_cast<double>(tcol) * (num_t - 1) / (num_cal - 1));
                for (int32_t i = 0; i < num_cal; ++i)
                    ob[static_cast<int64_t>(i) * num_cal + tcol] =
                        traj[tj][i];
            }
        } else {
            for (int32_t tcol = 0; tcol < num_cal; ++tcol) {
                double pos = static_cast<double>(tcol) * (num_t - 1)
                             / (num_cal - 1);
                int32_t lo = std::min(static_cast<int32_t>(pos), num_t - 2);
                double frac = pos - lo;
                for (int32_t i = 0; i < num_cal; ++i)
                    ob[static_cast<int64_t>(i) * num_cal + tcol] =
                        static_cast<float>((1 - frac) * traj[lo][i]
                                           + frac * traj[lo + 1][i]);
            }
        }
    }
}

// Explicit-Euler reaction-diffusion, Dirichlet-0, with the reference's
// early-time column subsampling.  u0: (batch, num_cal);
// out: (batch, num_cal, n_cols) with n_cols from rdiffusion_cols().
int32_t rdiffusion_cols(int32_t num_cal) {
    const double D = 0.01;
    const double dx = 1.0 / (num_cal - 1);
    const double dt = std::min(dx * dx / (2 * D), 1.0 / (num_cal - 1));
    const int32_t num_t = static_cast<int32_t>(1.0 / dt);
    const int32_t stride = std::max(1, num_t / num_cal);
    int32_t cols = (num_t + stride - 1) / stride;
    return std::min(cols, num_cal);
}

void solve_rdiffusion_batch(const float* u0_in, int32_t batch,
                            int32_t num_cal, float* out) {
    const double D = 0.01, k = 0.01;
    const double dx = 1.0 / (num_cal - 1);
    const double dt = std::min(dx * dx / (2 * D), 1.0 / (num_cal - 1));
    const int32_t num_t = static_cast<int32_t>(1.0 / dt);
    const int32_t stride = std::max(1, num_t / num_cal);
    const int32_t n_cols = rdiffusion_cols(num_cal);
#pragma omp parallel for schedule(static)
    for (int32_t b = 0; b < batch; ++b) {
        const float* u0 = u0_in + static_cast<int64_t>(b) * num_cal;
        float* ob = out + static_cast<int64_t>(b) * num_cal * n_cols;
        std::vector<double> u(num_cal, 0.0), un(num_cal, 0.0);
        int32_t col = 0;
        for (int32_t step = 0; step < num_t; ++step) {
            if (step % stride == 0 && col < n_cols) {
                for (int32_t i = 0; i < num_cal; ++i)
                    ob[static_cast<int64_t>(i) * n_cols + col] =
                        static_cast<float>(u[i]);
                ++col;
            }
            for (int32_t i = 1; i < num_cal - 1; ++i)
                un[i] = u[i] + dt * (D * (u[i + 1] - 2 * u[i] + u[i - 1])
                                     / (dx * dx)
                                     + k * u[i] * u[i] + u0[i]);
            un[0] = un[num_cal - 1] = 0.0;
            std::swap(u, un);
        }
    }
}

int32_t native_version() { return 1; }

}  // extern "C"
