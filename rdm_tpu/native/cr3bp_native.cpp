// Native CR3BP warm-start validation oracle.
//
// The reference delegates all astrodynamics to the external prebuilt
// `pydylan` C++ package (CR3BP equations of motion + SNOPT NLP solve,
// SURVEY.md section 2.6; reference wiring at
// GTO_Halo_DM/data_generation_scripts/
// cr3bp_earth_mission_simulator_boundary_diffusion_warmstart.py:87-224).
// This translation unit is the framework's own native equivalent: f64
// CR3BP propagation of a 66-var warm-start guess plus a Levenberg-
// Marquardt local refinement ("SNOPT-lite") that plays the same role the
// reference's per-sample SNOPT solve does — a sample is "feasible" when a
// local solver warm-started from it converges onto the L1/halo arrival
// set.  Batch entry points fan out over a std::thread pool, mirroring the
// reference's ThreadPoolExecutor SNOPT fan-out
// (Benchmark/gto_halo_multithreading.py:607-667).
//
// Units and dynamics match rdm_tpu/physics/cr3bp.py exactly (Earth-Moon
// rotating frame, DU = 384400 km, thrust in Newtons, mass in kg,
// Isp = 1000 s) so the Python tests can pin C++ <-> JAX parity.

#include <atomic>
#include <cmath>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#if defined(__SSE2__) || defined(__x86_64__)
#include <xmmintrin.h>
#endif

namespace {

constexpr double MU_EARTH = 398600.435507;  // km^3/s^2
constexpr double MU_MOON = 4902.800118;
constexpr double MU = MU_MOON / (MU_EARTH + MU_MOON);
constexpr double DU_KM = 384400.0;
const double TU_S = std::sqrt(DU_KM * DU_KM * DU_KM / (MU_EARTH + MU_MOON));
constexpr double G0 = 9.80665e-3;  // km/s^2
constexpr double ISP_S = 1000.0;

struct State7 {
  double v[7];  // x y z vx vy vz m
};

// d/dt of [x y z vx vy vz m]: CR3BP gravity + rotating-frame terms +
// low-thrust acceleration + Tsiolkovsky mass flow (cr3bp.py:eom).
inline void eom(const State7& s, const double u[3], double throttle,
                double thrust_n, State7& ds) {
  const double x = s.v[0], y = s.v[1], z = s.v[2];
  const double vx = s.v[3], vy = s.v[4], vz = s.v[5];
  const double m = s.v[6] > 1e-6 ? s.v[6] : 1e-6;
  const double dx1 = x + MU, dx2 = x - 1.0 + MU;
  const double r1 = std::sqrt(dx1 * dx1 + y * y + z * z);
  const double r2 = std::sqrt(dx2 * dx2 + y * y + z * z);
  const double r13 = r1 * r1 * r1, r23 = r2 * r2 * r2;
  const double one_mu = 1.0 - MU;
  const double amag =
      throttle * thrust_n / m * (TU_S * TU_S / (DU_KM * 1000.0));
  ds.v[0] = vx;
  ds.v[1] = vy;
  ds.v[2] = vz;
  ds.v[3] = x - one_mu * dx1 / r13 - MU * dx2 / r23 + 2.0 * vy + amag * u[0];
  ds.v[4] = y - one_mu * y / r13 - MU * y / r23 - 2.0 * vx + amag * u[1];
  ds.v[5] = -one_mu * z / r13 - MU * z / r23 + amag * u[2];
  ds.v[6] = -throttle * thrust_n / (ISP_S * G0 * 1000.0) * TU_S;
}

inline void axpy(State7& out, const State7& a, double h, const State7& b) {
  for (int i = 0; i < 7; ++i) out.v[i] = a.v[i] + h * b.v[i];
}

// Fixed-step RK4, identical stencil to cr3bp.py:_rk4_step/propagate.
void propagate(State7& s, const double u[3], double throttle, double thrust_n,
               double tof, int n_steps) {
  const double dt = tof / n_steps;
  State7 k1, k2, k3, k4, tmp;
  for (int i = 0; i < n_steps; ++i) {
    eom(s, u, throttle, thrust_n, k1);
    axpy(tmp, s, 0.5 * dt, k1);
    eom(tmp, u, throttle, thrust_n, k2);
    axpy(tmp, s, 0.5 * dt, k2);
    eom(tmp, u, throttle, thrust_n, k3);
    axpy(tmp, s, dt, k3);
    eom(tmp, u, throttle, thrust_n, k4);
    for (int j = 0; j < 7; ++j)
      s.v[j] += dt / 6.0 * (k1.v[j] + 2.0 * k2.v[j] + 2.0 * k3.v[j] + k4.v[j]);
  }
}

inline double jacobi_energy(const State7& s) {
  const double x = s.v[0], y = s.v[1], z = s.v[2];
  const double dx1 = x + MU, dx2 = x - 1.0 + MU;
  const double r1 = std::sqrt(dx1 * dx1 + y * y + z * z);
  const double r2 = std::sqrt(dx2 * dx2 + y * y + z * z);
  const double omega =
      0.5 * (x * x + y * y) + (1.0 - MU) / r1 + MU / r2;
  const double v2 =
      s.v[3] * s.v[3] + s.v[4] * s.v[4] + s.v[5] * s.v[5];
  return 0.5 * v2 - omega;
}

// Shoot a 66-var guess from the spiral boundary state: coast t_c1,
// n_segments constant-control arcs over t_shoot, coast t_c2.  Layout per
// prepare_training_data.py (SURVEY.md 2.6): [t_shoot, t_c1, t_c2,
// n_seg x (alpha, beta, r), fuel_mass, halo_period_norm, manifold_len].
void shoot(const double* guess, int n_segments, double thrust_n,
           const double* spiral_end, State7& out, int coast_steps,
           int seg_steps) {
  State7 s;
  std::memcpy(s.v, spiral_end, sizeof(s.v));
  const double zero_u[3] = {0.0, 0.0, 0.0};
  const double t_shoot = guess[0] > 1e-3 ? guess[0] : 1e-3;
  const double t_c1 = guess[1] > 0.0 ? guess[1] : 0.0;
  const double t_c2 = guess[2] > 0.0 ? guess[2] : 0.0;
  propagate(s, zero_u, 0.0, thrust_n, t_c1, coast_steps);
  const double seg_dt = t_shoot / n_segments;
  for (int k = 0; k < n_segments; ++k) {
    const double alpha = guess[3 + 3 * k];
    const double beta = guess[3 + 3 * k + 1];
    double r = guess[3 + 3 * k + 2];
    r = r < 0.0 ? 0.0 : (r > 1.0 ? 1.0 : r);
    const double u[3] = {std::cos(beta) * std::cos(alpha),
                         std::cos(beta) * std::sin(alpha), std::sin(beta)};
    propagate(s, u, r, thrust_n, seg_dt, seg_steps);
  }
  propagate(s, zero_u, 0.0, thrust_n, t_c2, coast_steps);
  out = s;
}

// Arrival residual r(theta) in R^5: position offset from L1 (3), weighted
// CR3BP-energy offset from E_L1 + halo_energy (the same arrival test the
// JAX oracle thresholds, oracle.py:evaluate_warmstarts), and a fuel-budget
// hinge that pushes solutions away from burning below the 300 kg dry mass
// (the reference's SNOPT solve enforces mass bounds natively).
constexpr int NRES = 5;
constexpr double ENERGY_WEIGHT = 2.0;
constexpr double MASS_FLOOR = 320.0;   // kg: dry mass 300 + margin
constexpr double MASS_SCALE = 100.0;   // kg of deficit per residual unit

void residual(const double* guess, int n_segments, double thrust_n,
              const double* spiral_end, double l1x, double e_target,
              double r_out[NRES], double* pos_err, double* energy_err,
              double* final_mass) {
  State7 s;
  shoot(guess, n_segments, thrust_n, spiral_end, s, 32, 16);
  r_out[0] = s.v[0] - l1x;
  r_out[1] = s.v[1];
  r_out[2] = s.v[2];
  const double e = jacobi_energy(s);
  r_out[3] = ENERGY_WEIGHT * (e - e_target);
  const double deficit = MASS_FLOOR - s.v[6];
  r_out[4] = deficit > 0.0 ? deficit / MASS_SCALE : 0.0;
  bool finite = true;
  for (int i = 0; i < 7; ++i) finite &= std::isfinite(s.v[i]);
  if (!finite) {
    for (int i = 0; i < NRES; ++i) r_out[i] = 1e6;
  }
  if (pos_err)
    *pos_err = finite ? std::sqrt(r_out[0] * r_out[0] + r_out[1] * r_out[1] +
                                  r_out[2] * r_out[2])
                      : 1e6;
  if (energy_err) *energy_err = finite ? std::fabs(e - e_target) : 1e6;
  if (final_mass) *final_mass = finite ? s.v[6] : -1.0;
}

constexpr int NVAR = 63;  // t_shoot, t_c1, t_c2, 20 x (alpha, beta, r)

inline void clamp_vars(double* g, int n_segments, double max_shoot,
                       double max_coast) {
  g[0] = g[0] < 1e-3 ? 1e-3 : (g[0] > max_shoot ? max_shoot : g[0]);
  for (int i = 1; i <= 2; ++i)
    g[i] = g[i] < 0.0 ? 0.0 : (g[i] > max_coast ? max_coast : g[i]);
  for (int k = 0; k < n_segments; ++k) {
    double& r = g[3 + 3 * k + 2];
    r = r < 0.0 ? 0.0 : (r > 1.0 ? 1.0 : r);
  }
}

// Solve the NRES x NRES system (J J^T + lambda I) a = -r by Gaussian
// elimination with partial pivoting; the min-norm LM step is then
// d = J^T a.  With NRES residuals and 63 variables the normal equations
// live in residual space.
bool solve_res(double A[NRES][NRES], const double b[NRES], double x[NRES]) {
  double M[NRES][NRES + 1];
  for (int i = 0; i < NRES; ++i) {
    for (int j = 0; j < NRES; ++j) M[i][j] = A[i][j];
    M[i][NRES] = b[i];
  }
  for (int c = 0; c < NRES; ++c) {
    int p = c;
    for (int rr = c + 1; rr < NRES; ++rr)
      if (std::fabs(M[rr][c]) > std::fabs(M[p][c])) p = rr;
    if (std::fabs(M[p][c]) < 1e-300) return false;
    if (p != c)
      for (int j = 0; j <= NRES; ++j) std::swap(M[p][j], M[c][j]);
    for (int rr = 0; rr < NRES; ++rr) {
      if (rr == c) continue;
      const double f = M[rr][c] / M[c][c];
      for (int j = c; j <= NRES; ++j) M[rr][j] -= f * M[c][j];
    }
  }
  for (int i = 0; i < NRES; ++i) x[i] = M[i][NRES] / M[i][i];
  return true;
}

inline double norm_res(const double r[NRES]) {
  double acc = 0.0;
  for (int i = 0; i < NRES; ++i) acc += r[i] * r[i];
  return std::sqrt(acc);
}

// Levenberg-Marquardt refinement of one warm start.  Returns the iteration
// count at convergence (or max_iters).  The finite-difference Jacobian
// costs NVAR shoots per iteration — each shoot is ~400 RK4 stages, so one
// sample refines in ~milliseconds, vs ~17-20 s per reference SNOPT solve
// (BASELINE.md).
int refine_one(double* guess, int n_segments, double thrust_n,
               const double* spiral_end, double l1x, double e_target,
               int max_iters, double tol, double max_shoot,
               double max_coast) {
  double r[NRES], pos_err, energy_err;
  clamp_vars(guess, n_segments, max_shoot, max_coast);
  residual(guess, n_segments, thrust_n, spiral_end, l1x, e_target, r,
           &pos_err, &energy_err, nullptr);
  double cost = norm_res(r);
  double lambda = 1e-3;
  std::vector<double> J(NRES * NVAR);
  std::vector<double> trial(66);

  int it = 0;
  for (; it < max_iters && cost > tol; ++it) {
    // forward-difference Jacobian over the free variables
    for (int v = 0; v < NVAR; ++v) {
      const double h = 1e-6 * (std::fabs(guess[v]) + 1.0);
      std::memcpy(trial.data(), guess, 66 * sizeof(double));
      trial[v] += h;
      double rp[NRES];
      residual(trial.data(), n_segments, thrust_n, spiral_end, l1x, e_target,
               rp, nullptr, nullptr, nullptr);
      for (int i = 0; i < NRES; ++i) J[i * NVAR + v] = (rp[i] - r[i]) / h;
    }
    double JJt[NRES][NRES];
    for (int i = 0; i < NRES; ++i)
      for (int j = 0; j < NRES; ++j) {
        double acc = 0.0;
        for (int v = 0; v < NVAR; ++v)
          acc += J[i * NVAR + v] * J[j * NVAR + v];
        JJt[i][j] = acc;
      }
    bool improved = false;
    for (int attempt = 0; attempt < 8 && !improved; ++attempt) {
      double A[NRES][NRES];
      for (int i = 0; i < NRES; ++i)
        for (int j = 0; j < NRES; ++j)
          A[i][j] = JJt[i][j] + (i == j ? lambda : 0.0);
      double neg_r[NRES], a[NRES];
      for (int i = 0; i < NRES; ++i) neg_r[i] = -r[i];
      if (!solve_res(A, neg_r, a)) {
        lambda *= 10.0;
        continue;
      }
      std::memcpy(trial.data(), guess, 66 * sizeof(double));
      for (int v = 0; v < NVAR; ++v) {
        double dv = 0.0;
        for (int i = 0; i < NRES; ++i) dv += J[i * NVAR + v] * a[i];
        trial[v] += dv;
      }
      clamp_vars(trial.data(), n_segments, max_shoot, max_coast);
      double rt[NRES], pe, ee;
      residual(trial.data(), n_segments, thrust_n, spiral_end, l1x, e_target,
               rt, &pe, &ee, nullptr);
      const double ct = norm_res(rt);
      if (ct < cost) {
        std::memcpy(guess, trial.data(), 66 * sizeof(double));
        std::memcpy(r, rt, sizeof(r));
        cost = ct;
        lambda = lambda > 1e-12 ? lambda * 0.3 : 1e-12;
        improved = true;
      } else {
        lambda *= 10.0;
      }
    }
    if (!improved) break;  // stuck in a flat/cliff region: report as-is
  }
  return it;
}

// Pin a defined FP environment for the duration of a batch call.  The
// embedding process may have FTZ/DAZ set on the calling thread (XLA's CPU
// runtime enables both), which flushes the ~1e-300-scale pivots of the LM
// normal-equation solve to zero and changes refinement trajectories —
// results must not depend on who called us last.  New std::threads inherit
// the creator's MXCSR, so the guard is applied per executing thread.
#if defined(__SSE2__) || defined(__x86_64__)
struct FpEnvGuard {
  unsigned int saved;
  FpEnvGuard() : saved(_mm_getcsr()) {
    _mm_setcsr(saved & ~0x8040u);  // clear FTZ (bit 15) and DAZ (bit 6)
  }
  ~FpEnvGuard() { _mm_setcsr(saved); }
};
#else
struct FpEnvGuard {};
#endif

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    FpEnvGuard fp;
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&]() {
    FpEnvGuard fp;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
  };
  unsigned hw = std::thread::hardware_concurrency();
  int t = n_threads < static_cast<int>(hw ? hw : 1)
              ? n_threads
              : static_cast<int>(hw ? hw : 1);
  t = t < n ? t : n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Single constant-control propagation (test hook for JAX parity).
void cr3bp_propagate(const double* s0, const double* u, double throttle,
                     double thrust_n, double tof, int n_steps, double* out) {
  State7 s;
  std::memcpy(s.v, s0, sizeof(s.v));
  propagate(s, u, throttle, thrust_n, tof, n_steps);
  std::memcpy(out, s.v, sizeof(s.v));
}

double cr3bp_jacobi_energy(const double* s0) {
  State7 s;
  std::memcpy(s.v, s0, sizeof(s.v));
  return jacobi_energy(s);
}

// Batched propagate-and-check (the native twin of
// oracle.evaluate_warmstarts), thread-pool fan-out.
void cr3bp_evaluate_batch(const double* guesses, const double* energies,
                          int n, int n_segments, double thrust_n,
                          const double* spiral_end, double l1x, double e_l1,
                          double* pos_err, double* energy_err,
                          double* final_mass, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    double r[NRES];
    residual(guesses + 66 * i, n_segments, thrust_n, spiral_end, l1x,
             e_l1 + energies[i], r, pos_err + i, energy_err + i,
             final_mass + i);
  });
}

// Batched LM refinement ("SNOPT-lite"): refined guesses written in place
// of a copy of the inputs; per-sample iteration counts and post-refinement
// arrival errors returned for feasibility grading.
void cr3bp_refine_batch(const double* guesses, const double* energies, int n,
                        int n_segments, double thrust_n,
                        const double* spiral_end, double l1x, double e_l1,
                        int max_iters, double tol, double max_shoot,
                        double max_coast, double* refined, double* pos_err,
                        double* energy_err, int* iters, int n_threads) {
  std::memcpy(refined, guesses, sizeof(double) * 66 * n);
  parallel_for(n, n_threads, [&](int i) {
    iters[i] = refine_one(refined + 66 * i, n_segments, thrust_n, spiral_end,
                          l1x, e_l1 + energies[i], max_iters, tol, max_shoot,
                          max_coast);
    double r[NRES];
    residual(refined + 66 * i, n_segments, thrust_n, spiral_end, l1x,
             e_l1 + energies[i], r, pos_err + i, energy_err + i, nullptr);
  });
}

}  // extern "C"
