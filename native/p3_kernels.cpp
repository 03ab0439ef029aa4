// P3-class microphysics: C++ native twin of miniweatherml_tpu/physics/p3.py.
//
// The reference implements P3 natively (Fortran 90 called through bind(C),
// model/modules/helpers/microphysics_p3/micro_p3.F90, entry
// p3_main_fortran declared at model/modules/microphysics_p3.h:7-20).  This
// framework's native tier is C++: the same scheme as the TPU-resident JAX
// path, bit-comparable in double precision, callable from the coupler
// module via ctypes/pure_callback (host execution, like the reference's
// host-staged Fortran call at microphysics_p3.h:364-376).
//
// Array layout: (ncol, nz) row-major -- each column's vertical is
// contiguous, bottom-up.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double R_D = 287.042;
constexpr double CP_D = 1004.64;
constexpr double R_V = 461.505;
constexpr double CP_V = 1859.0;
constexpr double CP_L = 4188.0;
constexpr double RHO_H2O = 1000.0;
constexpr double LATICE = 333700.0;
constexpr double TMELT = 273.15;
constexpr double QSMALL = 1.0e-14;
constexpr double NSMALL = 1.0e-16;
constexpr double NCCNST = 200.0e6;
constexpr double PI = 3.14159265358979323846;
const double CONS3 = 1.0 / (PI / 6.0 * RHO_H2O * 25.0e-6 * 25.0e-6 * 25.0e-6);

double svp_liquid(double temp) {
  double tc = temp - 273.15;
  return 610.94 * std::exp(17.625 * tc / (243.04 + tc));
}

double svp_ice(double temp) {
  double tc = temp - 273.15;
  return 611.21 * std::exp(22.587 * tc / (273.86 + tc));
}

double latent_heat_condensation(double temp) {
  double tc = temp - 273.15;
  return (2500.8 - 2.36 * tc + 0.0016 * tc * tc - 0.00006 * tc * tc * tc) *
         1000.0;
}

double cp_moist(double rho_d, double rho_v, double rho_c) {
  double rho = rho_d + rho_v + rho_c;
  return (rho_d * CP_D + rho_v * CP_V + rho_c * CP_L) / rho;
}

}  // namespace

extern "C" {

// Instantaneous saturation adjustment by bisection over n cells
// (identical math to physics/p3.py compute_adjusted_state; 60 halvings).
void p3_adjust_state(std::int64_t n, const double* rho, const double* rho_d,
                     double* rho_v, double* rho_c, double* temp) {
  for (std::int64_t c = 0; c < n; ++c) {
    double rv0 = rho_v[c], rc0 = rho_c[c], t0 = temp[c];
    double svp = svp_liquid(t0);
    double pv = rv0 * R_V * t0;
    bool condensing = pv > svp;
    bool evaporating = (pv < svp) && (rc0 > 0.0);
    double lo = condensing ? 0.0 : (evaporating ? -rc0 : 0.0);
    double hi = condensing ? rv0 : 0.0;
    for (int it = 0; it < 60; ++it) {
      double x = 0.5 * (lo + hi);
      double rv = std::max(rv0 - x, 0.0);
      double rc = std::max(rc0 + x, 0.0);
      double Lv = latent_heat_condensation(t0);
      double cp = cp_moist(rho_d[c], rv, rc);
      double t_loc = t0 + x * Lv / (rho[c] * cp);
      bool super_sat = rv * R_V * t_loc > svp_liquid(t_loc);
      if (super_sat) lo = x; else hi = x;
    }
    double x = (condensing || evaporating) ? 0.5 * (lo + hi) : 0.0;
    double rv = std::max(rv0 - x, 0.0);
    double rc = std::max(rc0 + x, 0.0);
    double Lv = latent_heat_condensation(t0);
    double cp = cp_moist(rho_d[c], rv, rc);
    rho_v[c] = rv;
    rho_c[c] = rc;
    temp[c] = t0 + x * Lv / (rho[c] * cp);
  }
}

// One P3-class microphysics step over (ncol, nz) columns.
// Mirrors physics/p3.py p3_scheme line for line.
void p3_column_step(std::int64_t ncol, std::int64_t nz, double dt, double* qc,
                    double* nc, double* qr, double* nr, double* qi, double* ni,
                    double* qm, double* bm, double* qv, double* theta,
                    const double* exner, const double* pres,
                    const double* rho_d, const double* dz, double* precip_liq,
                    double* precip_ice) {
  auto conserve2 = [dt](double avail, double& a, double& b) {
    double total = (a + b) * dt;
    if (total > avail) {
      double r = avail / std::max(total, 1e-300);
      a *= r;
      b *= r;
    }
  };

  std::int64_t n = ncol * nz;
  double vmax = 0.0;
  double dz_min = 1e300;

  // Total density from the *input* state: the JAX path computes rho once at
  // the top of p3_scheme and reuses it for all processes and sedimentation.
  std::vector<double> rho_pre(n), temp_pre(n);
  for (std::int64_t c = 0; c < n; ++c) {
    rho_pre[c] = rho_d[c] * (1.0 + qv[c] + qc[c] + qr[c] + qi[c]);
    temp_pre[c] = theta[c] * exner[c];
  }

  // Pass 1: process rates + tendencies, cell-local.
  for (std::int64_t c = 0; c < n; ++c) {
    double temp = theta[c] * exner[c];
    double rho = rho_pre[c];
    double inv_rho = 1.0 / rho;
    double Lv = latent_heat_condensation(temp);
    double Ls = Lv + LATICE;
    double Lf = LATICE;

    nc[c] = NCCNST * inv_rho;  // prescribed droplet number

    double au = 0.0;
    if (qc[c] >= 1.0e-8) {
      au = 1350.0 * std::pow(std::max(qc[c], QSMALL), 2.47) *
           std::pow(std::max(nc[c] * 1.0e-6 * rho, NSMALL), -1.79);
    }
    double ac = 0.0;
    if (qc[c] >= QSMALL && qr[c] >= QSMALL) {
      ac = 67.0 * std::pow(std::max(qc[c] * qr[c], 1e-300), 1.15);
    }
    double dm_r = std::cbrt(std::max(qr[c], QSMALL) /
                            (PI * RHO_H2O * std::max(nr[c], NSMALL)));
    double brk = dm_r < 280.0e-6 ? 1.0 : 2.0 - std::exp(2300.0 * (dm_r - 280.0e-6));
    double nr_self = qr[c] >= QSMALL ? brk * 5.78 * nr[c] * qr[c] * rho : 0.0;

    double qsl = svp_liquid(temp) / (R_V * temp * rho_d[c]);
    double subsat = std::max(qsl - qv[c], 0.0) / std::max(qsl, QSMALL);
    double tau_evap = 150.0 / std::max(std::pow(rho * qr[c], 0.35), 1e-4);
    double ev = (qr[c] >= QSMALL && qc[c] < QSMALL) ? subsat * qr[c] / tau_evap : 0.0;

    double tc_ = temp - TMELT;
    double qv_si = svp_ice(temp) / (R_V * temp * rho_d[c]);
    double sup_i = qv[c] / std::max(qv_si, QSMALL) - 1.0;

    double n_coop =
        std::min(0.005 * std::exp(0.304 * std::max(-tc_, 0.0)), 208.9e3) *
        1.0e3 * inv_rho;
    bool nucleate = (tc_ < -15.0) && (sup_i > 0.05);
    double qinuc = nucleate ? std::max(n_coop - ni[c], 0.0) * 1.0e-12 / dt : 0.0;
    double ninuc = nucleate ? std::max(n_coop - ni[c], 0.0) / dt : 0.0;

    double big_a = 0.66, big_b = 100.0;
    double bigg =
        tc_ < -4.0 ? big_b * (std::exp(big_a * std::min(-tc_, 40.0)) - 1.0) : 0.0;
    double qc_frz =
        bigg * rho * qc[c] * qc[c] / (RHO_H2O * std::max(nc[c] * rho, NSMALL) * 6.0);
    double qr_frz =
        bigg * rho * qr[c] * qr[c] / (RHO_H2O * std::max(nr[c] * rho, NSMALL) * 6.0);
    double nc_frz = qc_frz * nc[c] / std::max(qc[c], QSMALL);
    double nr_frz = qr_frz * nr[c] / std::max(qr[c], QSMALL);

    double tau_dep = 300.0 / std::max(std::pow(rho * qi[c], 0.25), 1e-3);
    bool has_ice = (qi[c] >= QSMALL) && (tc_ < 0.0);
    double dep = (has_ice && sup_i > 0.0) ? (qv[c] - qv_si) / tau_dep : 0.0;
    double sub = (has_ice && sup_i < 0.0) ? (qv_si - qv[c]) / tau_dep : 0.0;

    double vi = std::clamp(1.2 * std::pow(std::max(rho * qi[c], 0.0), 0.0625),
                           0.3, 3.0);
    double rim = (qi[c] >= QSMALL && qc[c] >= QSMALL && tc_ < 0.0)
                     ? 0.7 * 2.0 * vi * qi[c] * qc[c]
                     : 0.0;

    double melt = (qi[c] >= QSMALL && tc_ > 0.0) ? qi[c] * tc_ / 60.0 : 0.0;

    // conservation rescaling
    {
      double total = (au + ac + qc_frz + rim) * dt;
      if (total > qc[c]) {
        double r = qc[c] / std::max(total, 1e-300);
        au *= r; ac *= r; qc_frz *= r; rim *= r;
      }
    }
    conserve2(qr[c], ev, qr_frz);
    conserve2(qi[c], sub, melt);
    conserve2(std::max(qv[c] - qv_si, 0.0), dep, qinuc);

    double qc_new = qc[c] + dt * (-au - ac - qc_frz - rim);
    double qr_new = qr[c] + dt * (au + ac - ev - qr_frz + melt);
    double qi_new =
        qi[c] + dt * (qc_frz + qr_frz + dep + qinuc - sub - melt + rim);
    double qv_new = qv[c] + dt * (ev + sub - dep - qinuc);
    // melting moves ice number to rain number; sublimation removes ice
    // number (matches physics/p3.py's shared update equations)
    double ni2nr_melt = melt * ni[c] / std::max(qi[c], QSMALL);
    double nr_new = nr[c] + dt * (au * CONS3 - nr_self - nr_frz + ni2nr_melt -
                                  ev * nr[c] / std::max(qr[c], QSMALL));
    double ni_new = ni[c] + dt * (ninuc + nc_frz + nr_frz - ni2nr_melt -
                                  sub * ni[c] / std::max(qi[c], QSMALL));
    double qm_new = qm[c] + dt * (rim + qr_frz -
                                  (melt + sub) * qm[c] / std::max(qi[c], QSMALL));
    double bm_new = bm[c] + dt * (rim / 400.0 + qr_frz / 900.0 -
                                  (melt + sub) * bm[c] / std::max(qi[c], QSMALL));
    theta[c] += dt / (CP_D * exner[c]) *
                (Lv * (-ev) + Ls * (dep + qinuc - sub) +
                 Lf * (qc_frz + qr_frz + rim - melt));

    qc[c] = std::max(qc_new, 0.0);
    qr[c] = std::max(qr_new, 0.0);
    qi[c] = std::max(qi_new, 0.0);
    qv[c] = std::max(qv_new, 0.0);
    nr[c] = std::max(nr_new, 0.0);
    ni[c] = std::max(ni_new, 0.0);
    qm[c] = std::max(qm_new, 0.0);
    bm[c] = std::max(bm_new, 0.0);

    if (dz[c] < dz_min) dz_min = dz[c];
  }

  // Global CFL sub-cycle count (matches the JAX path's global max, computed
  // with pre-process rho and post-process qr/qi).
  for (std::int64_t c = 0; c < n; ++c) {
    std::int64_t col = c / nz;
    double rho0 = rho_pre[col * nz];
    double rho = rho_pre[c];
    double vr = std::clamp(36.34 * std::pow(std::max(rho * qr[c], 0.0), 0.1364) *
                               std::sqrt(rho0 / rho),
                           0.0, 9.1);
    double vi = std::clamp(1.2 * std::pow(std::max(rho * qi[c], 0.0), 0.0625),
                           0.3, 3.0);
    double temp_c = temp_pre[c];
    double mu_v = 1.496e-6 * std::pow(temp_c, 1.5) / (temp_c + 120.0);
    double acn = 9.80616 * RHO_H2O / (18.0 * mu_v);
    double sfac = 0.0005714 * (nc[c] * 1.0e-6 * rho) + 0.2714;
    double mu_cd = std::clamp(1.0 / (sfac * sfac) - 1.0, 2.0, 15.0);
    double lamc = std::cbrt(PI / 6.0 * RHO_H2O * nc[c] * (mu_cd + 3.0) *
                            (mu_cd + 2.0) * (mu_cd + 1.0) /
                            std::max(qc[c], QSMALL));
    lamc = std::clamp(lamc, (mu_cd + 1.0) * 2.5e4, (mu_cd + 1.0) * 1.0e6);
    double vc = qc[c] >= QSMALL
                    ? acn * std::exp(std::lgamma(mu_cd + 6.0) -
                                     std::lgamma(mu_cd + 4.0)) /
                          (lamc * lamc)
                    : 0.0;
    vmax = std::max(vmax, std::max(vc, std::max(vr, vi)));
  }
  double nsub = std::max(std::ceil(dt * vmax / (0.9 * dz_min)), 1.0);
  double dts = dt / nsub;

  // Pass 2: sedimentation, per column, upstream differencing.
  std::vector<double> vr_k(nz), vi_k(nz), vc_k(nz), flux(nz);
  for (std::int64_t col = 0; col < ncol; ++col) {
    double* Qc = qc + col * nz;
    double* Nc = nc + col * nz;
    const double* Tp = temp_pre.data() + col * nz;
    double* Qr = qr + col * nz;
    double* Nr = nr + col * nz;
    double* Qi = qi + col * nz;
    double* Ni = ni + col * nz;
    double* Qm = qm + col * nz;
    double* Bm = bm + col * nz;
    const double* Rho = rho_pre.data() + col * nz;
    const double* Dz = dz + col * nz;
    double pl = 0.0, pi_srf = 0.0;
    double rho0 = Rho[0];

    for (double it = 0; it < nsub; ++it) {
      // recompute fall speeds each sub-step (matches JAX sub_body)
      for (std::int64_t k = 0; k < nz; ++k) {
        vr_k[k] = std::clamp(
            36.34 * std::pow(std::max(Rho[k] * Qr[k], 0.0), 0.1364) *
                std::sqrt(rho0 / Rho[k]),
            0.0, 9.1);
        vi_k[k] = std::clamp(
            1.2 * std::pow(std::max(Rho[k] * Qi[k], 0.0), 0.0625), 0.3, 3.0);
        // Stokes cloud fall speed with the gamma DSD (matches the JAX
        // cloud_fallspeed; p3_main cloud sedimentation,
        // micro_p3.F90:3670-3690)
        double temp = Tp[k];
        double mu_v = 1.496e-6 * std::pow(temp, 1.5) / (temp + 120.0);
        double acn = 9.80616 * RHO_H2O / (18.0 * mu_v);
        double sfac = 0.0005714 * (Nc[k] * 1.0e-6 * Rho[k]) + 0.2714;
        double mu_cd =
            std::clamp(1.0 / (sfac * sfac) - 1.0, 2.0, 15.0);
        double lamc = std::cbrt(PI / 6.0 * RHO_H2O * Nc[k] * (mu_cd + 3.0) *
                                (mu_cd + 2.0) * (mu_cd + 1.0) /
                                std::max(Qc[k], QSMALL));
        lamc = std::clamp(lamc, (mu_cd + 1.0) * 2.5e4, (mu_cd + 1.0) * 1.0e6);
        double vq = acn *
                    std::exp(std::lgamma(mu_cd + 6.0) -
                             std::lgamma(mu_cd + 4.0)) /
                    (lamc * lamc);
        vc_k[k] = Qc[k] >= QSMALL ? vq : 0.0;
      }
      auto fall = [&](double* Q, const double* V, double* srf) {
        for (std::int64_t k = 0; k < nz; ++k) flux[k] = Rho[k] * Q[k] * V[k];
        if (srf) *srf += dts * flux[0] / RHO_H2O;
        for (std::int64_t k = 0; k < nz - 1; ++k) {
          Q[k] += dts * (flux[k + 1] - flux[k]) / (Rho[k] * Dz[k]);
        }
        Q[nz - 1] += -dts * flux[nz - 1] / (Rho[nz - 1] * Dz[nz - 1]);
        for (std::int64_t k = 0; k < nz; ++k) Q[k] = std::max(Q[k], 0.0);
      };
      fall(Qc, vc_k.data(), &pl);
      fall(Qr, vr_k.data(), &pl);
      fall(Nr, vr_k.data(), nullptr);
      fall(Qi, vi_k.data(), &pi_srf);
      fall(Ni, vi_k.data(), nullptr);
      fall(Qm, vi_k.data(), nullptr);
      fall(Bm, vi_k.data(), nullptr);
    }
    precip_liq[col] = pl / dt;
    precip_ice[col] = pi_srf / dt;
  }
}

}  // extern "C"
