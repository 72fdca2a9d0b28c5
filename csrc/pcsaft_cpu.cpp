// Native CPU solver backend for pure-component PC-SAFT.
//
// This is the framework's equivalent of the reference's native solver layer
// (reference src/pcsaft.rs: a Rust/pyo3 batched gradient-free backend over
// rayon).  On TPU the production path is the JAX solver
// (feos_tpu/solvers/vle.py); this C++ backend provides
//   * a host-side executor for CPU-only deployments (OpenMP over batch rows,
//     mirroring the reference's rayon par_map_collect, src/pcsaft.rs:88),
//   * an independent implementation of the same physics used by the test
//     suite to cross-validate the JAX solvers without the FeOs oracle.
//
// Physics: PC-SAFT residual Helmholtz energy density (hard sphere, hard
// chain, dispersion, PCP-SAFT dipole, 2-site association closed form) with
// semantics matching reference feos_torch/pcsaft_pure.py:106-178; solvers
// follow feos_tpu/solvers/vle.py (tiny-pressure liquid initialization,
// ideal-vapor saturation estimate, damped 2x2 Newton).
//
// Build: make -C csrc   (produces libfeos_cpu.so; loaded via ctypes)

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

constexpr double PI = 3.14159265358979323846;
constexpr double MU2_FACTOR = 1e-19 / 1.380649e-23;

// second-order dual number: value, d/drho, d2/drho2 (the reference's Dual3,
// feos_torch/dual.py:5, re-derived here for the solver's (phi, p~, dp~))
struct D3 {
    double re, v1, v2;
};
inline D3 mk(double re) { return {re, 0.0, 0.0}; }
inline D3 operator+(D3 a, D3 b) { return {a.re + b.re, a.v1 + b.v1, a.v2 + b.v2}; }
inline D3 operator+(D3 a, double b) { return {a.re + b, a.v1, a.v2}; }
inline D3 operator+(double a, D3 b) { return b + a; }
inline D3 operator-(D3 a) { return {-a.re, -a.v1, -a.v2}; }
inline D3 operator-(D3 a, D3 b) { return {a.re - b.re, a.v1 - b.v1, a.v2 - b.v2}; }
inline D3 operator-(double a, D3 b) { return {a - b.re, -b.v1, -b.v2}; }
inline D3 operator-(D3 a, double b) { return {a.re - b, a.v1, a.v2}; }
inline D3 operator*(D3 a, D3 b) {
    return {a.re * b.re, a.v1 * b.re + a.re * b.v1,
            a.v2 * b.re + 2.0 * a.v1 * b.v1 + a.re * b.v2};
}
inline D3 operator*(D3 a, double b) { return {a.re * b, a.v1 * b, a.v2 * b}; }
inline D3 operator*(double a, D3 b) { return b * a; }
inline D3 chain(D3 x, double f0, double f1, double f2) {
    return {f0, f1 * x.v1, f2 * x.v1 * x.v1 + f1 * x.v2};
}
inline D3 recip(D3 x) {
    double r = 1.0 / x.re;
    return chain(x, r, -r * r, 2.0 * r * r * r);
}
inline D3 operator/(D3 a, D3 b) { return a * recip(b); }
inline D3 operator/(D3 a, double b) { return {a.re / b, a.v1 / b, a.v2 / b}; }
inline D3 operator/(double a, D3 b) { return a * recip(b); }
inline D3 dlog(D3 x) {
    double r = 1.0 / x.re;
    return chain(x, std::log(x.re), r, -r * r);
}
inline D3 dsqrt(D3 x) {
    double s = std::sqrt(x.re);
    return chain(x, s, 0.5 / s, -0.25 / (s * s * s));
}

// universal PC-SAFT constants (Gross & Sadowski 2001; Gross & Vrabec 2006)
const double A0[7] = {0.91056314451539, 0.63612814494991, 2.68613478913903,
                      -26.5473624914884, 97.7592087835073, -159.591540865600,
                      91.2977740839123};
const double A1[7] = {-0.30840169182720, 0.18605311591713, -2.50300472586548,
                      21.4197936296668, -65.2558853303492, 83.3186804808856,
                      -33.7469229297323};
const double A2C[7] = {-0.09061483509767, 0.45278428063920, 0.59627007280101,
                       -1.72418291311787, -4.13021125311661, 13.7766318697211,
                       -8.67284703679646};
const double B0[7] = {0.72409469413165, 2.23827918609380, -4.00258494846342,
                      -21.00357681484648, 26.8556413626615, 206.5513384066188,
                      -355.60235612207947};
const double B1[7] = {-0.57554980753450, 0.69950955214436, 3.89256733895307,
                      -17.21547164777212, 192.6722644652495, -161.8264616487648,
                      -165.2076934555607};
const double B2C[7] = {0.09768831158356, -0.25575749816100, -9.15585615297321,
                       20.64207597439724, -38.80443005206285, 93.6267740770146,
                       -29.66690558514725};
const double AD[5][3] = {{0.30435038064, 0.95346405973, -1.16100802773},
                         {-0.13585877707, -1.83963831920, 4.52586067320},
                         {1.44933285154, 2.01311801180, 0.97512223853},
                         {0.35569769252, -7.37249576667, -12.2810377713},
                         {-2.06533084541, 8.23741345333, 5.93975747420}};
const double BD[5][3] = {{0.21879385627, -0.58731641193, 3.48695755800},
                         {-1.18964307357, 1.24891317047, -14.9159739347},
                         {1.16268885692, -0.50852797392, 15.3720218600},
                         {0.0, 0.0, 0.0},
                         {0.0, 0.0, 0.0}};
const double CD[4][3] = {{-0.06467735252, -0.95208758351, -0.62609792333},
                         {0.19758818347, 2.99242575222, 1.29246858189},
                         {-0.80875619458, -2.38026356489, 1.65427830900},
                         {0.69028490492, -0.27012609786, -3.43967436378}};

struct Par {
    double m, sigma, eps_k, mu, kappa_ab, eps_k_ab, na, nb;
};

// reduced residual Helmholtz energy density phi = A/(kB T V), and its first
// and second density derivatives, as a dual-number computation
D3 phi_pure(const Par& p, double T, D3 rho) {
    const double d = p.sigma * (1.0 - 0.12 * std::exp(-3.0 * p.eps_k / T));
    const double e = p.eps_k / T;
    const double s3 = p.sigma * p.sigma * p.sigma;

    D3 eta = (PI / 6.0 * p.m * d * d * d) * rho;
    D3 eta2 = eta * eta;
    D3 eta3 = eta2 * eta;
    D3 eta_m1 = 1.0 / (1.0 - eta);
    D3 eta_m2 = eta_m1 * eta_m1;
    D3 etas[7] = {mk(1.0), eta, eta2, eta3, eta2 * eta2, eta2 * eta3, eta3 * eta3};

    // hard sphere
    D3 hs = p.m * rho * (4.0 * eta - 3.0 * eta2) * eta_m2;

    // hard chain
    D3 g = (1.0 - eta * 0.5) * eta_m1 * eta_m2;
    D3 hc = -1.0 * rho * (p.m - 1.0) * dlog(g);

    // dispersion
    double m1 = (p.m - 1.0) / p.m;
    double m2 = (p.m - 2.0) / p.m;
    D3 I1 = mk(0.0), I2 = mk(0.0);
    for (int i = 0; i < 7; ++i) {
        I1 = I1 + (m1 * (m2 * A2C[i] + A1[i]) + A0[i]) * etas[i];
        I2 = I2 + (m1 * (m2 * B2C[i] + B1[i]) + B0[i]) * etas[i];
    }
    D3 C1 = 1.0 / (1.0 + p.m * (8.0 * eta - 2.0 * eta2) * eta_m2 * eta_m2 +
                   (1.0 - p.m) *
                       (20.0 * eta - 27.0 * eta2 + 12.0 * eta2 * eta -
                        2.0 * eta2 * eta2) /
                       ((1.0 - eta) * (1.0 - eta) * (2.0 - eta) * (2.0 - eta)));
    D3 I = 2.0 * I1 + C1 * I2 * (p.m * e);
    D3 disp = (-PI * p.m * p.m * e * s3) * rho * rho * I;

    // dipole (scale-safe Pade, see feos_tpu/models/pcsaft_pure.py)
    double mu2 = p.mu * p.mu / (p.m * s3 * p.eps_k) * MU2_FACTOR * e * s3;
    double mc = std::min(p.m, 2.0);
    double md1 = (mc - 1.0) / mc;
    double md2 = md1 * (mc - 2.0) / mc;
    D3 J1 = mk(0.0), J2 = mk(0.0);
    for (int i = 0; i < 5; ++i) {
        double a = AD[i][0] + md1 * AD[i][1] + md2 * AD[i][2];
        double b = BD[i][0] + md1 * BD[i][1] + md2 * BD[i][2];
        J1 = J1 + (a + b * e) * etas[i];
    }
    for (int i = 0; i < 4; ++i)
        J2 = J2 + (CD[i][0] + md1 * CD[i][1] + md2 * CD[i][2]) * etas[i];
    D3 phi2 = -PI / s3 * rho * rho * J1;
    D3 J1safe = (J1.re != 0.0) ? J1 : mk(1.0);
    D3 ratio = (4.0 / 3.0 * PI) * rho * (J2 / J1safe);
    D3 dipole = phi2 * (mu2 * mu2) / (1.0 - mu2 * ratio);

    // association (closed-form 2-site)
    double delta_assoc = (std::exp(p.eps_k_ab / T) - 1.0) * s3 * p.kappa_ab;
    D3 k = eta * eta_m1;
    D3 delta = (1.0 + k * (1.5 + k * 0.5)) * eta_m1 * delta_assoc;
    D3 rhoa = p.na * rho;
    D3 rhob = p.nb * rho;
    D3 aux = 1.0 + (rhoa - rhob) * delta;
    D3 sq = dsqrt(aux * aux + 4.0 * rhob * delta);
    D3 xa = 2.0 / (sq + 1.0 + (rhob - rhoa) * delta);
    D3 xb = 2.0 / (sq + 1.0 - (rhob - rhoa) * delta);
    D3 assoc = rhoa * (dlog(xa) - xa * 0.5 + 0.5) + rhob * (dlog(xb) - xb * 0.5 + 0.5);

    return hs + hc + disp + dipole + assoc;
}

struct Eos {
    double pt, dpt, mu, dmu;  // p~, dp~/drho, mu~_tot, dmu~/drho
};

Eos eos(const Par& p, double T, double rho) {
    D3 a = phi_pure(p, T, {rho, 1.0, 0.0});
    Eos o;
    o.pt = rho - a.re + rho * a.v1;
    o.dpt = 1.0 + rho * a.v2;
    o.mu = a.v1 + std::log(rho);
    o.dmu = a.v2 + 1.0 / rho;
    return o;
}

// Newton solve of p~(rho) = pt on the given branch; sign=+1 liquid, -1 vapor
bool npt(const Par& p, double T, double pt, double rho0, double sign,
         double* rho_out) {
    const double d = p.sigma * (1.0 - 0.12 * std::exp(-3.0 * p.eps_k / T));
    const double eta_factor = PI / 6.0 * p.m * d * d * d;
    double lr = std::log(rho0);
    const double lr_max = std::log(0.74 / eta_factor);
    for (int it = 0; it < 60; ++it) {
        double rho = std::exp(lr);
        Eos o = eos(p, T, rho);
        double r = o.pt - pt;
        double dr = rho * o.dpt;
        double step;
        if (dr > 0.0) {
            step = std::clamp(r / dr, -0.5, 0.5);
            if (std::abs(r / dr) < 1e-13) {
                *rho_out = rho;
                return true;
            }
        } else {
            step = -sign * 0.2;
        }
        if (!std::isfinite(step)) return false;
        lr = std::min(lr - step, lr_max);
    }
    double rho = std::exp(lr);
    Eos o = eos(p, T, rho);
    *rho_out = rho;
    return o.dpt > 0.0 && std::abs(o.pt - pt) < 1e-6 * std::abs(rho * o.dpt);
}

// pure VLE: returns rho_v, rho_l; same scheme as feos_tpu/solvers/vle.py
bool vle(const Par& p, double T, double* rho_v, double* rho_l) {
    const double d = p.sigma * (1.0 - 0.12 * std::exp(-3.0 * p.eps_k / T));
    const double eta_factor = PI / 6.0 * p.m * d * d * d;

    // spinodal scan for the near-critical fallback
    double p_inf = 1e-12, rho_infl = 0.0, min_dp = 1e30;
    for (int i = 0; i < 48; ++i) {
        double eta = 1e-4 * std::pow(5500.0, i / 47.0);  // 1e-4 .. 0.55
        double rho = eta / eta_factor;
        Eos o = eos(p, T, rho);
        if (o.dpt < min_dp) {
            min_dp = o.dpt;
            p_inf = std::max(o.pt, 1e-12);
            rho_infl = rho;
        }
    }
    if (min_dp > 0.0) return false;  // supercritical

    double rho_l0;
    bool ok_tiny = npt(p, T, 1e-10, 0.5 / eta_factor, 1.0, &rho_l0) &&
                   eta_factor * rho_l0 < 0.7;
    double p0;
    if (ok_tiny) {
        Eos o = eos(p, T, rho_l0);
        p0 = std::exp(std::clamp(o.mu, -700.0, 700.0));
    } else {
        if (!npt(p, T, p_inf, 0.5 / eta_factor, 1.0, &rho_l0)) return false;
        p0 = p_inf;
    }
    double rho_v0;
    if (!npt(p, T, p0, std::max(p0, 1e-250), -1.0, &rho_v0)) rho_v0 = p0;

    double lv = std::log(rho_v0), ll = std::log(rho_l0);
    const double ln_inf = std::log(rho_infl);
    bool conv = false;
    for (int it = 0; it < 80; ++it) {
        double rv = std::exp(lv), rl = std::exp(ll);
        Eos ov = eos(p, T, rv), ol = eos(p, T, rl);
        double r1 = ov.pt - ol.pt, r2 = ov.mu - ol.mu;
        double j00 = rv * ov.dpt, j01 = -rl * ol.dpt;
        double j10 = rv * ov.dmu, j11 = -rl * ol.dmu;
        double det = j00 * j11 - j01 * j10;
        if (std::abs(det) < 1e-300) det = 1e-300;
        double dv = (j11 * r1 - j01 * r2) / det;
        double dl = (-j10 * r1 + j00 * r2) / det;
        if (!std::isfinite(dv) || !std::isfinite(dl)) return false;
        // step FIRST, then exit: applying the final Newton step from a
        // residual-accepted point costs nothing and lands the densities at
        // the f64 noise floor (quadratic convergence), which is what puts
        // two independent implementations within ~1e-13 of each other
        lv = std::min(lv - std::clamp(dv, -0.2, 0.2), ln_inf);
        ll = std::max(ll - std::clamp(dl, -0.2, 0.2), ln_inf);
        if ((std::abs(r1) < 1e-9 * std::abs(j00) + 1e-13 * std::abs(rl * ol.dpt) &&
             std::abs(r2) < 1e-9) ||
            std::abs(dv) + std::abs(dl) < 1e-13) {
            conv = true;
            break;
        }
    }
    double rv = std::exp(lv), rl = std::exp(ll);
    Eos ov = eos(p, T, rv), ol = eos(p, T, rl);
    bool ok = conv && std::isfinite(rv) && std::isfinite(rl) &&
              rl > rv * (1.0 + 1e-6) && ov.dpt > 0.0 && ol.dpt > 0.0 &&
              std::abs(ov.mu - ol.mu) < 1e-7;
    *rho_v = rv;
    *rho_l = rl;
    return ok;
}

Par load(const double* row) {
    return {row[0], row[1], row[2], row[3], row[4], row[5], row[6], row[7]};
}

}  // namespace

extern "C" {

// Batched vapor-pressure VLE solve: densities[2*i] = rho_V, [2*i+1] = rho_L.
// Failure-mask protocol as in the reference (src/pcsaft.rs:82-103), but with
// fixed-length outputs (NaN-filled on failure) instead of compaction.
void feos_vapor_pressure(const double* params, const double* temperature,
                         int64_t n, double* densities, uint8_t* ok) {
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t i = 0; i < n; ++i) {
        Par p = load(params + 8 * i);
        double rv = 0.0 / 0.0, rl = 0.0 / 0.0;
        ok[i] = vle(p, temperature[i], &rv, &rl) ? 1 : 0;
        densities[2 * i] = rv;
        densities[2 * i + 1] = rl;
    }
}

// Batched NPT liquid-density solve (reference src/pcsaft.rs:105-129);
// p_target in reduced units (p A^3/(kB T)).
void feos_liquid_density(const double* params, const double* temperature,
                         const double* p_red, int64_t n, double* density,
                         uint8_t* ok) {
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t i = 0; i < n; ++i) {
        Par p = load(params + 8 * i);
        double d = p.sigma * (1.0 - 0.12 * std::exp(-3.0 * p.eps_k / temperature[i]));
        double eta_factor = PI / 6.0 * p.m * d * d * d;
        double rho = 0.0 / 0.0;
        bool good = npt(p, temperature[i], p_red[i], 0.5 / eta_factor, 1.0, &rho);
        ok[i] = (good && eta_factor * rho < 0.7) ? 1 : 0;
        density[i] = rho;
    }
}

// Batched Helmholtz derivatives (phi, p~, dp~/drho) for cross-validation.
void feos_derivatives(const double* params, const double* temperature,
                      const double* rho, int64_t n, double* out /* 3n */) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        Par p = load(params + 8 * i);
        D3 a = phi_pure(p, temperature[i], {rho[i], 1.0, 0.0});
        out[3 * i] = a.re;
        out[3 * i + 1] = rho[i] - a.re + rho[i] * a.v1;
        out[3 * i + 2] = 1.0 + rho[i] * a.v2;
    }
}

}  // extern "C"
