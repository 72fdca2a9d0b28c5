// Native CPU solver backend for binary-mixture PC-SAFT bubble/dew points.
//
// Independent oracle for the JAX mixture VLE solvers
// (feos_tpu/solvers/vle.py:mix_vle): same physics as the differentiable
// model (feos_torch/pcsaft_mix.py:31-154 semantics), re-derived here with
// 2-variable second-order hyper-dual numbers so the solver gets exact
// (p~, mu_i) Jacobians without any AD framework.  Mirrors the native
// capability of reference src/pcsaft.rs:150-214 (batched binary
// bubble_point/dew_point over CPU threads).
//
// Build: make -C csrc   (compiled into libfeos_cpu.so; loaded via ctypes)

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

constexpr double PI = 3.14159265358979323846;
constexpr double MU2_FACTOR = 1e-19 / 1.380649e-23;

// ---------------------------------------------------------------------------
// 2-variable second-order hyper-dual: value, gradient (2), Hessian (sym 3)
// ---------------------------------------------------------------------------

struct D2v {
    double re;
    double g0, g1;
    double h00, h01, h11;
};

inline D2v mk(double v) { return {v, 0, 0, 0, 0, 0}; }
inline D2v var0(double v) { return {v, 1, 0, 0, 0, 0}; }
inline D2v var1(double v) { return {v, 0, 1, 0, 0, 0}; }

inline D2v operator+(D2v a, D2v b) {
    return {a.re + b.re, a.g0 + b.g0, a.g1 + b.g1,
            a.h00 + b.h00, a.h01 + b.h01, a.h11 + b.h11};
}
inline D2v operator+(D2v a, double b) { return {a.re + b, a.g0, a.g1, a.h00, a.h01, a.h11}; }
inline D2v operator+(double a, D2v b) { return b + a; }
inline D2v operator-(D2v a) { return {-a.re, -a.g0, -a.g1, -a.h00, -a.h01, -a.h11}; }
inline D2v operator-(D2v a, D2v b) { return a + (-b); }
inline D2v operator-(D2v a, double b) { return a + (-b); }
inline D2v operator-(double a, D2v b) { return (-b) + a; }
inline D2v operator*(D2v a, D2v b) {
    return {a.re * b.re,
            a.g0 * b.re + a.re * b.g0,
            a.g1 * b.re + a.re * b.g1,
            a.h00 * b.re + 2.0 * a.g0 * b.g0 + a.re * b.h00,
            a.h01 * b.re + a.g0 * b.g1 + a.g1 * b.g0 + a.re * b.h01,
            a.h11 * b.re + 2.0 * a.g1 * b.g1 + a.re * b.h11};
}
inline D2v operator*(D2v a, double b) {
    return {a.re * b, a.g0 * b, a.g1 * b, a.h00 * b, a.h01 * b, a.h11 * b};
}
inline D2v operator*(double a, D2v b) { return b * a; }
// chain rule for f(x): f0 = f(x.re), f1 = f'(x.re), f2 = f''(x.re)
inline D2v chain(D2v x, double f0, double f1, double f2) {
    return {f0,
            f1 * x.g0,
            f1 * x.g1,
            f2 * x.g0 * x.g0 + f1 * x.h00,
            f2 * x.g0 * x.g1 + f1 * x.h01,
            f2 * x.g1 * x.g1 + f1 * x.h11};
}
inline D2v recip(D2v x) {
    double r = 1.0 / x.re;
    return chain(x, r, -r * r, 2.0 * r * r * r);
}
inline D2v operator/(D2v a, D2v b) { return a * recip(b); }
inline D2v operator/(D2v a, double b) { return a * (1.0 / b); }
inline D2v operator/(double a, D2v b) { return recip(b) * a; }
inline D2v dlog(D2v x) {
    double r = 1.0 / x.re;
    return chain(x, std::log(x.re), r, -r * r);
}
inline D2v dexp(D2v x) {
    double e = std::exp(x.re);
    return chain(x, e, e, e);
}
inline D2v dsqrt(D2v x) {
    double s = std::sqrt(x.re);
    return chain(x, s, 0.5 / s, -0.25 / (s * s * s));
}

// universal PC-SAFT constants (Gross & Sadowski 2001; Gross & Vrabec 2006)
extern const double A0[7], A1[7], A2C[7], B0[7], B1[7], B2C[7];
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
const double ADc[5][3] = {{0.30435038064, 0.95346405973, -1.16100802773},
                          {-0.13585877707, -1.83963831920, 4.52586067320},
                          {1.44933285154, 2.01311801180, 0.97512223853},
                          {0.35569769252, -7.37249576667, -12.2810377713},
                          {-2.06533084541, 8.23741345333, 5.93975747420}};
const double BDc[5][3] = {{0.21879385627, -0.58731641193, 3.48695755800},
                          {-1.18964307357, 1.24891317047, -14.9159739347},
                          {1.16268885692, -0.50852797392, 15.3720218600},
                          {0.0, 0.0, 0.0},
                          {0.0, 0.0, 0.0}};
const double CDc[4][3] = {{-0.06467735252, -0.95208758351, -0.62609792333},
                          {0.19758818347, 2.99242575222, 1.29246858189},
                          {-0.80875619458, -2.38026356489, 1.65427830900},
                          {0.69028490492, -0.27012609786, -3.43967436378}};

struct MixPar {
    double m[2], sigma[2], eps_k[2], mu[2], kappa_ab[2], eps_k_ab[2], na[2], nb[2];
    double kij, eps_aibj;
    D2v phi(double T, D2v rho0, D2v rho1) const;
    // per-component m_c * d_c^3 (sets the eta = 0.5 liquid initialization)
    void comp_md3(double T, double out[2]) const {
        for (int i = 0; i < 2; ++i) {
            double d = sigma[i] * (1.0 - 0.12 * std::exp(-3.0 * eps_k[i] / T));
            out[i] = m[i] * d * d * d;
        }
    }
};

// shared dipolar Pade on component-level parameters (2 components);
// mu2t[i] = mu_i^2 * MU2_FACTOR / (m_i T) scaled by sigma^3 eps conventions
// of the caller (feos_torch/pcsaft_mix.py:156-208 semantics)
D2v phi_dipole2(const double mu2t[2], const double mc[2], const double sig[2],
                const double epsk[2], double T, const D2v rho[2],
                const D2v etas[7]) {
    D2v rho_t = rho[0] + rho[1];
    D2v w[2] = {rho[0] / rho_t, rho[1] / rho_t};
    D2v S2 = mk(0), S3 = mk(0);
    for (int i = 0; i < 2; ++i)
        for (int j = i; j < 2; ++j) {
            double sij3 = std::pow(0.5 * (sig[i] + sig[j]), 3.0);
            double mij = std::sqrt(mc[i] * mc[j]);
            double mij1 = (mij - 1.0) / mij;
            double mij2 = mij1 * (mij - 2.0) / mij;
            double eps_ij_t = std::sqrt(epsk[i] * epsk[j]) / T;
            D2v J2 = mk(0);
            for (int q = 0; q < 5; ++q) {
                double a = ADc[q][0] + mij1 * ADc[q][1] + mij2 * ADc[q][2];
                double b = BDc[q][0] + mij1 * BDc[q][1] + mij2 * BDc[q][2];
                J2 = J2 + (a + b * eps_ij_t) * etas[q];
            }
            double cc = (i == j) ? 1.0 : 2.0;
            S2 = S2 - w[i] * w[j] * (mu2t[i] * mu2t[j] / sij3 * cc) * J2;
            for (int k = j; k < 2; ++k) {
                double sig_ij = 0.5 * (sig[i] + sig[j]);
                double sig_ik = 0.5 * (sig[i] + sig[k]);
                double sig_jk = 0.5 * (sig[j] + sig[k]);
                double mijk = std::cbrt(mc[i] * mc[j] * mc[k]);
                double mijk1 = (mijk - 1.0) / mijk;
                double mijk2 = mijk1 * (mijk - 2.0) / mijk;
                // multiplicity by number of distinct indices {1,2,3}->{1,3,6}
                int nd = (i == j && j == k) ? 1 : ((i != j && j != k && i != k) ? 3 : 2);
                double c3 = (nd == 1) ? 1.0 : (nd == 2 ? 3.0 : 6.0);
                D2v J3 = mk(0);
                for (int q = 0; q < 4; ++q)
                    J3 = J3 + (CDc[q][0] + mijk1 * CDc[q][1] +
                               mijk2 * CDc[q][2]) *
                                  etas[q];
                S3 = S3 - w[i] * w[j] * w[k] *
                          (mu2t[i] * mu2t[j] * mu2t[k] /
                           (sig_ij * sig_ik * sig_jk) * c3) *
                          J3;
            }
        }
    S2 = S2 * PI;
    S3 = S3 * (4.0 / 3.0 * PI * PI);
    D2v phi2 = rho_t * rho_t * S2;
    D2v S2safe = (S2.re != 0.0) ? S2 : mk(1.0);
    D2v ratio = rho_t * S3 / S2safe;
    return phi2 / (1.0 - ratio);
}

// association strength Delta_AiBj (feos_torch/pcsaft_mix.py:500-522 semantics)
inline D2v assoc_strength(const MixPar& p, int i, int j, double T,
                          const double d[2], D2v zeta2, D2v zeta3_m1) {
    D2v k = (d[i] * d[j] / (d[i] + d[j])) * zeta2 * zeta3_m1;
    double s3k = std::pow(p.sigma[i] * p.sigma[j], 1.5) *
                 std::sqrt(p.kappa_ab[i] * p.kappa_ab[j]);
    double eps = 0.5 * (p.eps_k_ab[i] + p.eps_k_ab[j]);
    if (i != j && p.eps_aibj != 0.0) eps = p.eps_aibj;
    return zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * s3k *
           (std::exp(eps / T) - 1.0);
}

inline D2v site_f(D2v x) { return dlog(x) - 0.5 * x + 0.5; }

// reduced residual Helmholtz energy density of a binary PC-SAFT mixture
// (semantics of feos_torch/pcsaft_mix.py:31-154 / feos_tpu phi_mix)
D2v phi_mix(const MixPar& p, double T, D2v rho0, D2v rho1) {
    D2v rho[2] = {rho0, rho1};
    double d[2], e[2], s3[2];
    for (int i = 0; i < 2; ++i) {
        d[i] = p.sigma[i] * (1.0 - 0.12 * std::exp(-3.0 * p.eps_k[i] / T));
        e[i] = p.eps_k[i] / T;
        s3[i] = p.sigma[i] * p.sigma[i] * p.sigma[i];
    }

    D2v zeta0 = mk(0), zeta1 = mk(0), zeta2 = mk(0), zeta3 = mk(0);
    for (int i = 0; i < 2; ++i) {
        D2v mr = p.m[i] * rho[i] * (PI / 6.0);
        zeta0 = zeta0 + mr;
        zeta1 = zeta1 + mr * d[i];
        zeta2 = zeta2 + mr * (d[i] * d[i]);
        zeta3 = zeta3 + mr * (d[i] * d[i] * d[i]);
    }
    D2v zeta23 = zeta2 / zeta3;
    D2v z3_2 = zeta3 * zeta3;
    D2v z3_3 = z3_2 * zeta3;
    D2v zeta3_m1 = 1.0 / (1.0 - zeta3);
    D2v zeta3_m2 = zeta3_m1 * zeta3_m1;
    D2v etas[7] = {mk(1.0), zeta3, z3_2, z3_3, z3_2 * z3_2, z3_2 * z3_3,
                   z3_3 * z3_3};

    // hard sphere (Boublik-Mansoori)
    D2v hs = (6.0 / PI) * (zeta1 * zeta2 * zeta3_m1 * 3.0 +
                           zeta2 * zeta2 * zeta3_m2 * zeta23 +
                           (zeta2 * zeta23 * zeta23 - zeta0) * dlog(1.0 - zeta3));

    // hard chain
    D2v c = zeta2 * zeta3_m2;
    D2v hc = mk(0);
    for (int i = 0; i < 2; ++i) {
        D2v g = zeta3_m1 + d[i] * c * 1.5 -
                (d[i] * d[i]) * c * c * (zeta3 - 1.0) * 0.5;
        hc = hc - rho[i] * (p.m[i] - 1.0) * dlog(g);
    }

    // dispersion with quadratic combining rules and kij
    D2v rho_t = rho[0] + rho[1];
    D2v mmean = (rho[0] * p.m[0] + rho[1] * p.m[1]) / rho_t;
    D2v rho1mix = mk(0), rho2mix = mk(0);
    for (int i = 0; i < 2; ++i)
        for (int j = 0; j < 2; ++j) {
            double eps_ij = std::sqrt(p.eps_k[i] * p.eps_k[j]) / T;
            if (i != j) eps_ij *= (1.0 - p.kij);
            double sij = 0.5 * (p.sigma[i] + p.sigma[j]);
            D2v rij = rho[i] * rho[j] *
                      (p.m[i] * p.m[j] * eps_ij * sij * sij * sij);
            rho1mix = rho1mix + rij;
            rho2mix = rho2mix + rij * eps_ij;
        }
    D2v m1 = (mmean - 1.0) / mmean;
    D2v m2 = m1 * ((mmean - 2.0) / mmean);
    D2v I1 = mk(0), I2 = mk(0);
    for (int i = 0; i < 7; ++i) {
        I1 = I1 + (m2 * A2C[i] + m1 * A1[i] + A0[i]) * etas[i];
        I2 = I2 + (m2 * B2C[i] + m1 * B1[i] + B0[i]) * etas[i];
    }
    D2v C1 =
        1.0 / (1.0 + mmean * (8.0 * zeta3 - 2.0 * z3_2) * zeta3_m2 * zeta3_m2 +
               (1.0 - mmean) *
                   (20.0 * zeta3 - 27.0 * z3_2 + 12.0 * z3_2 * zeta3 -
                    2.0 * z3_2 * z3_2) /
                   ((1.0 - zeta3) * (1.0 - zeta3) * (2.0 - zeta3) * (2.0 - zeta3)));
    D2v disp = (rho1mix * -2.0 * I1 - rho2mix * C1 * I2 * mmean) * PI;

    D2v phi = hs + hc + disp;

    // dipole (scale-safe Pade on composition weights, feos_tpu/models/common.py)
    bool dipolar = p.mu[0] != 0.0 || p.mu[1] != 0.0;
    if (dipolar) {
        double mu2t[2], mc[2];
        for (int i = 0; i < 2; ++i) {
            double mu2 = p.mu[i] * p.mu[i] / (p.m[i] * s3[i] * p.eps_k[i]) *
                         MU2_FACTOR;
            mu2t[i] = s3[i] * e[i] * mu2;  // mu2_scaled / T
            mc[i] = std::min(p.m[i], 2.0);
        }
        phi = phi + phi_dipole2(mu2t, mc, p.sigma, p.eps_k, T, rho, etas);
    }

    // association regimes (feos_torch/pcsaft_mix.py:117-152 dispatch)
    int n_assoc = (p.na[0] + p.nb[0] > 0) + (p.na[1] + p.nb[1] > 0);
    int n_self = (p.na[0] * p.nb[0] > 0) + (p.na[1] * p.nb[1] > 0);
    if (n_assoc == 1 && n_self == 1) {
        // single self-associating component: closed form
        int ia = (p.na[0] + p.nb[0] > 0) ? 0 : 1;
        D2v k = (d[ia] * 0.5) * zeta2 * zeta3_m1;
        D2v delta = zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * s3[ia] *
                    p.kappa_ab[ia] * (std::exp(p.eps_k_ab[ia] / T) - 1.0);
        D2v rhoa = p.na[ia] * rho[ia];
        D2v rhob = p.nb[ia] * rho[ia];
        D2v aux = 1.0 + (rhoa - rhob) * delta;
        D2v sq = dsqrt(aux * aux + 4.0 * rhob * delta);
        D2v xa = 2.0 / (sq + 1.0 + (rhob - rhoa) * delta);
        D2v xb = 2.0 / (sq + 1.0 + (rhoa - rhob) * delta);
        phi = phi + rhoa * site_f(xa) + rhob * site_f(xb);
    } else if (n_assoc == 2 && n_self == 2) {
        // two self-associating components: 2-unknown fixed point, damped
        // Newton iterated in dual arithmetic (derivatives converge with the
        // iterates; the reference backprops through 50 unrolled iterations)
        D2v dd[2][2];
        for (int i = 0; i < 2; ++i)
            for (int j = 0; j < 2; ++j)
                dd[i][j] = assoc_strength(p, i, j, T, d, zeta2, zeta3_m1);
        D2v rhoa[2] = {p.na[0] * rho[0], p.na[1] * rho[1]};
        D2v rhob[2] = {p.nb[0] * rho[0], p.nb[1] * rho[1]};
        D2v xa0 = mk(0.2), xa1 = mk(0.2);
        for (int it = 0; it < 50; ++it) {
            D2v w0 = 1.0 + xa0 * rhoa[0] * dd[0][0] + xa1 * rhoa[1] * dd[0][1];
            D2v w1 = 1.0 + xa0 * rhoa[0] * dd[1][0] + xa1 * rhoa[1] * dd[1][1];
            D2v q00 = rhob[0] * dd[0][0] / w0;
            D2v q01 = rhob[1] * dd[0][1] / w1;
            D2v q10 = rhob[0] * dd[1][0] / w0;
            D2v q11 = rhob[1] * dd[1][1] / w1;
            D2v f0 = xa0 - 1.0 + xa0 * (q00 + q01);
            D2v f1 = xa1 - 1.0 + xa1 * (q10 + q11);
            D2v j00 = 1.0 + q00 + q01 -
                      xa0 * (q00 / w0 * rhoa[0] * dd[0][0] +
                             q01 / w1 * rhoa[0] * dd[1][0]);
            D2v j01 = -xa0 * (q00 / w0 * rhoa[1] * dd[0][1] +
                              q01 / w1 * rhoa[1] * dd[1][1]);
            D2v j10 = -xa1 * (q10 / w0 * rhoa[0] * dd[0][0] +
                              q11 / w1 * rhoa[0] * dd[1][0]);
            D2v j11 = 1.0 + q10 + q11 -
                      xa1 * (q10 / w0 * rhoa[1] * dd[0][1] +
                             q11 / w1 * rhoa[1] * dd[1][1]);
            D2v det = j00 * j11 - j01 * j10;
            if (std::abs(det.re) < 1e-30) det = mk(1.0);
            D2v n0 = xa0 - (j11 * f0 - j01 * f1) / det;
            D2v n1 = xa1 - (j00 * f1 - j10 * f0) / det;
            xa0 = (n0.re < 0.0) ? 0.2 * xa0 : n0;
            xa1 = (n1.re < 0.0) ? 0.2 * xa1 : n1;
        }
        D2v xb0 = 1.0 / (1.0 + xa0 * rhoa[0] * dd[0][0] + xa1 * rhoa[1] * dd[0][1]);
        D2v xb1 = 1.0 / (1.0 + xa0 * rhoa[0] * dd[1][0] + xa1 * rhoa[1] * dd[1][1]);
        phi = phi + rhoa[0] * site_f(xa0) + rhoa[1] * site_f(xa1) +
              rhob[0] * site_f(xb0) + rhob[1] * site_f(xb1);
    } else if (n_assoc == 2 && n_self == 1) {
        // one self-associating + one induced component: 1-unknown fixed point
        D2v dd[2][2];
        for (int i = 0; i < 2; ++i)
            for (int j = 0; j < 2; ++j)
                dd[i][j] = assoc_strength(p, i, j, T, d, zeta2, zeta3_m1) * rho[j];
        double na0 = p.na[0], na1 = p.na[1], nb0 = p.nb[0], nb1 = p.nb[1];
        D2v xa = mk(0.2);
        for (int it = 0; it < 50; ++it) {
            D2v c0 = na0 * dd[0][0] + na1 * dd[0][1];
            D2v c1 = na0 * dd[1][0] + na1 * dd[1][1];
            D2v w0 = 1.0 + xa * c0;
            D2v w1 = 1.0 + xa * c1;
            D2v g0 = w0 * w1 + nb0 * w1 * dd[0][0] + nb1 * w0 * dd[0][1];
            D2v g1 = w0 * w1 + nb0 * w1 * dd[1][0] + nb1 * w0 * dd[1][1];
            D2v f = na0 * (xa * g0 - w0 * w1) + na1 * (xa * g1 - w0 * w1);
            D2v dww = c0 * w1 + c1 * w0;
            D2v dg0 = dww + nb0 * c1 * dd[0][0] + nb1 * c0 * dd[0][1];
            D2v dg1 = dww + nb0 * c1 * dd[1][0] + nb1 * c0 * dd[1][1];
            D2v df = na0 * (g0 + xa * dg0 - dww) + na1 * (g1 + xa * dg1 - dww);
            if (std::abs(df.re) < 1e-30) df = mk(1.0);
            D2v nx = xa - f / df;
            xa = (nx.re < 0.0) ? 0.2 * xa : nx;
        }
        D2v xb0 = 1.0 / (1.0 + xa * (na0 * dd[0][0] + na1 * dd[0][1]));
        D2v xb1 = 1.0 / (1.0 + xa * (na0 * dd[1][0] + na1 * dd[1][1]));
        phi = phi + rho[0] * (site_f(xa) * na0 + site_f(xb0) * nb0) +
              rho[1] * (site_f(xa) * na1 + site_f(xb1) * nb1);
    }
    return phi;
}

D2v MixPar::phi(double T, D2v rho0, D2v rho1) const {
    return phi_mix(*this, T, rho0, rho1);
}

// (p~, mu_i, dp/drho_j, dmu_i/drho_j) at a state
struct MixEos {
    double pt;
    double mu[2];
    double dpt[2];
    double dmu[2][2];
    double phi;
};

template <class Par>
MixEos eos_mix(const Par& p, double T, double r0, double r1) {
    D2v phi = p.phi(T, var0(r0), var1(r1));
    MixEos o;
    o.phi = phi.re;
    double g[2] = {phi.g0, phi.g1};
    double H[2][2] = {{phi.h00, phi.h01}, {phi.h01, phi.h11}};
    double rho[2] = {r0, r1};
    o.pt = r0 + r1 + r0 * g[0] + r1 * g[1] - phi.re;
    for (int j = 0; j < 2; ++j) {
        o.dpt[j] = 1.0 + rho[0] * H[0][j] + rho[1] * H[1][j];
        for (int i = 0; i < 2; ++i) o.dmu[i][j] = H[i][j];
        o.dmu[j][j] += 1.0 / rho[j];
    }
    for (int i = 0; i < 2; ++i) o.mu[i] = g[i] + std::log(rho[i]);
    return o;
}

// NPT Newton on ln rho_t at fixed composition z; sign=+1 liquid, -1 vapor
template <class Par>
bool npt_mix(const Par& p, double T, const double z[2], double pt, double rho0,
             double sign, double lr_cap, double* rho_out) {
    double lr = std::log(rho0);
    for (int it = 0; it < 60; ++it) {
        double rt = std::exp(lr);
        MixEos o = eos_mix(p, T, z[0] * rt, z[1] * rt);
        // dp/d ln rho_t = sum_j dp/drho_j * z_j * rho_t
        double dp = (o.dpt[0] * z[0] + o.dpt[1] * z[1]) * rt;
        double r = o.pt - pt;
        double step;
        if (dp > 0.0) {
            step = std::clamp(r / dp, -0.5, 0.5);
            if (std::abs(r / dp) < 1e-13) {
                *rho_out = rt;
                return true;
            }
        } else {
            step = -sign * 0.2;
        }
        if (!std::isfinite(step)) return false;
        lr = std::min(lr - step, lr_cap);
    }
    double rt = std::exp(lr);
    MixEos o = eos_mix(p, T, z[0] * rt, z[1] * rt);
    double dp = (o.dpt[0] * z[0] + o.dpt[1] * z[1]) * rt;
    *rho_out = rt;
    return dp > 0.0 && std::abs(o.pt - pt) < 1e-6 * std::abs(dp);
}

// bubble (incipient vapor) / dew (incipient liquid) point solve; the bulk
// phase has mole fractions z.  Unknowns: incipient partial densities and
// bulk total density, in log space (same formulation as
// feos_tpu/solvers/vle.py:mix_vle, re-derived independently in C++).
template <class Par>
bool mix_vle_cpp(const Par& p, double T, const double z[2], double p0,
                 bool incipient_is_vapor, double rho_inc[2], double rho_bulk[2],
                 double* pt_out) {
    double md3[2];
    p.comp_md3(T, md3);
    double z_md3 = z[0] * md3[0] + z[1] * md3[1];
    double eta_factor = PI / 6.0 * z_md3;
    double lr_cap = std::log(0.74 / eta_factor);

    // grid scan: van-der-Waals loop detection + branch limits + p0 cap
    double p_sv = -1e300;
    double ln_sv = 1e300, ln_sl = -1e300;
    bool has_loop = false, seen_unstable = false;
    double prev_ln = 0.0;
    for (int i = 0; i < 48; ++i) {
        double eta = (i < 8) ? 1e-4 * std::pow(100.0, i / 8.0)
                             : 0.01 + (0.55 - 0.01) * (i - 8) / 39.0;
        double rt = eta / eta_factor;
        MixEos o = eos_mix(p, T, z[0] * rt, z[1] * rt);
        double dp = (o.dpt[0] * z[0] + o.dpt[1] * z[1]) * rt;
        bool unstable = dp <= 0.0;
        double ln_rt = std::log(rt);
        if (!seen_unstable && !unstable) p_sv = std::max(p_sv, o.pt);
        if (unstable && !has_loop) {
            has_loop = true;
            ln_sv = (i > 0) ? prev_ln : ln_rt;
        }
        if (unstable) seen_unstable = true;
        if (has_loop && !unstable && ln_sl < -1e299) ln_sl = ln_rt;
        if (unstable) ln_sl = -1e300;  // reset until the loop truly ends
        prev_ln = ln_rt;
    }
    if (has_loop && ln_sl < -1e299) ln_sl = lr_cap;
    if (has_loop) p0 = std::min(p0, 0.5 * p_sv);
    p0 = std::max(p0, 1e-30);

    double ln_inc_min = -1e300, ln_inc_max = 1e300;
    double ln_bulk_min = -1e300, ln_bulk_max = 1e300;
    if (has_loop) {
        // the spinodal bounds come from the grid scan at the BULK
        // composition z; widen the incipient limits by the extreme
        // per-component size ratio so equal-packing states of a rotated
        // composition stay on their branch (see feos_tpu/solvers/vle.py).
        if (incipient_is_vapor) {
            ln_inc_max = ln_sv + std::log(z_md3 / std::min(md3[0], md3[1]));
            ln_bulk_min = ln_sl;
        } else {
            ln_inc_min = ln_sl + std::log(z_md3 / std::max(md3[0], md3[1]));
            ln_bulk_max = ln_sv;
        }
    }

    // NPT init of both branches
    double rho_liq, rho_vap;
    bool ok_l = npt_mix(p, T, z, p0, 0.5 / eta_factor, 1.0, lr_cap, &rho_liq);
    bool ok_v = npt_mix(p, T, z, p0, std::max(p0, 1e-250), -1.0, lr_cap, &rho_vap);
    double rho_bulk_t0 = incipient_is_vapor ? rho_liq : rho_vap;
    double rho_inc_t0 = incipient_is_vapor ? rho_vap : rho_liq;
    bool init_ok = incipient_is_vapor ? ok_l : ok_v;
    if (!init_ok || !std::isfinite(rho_bulk_t0)) return false;
    if (!std::isfinite(rho_inc_t0)) rho_inc_t0 = p0;

    // successive-substitution warmup
    double ln_i[2] = {std::log(z[0] * rho_inc_t0), std::log(z[1] * rho_inc_t0)};
    double ln_bt = std::log(rho_bulk_t0);
    for (int it = 0; it < 16; ++it) {
        double rb[2] = {z[0] * std::exp(ln_bt), z[1] * std::exp(ln_bt)};
        MixEos ob = eos_mix(p, T, rb[0], rb[1]);
        MixEos oi = eos_mix(p, T, std::exp(ln_i[0]), std::exp(ln_i[1]));
        double gi[2] = {oi.mu[0] - ln_i[0], oi.mu[1] - ln_i[1]};
        double target[2] = {ob.mu[0] - gi[0], ob.mu[1] - gi[1]};
        if (incipient_is_vapor) {
            for (int i = 0; i < 2; ++i)
                ln_i[i] += std::clamp(target[i] - ln_i[i], -1.0, 1.0);
        } else {
            double mx = std::max(target[0], target[1]);
            double lse = mx + std::log(std::exp(target[0] - mx) +
                                       std::exp(target[1] - mx));
            double mu_inc[2] = {oi.mu[0], oi.mu[1]};
            // pin the PACKING FRACTION, not the molar density: the liquid
            // composition rotates toward the heavy component, where the
            // NPT molar density would over-compress it (period-2
            // oscillation; see feos_tpu/solvers/vle.py ss_body).
            double x0 = std::exp(target[0] - lse), x1 = std::exp(target[1] - lse);
            double eta_corr = z_md3 / (x0 * md3[0] + x1 * md3[1]);
            for (int i = 0; i < 2; ++i)
                ln_i[i] = target[i] - lse + std::log(rho_inc_t0 * eta_corr);
            double m2x = std::max(std::min(mu_inc[0], 78.0), std::min(mu_inc[1], 78.0));
            double lse2 = m2x + std::log(std::exp(std::min(mu_inc[0], 78.0) - m2x) +
                                         std::exp(std::min(mu_inc[1], 78.0) - m2x));
            ln_bt = std::min(lse2, ln_bulk_max);
        }
    }

    // full Newton on u = (ln rho_inc_0, ln rho_inc_1, ln rho_bulk_t)
    double u[3] = {ln_i[0], ln_i[1], ln_bt};
    bool conv = false;
    double r[3] = {1e300, 1e300, 1e300};
    double pt_inc = 0.0, pt_bulk = 0.0;
    for (int it = 0; it < 80; ++it) {
        double ri[2] = {std::exp(u[0]), std::exp(u[1])};
        double rbt = std::exp(u[2]);
        double rb[2] = {z[0] * rbt, z[1] * rbt};
        MixEos oi = eos_mix(p, T, ri[0], ri[1]);
        MixEos ob = eos_mix(p, T, rb[0], rb[1]);
        r[0] = oi.mu[0] - ob.mu[0];
        r[1] = oi.mu[1] - ob.mu[1];
        r[2] = oi.pt - ob.pt;
        pt_inc = oi.pt;
        pt_bulk = ob.pt;
        double J[3][3];
        for (int i = 0; i < 2; ++i) {
            for (int j = 0; j < 2; ++j) J[i][j] = oi.dmu[i][j] * ri[j];
            J[i][2] = -(ob.dmu[i][0] * rb[0] + ob.dmu[i][1] * rb[1]);
        }
        for (int j = 0; j < 2; ++j) J[2][j] = oi.dpt[j] * ri[j];
        J[2][2] = -(ob.dpt[0] * rb[0] + ob.dpt[1] * rb[1]);
        // Cramer solve
        double c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1];
        double c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2];
        double c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0];
        double det = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02;
        if (std::abs(det) < 1e-300) det = 1e-300;
        double s0 = (r[0] * c00 + r[1] * (J[0][2] * J[2][1] - J[0][1] * J[2][2]) +
                     r[2] * (J[0][1] * J[1][2] - J[0][2] * J[1][1])) /
                    det;
        double s1 = (r[0] * c01 + r[1] * (J[0][0] * J[2][2] - J[0][2] * J[2][0]) +
                     r[2] * (J[0][2] * J[1][0] - J[0][0] * J[1][2])) /
                    det;
        double s2 = (r[0] * c02 + r[1] * (J[0][1] * J[2][0] - J[0][0] * J[2][1]) +
                     r[2] * (J[0][0] * J[1][1] - J[0][1] * J[1][0])) /
                    det;
        double tot = ri[0] + ri[1];
        bool res_ok = std::max(std::abs(r[0]), std::abs(r[1])) < 1e-9 &&
                      std::abs(r[2]) < 1e-9 * tot + 1e-13 * rbt;
        double ms = std::max({std::abs(s0), std::abs(s1), std::abs(s2)});
        if (!std::isfinite(s0) || !std::isfinite(s1) || !std::isfinite(s2))
            return false;
        // step FIRST, then exit (see pcsaft_cpu.cpp vle()): the final
        // Newton step from a residual-accepted point lands the densities
        // at the f64 noise floor; the carried residual r / pressures
        // pt_inc/pt_bulk stay a strict upper bound for the returned state
        u[0] -= std::clamp(s0, -0.5, 0.5);
        u[1] -= std::clamp(s1, -0.5, 0.5);
        u[2] -= std::clamp(s2, -0.5, 0.5);
        if (ms < 1e-13 || res_ok) {
            conv = true;
            break;
        }
        // branch projection
        double mx = std::max(u[0], u[1]);
        double lt = mx + std::log(std::exp(u[0] - mx) + std::exp(u[1] - mx));
        double shift = std::clamp(lt, ln_inc_min, ln_inc_max) - lt;
        u[0] += shift;
        u[1] += shift;
        u[2] = std::clamp(u[2], ln_bulk_min, ln_bulk_max);
    }
    rho_inc[0] = std::exp(u[0]);
    rho_inc[1] = std::exp(u[1]);
    double rbt = std::exp(u[2]);
    rho_bulk[0] = z[0] * rbt;
    rho_bulk[1] = z[1] * rbt;
    // report the VAPOR-side pressure: the liquid p~ is a cancellation of
    // large terms whose f64 noise floor is percent-level relative error at
    // Pa-scale dew pressures (same convention as feos_tpu/solvers/vle.py).
    double pt_eq = incipient_is_vapor ? pt_inc : pt_bulk;
    *pt_out = pt_eq;
    double tot_inc = rho_inc[0] + rho_inc[1];
    double tot_bulk = rbt;
    bool trivial = std::abs(std::log(tot_inc) - u[2]) < 1e-5;
    bool ordered = incipient_is_vapor ? tot_inc < tot_bulk : tot_inc > tot_bulk;
    double res_mu = std::max(std::abs(r[0]), std::abs(r[1]));
    double p_noise = 1e-12 * std::max(tot_inc, tot_bulk);
    double res_p = std::abs(r[2]) / (tot_inc + p_noise / 1e-6);
    return conv && std::isfinite(tot_inc) && res_mu < 1e-7 && res_p < 1e-6 &&
           !trivial && ordered && pt_eq > 0.0;
}

// Isothermal two-phase TP split at (T, p~, z) — independent oracle for
// feos_tpu/solvers/flash.py.  The two-phase window comes from the in-file
// bubble/dew solves; K-factors start from a ln-p interpolation of the two
// edge incipient compositions; successive substitution with a Rachford-Rice
// Newton and per-phase NPT solves closes the split.  Returns the phase
// code (0 liquid, 1 vapor, 2 two-phase, -1 failed).
template <class Par>
int flash_tp_cpp(const Par& p, double T, const double z[2], double pt_target,
                 double* beta_out, double x[2], double y[2], double rho2[2]) {
    // edge-solve estimate floored at 1e5 Pa in reduced units
    // (1e5 * ANGSTROM^3 / kB / T): the VLE solver recovers from a
    // too-high estimate (grid scan caps p0 below the spinodal maximum)
    // but not from one decades too low — and a flash target mid-way
    // through a wide window sits far below its bubble point (same fix
    // as feos_tpu/models/pcsaft_mix.py flash()).
    double p0e = std::max(pt_target, 1e5 * 7.2429716939261674e-8 / T);
    double rib[2], rbb[2], pt_b;   // bubble: incipient vapor
    double rid[2], rbd[2], pt_d;   // dew: incipient liquid
    bool okb = mix_vle_cpp(p, T, z, p0e, true, rib, rbb, &pt_b);
    bool okd = mix_vle_cpp(p, T, z, p0e, false, rid, rbd, &pt_d);
    if (!okb || !okd) return -1;
    if (pt_target >= pt_b) return 0;
    if (pt_target <= pt_d) return 1;

    double yb[2] = {rib[0] / (rib[0] + rib[1]), rib[1] / (rib[0] + rib[1])};
    double xd[2] = {rid[0] / (rid[0] + rid[1]), rid[1] / (rid[0] + rid[1])};
    double w = (std::log(pt_b) - std::log(pt_target)) /
               (std::log(pt_b) - std::log(pt_d));
    w = std::clamp(w, 0.02, 0.98);
    double lnK[2];
    for (int i = 0; i < 2; ++i)
        lnK[i] = (1.0 - w) * std::log(yb[i] / z[i]) +
                 w * std::log(z[i] / xd[i]);

    double md3[2];
    p.comp_md3(T, md3);
    double beta = w;
    double rho_l = rbb[0] + rbb[1];          // bubble-side liquid density
    double rho_v = rbd[0] + rbd[1];          // dew-side vapor density
    bool conv = false;
    double res_mu = 1e300;
    double d_prev[2] = {0.0, 0.0};
    for (int it = 0; it < 200; ++it) {
        // Rachford-Rice: clipped Newton (h is monotone decreasing on [0,1])
        double K[2] = {std::exp(lnK[0]), std::exp(lnK[1])};
        beta = std::clamp(beta, 1e-12, 1.0 - 1e-12);
        for (int rr = 0; rr < 24; ++rr) {
            double h = 0.0, dh = 0.0;
            for (int i = 0; i < 2; ++i) {
                double den = 1.0 + beta * (K[i] - 1.0);
                h += z[i] * (K[i] - 1.0) / den;
                dh -= z[i] * (K[i] - 1.0) * (K[i] - 1.0) / (den * den);
            }
            double step = h / (dh < 0.0 ? dh : -1.0);
            beta = std::clamp(beta - step, 1e-12, 1.0 - 1e-12);
        }
        double xs = 0.0, ys = 0.0;
        for (int i = 0; i < 2; ++i) {
            x[i] = z[i] / (1.0 + beta * (K[i] - 1.0));
            xs += x[i];
        }
        for (int i = 0; i < 2; ++i) {
            x[i] /= xs;
            y[i] = K[i] * x[i];
            ys += y[i];
        }
        for (int i = 0; i < 2; ++i) y[i] /= ys;

        double cap_l = std::log(0.74 / (PI / 6.0 * (x[0] * md3[0] + x[1] * md3[1])));
        double cap_v = std::log(0.74 / (PI / 6.0 * (y[0] * md3[0] + y[1] * md3[1])));
        if (!npt_mix(p, T, x, pt_target, rho_l, 1.0, cap_l, &rho_l)) return -1;
        if (!npt_mix(p, T, y, pt_target, rho_v, -1.0, cap_v, &rho_v)) return -1;
        MixEos ol = eos_mix(p, T, x[0] * rho_l, x[1] * rho_l);
        MixEos ov = eos_mix(p, T, y[0] * rho_v, y[1] * rho_v);
        // equilibrium: mu_i^L = mu_i^V with mu_i = ln rho_i + g_i, so
        // ln K = ln(y/x) updates by the total-potential mismatch.
        // Every 3rd iteration applies dominant-eigenvalue (GDEM)
        // extrapolation d/(1 - lambda), lambda from two consecutive
        // plain deltas clipped to 0.95 — near-critical rows contract at
        // rates ~0.99 and stall the plain loop at the iteration cap
        // (same scheme as feos_tpu/solvers/flash.py).
        double d[2], dmax = 0.0;
        for (int i = 0; i < 2; ++i) {
            d[i] = ol.mu[i] - ov.mu[i];
            dmax = std::max(dmax, std::abs(d[i]));
        }
        double den = d_prev[0] * d_prev[0] + d_prev[1] * d_prev[1];
        double lam = 0.0;
        if (den > 0.0) lam = (d[0] * d_prev[0] + d[1] * d_prev[1]) / den;
        lam = std::clamp(lam, -0.95, 0.95);
        bool accel = (it % 3 == 2) && it >= 5 && den > 0.0 &&
                     std::isfinite(lam);
        for (int i = 0; i < 2; ++i) {
            lnK[i] += accel ? d[i] / (1.0 - lam) : d[i];
            d_prev[i] = d[i];
        }
        res_mu = dmax;
        if (dmax < 1e-11) {
            conv = true;
            break;
        }
        if (!std::isfinite(dmax)) return -1;
    }
    if (!conv) return -1;

    // final acceptance at the returned state: both phases on stable
    // branches at the target pressure (with the liquid-cancellation noise
    // allowance of mix_vle_cpp), ordered densities, interior split
    MixEos ol = eos_mix(p, T, x[0] * rho_l, x[1] * rho_l);
    MixEos ov = eos_mix(p, T, y[0] * rho_v, y[1] * rho_v);
    double dp_l = (ol.dpt[0] * x[0] + ol.dpt[1] * x[1]) * rho_l;
    double dp_v = (ov.dpt[0] * y[0] + ov.dpt[1] * y[1]) * rho_v;
    bool okp = std::abs(ol.pt - pt_target) < 1e-6 * pt_target + 6e-12 * dp_l &&
               std::abs(ov.pt - pt_target) < 1e-6 * pt_target + 6e-12 * dp_v;
    if (!(okp && dp_l > 0.0 && dp_v > 0.0 && rho_l > rho_v &&
          beta > 1e-10 && beta < 1.0 - 1e-10 && res_mu < 1e-9))
        return -1;
    *beta_out = beta;
    rho2[0] = rho_l;
    rho2[1] = rho_v;
    return 2;
}

// ---------------------------------------------------------------------------
// Heterosegmented gc-PC-SAFT (binary): segment-resolved hard chain and
// dispersion, component-level dipole/association on the gc mixing-rule
// aggregates.  Mirrors the semantics of feos_torch/gc_pcsaft.py:116-253 /
// feos_tpu phi_gc, re-derived here with explicit (S, S) loops and dual
// arithmetic — an independent oracle for the JAX gc VLE path (which
// collapses the segment contraction into precomputed bases).
// ---------------------------------------------------------------------------

constexpr int GC_MAX_S = 64;

struct GcPar {
    int S;
    // segment-level (shared): sigma/eps_k (S), kab (S, S)
    const double* sigma;
    const double* eps_k;
    const double* kab;
    // per item: m (2, S) = counts * m_seg; bonded pairs bond_a/bond_b (P)
    // with counts bonds_p (2, P); phi dispersion correction (2)
    const double* m;
    int P;
    const int32_t* bond_a;
    const int32_t* bond_b;
    const double* bonds_p;
    const double* phi_corr;
    // component-level aggregates (2 each): dipole mixing and association
    const double* m_mix;
    const double* sigma_mix;
    const double* eps_mix;
    const double* mu2;  // pre-scaled: (counts . mu^2)/m_mix * MU2_FACTOR
    const double* sigma_assoc;
    const double* eps_assoc;
    const double* kappa_ab;
    const double* eps_k_ab;
    const double* na;
    const double* nb;

    void seg_d(double T, double* d) const {
        for (int s = 0; s < S; ++s)
            d[s] = sigma[s] * (1.0 - 0.12 * std::exp(-3.0 * eps_k[s] / T));
    }

    void comp_md3(double T, double out[2]) const {
        double d[GC_MAX_S];
        seg_d(T, d);
        for (int c = 0; c < 2; ++c) {
            out[c] = 0.0;
            for (int s = 0; s < S; ++s)
                out[c] += m[c * S + s] * d[s] * d[s] * d[s];
        }
    }

    // gc association strength Delta_ij on the component aggregates
    // (feos_torch/gc_pcsaft.py:549-564): the segment diameter is recomputed
    // from the associating segment's own sigma/eps_k
    D2v assoc_strength(int i, int j, double T, D2v zeta2, D2v zeta3_m1) const {
        double di = sigma_assoc[i] *
                    (1.0 - 0.12 * std::exp(-3.0 * eps_assoc[i] / T));
        double dj = sigma_assoc[j] *
                    (1.0 - 0.12 * std::exp(-3.0 * eps_assoc[j] / T));
        D2v k = (di * dj / (di + dj)) * zeta2 * zeta3_m1;
        double s3k = std::pow(sigma_assoc[i] * sigma_assoc[j], 1.5) *
                     std::sqrt(kappa_ab[i] * kappa_ab[j]);
        double eps = 0.5 * (eps_k_ab[i] + eps_k_ab[j]);
        return zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * s3k *
               (std::exp(eps / T) - 1.0);
    }

    D2v phi(double T, D2v rho0, D2v rho1) const {
        D2v rho[2] = {rho0, rho1};
        double d[GC_MAX_S];
        seg_d(T, d);

        // zeta moments from per-component diameter moments
        double md0[2] = {0, 0}, md1[2] = {0, 0}, md2[2] = {0, 0}, md3[2] = {0, 0};
        for (int c = 0; c < 2; ++c)
            for (int s = 0; s < S; ++s) {
                double ms = m[c * S + s];
                md0[c] += ms;
                md1[c] += ms * d[s];
                md2[c] += ms * d[s] * d[s];
                md3[c] += ms * d[s] * d[s] * d[s];
            }
        D2v zeta0 = (rho0 * md0[0] + rho1 * md0[1]) * (PI / 6.0);
        D2v zeta1 = (rho0 * md1[0] + rho1 * md1[1]) * (PI / 6.0);
        D2v zeta2 = (rho0 * md2[0] + rho1 * md2[1]) * (PI / 6.0);
        D2v zeta3 = (rho0 * md3[0] + rho1 * md3[1]) * (PI / 6.0);
        D2v zeta23 = zeta2 / zeta3;
        D2v z3_2 = zeta3 * zeta3;
        D2v z3_3 = z3_2 * zeta3;
        D2v zeta3_m1 = 1.0 / (1.0 - zeta3);
        D2v zeta3_m2 = zeta3_m1 * zeta3_m1;
        D2v etas[7] = {mk(1.0), zeta3, z3_2, z3_3, z3_2 * z3_2, z3_2 * z3_3,
                       z3_3 * z3_3};

        // hard sphere (Boublik-Mansoori)
        D2v hs =
            (6.0 / PI) * (zeta1 * zeta2 * zeta3_m1 * 3.0 +
                          zeta2 * zeta2 * zeta3_m2 * zeta23 +
                          (zeta2 * zeta23 * zeta23 - zeta0) * dlog(1.0 - zeta3));

        // hard chain over bonded segment pairs
        D2v c = zeta2 * zeta3_m2;
        D2v hc = mk(0);
        for (int pI = 0; pI < P; ++pI) {
            double da = d[bond_a[pI]], db = d[bond_b[pI]];
            double ddv = da * db / (da + db);
            D2v cd = c * ddv;
            D2v g = zeta3_m1 + cd * 3.0 - cd * cd * (zeta3 - 1.0) * 2.0;
            D2v lg = dlog(g);
            for (int comp = 0; comp < 2; ++comp) {
                double bc = bonds_p[comp * P + pI];
                if (bc != 0.0) hc = hc - rho[comp] * bc * lg;
            }
        }

        // dispersion: explicit (S, S) segment contraction per component pair
        // with the phi correction and kab applied off-diagonally
        double e1[2][2], e2[2][2];
        for (int i = 0; i < 2; ++i)
            for (int j = 0; j < 2; ++j) {
                double s1 = 0.0, s2 = 0.0;
                for (int a = 0; a < S; ++a) {
                    double mia = m[i * S + a];
                    if (mia == 0.0) continue;
                    for (int b = 0; b < S; ++b) {
                        double mjb = m[j * S + b];
                        if (mjb == 0.0) continue;
                        double eps_ab =
                            std::sqrt(eps_k[a] * eps_k[b] * phi_corr[i] *
                                      phi_corr[j]) /
                            T;
                        if (i != j) eps_ab *= (1.0 - kab[a * S + b]);
                        double sab = std::pow(0.5 * (sigma[a] + sigma[b]), 3.0);
                        double w = mia * mjb * eps_ab * sab;
                        s1 += w;
                        s2 += w * eps_ab;
                    }
                }
                e1[i][j] = s1;
                e2[i][j] = s2;
            }
        D2v rho_t = rho0 + rho1;
        D2v mmean = (rho0 * md0[0] + rho1 * md0[1]) / rho_t;
        D2v rho1mix = mk(0), rho2mix = mk(0);
        for (int i = 0; i < 2; ++i)
            for (int j = 0; j < 2; ++j) {
                D2v rij = rho[i] * rho[j];
                rho1mix = rho1mix + rij * e1[i][j];
                rho2mix = rho2mix + rij * e2[i][j];
            }
        D2v m1 = (mmean - 1.0) / mmean;
        D2v m2 = m1 * ((mmean - 2.0) / mmean);
        D2v I1 = mk(0), I2 = mk(0);
        for (int i = 0; i < 7; ++i) {
            I1 = I1 + (m2 * A2C[i] + m1 * A1[i] + A0[i]) * etas[i];
            I2 = I2 + (m2 * B2C[i] + m1 * B1[i] + B0[i]) * etas[i];
        }
        D2v C1 = 1.0 / (1.0 +
                        mmean * (8.0 * zeta3 - 2.0 * z3_2) * zeta3_m2 * zeta3_m2 +
                        (1.0 - mmean) *
                            (20.0 * zeta3 - 27.0 * z3_2 + 12.0 * z3_2 * zeta3 -
                             2.0 * z3_2 * z3_2) /
                            ((1.0 - zeta3) * (1.0 - zeta3) * (2.0 - zeta3) *
                             (2.0 - zeta3)));
        D2v disp = (rho1mix * -2.0 * I1 - rho2mix * C1 * I2 * mmean) * PI;

        D2v phi = hs + hc + disp;

        // dipole on the gc component-level mixing-rule aggregates
        if (mu2[0] != 0.0 || mu2[1] != 0.0) {
            double mu2t[2] = {mu2[0] / T, mu2[1] / T};
            double mc[2] = {std::min(m_mix[0], 2.0), std::min(m_mix[1], 2.0)};
            phi = phi + phi_dipole2(mu2t, mc, sigma_mix, eps_mix, T, rho, etas);
        }

        // association regimes on the component aggregates
        // (feos_torch/gc_pcsaft.py:309-441 dispatch)
        int n_assoc = (kappa_ab[0] * eps_k_ab[0] != 0.0) +
                      (kappa_ab[1] * eps_k_ab[1] != 0.0);
        int n_self = (na[0] * nb[0] != 0.0) + (na[1] * nb[1] != 0.0);
        if (n_assoc == 1 && n_self == 1) {
            // single self-associating component, closed form for nA = nB = 1
            int ia = (kappa_ab[0] * eps_k_ab[0] != 0.0) ? 0 : 1;
            D2v delta = assoc_strength(ia, ia, T, zeta2, zeta3_m1);
            D2v deltarho = delta * rho[ia];
            D2v xa = 2.0 / (dsqrt(1.0 + 4.0 * deltarho) + 1.0);
            phi = phi + rho[ia] * (2.0 * dlog(xa) - xa + 1.0);
        } else if (n_assoc == 2 && n_self == 2) {
            // two self-associating segments, nA = nB = 1 fixed point
            // XA_i = 1 / (1 + sum_j XA_j Delta_ij rho_j)
            D2v dd[2][2];
            for (int i = 0; i < 2; ++i)
                for (int j = 0; j < 2; ++j)
                    dd[i][j] = assoc_strength(i, j, T, zeta2, zeta3_m1) * rho[j];
            D2v xa0 = mk(0.2), xa1 = mk(0.2);
            for (int it = 0; it < 50; ++it) {
                D2v f0 = xa0 - 1.0 + xa0 * (xa0 * dd[0][0] + xa1 * dd[0][1]);
                D2v f1 = xa1 - 1.0 + xa1 * (xa0 * dd[1][0] + xa1 * dd[1][1]);
                D2v j00 = 1.0 + 2.0 * xa0 * dd[0][0] + xa1 * dd[0][1];
                D2v j01 = xa0 * dd[0][1];
                D2v j10 = xa1 * dd[1][0];
                D2v j11 = 1.0 + xa0 * dd[1][0] + 2.0 * xa1 * dd[1][1];
                D2v det = j00 * j11 - j01 * j10;
                if (std::abs(det.re) < 1e-30) det = mk(1.0);
                D2v n0 = xa0 - (j11 * f0 - j01 * f1) / det;
                D2v n1 = xa1 - (j00 * f1 - j10 * f0) / det;
                xa0 = (n0.re < 0.0) ? 0.2 * xa0 : n0;
                xa1 = (n1.re < 0.0) ? 0.2 * xa1 : n1;
            }
            phi = phi + rho[0] * (2.0 * dlog(xa0) - xa0 + 1.0) +
                  rho[1] * (2.0 * dlog(xa1) - xa1 + 1.0);
        } else if (n_assoc == 2 && n_self == 1) {
            // one self-associating + one induced segment, 1-unknown fixed
            // point (same residual as the homosegmented induced regime)
            D2v dd[2][2];
            for (int i = 0; i < 2; ++i)
                for (int j = 0; j < 2; ++j)
                    dd[i][j] = assoc_strength(i, j, T, zeta2, zeta3_m1) * rho[j];
            double na0 = na[0], na1 = na[1], nb0 = nb[0], nb1 = nb[1];
            D2v xa = mk(0.2);
            for (int it = 0; it < 50; ++it) {
                D2v c0 = na0 * dd[0][0] + na1 * dd[0][1];
                D2v c1 = na0 * dd[1][0] + na1 * dd[1][1];
                D2v w0 = 1.0 + xa * c0;
                D2v w1 = 1.0 + xa * c1;
                D2v g0 = w0 * w1 + nb0 * w1 * dd[0][0] + nb1 * w0 * dd[0][1];
                D2v g1 = w0 * w1 + nb0 * w1 * dd[1][0] + nb1 * w0 * dd[1][1];
                D2v f = na0 * (xa * g0 - w0 * w1) + na1 * (xa * g1 - w0 * w1);
                D2v dww = c0 * w1 + c1 * w0;
                D2v dg0 = dww + nb0 * c1 * dd[0][0] + nb1 * c0 * dd[0][1];
                D2v dg1 = dww + nb0 * c1 * dd[1][0] + nb1 * c0 * dd[1][1];
                D2v df = na0 * (g0 + xa * dg0 - dww) + na1 * (g1 + xa * dg1 - dww);
                if (std::abs(df.re) < 1e-30) df = mk(1.0);
                D2v nx = xa - f / df;
                xa = (nx.re < 0.0) ? 0.2 * xa : nx;
            }
            D2v xb0 = 1.0 / (1.0 + xa * (na0 * dd[0][0] + na1 * dd[0][1]));
            D2v xb1 = 1.0 / (1.0 + xa * (na0 * dd[1][0] + na1 * dd[1][1]));
            phi = phi + rho[0] * (site_f(xa) * na0 + site_f(xb0) * nb0) +
                  rho[1] * (site_f(xa) * na1 + site_f(xb1) * nb1);
        }
        return phi;
    }
};

}  // namespace

extern "C" {

// Batched binary bubble/dew solve (reference src/pcsaft.rs:150-214 contract
// with fixed-shape NaN-filled outputs): params (n, 2, 8) row-major, kij
// (n, 2) = [k_ij, eps_k_AiBj], p0 in *reduced* units; outputs rho (n, 4) =
// [rho_V_1, rho_V_2, rho_L_1, rho_L_2] (A^-3) and p~ at the solution.
void feos_mix_vle(const double* params, const double* kij,
                  const double* temperature, const double* molefracs,
                  const double* p0_red, int64_t n, int32_t is_bubble,
                  double* rho_out, double* pt_out, uint8_t* ok) {
#pragma omp parallel for schedule(dynamic, 4)
    for (int64_t i = 0; i < n; ++i) {
        MixPar p;
        for (int c = 0; c < 2; ++c) {
            const double* row = params + 16 * i + 8 * c;
            p.m[c] = row[0];
            p.sigma[c] = row[1];
            p.eps_k[c] = row[2];
            p.mu[c] = row[3];
            p.kappa_ab[c] = row[4];
            p.eps_k_ab[c] = row[5];
            p.na[c] = row[6];
            p.nb[c] = row[7];
        }
        p.kij = kij[2 * i];
        p.eps_aibj = kij[2 * i + 1];
        double z[2] = {molefracs[i], 1.0 - molefracs[i]};
        double rho_inc[2] = {0.0 / 0.0, 0.0 / 0.0};
        double rho_bulk[2] = {0.0 / 0.0, 0.0 / 0.0};
        double pt = 0.0 / 0.0;
        bool good = mix_vle_cpp(p, temperature[i], z, p0_red[i],
                                is_bubble != 0, rho_inc, rho_bulk, &pt);
        ok[i] = good ? 1 : 0;
        if (is_bubble != 0) {  // incipient phase is the vapor
            rho_out[4 * i + 0] = rho_inc[0];
            rho_out[4 * i + 1] = rho_inc[1];
            rho_out[4 * i + 2] = rho_bulk[0];
            rho_out[4 * i + 3] = rho_bulk[1];
        } else {
            rho_out[4 * i + 0] = rho_bulk[0];
            rho_out[4 * i + 1] = rho_bulk[1];
            rho_out[4 * i + 2] = rho_inc[0];
            rho_out[4 * i + 3] = rho_inc[1];
        }
        pt_out[i] = pt;
    }
}

// Batched isothermal TP flash (independent oracle for
// feos_tpu/solvers/flash.py): params (n, 2, 8), kij (n, 2), p in REDUCED
// units.  Outputs: beta (n), x/y (n, 2) liquid/vapor compositions,
// rho (n, 2) = [rho_L, rho_V] total molar densities (A^-3), phase (n)
// int8 = 0 liquid / 1 vapor / 2 two-phase / -1 failed.  Single-phase and
// failed rows return NaN in beta/x/y/rho (beta 0/1 convention is left to
// the Python caller, matching solvers.flash.flash_window).
void feos_mix_flash(const double* params, const double* kij,
                    const double* temperature, const double* molefracs,
                    const double* p_red, int64_t n, double* beta_out,
                    double* x_out, double* y_out, double* rho_out,
                    int8_t* phase) {
#pragma omp parallel for schedule(dynamic, 4)
    for (int64_t i = 0; i < n; ++i) {
        MixPar p;
        for (int c = 0; c < 2; ++c) {
            const double* row = params + 16 * i + 8 * c;
            p.m[c] = row[0];
            p.sigma[c] = row[1];
            p.eps_k[c] = row[2];
            p.mu[c] = row[3];
            p.kappa_ab[c] = row[4];
            p.eps_k_ab[c] = row[5];
            p.na[c] = row[6];
            p.nb[c] = row[7];
        }
        p.kij = kij[2 * i];
        p.eps_aibj = kij[2 * i + 1];
        double z[2] = {molefracs[i], 1.0 - molefracs[i]};
        double beta = 0.0 / 0.0;
        double x[2] = {0.0 / 0.0, 0.0 / 0.0};
        double y[2] = {0.0 / 0.0, 0.0 / 0.0};
        double r2[2] = {0.0 / 0.0, 0.0 / 0.0};
        int ph = flash_tp_cpp(p, temperature[i], z, p_red[i], &beta, x, y, r2);
        phase[i] = (int8_t)ph;
        beta_out[i] = (ph == 2) ? beta : 0.0 / 0.0;
        for (int c = 0; c < 2; ++c) {
            x_out[2 * i + c] = (ph == 2) ? x[c] : 0.0 / 0.0;
            y_out[2 * i + c] = (ph == 2) ? y[c] : 0.0 / 0.0;
            rho_out[2 * i + c] = (ph == 2) ? r2[c] : 0.0 / 0.0;
        }
    }
}

// Batched mixture Helmholtz derivatives (phi, p~, mu_1, mu_2) for
// cross-validation of the differentiable core.
void feos_mix_derivatives(const double* params, const double* kij,
                          const double* temperature, const double* rho,
                          int64_t n, double* out /* 4n */) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        MixPar p;
        for (int c = 0; c < 2; ++c) {
            const double* row = params + 16 * i + 8 * c;
            p.m[c] = row[0];
            p.sigma[c] = row[1];
            p.eps_k[c] = row[2];
            p.mu[c] = row[3];
            p.kappa_ab[c] = row[4];
            p.eps_k_ab[c] = row[5];
            p.na[c] = row[6];
            p.nb[c] = row[7];
        }
        p.kij = kij[2 * i];
        p.eps_aibj = kij[2 * i + 1];
        MixEos o = eos_mix(p, temperature[i], rho[2 * i], rho[2 * i + 1]);
        out[4 * i] = o.phi;
        out[4 * i + 1] = o.pt;
        out[4 * i + 2] = o.mu[0];
        out[4 * i + 3] = o.mu[1];
    }
}

// gc-PC-SAFT entry points.  Shared segment table: sigma/eps_k (S), kab
// (S, S), bonded-pair index lists bond_a/bond_b (P).  Per item i: m
// (2, S) at m + 2*S*i, bonds_p (2, P), phi_corr (2), and comp (10, 2) =
// rows [m_mix, sigma_mix, eps_mix, mu2, sigma_assoc, eps_assoc, kappa_ab,
// eps_k_ab, na, nb] — the component-level aggregates of
// feos_tpu.models.gc_pcsaft.assemble (reference src/gc_pcsaft.rs:26-69).

static GcPar make_gc_par(int64_t S, const double* sigma, const double* eps_k,
                         const double* kab, int64_t P, const int32_t* bond_a,
                         const int32_t* bond_b, const double* m,
                         const double* bonds_p, const double* phi_corr,
                         const double* comp, int64_t i) {
    GcPar g;
    g.S = (int)S;
    g.sigma = sigma;
    g.eps_k = eps_k;
    g.kab = kab;
    g.P = (int)P;
    g.bond_a = bond_a;
    g.bond_b = bond_b;
    g.m = m + 2 * S * i;
    g.bonds_p = bonds_p + 2 * P * i;
    g.phi_corr = phi_corr + 2 * i;
    const double* c = comp + 20 * i;
    g.m_mix = c;
    g.sigma_mix = c + 2;
    g.eps_mix = c + 4;
    g.mu2 = c + 6;
    g.sigma_assoc = c + 8;
    g.eps_assoc = c + 10;
    g.kappa_ab = c + 12;
    g.eps_k_ab = c + 14;
    g.na = c + 16;
    g.nb = c + 18;
    return g;
}

// Batched gc bubble/dew solve (reference src/gc_pcsaft.rs:103-171 contract
// with fixed-shape NaN-filled outputs); p0 in reduced units; outputs
// rho (n, 4) = [rho_V_1, rho_V_2, rho_L_1, rho_L_2] (A^-3) and p~.
void feos_gc_vle(int64_t S, const double* sigma, const double* eps_k,
                 const double* kab, int64_t P, const int32_t* bond_a,
                 const int32_t* bond_b, const double* m, const double* bonds_p,
                 const double* phi_corr, const double* comp,
                 const double* temperature, const double* molefracs,
                 const double* p0_red, int64_t n, int32_t is_bubble,
                 double* rho_out, double* pt_out, uint8_t* ok) {
#pragma omp parallel for schedule(dynamic, 4)
    for (int64_t i = 0; i < n; ++i) {
        GcPar g = make_gc_par(S, sigma, eps_k, kab, P, bond_a, bond_b, m,
                              bonds_p, phi_corr, comp, i);
        double z[2] = {molefracs[i], 1.0 - molefracs[i]};
        double rho_inc[2] = {0.0 / 0.0, 0.0 / 0.0};
        double rho_bulk[2] = {0.0 / 0.0, 0.0 / 0.0};
        double pt = 0.0 / 0.0;
        bool good = mix_vle_cpp(g, temperature[i], z, p0_red[i],
                                is_bubble != 0, rho_inc, rho_bulk, &pt);
        ok[i] = good ? 1 : 0;
        if (is_bubble != 0) {  // incipient phase is the vapor
            rho_out[4 * i + 0] = rho_inc[0];
            rho_out[4 * i + 1] = rho_inc[1];
            rho_out[4 * i + 2] = rho_bulk[0];
            rho_out[4 * i + 3] = rho_bulk[1];
        } else {
            rho_out[4 * i + 0] = rho_bulk[0];
            rho_out[4 * i + 1] = rho_bulk[1];
            rho_out[4 * i + 2] = rho_inc[0];
            rho_out[4 * i + 3] = rho_inc[1];
        }
        pt_out[i] = pt;
    }
}

// Batched gc isothermal TP flash (same contract as feos_mix_flash).
void feos_gc_flash(int64_t S, const double* sigma, const double* eps_k,
                   const double* kab, int64_t P, const int32_t* bond_a,
                   const int32_t* bond_b, const double* m,
                   const double* bonds_p, const double* phi_corr,
                   const double* comp, const double* temperature,
                   const double* molefracs, const double* p_red, int64_t n,
                   double* beta_out, double* x_out, double* y_out,
                   double* rho_out, int8_t* phase) {
#pragma omp parallel for schedule(dynamic, 4)
    for (int64_t i = 0; i < n; ++i) {
        GcPar g = make_gc_par(S, sigma, eps_k, kab, P, bond_a, bond_b, m,
                              bonds_p, phi_corr, comp, i);
        double z[2] = {molefracs[i], 1.0 - molefracs[i]};
        double beta = 0.0 / 0.0;
        double x[2] = {0.0 / 0.0, 0.0 / 0.0};
        double y[2] = {0.0 / 0.0, 0.0 / 0.0};
        double r2[2] = {0.0 / 0.0, 0.0 / 0.0};
        int ph = flash_tp_cpp(g, temperature[i], z, p_red[i], &beta, x, y, r2);
        phase[i] = (int8_t)ph;
        beta_out[i] = (ph == 2) ? beta : 0.0 / 0.0;
        for (int c = 0; c < 2; ++c) {
            x_out[2 * i + c] = (ph == 2) ? x[c] : 0.0 / 0.0;
            y_out[2 * i + c] = (ph == 2) ? y[c] : 0.0 / 0.0;
            rho_out[2 * i + c] = (ph == 2) ? r2[c] : 0.0 / 0.0;
        }
    }
}

// Batched gc Helmholtz derivatives (phi, p~, mu_1, mu_2) for
// cross-validation of the differentiable gc core.
void feos_gc_derivatives(int64_t S, const double* sigma, const double* eps_k,
                         const double* kab, int64_t P, const int32_t* bond_a,
                         const int32_t* bond_b, const double* m,
                         const double* bonds_p, const double* phi_corr,
                         const double* comp, const double* temperature,
                         const double* rho, int64_t n, double* out /* 4n */) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        GcPar g = make_gc_par(S, sigma, eps_k, kab, P, bond_a, bond_b, m,
                              bonds_p, phi_corr, comp, i);
        MixEos o = eos_mix(g, temperature[i], rho[2 * i], rho[2 * i + 1]);
        out[4 * i] = o.phi;
        out[4 * i + 1] = o.pt;
        out[4 * i + 2] = o.mu[0];
        out[4 * i + 3] = o.mu[1];
    }
}

}  // extern "C"
