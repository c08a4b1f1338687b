"""Restricted and unrestricted Kohn-Sham DFT on a Becke grid.

Replaces pyscf.dft's RKS/UKS for the reference's DFT baseline MDs
(scripts/MD/H30/md_H30_DFT.py, scripts/MD/H2O-H3O+/md_H2O-H3O+_DFT.py,
Zundel_thermodynamics/reference_dynamics/Zundel_DFT_{PBE,CAMB3LYP}.py;
the CAM-B3LYP reference dynamics use dft.UKS, Zundel_DFT_CAMB3LYP.py:55,
05_Zundel_test_potential_energy.py:161).
Functionals:
  * "lda"       Slater exchange + Perdew-Zunger 81 correlation
  * "pbe"       PBE exchange (kappa = 0.804, mu = 0.2195...) + PBE
                correlation on PW92 (closed shell, phi = 1)
  * "b3lyp"     0.20 HF + 0.08 LDA + 0.72 B88 exchange;
                0.19 VWN5 + 0.81 LYP correlation
  * "camb3lyp"  Coulomb-attenuated B3LYP (Yanai/Tew/Handy 2004):
                alpha = 0.19, beta = 0.46, omega = 0.33 — HF exchange
                alpha*K + beta*K_LR(omega) (long-range ERIs from
                IntegralEngine.eri(omega=...)), B88 exchange attenuated
                pointwise by 1 - alpha - beta*g(a) with the Iikura/Tawada
                erf exchange-hole fraction g(a); 0.19 VWN5 + 0.81 LYP
                correlation
  * "hf"        no DFT XC, full exact exchange (RHF through the same SCF
                loop; used to validate the hybrid machinery)

Grid: Becke partitioning with Gauss-Chebyshev radial points and either a
Gauss-Legendre product angular rule (default; overlap matrices reproduced
to ~3e-8 on test molecules) or Lebedev 26/50 rules for speed.
"""

from dataclasses import dataclass

import numpy as np

from .dft_grid import molecular_grid, eval_aos

# PZ81 correlation parameters (unpolarized)
_PZ_GAMMA, _PZ_B1, _PZ_B2 = -0.1423, 1.0529, 0.3334
_PZ_A, _PZ_B, _PZ_C, _PZ_D = 0.0311, -0.048, 0.0020, -0.0116

# PW92 correlation parameters (unpolarized channel)
_PW_A, _PW_A1 = 0.031091, 0.21370
_PW_B1, _PW_B2, _PW_B3, _PW_B4 = 7.5957, 3.5876, 1.6382, 0.49294

_PBE_KAPPA = 0.804
_PBE_MU = 0.2195149727645171
_PBE_GAMMA = 0.031090690869654895   # (1 - ln 2) / pi^2
_PBE_BETA = 0.066725


def _eps_x_lda(rho, xp=np):
    return -0.75 * (3.0 / np.pi) ** (1.0 / 3.0) * rho ** (1.0 / 3.0)


def _eps_c_pz(rs, xp=np):
    lo = rs >= 1.0
    eps_lo = _PZ_GAMMA / (1.0 + _PZ_B1 * xp.sqrt(rs) + _PZ_B2 * rs)
    lnrs = xp.log(xp.maximum(rs, 1e-30))
    eps_hi = (_PZ_A * lnrs + _PZ_B + _PZ_C * rs * lnrs + _PZ_D * rs)
    return xp.where(lo, eps_lo, eps_hi)


def _eps_c_pw92(rs, xp=np):
    q0 = -2.0 * _PW_A * (1.0 + _PW_A1 * rs)
    sq = xp.sqrt(rs)
    q1 = 2.0 * _PW_A * (_PW_B1 * sq + _PW_B2 * rs + _PW_B3 * rs * sq
                        + _PW_B4 * rs * rs)
    return q0 * xp.log1p(1.0 / xp.maximum(q1, 1e-30))


# VWN5 correlation parameters (paramagnetic fit, Vosko/Wilk/Nusair 1980)
_VWN_A, _VWN_X0, _VWN_B, _VWN_C = 0.0310907, -0.10498, 3.72744, 12.9352

# B88 exchange
_B88_BETA = 0.0042
# LYP correlation (Lee/Yang/Parr 1988, Miehlich et al. 1989 form)
_LYP_A, _LYP_B, _LYP_C, _LYP_D = 0.04918, 0.132, 0.2533, 0.349
_CF = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0)

# hybrid mixing: c_hf * K + c_lr * K_LR(omega) exact exchange
_HYBRIDS = {
    "b3lyp": dict(c_hf=0.20, c_lr=0.0, omega=0.0),
    "camb3lyp": dict(c_hf=0.19, c_lr=0.46, omega=0.33),
    "hf": dict(c_hf=1.0, c_lr=0.0, omega=0.0),
}


def _eps_c_vwn5(rs, xp=np):
    """VWN5 (paramagnetic) correlation energy per particle of the uniform
    gas, in the RPA-fit x = sqrt(rs) parametrization."""
    x = xp.sqrt(rs)
    X = x * x + _VWN_B * x + _VWN_C
    X0 = _VWN_X0 * _VWN_X0 + _VWN_B * _VWN_X0 + _VWN_C
    Q = np.sqrt(4.0 * _VWN_C - _VWN_B * _VWN_B)
    atn = xp.arctan(Q / (2.0 * x + _VWN_B))
    return _VWN_A * (
        xp.log(x * x / X) + 2.0 * _VWN_B / Q * atn
        - _VWN_B * _VWN_X0 / X0 * (
            xp.log((x - _VWN_X0) ** 2 / X)
            + 2.0 * (_VWN_B + 2.0 * _VWN_X0) / Q * atn
        )
    )


def _ex_b88_spin(rho_s, sigma_s, xp=np):
    """B88 exchange energy per volume for one spin channel (includes the
    LDA part; beta = 0.0042 recovers pure Slater exchange for beta -> 0)."""
    rho_s = xp.maximum(rho_s, 1e-30)
    r43 = rho_s ** (4.0 / 3.0)
    x = xp.sqrt(xp.maximum(sigma_s, 0.0)) / r43
    cx = 1.5 * (3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
    corr = _B88_BETA * x * x / (1.0 + 6.0 * _B88_BETA * x * xp.arcsinh(x))
    return -r43 * (cx + corr)


def _cam_lr_fraction(a, xp=np):
    """g(a): long-range (erf(omega r)) fraction of the model GGA exchange
    hole (Iikura/Tawada/Yanai/Hirao 2001 eq. 6; CAM usage Yanai 2004).
    g(0) = 0 (all exchange short-range), g(inf) = 1."""
    a = xp.maximum(a, 1e-12)
    inv = 1.0 / (2.0 * a)
    if xp is np:
        from scipy.special import erf
    else:
        from jax.scipy.special import erf
    expo = xp.exp(-xp.minimum(inv * inv, 700.0))
    b = expo - 1.0
    c = 2.0 * a * a * b + 0.5
    g = (8.0 / 3.0) * a * (np.sqrt(np.pi) * erf(inv) + 2.0 * a * (b - c))
    # large-a: the closed form cancels catastrophically; asymptotic series
    # g = 1 - 1/(36 a^2) + O(a^-4)
    g = xp.where(a > 8.0, 1.0 - 1.0 / (36.0 * a * a), g)
    return xp.clip(g, 0.0, 1.0)


def _ec_lyp_closed(rho, sigma, xp=np):
    """LYP correlation energy per volume, closed shell (rho_a = rho_b =
    rho/2, sigma_aa = sigma_bb = sigma_ab = sigma/4), Miehlich et al.
    gradient-only form."""
    rho = xp.maximum(rho, 1e-30)
    sigma = xp.maximum(sigma, 0.0)
    rm13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + _LYP_D * rm13
    omega = xp.exp(-_LYP_C * rm13) / denom * rho ** (-11.0 / 3.0)
    delta = _LYP_C * rm13 + _LYP_D * rm13 / denom
    ra = rb = 0.5 * rho
    s_aa = s_bb = s_ab = 0.25 * sigma
    rab = ra * rb
    term1 = -4.0 * _LYP_A * rab / (rho * denom)
    t = (
        rab * (
            2.0 ** (11.0 / 3.0) * _CF * (ra ** (8.0 / 3.0)
                                         + rb ** (8.0 / 3.0))
            + (47.0 / 18.0 - 7.0 * delta / 18.0) * sigma
            - (2.5 - delta / 18.0) * (s_aa + s_bb)
            - (delta - 11.0) / 9.0 * (ra * s_aa + rb * s_bb) / rho
        )
        - 2.0 / 3.0 * rho * rho * sigma
        + (2.0 / 3.0 * rho * rho - ra * ra) * s_bb
        + (2.0 / 3.0 * rho * rho - rb * rb) * s_aa
    )
    return term1 - _LYP_A * _LYP_B * omega * t


def _xc_energy_density(rho, sigma, xc, xp=np):
    """epsilon_xc(rho, |grad rho|^2) per particle. Vectorized over the
    array module xp (numpy for the SCF loop, jax.numpy for the
    differentiable force path in dft_force.py); the numpy SCF potential
    differentiates it by finite perturbation (see _exc_and_v)."""
    rho = xp.maximum(rho, 1e-30)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    ex = _eps_x_lda(rho, xp)
    if xc == "lda":
        return ex + _eps_c_pz(rs, xp)
    if xc == "hf":
        return xp.zeros_like(rho)
    if xc in ("b3lyp", "camb3lyp"):
        ra, s_aa = 0.5 * rho, 0.25 * xp.maximum(sigma, 0.0)
        e_b88 = 2.0 * _ex_b88_spin(ra, s_aa, xp)      # per volume, both spins
        e_lyp = _ec_lyp_closed(rho, sigma, xp)
        if xc == "b3lyp":
            # a0=0.20 HF handled via K matrices; DFT exchange:
            # 0.08 LDA + 0.72 B88 (B88 includes its LDA part)
            eps_x = 0.08 * ex + 0.72 * e_b88 / rho
        else:
            # CAM: attenuate the B88 exchange hole pointwise by
            # 1 - alpha - beta*g(a); HF part alpha*K + beta*K_LR
            alpha, beta, omega_rs = 0.19, 0.46, 0.33
            K_s = -2.0 * (0.5 * e_b88) / ra ** (4.0 / 3.0)
            a = omega_rs * xp.sqrt(xp.maximum(K_s, 1e-30)) \
                / (6.0 * np.sqrt(np.pi) * ra ** (1.0 / 3.0))
            eps_x = (1.0 - alpha - beta * _cam_lr_fraction(a, xp)) \
                * e_b88 / rho
        eps_c = 0.19 * _eps_c_vwn5(rs, xp) + 0.81 * e_lyp / rho
        return eps_x + eps_c
    # PBE
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    grad = xp.sqrt(xp.maximum(sigma, 0.0))
    s = grad / xp.maximum(2.0 * kf * rho, 1e-30)
    fx = 1.0 + _PBE_KAPPA - _PBE_KAPPA / (1.0 + _PBE_MU * s * s / _PBE_KAPPA)
    eps_x = ex * fx
    # correlation
    eps_c0 = _eps_c_pw92(rs, xp)
    ks = xp.sqrt(4.0 * kf / np.pi)
    t = grad / xp.maximum(2.0 * ks * rho, 1e-30)
    expo = xp.exp(-eps_c0 / _PBE_GAMMA)
    A = _PBE_BETA / _PBE_GAMMA / xp.maximum(expo - 1.0, 1e-30)
    t2 = t * t
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = _PBE_GAMMA * xp.log1p(_PBE_BETA / _PBE_GAMMA * t2 * num / den)
    return eps_x + eps_c0 + H


def _exc_and_v(rho, sigma, xc, eps=1e-7, rho_cutoff=1e-10):
    """E_xc density f = rho*eps and its derivatives (df/drho, df/dsigma)
    by central differences (robust and plenty accurate on a DFT grid).

    Grid points with rho below rho_cutoff are screened out entirely — the
    correlation functionals (LYP/VWN) have negative-power/log terms whose
    finite differences blow up in the numerical noise of the density tails
    (the same screening every production DFT code applies)."""
    def f(r, s):
        return r * _xc_energy_density(r, s, xc)

    live = rho > rho_cutoff
    f0 = np.where(live, f(rho, sigma), 0.0)
    dr = np.maximum(rho * 1e-6, 1e-12)
    vrho = np.where(live,
                    (f(rho + dr, sigma) - f(rho - dr, sigma)) / (2 * dr),
                    0.0)
    if xc == "lda":
        vsigma = np.zeros_like(rho)
    else:
        ds = np.maximum(sigma * 1e-6, 1e-16)
        vsigma = np.where(
            live,
            (f(rho, sigma + ds) - f(rho, sigma - ds)) / (2 * ds), 0.0)
    return f0, vrho, vsigma


@dataclass
class RKSResult:
    e_tot: float
    e_xc: float
    mo_coeff: np.ndarray
    mo_energy: np.ndarray
    dm: np.ndarray
    converged: bool
    nocc: int
    n_elec_grid: float


def rks(engine, coords=None, xc="pbe", n_rad=75, angular="product",
        max_cycle=60,
        conv_tol=1e-8, diis_size=8):
    """Restricted Kohn-Sham SCF with the given functional."""
    coords = np.asarray(engine.mol.coords if coords is None else coords)
    mol = engine.mol.set_geom(coords)
    bundle = engine.compute_jit(coords)
    S = np.array(bundle.ovlp)
    h = np.array(bundle.hcore)
    g = np.array(bundle.eri)
    enuc = float(bundle.enuc)
    nelec = mol.nelec
    assert nelec[0] == nelec[1], "RKS requires closed shell"
    nocc = nelec[0]

    hyb = _HYBRIDS.get(xc, dict(c_hf=0.0, c_lr=0.0, omega=0.0))
    g_lr = None
    if hyb["c_lr"]:
        import jax
        g_lr = np.array(jax.jit(
            lambda c: engine.eri(c, omega=hyb["omega"]))(coords))

    points, wts = molecular_grid(mol, n_rad=n_rad, angular=angular)
    phi, dphi = eval_aos(engine, points, deriv=True, coords=coords)

    vals, vecs = np.linalg.eigh(S)
    keep = vals > 1e-12
    X = vecs[:, keep] / np.sqrt(vals[keep])

    def solve(F):
        e, cp = np.linalg.eigh(X.T @ F @ X)
        return e, X @ cp

    mo_e, C = solve(h)
    dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T

    diis_F, diis_err = [], []
    e_old, converged = 0.0, False
    exc = 0.0
    nelec_grid = 0.0
    for _ in range(max_cycle):
        J = np.einsum("ij,ijkl->kl", dm, g, optimize=True)
        rho = np.einsum("ni,ij,nj->n", phi, dm, phi, optimize=True)
        grad_rho = 2.0 * np.einsum("ndi,ij,nj->nd", dphi, dm, phi,
                                   optimize=True)
        sigma = np.sum(grad_rho * grad_rho, axis=1)
        fxc, vrho, vsigma = _exc_and_v(rho, sigma, xc)
        exc = float(np.sum(wts * fxc))
        nelec_grid = float(np.sum(wts * rho))
        # V_xc = vrho phi phi + 2 vsigma grad_rho . grad(phi phi)
        Vxc = np.einsum("n,ni,nj->ij", wts * vrho, phi, phi, optimize=True)
        if xc != "lda":
            t = np.einsum("n,nd,ndi,nj->ij", 2.0 * wts * vsigma, grad_rho,
                          dphi, phi, optimize=True)
            Vxc += t + t.T
        VK = 0.0
        if hyb["c_hf"]:
            VK = hyb["c_hf"] * np.einsum("kl,ikjl->ij", dm, g,
                                         optimize=True)
        if hyb["c_lr"]:
            VK = VK + hyb["c_lr"] * np.einsum("kl,ikjl->ij", dm, g_lr,
                                              optimize=True)
        F = h + J + Vxc - 0.5 * VK

        err = F @ dm @ S - S @ dm @ F
        diis_F.append(F.copy())
        diis_err.append(err.ravel())
        if len(diis_F) > diis_size:
            diis_F.pop(0)
            diis_err.pop(0)
        if len(diis_F) > 1:
            m = len(diis_F)
            B = -np.ones((m + 1, m + 1))
            B[-1, -1] = 0.0
            for i in range(m):
                for j in range(m):
                    B[i, j] = diis_err[i] @ diis_err[j]
            rhs = np.zeros(m + 1)
            rhs[-1] = -1.0
            try:
                w = np.linalg.solve(B, rhs)[:m]
                F = sum(wi * Fi for wi, Fi in zip(w, diis_F))
            except np.linalg.LinAlgError:
                pass
        mo_e, C = solve(F)
        dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        e_k = 0.0
        if hyb["c_hf"]:
            e_k += hyb["c_hf"] * np.einsum("ij,kl,ikjl->", dm, dm, g,
                                           optimize=True)
        if hyb["c_lr"]:
            e_k += hyb["c_lr"] * np.einsum("ij,kl,ikjl->", dm, dm, g_lr,
                                           optimize=True)
        e_elec = (np.sum(dm * h) + 0.5 * np.sum(
            dm * np.einsum("ij,ijkl->kl", dm, g, optimize=True))
            - 0.25 * e_k + exc)
        if abs(e_elec - e_old) < conv_tol:
            converged = True
            break
        e_old = e_elec

    return RKSResult(
        e_tot=float(e_elec + enuc), e_xc=exc, mo_coeff=C, mo_energy=mo_e,
        dm=dm, converged=converged, nocc=nocc, n_elec_grid=nelec_grid)


# ---------------------------------------------------------------------------
# spin-polarized (unrestricted) Kohn-Sham
# ---------------------------------------------------------------------------
# PW92 parameter sets: (A, alpha1, beta1..4) for ec(zeta=0), ec(zeta=1) and
# the spin stiffness -alpha_c. The zeta=0 channel reuses _eps_c_pw92 above so
# UKS on a closed shell is bitwise the RKS functional.
_PW_EC1 = (0.01554535, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
_PW_ALP = (0.0168869, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)

# PZ81 polarized-channel parameters
_PZ_P = dict(gamma=-0.0843, b1=1.3981, b2=0.2611,
             A=0.01555, B=-0.0269, C=0.0007, D=-0.0048)

# VWN5 ferromagnetic and spin-stiffness fits (paramagnetic set is above)
_VWN_F = (0.01554535, -0.32500, 7.06042, 18.0578)
_VWN_S = (-1.0 / (6.0 * np.pi ** 2), -0.0047584, 1.13107, 13.0045)

_FPP0 = 4.0 / (9.0 * (2.0 ** (1.0 / 3.0) - 1.0))   # f''(0) = 1.7099209...


def _f_zeta(zeta):
    """Spin-interpolation function of the uniform electron gas."""
    zp = np.clip(1.0 + zeta, 0.0, 2.0)
    zm = np.clip(1.0 - zeta, 0.0, 2.0)
    return (zp ** (4.0 / 3.0) + zm ** (4.0 / 3.0) - 2.0) \
        / (2.0 * (2.0 ** (1.0 / 3.0) - 1.0))


def _pw92_G(rs, A, a1, b1, b2, b3, b4):
    sq = np.sqrt(rs)
    q0 = -2.0 * A * (1.0 + a1 * rs)
    q1 = 2.0 * A * (b1 * sq + b2 * rs + b3 * rs * sq + b4 * rs * rs)
    return q0 * np.log1p(1.0 / np.maximum(q1, 1e-30))


def _eps_c_pw92_spin(rs, zeta):
    ec0 = _eps_c_pw92(rs)
    ec1 = _pw92_G(rs, *_PW_EC1)
    alp = -_pw92_G(rs, *_PW_ALP)          # fit targets -alpha_c
    f = _f_zeta(zeta)
    z4 = zeta ** 4
    return ec0 + alp * f / _FPP0 * (1.0 - z4) + (ec1 - ec0) * f * z4


def _eps_c_pz_spin(rs, zeta):
    ecU = _eps_c_pz(rs)
    lo = rs >= 1.0
    p = _PZ_P
    ec_lo = p["gamma"] / (1.0 + p["b1"] * np.sqrt(rs) + p["b2"] * rs)
    lnrs = np.log(np.maximum(rs, 1e-30))
    ec_hi = p["A"] * lnrs + p["B"] + p["C"] * rs * lnrs + p["D"] * rs
    ecP = np.where(lo, ec_lo, ec_hi)
    return ecU + _f_zeta(zeta) * (ecP - ecU)


def _vwn_fit(rs, A, x0, b, c):
    x = np.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = np.sqrt(4.0 * c - b * b)
    atn = np.arctan(Q / (2.0 * x + b))
    return A * (
        np.log(x * x / X) + 2.0 * b / Q * atn
        - b * x0 / X0 * (np.log((x - x0) ** 2 / X)
                         + 2.0 * (b + 2.0 * x0) / Q * atn))


def _eps_c_vwn5_spin(rs, zeta):
    ecP = _eps_c_vwn5(rs)                  # paramagnetic fit (zeta = 0)
    ecF = _vwn_fit(rs, *_VWN_F)
    alp = _vwn_fit(rs, *_VWN_S)
    f = _f_zeta(zeta)
    z4 = zeta ** 4
    beta = _FPP0 * (ecF - ecP) / np.where(np.abs(alp) > 1e-30, alp, 1e-30) \
        - 1.0
    return ecP + alp * f / _FPP0 * (1.0 + beta * z4)


def _ec_lyp_spin(ra, rb, s_aa, s_ab, s_bb):
    """LYP correlation energy per volume, open shell (Miehlich et al. 1989
    eq. 2); reduces exactly to _ec_lyp_closed at ra = rb."""
    rho = np.maximum(ra + rb, 1e-30)
    ra = np.maximum(ra, 0.0)
    rb = np.maximum(rb, 0.0)
    sigma = s_aa + 2.0 * s_ab + s_bb
    rm13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + _LYP_D * rm13
    omega = np.exp(-_LYP_C * rm13) / denom * rho ** (-11.0 / 3.0)
    delta = _LYP_C * rm13 + _LYP_D * rm13 / denom
    rab = ra * rb
    term1 = -4.0 * _LYP_A * rab / (rho * denom)
    t = (
        rab * (
            2.0 ** (11.0 / 3.0) * _CF * (ra ** (8.0 / 3.0)
                                         + rb ** (8.0 / 3.0))
            + (47.0 / 18.0 - 7.0 * delta / 18.0) * sigma
            - (2.5 - delta / 18.0) * (s_aa + s_bb)
            - (delta - 11.0) / 9.0 * (ra * s_aa + rb * s_bb) / rho
        )
        - 2.0 / 3.0 * rho * rho * sigma
        + (2.0 / 3.0 * rho * rho - ra * ra) * s_bb
        + (2.0 / 3.0 * rho * rho - rb * rb) * s_aa
    )
    return term1 - _LYP_A * _LYP_B * omega * t


def _pbe_ex_vol(rho, sigma):
    """Closed-shell PBE exchange energy per volume."""
    rho = np.maximum(rho, 1e-30)
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    s = np.sqrt(np.maximum(sigma, 0.0)) / np.maximum(2.0 * kf * rho, 1e-30)
    fx = 1.0 + _PBE_KAPPA - _PBE_KAPPA / (1.0 + _PBE_MU * s * s / _PBE_KAPPA)
    return rho * _eps_x_lda(rho) * fx


def _xc_f_spin(ra, rb, s_aa, s_ab, s_bb, xc):
    """E_xc density per volume for spin-resolved densities/gradients.

    At ra = rb = rho/2, s_aa = s_ab = s_bb = sigma/4 this equals
    rho * _xc_energy_density(rho, sigma, xc) for every functional
    (the UKS == RKS closed-shell identity, asserted in the tests)."""
    ra = np.maximum(ra, 1e-30)
    rb = np.maximum(rb, 1e-30)
    rho = ra + rb
    zeta = np.clip((ra - rb) / rho, -1.0, 1.0)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    # exact spin scaling of LDA exchange
    ex_lda = 0.5 * ((2.0 * ra) * _eps_x_lda(2.0 * ra)
                    + (2.0 * rb) * _eps_x_lda(2.0 * rb))
    if xc == "hf":
        return np.zeros_like(ra)
    if xc == "lda":
        return ex_lda + rho * _eps_c_pz_spin(rs, zeta)
    if xc in ("b3lyp", "camb3lyp"):
        eb88_a = _ex_b88_spin(ra, s_aa)
        eb88_b = _ex_b88_spin(rb, s_bb)
        e_lyp = _ec_lyp_spin(ra, rb, s_aa, s_ab, s_bb)
        if xc == "b3lyp":
            ex = 0.08 * ex_lda + 0.72 * (eb88_a + eb88_b)
        else:
            alpha, beta, omega_rs = 0.19, 0.46, 0.33
            ex = 0.0
            for r_s, e_s in ((ra, eb88_a), (rb, eb88_b)):
                K_s = -2.0 * e_s / r_s ** (4.0 / 3.0)
                a = omega_rs * np.sqrt(np.maximum(K_s, 1e-30)) \
                    / (6.0 * np.sqrt(np.pi) * r_s ** (1.0 / 3.0))
                ex = ex + (1.0 - alpha - beta * _cam_lr_fraction(a)) * e_s
        ec = 0.19 * rho * _eps_c_vwn5_spin(rs, zeta) + 0.81 * e_lyp
        return ex + ec
    # PBE: exchange by spin scaling, correlation with phi(zeta)
    ex = 0.5 * (_pbe_ex_vol(2.0 * ra, 4.0 * s_aa)
                + _pbe_ex_vol(2.0 * rb, 4.0 * s_bb))
    sigma = np.maximum(s_aa + 2.0 * s_ab + s_bb, 0.0)
    eps_c0 = _eps_c_pw92_spin(rs, zeta)
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = np.sqrt(4.0 * kf / np.pi)
    t = np.sqrt(sigma) / np.maximum(2.0 * phi * ks * rho, 1e-30)
    gphi3 = _PBE_GAMMA * phi ** 3
    expo = np.exp(-eps_c0 / np.maximum(gphi3, 1e-30))
    A = _PBE_BETA / _PBE_GAMMA / np.maximum(expo - 1.0, 1e-30)
    t2 = t * t
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = gphi3 * np.log1p(_PBE_BETA / _PBE_GAMMA * t2 * num / den)
    return ex + rho * (eps_c0 + H)


def _exc_and_v_spin(ra, rb, s_aa, s_ab, s_bb, xc, rho_cutoff=1e-10):
    """f = E_xc per volume and its five partial derivatives by central
    differences (see _exc_and_v for the screening rationale)."""
    live = (ra + rb) > rho_cutoff

    def f(*args):
        return _xc_f_spin(*args, xc)

    args = [ra, rb, s_aa, s_ab, s_bb]
    f0 = np.where(live, f(*args), 0.0)
    derivs = []
    gga = xc != "lda" and xc != "hf"
    for k in range(5):
        if k >= 2 and not gga:
            derivs.append(np.zeros_like(ra))
            continue
        x = args[k]
        h = np.maximum(np.abs(x) * 1e-6, 1e-12 if k < 2 else 1e-16)
        up = list(args)
        dn = list(args)
        up[k] = x + h
        dn[k] = x - h
        derivs.append(np.where(live, (f(*up) - f(*dn)) / (2.0 * h), 0.0))
    return f0, derivs


@dataclass
class UKSResult:
    e_tot: float
    e_xc: float
    mo_coeff: tuple
    mo_energy: tuple
    dm: tuple
    converged: bool
    nocc: tuple
    n_elec_grid: float
    spin_sq: float


def uks(engine, coords=None, xc="pbe", n_rad=75, angular="product",
        max_cycle=80, conv_tol=1e-8, diis_size=8, level_shift=0.0,
        guess_mix=0.0):
    """Unrestricted Kohn-Sham SCF (the reference's dft.UKS baseline,
    Zundel_DFT_CAMB3LYP.py:55). xc in {lda, pbe, b3lyp, camb3lyp, hf};
    'hf' makes this a plain UHF through the same loop.

    guess_mix > 0 rotates the alpha HOMO/LUMO of the initial guess to break
    spin symmetry (for UHF solutions of stretched closed-shell systems)."""
    coords = np.asarray(engine.mol.coords if coords is None else coords)
    mol = engine.mol.set_geom(coords)
    bundle = engine.compute_jit(coords)
    S = np.array(bundle.ovlp)
    h = np.array(bundle.hcore)
    g = np.array(bundle.eri)
    enuc = float(bundle.enuc)
    na, nb = mol.nelec

    hyb = _HYBRIDS.get(xc, dict(c_hf=0.0, c_lr=0.0, omega=0.0))
    g_lr = None
    if hyb["c_lr"]:
        import jax
        g_lr = np.array(jax.jit(
            lambda c: engine.eri(c, omega=hyb["omega"]))(coords))

    points, wts = molecular_grid(mol, n_rad=n_rad, angular=angular)
    phi, dphi = eval_aos(engine, points, deriv=True, coords=coords)

    vals, vecs = np.linalg.eigh(S)
    keep = vals > 1e-12
    X = vecs[:, keep] / np.sqrt(vals[keep])

    def solve(F):
        e, cp = np.linalg.eigh(X.T @ F @ X)
        return e, X @ cp

    mo_e0, C0 = solve(h)
    Ca, Cb = C0.copy(), C0.copy()
    if guess_mix > 0.0 and na > 0 and C0.shape[1] > na:
        th = float(guess_mix)
        homo, lumo = Ca[:, na - 1].copy(), Ca[:, na].copy()
        Ca[:, na - 1] = np.cos(th) * homo + np.sin(th) * lumo
        Ca[:, na] = -np.sin(th) * homo + np.cos(th) * lumo
    dma = Ca[:, :na] @ Ca[:, :na].T if na else np.zeros_like(S)
    dmb = Cb[:, :nb] @ Cb[:, :nb].T if nb else np.zeros_like(S)

    def K(dm, tensor):
        return np.einsum("kl,ikjl->ij", dm, tensor, optimize=True)

    diis_F, diis_err = [], []
    e_old, converged = 0.0, False
    exc = 0.0
    nelec_grid = 0.0
    mo_ea = mo_eb = mo_e0
    for cycle in range(max_cycle):
        dmt = dma + dmb
        J = np.einsum("ij,ijkl->kl", dmt, g, optimize=True)
        rho_a = np.einsum("ni,ij,nj->n", phi, dma, phi, optimize=True)
        rho_b = np.einsum("ni,ij,nj->n", phi, dmb, phi, optimize=True)
        gr_a = 2.0 * np.einsum("ndi,ij,nj->nd", dphi, dma, phi,
                               optimize=True)
        gr_b = 2.0 * np.einsum("ndi,ij,nj->nd", dphi, dmb, phi,
                               optimize=True)
        s_aa = np.sum(gr_a * gr_a, axis=1)
        s_ab = np.sum(gr_a * gr_b, axis=1)
        s_bb = np.sum(gr_b * gr_b, axis=1)
        fxc, (vra, vrb, vsaa, vsab, vsbb) = _exc_and_v_spin(
            rho_a, rho_b, s_aa, s_ab, s_bb, xc)
        exc = float(np.sum(wts * fxc))
        nelec_grid = float(np.sum(wts * (rho_a + rho_b)))

        def vxc_mat(vr, vs_self, vs_cross, gr_self, gr_cross):
            V = np.einsum("n,ni,nj->ij", wts * vr, phi, phi, optimize=True)
            if xc not in ("lda", "hf"):
                vec = (2.0 * vs_self[:, None] * gr_self
                       + vs_cross[:, None] * gr_cross)
                t = np.einsum("n,nd,ndi,nj->ij", wts, vec, dphi, phi,
                              optimize=True)
                V += t + t.T
            return V

        Va = vxc_mat(vra, vsaa, vsab, gr_a, gr_b)
        Vb = vxc_mat(vrb, vsbb, vsab, gr_b, gr_a)
        Ka = Kb = 0.0
        if hyb["c_hf"]:
            Ka = hyb["c_hf"] * K(dma, g)
            Kb = hyb["c_hf"] * K(dmb, g)
        if hyb["c_lr"]:
            Ka = Ka + hyb["c_lr"] * K(dma, g_lr)
            Kb = Kb + hyb["c_lr"] * K(dmb, g_lr)
        Fa = h + J + Va - Ka
        Fb = h + J + Vb - Kb
        if level_shift:
            Fa = Fa + level_shift * (S - S @ dma @ S)
            Fb = Fb + level_shift * (S - S @ dmb @ S)

        err = np.concatenate([
            (Fa @ dma @ S - S @ dma @ Fa).ravel(),
            (Fb @ dmb @ S - S @ dmb @ Fb).ravel()])
        diis_F.append((Fa.copy(), Fb.copy()))
        diis_err.append(err)
        if len(diis_F) > diis_size:
            diis_F.pop(0)
            diis_err.pop(0)
        if len(diis_F) > 1:
            m = len(diis_F)
            B = -np.ones((m + 1, m + 1))
            B[-1, -1] = 0.0
            for i in range(m):
                for j in range(m):
                    B[i, j] = diis_err[i] @ diis_err[j]
            rhs = np.zeros(m + 1)
            rhs[-1] = -1.0
            try:
                w = np.linalg.solve(B, rhs)[:m]
                Fa = sum(wi * Fi[0] for wi, Fi in zip(w, diis_F))
                Fb = sum(wi * Fi[1] for wi, Fi in zip(w, diis_F))
            except np.linalg.LinAlgError:
                pass
        mo_ea, Ca = solve(Fa)
        mo_eb, Cb = solve(Fb)
        dma = Ca[:, :na] @ Ca[:, :na].T if na else np.zeros_like(S)
        dmb = Cb[:, :nb] @ Cb[:, :nb].T if nb else np.zeros_like(S)
        dmt = dma + dmb
        e_k = 0.0
        if hyb["c_hf"]:
            e_k += hyb["c_hf"] * (np.sum(dma * K(dma, g))
                                  + np.sum(dmb * K(dmb, g)))
        if hyb["c_lr"]:
            e_k += hyb["c_lr"] * (np.sum(dma * K(dma, g_lr))
                                  + np.sum(dmb * K(dmb, g_lr)))
        e_elec = (np.sum(dmt * h)
                  + 0.5 * np.sum(dmt * np.einsum("ij,ijkl->kl", dmt, g,
                                                 optimize=True))
                  - 0.5 * e_k + exc)
        if abs(e_elec - e_old) < conv_tol and cycle > 0:
            converged = True
            break
        e_old = e_elec

    # <S^2> = Sz(Sz+1) + Nb - |<a|b>|^2 over occupied pairs
    sz = 0.5 * (na - nb)
    Sab = Ca[:, :na].T @ S @ Cb[:, :nb] if na and nb else np.zeros((0, 0))
    spin_sq = sz * (sz + 1.0) + nb - float(np.sum(Sab * Sab))

    return UKSResult(
        e_tot=float(e_elec + enuc), e_xc=exc, mo_coeff=(Ca, Cb),
        mo_energy=(mo_ea, mo_eb), dm=(dma, dmb), converged=converged,
        nocc=(na, nb), n_elec_grid=nelec_grid, spin_sq=spin_sq)
