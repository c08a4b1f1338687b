"""Restricted Kohn-Sham DFT (LDA, PBE, B3LYP, CAM-B3LYP) on a Becke grid.

Replaces pyscf.dft's RKS for the reference's DFT baseline MDs
(scripts/MD/H30/md_H30_DFT.py, scripts/MD/H2O-H3O+/md_H2O-H3O+_DFT.py,
Zundel_thermodynamics/reference_dynamics/Zundel_DFT_{PBE,CAMB3LYP}.py).
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


def _eps_x_lda(rho):
    return -0.75 * (3.0 / np.pi) ** (1.0 / 3.0) * rho ** (1.0 / 3.0)


def _eps_c_pz(rs):
    lo = rs >= 1.0
    eps_lo = _PZ_GAMMA / (1.0 + _PZ_B1 * np.sqrt(rs) + _PZ_B2 * rs)
    lnrs = np.log(np.maximum(rs, 1e-30))
    eps_hi = (_PZ_A * lnrs + _PZ_B + _PZ_C * rs * lnrs + _PZ_D * rs)
    return np.where(lo, eps_lo, eps_hi)


def _eps_c_pw92(rs):
    q0 = -2.0 * _PW_A * (1.0 + _PW_A1 * rs)
    sq = np.sqrt(rs)
    q1 = 2.0 * _PW_A * (_PW_B1 * sq + _PW_B2 * rs + _PW_B3 * rs * sq
                        + _PW_B4 * rs * rs)
    return q0 * np.log1p(1.0 / np.maximum(q1, 1e-30))


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


def _eps_c_vwn5(rs):
    """VWN5 (paramagnetic) correlation energy per particle of the uniform
    gas, in the RPA-fit x = sqrt(rs) parametrization."""
    x = np.sqrt(rs)
    X = x * x + _VWN_B * x + _VWN_C
    X0 = _VWN_X0 * _VWN_X0 + _VWN_B * _VWN_X0 + _VWN_C
    Q = np.sqrt(4.0 * _VWN_C - _VWN_B * _VWN_B)
    atn = np.arctan(Q / (2.0 * x + _VWN_B))
    return _VWN_A * (
        np.log(x * x / X) + 2.0 * _VWN_B / Q * atn
        - _VWN_B * _VWN_X0 / X0 * (
            np.log((x - _VWN_X0) ** 2 / X)
            + 2.0 * (_VWN_B + 2.0 * _VWN_X0) / Q * atn
        )
    )


def _ex_b88_spin(rho_s, sigma_s):
    """B88 exchange energy per volume for one spin channel (includes the
    LDA part; beta = 0.0042 recovers pure Slater exchange for beta -> 0)."""
    rho_s = np.maximum(rho_s, 1e-30)
    r43 = rho_s ** (4.0 / 3.0)
    x = np.sqrt(np.maximum(sigma_s, 0.0)) / r43
    cx = 1.5 * (3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
    corr = _B88_BETA * x * x / (1.0 + 6.0 * _B88_BETA * x * np.arcsinh(x))
    return -r43 * (cx + corr)


def _cam_lr_fraction(a):
    """g(a): long-range (erf(omega r)) fraction of the model GGA exchange
    hole (Iikura/Tawada/Yanai/Hirao 2001 eq. 6; CAM usage Yanai 2004).
    g(0) = 0 (all exchange short-range), g(inf) = 1."""
    a = np.maximum(a, 1e-12)
    inv = 1.0 / (2.0 * a)
    from scipy.special import erf
    expo = np.exp(-np.minimum(inv * inv, 700.0))
    b = expo - 1.0
    c = 2.0 * a * a * b + 0.5
    g = (8.0 / 3.0) * a * (np.sqrt(np.pi) * erf(inv) + 2.0 * a * (b - c))
    # large-a: the closed form cancels catastrophically; asymptotic series
    # g = 1 - 1/(36 a^2) + O(a^-4)
    g = np.where(a > 8.0, 1.0 - 1.0 / (36.0 * a * a), g)
    return np.clip(g, 0.0, 1.0)


def _ec_lyp_closed(rho, sigma):
    """LYP correlation energy per volume, closed shell (rho_a = rho_b =
    rho/2, sigma_aa = sigma_bb = sigma_ab = sigma/4), Miehlich et al.
    gradient-only form."""
    rho = np.maximum(rho, 1e-30)
    sigma = np.maximum(sigma, 0.0)
    rm13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + _LYP_D * rm13
    omega = np.exp(-_LYP_C * rm13) / denom * rho ** (-11.0 / 3.0)
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


def _xc_energy_density(rho, sigma, xc):
    """epsilon_xc(rho, |grad rho|^2) per particle; numpy, differentiated
    by finite perturbation for the potential (see _vxc)."""
    rho = np.maximum(rho, 1e-30)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    ex = _eps_x_lda(rho)
    if xc == "lda":
        return ex + _eps_c_pz(rs)
    if xc == "hf":
        return np.zeros_like(rho)
    if xc in ("b3lyp", "camb3lyp"):
        ra, s_aa = 0.5 * rho, 0.25 * np.maximum(sigma, 0.0)
        e_b88 = 2.0 * _ex_b88_spin(ra, s_aa)          # per volume, both spins
        e_lyp = _ec_lyp_closed(rho, sigma)
        if xc == "b3lyp":
            # a0=0.20 HF handled via K matrices; DFT exchange:
            # 0.08 LDA + 0.72 B88 (B88 includes its LDA part)
            eps_x = 0.08 * ex + 0.72 * e_b88 / rho
        else:
            # CAM: attenuate the B88 exchange hole pointwise by
            # 1 - alpha - beta*g(a); HF part alpha*K + beta*K_LR
            alpha, beta, omega_rs = 0.19, 0.46, 0.33
            K_s = -2.0 * (0.5 * e_b88) / ra ** (4.0 / 3.0)
            a = omega_rs * np.sqrt(np.maximum(K_s, 1e-30)) \
                / (6.0 * np.sqrt(np.pi) * ra ** (1.0 / 3.0))
            eps_x = (1.0 - alpha - beta * _cam_lr_fraction(a)) * e_b88 / rho
        eps_c = 0.19 * _eps_c_vwn5(rs) + 0.81 * e_lyp / rho
        return eps_x + eps_c
    # PBE
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    grad = np.sqrt(np.maximum(sigma, 0.0))
    s = grad / np.maximum(2.0 * kf * rho, 1e-30)
    fx = 1.0 + _PBE_KAPPA - _PBE_KAPPA / (1.0 + _PBE_MU * s * s / _PBE_KAPPA)
    eps_x = ex * fx
    # correlation
    eps_c0 = _eps_c_pw92(rs)
    ks = np.sqrt(4.0 * kf / np.pi)
    t = grad / np.maximum(2.0 * ks * rho, 1e-30)
    expo = np.exp(-eps_c0 / _PBE_GAMMA)
    A = _PBE_BETA / _PBE_GAMMA / np.maximum(expo - 1.0, 1e-30)
    t2 = t * t
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = _PBE_GAMMA * np.log1p(_PBE_BETA / _PBE_GAMMA * t2 * num / den)
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
    phi, dphi = eval_aos(engine, points, deriv=True)

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
