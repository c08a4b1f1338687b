"""Restricted Kohn-Sham DFT (LDA and PBE) on a Becke grid.

Replaces pyscf.dft's RKS for the reference's DFT baseline MDs
(scripts/MD/H30/md_H30_DFT.py, scripts/MD/H2O-H3O+/md_H2O-H3O+_DFT.py,
Zundel_DFT_PBE.py). Functionals:
  * "lda"  Slater exchange + Perdew-Zunger 81 correlation
  * "pbe"  PBE exchange (kappa = 0.804, mu = 0.2195...) + PBE correlation
           on PW92 (closed shell, phi = 1)

Grid: Becke partitioning with Gauss-Chebyshev radial points and either a
Gauss-Legendre product angular rule (default; overlap matrices reproduced
to ~3e-8 on test molecules) or Lebedev 26/50 rules for speed. CAM-B3LYP
(range-separated hybrid) is future work; LDA/PBE cover the reference's
PBE baselines.
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


def _xc_energy_density(rho, sigma, xc):
    """epsilon_xc(rho, |grad rho|^2) per particle; numpy, differentiated
    by finite perturbation for the potential (see _vxc)."""
    rho = np.maximum(rho, 1e-30)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    ex = _eps_x_lda(rho)
    if xc == "lda":
        return ex + _eps_c_pz(rs)
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


def _exc_and_v(rho, sigma, xc, eps=1e-7):
    """E_xc density f = rho*eps and its derivatives (df/drho, df/dsigma)
    by central differences (robust and plenty accurate on a DFT grid)."""
    def f(r, s):
        return r * _xc_energy_density(r, s, xc)

    f0 = f(rho, sigma)
    dr = np.maximum(rho * 1e-6, 1e-12)
    vrho = (f(rho + dr, sigma) - f(rho - dr, sigma)) / (2 * dr)
    if xc == "lda":
        vsigma = np.zeros_like(rho)
    else:
        ds = np.maximum(sigma * 1e-6, 1e-16)
        vsigma = (f(rho, sigma + ds) - f(rho, sigma - ds)) / (2 * ds)
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
        F = h + J + Vxc

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
        e_elec = (np.sum(dm * h) + 0.5 * np.sum(
            dm * np.einsum("ij,ijkl->kl", dm, g, optimize=True)) + exc)
        if abs(e_elec - e_old) < conv_tol:
            converged = True
            break
        e_old = e_elec

    return RKSResult(
        e_tot=float(e_elec + enuc), e_xc=exc, mo_coeff=C, mo_energy=mo_e,
        dm=dm, converged=converged, nocc=nocc, n_elec_grid=nelec_grid)
