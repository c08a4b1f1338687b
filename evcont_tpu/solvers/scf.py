"""Restricted Hartree-Fock with DIIS.

Replaces the reference's uses of `pyscf.scf.RHF` (canonical/split basis
construction in evcont/electron_integral_utils.py:106-118, HF baselines in
scripts/MD/*). Host-side training tool: runs on precomputed AO integrals
(from evcont_tpu.integrals.engine), numpy f64 for robustness; the hot
inference path never calls SCF.
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class RHFResult:
    e_tot: float
    e_elec: float
    mo_coeff: np.ndarray
    mo_energy: np.ndarray
    dm: np.ndarray
    converged: bool
    nocc: int


def _fock(h, eri, dm):
    j = np.einsum("ij,ijkl->kl", dm, eri, optimize=True)
    k = np.einsum("ij,ikjl->kl", dm, eri, optimize=True)
    return h + j - 0.5 * k


def rhf(ovlp, hcore, eri, enuc, nelec, max_cycle=100, conv_tol=1e-11,
        diis_size=8, level_shift=0.0):
    """Solve RHF equations. nelec may be an int or (nalpha, nbeta) with
    nalpha == nbeta (closed shell)."""
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
        assert na == nb, "RHF requires a closed shell"
        nocc = na
    else:
        assert nelec % 2 == 0, "RHF requires an even electron count"
        nocc = nelec // 2

    S = np.asarray(ovlp, dtype=np.float64)
    h = np.asarray(hcore, dtype=np.float64)
    g = np.asarray(eri, dtype=np.float64)

    # symmetric orthogonalization for the eigensolves
    vals, vecs = np.linalg.eigh(S)
    keep = vals > 1e-12
    X = vecs[:, keep] / np.sqrt(vals[keep])

    def solve_fock(F):
        Fp = X.T @ F @ X
        e, cp = np.linalg.eigh(Fp)
        return e, X @ cp

    # core guess
    mo_e, C = solve_fock(h)
    dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T

    diis_F, diis_err = [], []
    e_old, converged = 0.0, False
    for _ in range(max_cycle):
        F = _fock(h, g, dm)
        # DIIS on the orthonormal-basis error FDS - SDF
        err = F @ dm @ S - S @ dm @ F
        diis_F.append(F.copy())
        diis_err.append(err.ravel())
        if len(diis_F) > diis_size:
            diis_F.pop(0)
            diis_err.pop(0)
        if len(diis_F) > 1:
            n = len(diis_F)
            B = -np.ones((n + 1, n + 1))
            B[-1, -1] = 0.0
            for i in range(n):
                for j in range(n):
                    B[i, j] = diis_err[i] @ diis_err[j]
            rhs = np.zeros(n + 1)
            rhs[-1] = -1.0
            try:
                w = np.linalg.solve(B, rhs)[:n]
                F = sum(wi * Fi for wi, Fi in zip(w, diis_F))
            except np.linalg.LinAlgError:
                pass
        if level_shift:
            F = F + level_shift * (S - S @ dm @ S / 2.0)
        mo_e, C = solve_fock(F)
        dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        e_elec = 0.5 * np.sum(dm * (h + _fock(h, g, dm)))
        if abs(e_elec - e_old) < conv_tol:
            converged = True
            break
        e_old = e_elec

    e_elec = 0.5 * np.sum(dm * (h + _fock(h, g, dm)))
    return RHFResult(
        e_tot=float(e_elec + enuc),
        e_elec=float(e_elec),
        mo_coeff=C,
        mo_energy=mo_e,
        dm=dm,
        converged=converged,
        nocc=nocc,
    )


def rhf_energy_and_gradient(engine, coords, **kwargs):
    """RHF total energy and analytic nuclear gradient.

    Replaces pyscf's grad.RHF used for the reference's HF baselines
    (scripts/MD/H30/md_H30_HF.py, scripts/MD/H2O-H3O+/md_H2O-H3O+_HF.py).

    Method: converge SCF on host, then differentiate the variational
    functional with the converged density D and energy-weighted density Q
    held fixed:
        g(R) = tr(D h(R)) + 1/2 [D_ij D_kl ((ij|kl) - 1/2 (ik|jl))]
               + E_nuc(R) - tr(Q S(R)),
    whose gradient at the SCF solution equals the exact dE/dR (the -tr(Q dS)
    term is the Pulay/orthonormality force). The derivative integrals come
    from autodiff of the JAX engine — no hand-coded derivative intors.
    """
    import jax
    import jax.numpy as jnp

    coords = np.asarray(coords)
    res = rhf_from_engine(engine, coords=coords, **kwargs)
    D = res.dm
    nocc = res.nocc
    Cocc = res.mo_coeff[:, :nocc]
    Q = 2.0 * (Cocc * res.mo_energy[:nocc]) @ Cocc.T

    def functional(c):
        h = engine.hcore(c)
        g = engine.eri(c)
        S = engine.overlap(c)
        e1 = jnp.sum(D * h)
        J = jnp.einsum("ij,ijkl->kl", D, g)
        K = jnp.einsum("ij,ikjl->kl", D, g)
        e2 = 0.5 * jnp.sum(D * (J - 0.5 * K))
        return e1 + e2 + engine.energy_nuc(c) - jnp.sum(Q * S)

    grad = np.array(jax.jit(jax.grad(functional))(coords))
    return res.e_tot, grad, res


def rhf_from_engine(engine, coords=None, **kwargs):
    """Convenience: run RHF directly from an IntegralEngine."""
    import numpy as _np
    if coords is None:
        coords = engine.mol.coords
    bundle = engine.compute_jit(_np.asarray(coords))
    return rhf(
        _np.array(bundle.ovlp), _np.array(bundle.hcore),
        _np.array(bundle.eri), float(bundle.enuc),
        engine.mol.nelec, **kwargs,
    )
