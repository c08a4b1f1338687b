"""Boys orbital localization by Jacobi sweeps.

Reference parity: pyscf.lo.Boys used for the "split" basis option
(evcont/electron_integral_utils.py:109-116). Maximizes
sum_i |<i|r|i>|^2 over pairwise orbital rotations.
"""

import numpy as np


def boys_localize(dip_mo, max_sweeps=200, tol=1e-10):
    """Localize orbitals given their dipole-matrix blocks.

    Args:
        dip_mo: (3, n, n) dipole integrals in the orbital basis to localize.

    Returns:
        (n, n) rotation matrix W such that localized = C @ W.
    """
    r = np.array(dip_mo, dtype=np.float64, copy=True)   # (3, n, n)
    n = r.shape[1]
    W = np.eye(n)
    for _ in range(max_sweeps):
        changed = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                rii, rjj, rij = r[:, i, i], r[:, j, j], r[:, i, j]
                A = rij @ rij - 0.25 * (rii - rjj) @ (rii - rjj)
                B = rij @ (rii - rjj)
                if abs(A) < 1e-14 and abs(B) < 1e-14:
                    continue
                theta = 0.25 * np.arctan2(B, -A)
                if abs(theta) < 1e-12:
                    continue
                c, s = np.cos(theta), np.sin(theta)
                G = np.eye(n)
                G[i, i] = G[j, j] = c
                G[i, j] = s
                G[j, i] = -s
                # rotate dipole blocks and accumulate
                r = np.einsum("pi,xpq,qj->xij", G, r, G)
                W = W @ G
                changed += abs(theta)
        if changed < tol:
            break
    return W


def get_basis(engine, coords, basis_type="OAO", nocc=None):
    """Orthogonal orbital basis construction, all three reference variants
    (evcont/electron_integral_utils.py:91-119):
      * "OAO"       Löwdin-orthogonalized AOs
      * "canonical" RHF molecular orbitals
      * "split"     Boys-localized occupied + Boys-localized virtuals

    Returns AO->basis coefficients (nao, nao)."""
    import numpy as _np
    from ..oao import loewdin_trafo
    from .scf import rhf_from_engine

    coords = _np.asarray(coords)
    if basis_type == "OAO":
        return _np.array(loewdin_trafo(engine.overlap(coords)))

    res = rhf_from_engine(engine, coords=coords)
    basis = res.mo_coeff
    if basis_type == "canonical":
        return basis
    if basis_type == "split":
        nocc = res.nocc if nocc is None else nocc
        dip = _np.array(engine.dipole(coords, _np.zeros(3)))
        for sl in (slice(None, nocc), slice(nocc, None)):
            C = basis[:, sl]
            dip_mo = _np.einsum("pi,xpq,qj->xij", C, dip, C)
            W = boys_localize(dip_mo)
            basis[:, sl] = C @ W
        return basis
    raise ValueError(f"unknown basis_type {basis_type!r}")


def fiedler_orbital_reordering(h1, h2):
    """Fiedler-vector orbital ordering for DMRG (block2's
    `DMRGDriver.orbital_reordering` analog, used by the reference's rerun
    append strategy, DMRG_EVCont.py:121-124): order orbitals by the
    Fiedler vector of the interaction graph so strongly-coupled orbitals
    sit close on the MPS chain, minimizing entanglement across cuts.

    Edge weights follow block2's convention
    K_ij = |h1_ij| + sqrt(|(ij|ji)|): one-electron hopping plus exchange.

    Returns a permutation `perm` such that reordered = orbitals[perm].
    """
    h1 = np.asarray(h1, dtype=np.float64)
    h2 = np.asarray(h2, dtype=np.float64)
    n = h1.shape[0]
    if n < 3:
        return np.arange(n)
    K = np.abs(h1) + np.sqrt(np.abs(np.einsum("ijji->ij", h2)))
    np.fill_diagonal(K, 0.0)
    K = 0.5 * (K + K.T)
    L = np.diag(K.sum(axis=1)) - K
    w, v = np.linalg.eigh(L)
    fiedler = v[:, 1]
    # deterministic sign: make the first nonzero component positive
    nz = np.nonzero(np.abs(fiedler) > 1e-12)[0]
    if nz.size and fiedler[nz[0]] < 0:
        fiedler = -fiedler
    return np.argsort(fiedler, kind="stable")
