"""CI-vector transformation between orthonormal orbital bases.

Reference parity: pyscf.fci.addons.transform_ci, used to rotate FCI
training states solved in the canonical-MO basis into the shared OAO basis
(evcont/FCI_EVCont.py:79-85). For orthonormal old/new orbital sets related
by u = C_old^T S_ao C_new, the determinant-basis transformation is

    <D_I(new) | D_J(old)> = det(u[occ(J), occ(I)])   per spin sector,

so  C_new = U_a^T C_old U_b  with U[J, I] = det(u[occ(J), occ(I)]).

The determinant batches are evaluated with vectorized LU decompositions
(numpy einsum gather + np.linalg.det over stacked submatrices).
"""

import numpy as np

from .fci import make_strings


def string_transform_matrix(u, norb, nelec):
    """U[J, I] = det(u[occ(J), occ(I)]) over all string pairs."""
    strings = make_strings(norb, nelec)
    occ = np.array(strings)                      # (nstr, nelec)
    nstr = len(strings)
    # gather (nstr, nstr, ne, ne) submatrices: rows from J, cols from I
    sub = u[occ[:, None, :, None], occ[None, :, None, :]]
    return np.linalg.det(sub)


def transform_ci(civec, nelec, u):
    """Rotate a CI vector to a new orbital basis.

    Args:
        civec: (Na, Nb) CI coefficients in the old basis.
        nelec: (nalpha, nbeta) or int.
        u: (norb, norb) orbital overlap C_old^T S_ao C_new.

    Returns:
        (Na, Nb) CI coefficients in the new basis.
    """
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = nelec // 2
        na = nelec - nb
    norb = u.shape[0]
    Ua = string_transform_matrix(u, norb, na)
    Ub = Ua if nb == na else string_transform_matrix(u, norb, nb)
    return Ua.T @ np.asarray(civec) @ Ub
