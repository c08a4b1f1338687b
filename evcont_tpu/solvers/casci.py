"""CASCI: complete-active-space CI on top of RHF orbitals.

Replaces pyscf.mcscf.CASCI used by the reference's CAS backend
(evcont/CASCI_EVCont.py:143-161). The active space is the ncas orbitals
around the Fermi level with nelecas active electrons; the core is doubly
occupied and folded into an effective one-body operator.
"""

from dataclasses import dataclass

import numpy as np

from .fci import FCISolver
from .scf import rhf


@dataclass
class CASCIResult:
    e_tot: float
    e_cas: float
    e_core: float
    ci: np.ndarray            # active-space CI vector (Na, Nb)
    mo_coeff: np.ndarray      # full AO->MO coefficients
    ncore: int
    ncas: int
    nelecas: tuple
    converged: bool


def casci(ovlp, hcore, eri, enuc, nelec, ncas, nelecas, mo_coeff=None,
          fci_kwargs=None):
    """Run CASCI. nelecas may be an int (split closed-shell) or tuple."""
    if isinstance(nelec, (tuple, list)):
        nelec_tot = sum(nelec)
    else:
        nelec_tot = nelec
    if isinstance(nelecas, (tuple, list)):
        na_cas, nb_cas = nelecas
    else:
        nb_cas = nelecas // 2
        na_cas = nelecas - nb_cas
    ncore = (nelec_tot - na_cas - nb_cas) // 2
    assert 2 * ncore + na_cas + nb_cas == nelec_tot

    converged = True
    if mo_coeff is None:
        res = rhf(ovlp, hcore, eri, enuc, nelec_tot)
        mo_coeff = res.mo_coeff
        converged = res.converged

    C_core = mo_coeff[:, :ncore]
    C_act = mo_coeff[:, ncore:ncore + ncas]

    dm_core = 2.0 * C_core @ C_core.T
    J = np.einsum("ij,ijkl->kl", dm_core, eri, optimize=True)
    K = np.einsum("ij,ikjl->kl", dm_core, eri, optimize=True)
    veff = J - 0.5 * K
    e_core = float(np.sum(dm_core * (hcore + 0.5 * veff)) + enuc)

    h1eff = C_act.T @ (hcore + veff) @ C_act
    eri_act = eri
    for _ in range(4):
        eri_act = np.tensordot(eri_act, C_act, axes=[[0], [0]])

    solver = FCISolver(ncas, (na_cas, nb_cas))
    e_cas, ci = solver.kernel(h1eff, eri_act, **(fci_kwargs or {}))
    return CASCIResult(
        e_tot=e_cas + e_core, e_cas=e_cas, e_core=e_core, ci=ci,
        mo_coeff=mo_coeff, ncore=ncore, ncas=ncas,
        nelecas=(na_cas, nb_cas), converged=converged)


def embed_cas_civec(ci, norb, ncore, ncas, nelec):
    """Embed an active-space CI vector into the full-orbital determinant
    space (core orbitals doubly occupied). Used to evaluate cross-geometry
    t-RDMs exactly by full-space CI algebra — the role pygnme's
    nonorthogonal Wick theorem plays in the reference
    (CASCI_EVCont.py:173-319)."""
    from .fci import make_strings

    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = nelec // 2
        na = nelec - nb
    na_cas, nb_cas = na - ncore, nb - ncore

    strings_full_a = make_strings(norb, na)
    index_full_a = {s: i for i, s in enumerate(strings_full_a)}
    strings_full_b = (strings_full_a if nb == na
                      else make_strings(norb, nb))
    index_full_b = ({s: i for i, s in enumerate(strings_full_b)}
                    if nb != na else index_full_a)

    strings_act_a = make_strings(ncas, na_cas)
    strings_act_b = (strings_act_a if nb_cas == na_cas
                     else make_strings(ncas, nb_cas))

    core = tuple(range(ncore))

    def full_index(act_string, index_full):
        s = core + tuple(o + ncore for o in act_string)
        return index_full[tuple(sorted(s))]

    # core orbitals come first in sorted order, so no extra sign arises
    rows = [full_index(s, index_full_a) for s in strings_act_a]
    cols = [full_index(s, index_full_b) for s in strings_act_b]
    out = np.zeros((len(strings_full_a), len(strings_full_b)))
    out[np.ix_(rows, cols)] = np.asarray(ci)
    return out
