"""CASCI training-state backend.

Reference parity: CAS_EVCont_obj (evcont/CASCI_EVCont.py:94-361). The
reference evaluates t-RDMs between CAS states built on *different* MO
bases per geometry with pygnme's nonorthogonal Wick theorem
(CASCI_EVCont.py:173-319, MPI-split over occupation-string quadruples).

Two equivalent evaluation paths are provided:
  * method="wick" (default): the framework's own nonorthogonal kernel
    (solvers/nonorthogonal.py) — batched Löwdin pairing over determinant
    pairs, exact generalized Slater-Condon with branch-free zero-overlap
    handling. Scales with the active space only (the pygnme replacement).
  * method="fullspace": embed each CAS state into the full determinant
    space and rotate it exactly to the shared OAO basis (transform_ci);
    t-RDMs then reduce to orthonormal CI algebra. Exact but limited to
    ~14 total orbitals; retained as the independent cross-check oracle.

Both paths express every state in its own geometry's OAO frame and
identify those frames as one index space — the eigenvector-continuation
assumption shared with the reference.
"""

import numpy as np

from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo
from ..solvers.casci import casci, embed_cas_civec
from ..solvers.ci_transform import transform_ci
from ..solvers.fci import FCISolver
from ..solvers.nonorthogonal import cas_no_state, trans_rdm12_nonorthogonal
from .base import EVContBackend


def _sqrtm_psd(S):
    w, V = np.linalg.eigh(S)
    return (V * np.sqrt(np.maximum(w, 0.0))) @ V.T


class CASCIBackend(EVContBackend):
    def __init__(self, ncas, nelecas, method="wick", compress=False):
        """
        Args:
            ncas: number of active orbitals.
            nelecas: active electrons (int or (na, nb)).
            method: "wick" | "fullspace" (see module docstring).
            compress: maintain the store in the fully compressed pair +
                exchange layouts (see EVContBackend).
        """
        super().__init__(compress=compress)
        self.ncas = ncas
        self.nelecas = nelecas
        assert method in ("wick", "fullspace")
        self.method = method
        self.states = []          # wick: NOState; fullspace: CI vectors
        self._solver = None
        self._engine_cache = {}

    def _engine(self, mol):
        key = (mol.symbols, mol.basis, mol.charge, mol.spin)
        if key not in self._engine_cache:
            self._engine_cache[key] = IntegralEngine(mol)
        return self._engine_cache[key]

    def append_to_rdms(self, mol):
        engine = self._engine(mol)
        bundle = engine.compute_jit(np.asarray(mol.coords))
        S_ao = np.array(bundle.ovlp)
        hcore = np.array(bundle.hcore)
        eri = np.array(bundle.eri)
        enuc = float(bundle.enuc)
        norb = engine.nao

        res = casci(S_ao, hcore, eri, enuc, mol.nelec, self.ncas,
                    self.nelecas)
        assert res.converged, "underlying RHF did not converge"
        self.ens.append(res.e_tot)
        self.mol_index.append(
            0 if not self.mol_index else max(self.mol_index) + 1)

        if self.method == "wick":
            # MOs in this geometry's OAO coordinates
            d = _sqrtm_psd(S_ao) @ res.mo_coeff
            na, nb = res.nelecas
            state = cas_no_state(res.ci, d, res.ncore, res.ncas, (na, nb))
            self.states.append(state)
            ovlp_row, rdm1_row, rdm2_row = [], [], []
            for st in self.states:
                ov, r1, r2 = trans_rdm12_nonorthogonal(
                    self.states[-1], st)
                ovlp_row.append(ov)
                rdm1_row.append(r1)
                rdm2_row.append(r2)
        else:
            ci_full = embed_cas_civec(res.ci, norb, res.ncore, res.ncas,
                                      mol.nelec)
            basis_oao = np.array(loewdin_trafo(bundle.ovlp))
            u = res.mo_coeff.T @ S_ao @ basis_oao
            ci_oao = transform_ci(ci_full, mol.nelec, u)
            if self._solver is None:
                self._solver = FCISolver(norb, mol.nelec, spin=None)
            self.states.append(ci_oao)
            ovlp_row, rdm1_row, rdm2_row = [], [], []
            for st in self.states:
                ovlp_row.append(np.vdot(self.states[-1], st))
                r1, r2 = self._solver.trans_rdm12(self.states[-1], st)
                rdm1_row.append(r1)
                rdm2_row.append(r2)

        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        self.states = [self.states[i] for i in keep_ids]
