"""CASCI training-state backend.

Reference parity: CAS_EVCont_obj (evcont/CASCI_EVCont.py:94-361). The
reference evaluates t-RDMs between CAS states built on *different* MO
bases per geometry with pygnme's nonorthogonal Wick theorem
(CASCI_EVCont.py:173-319, MPI-split over occupation-string quadruples).

pygnme is unavailable here; instead each CAS state is embedded into the
full-orbital determinant space and rotated exactly to the shared OAO basis
(transform_ci), after which t-RDMs reduce to orthonormal full-space CI
algebra. This is mathematically identical to the nonorthogonal Wick result
(both compute <psi_a|...|psi_b> exactly), at the cost of full-space CI
vectors — practical up to ~14 orbitals. A batched generalized
Slater-Condon kernel for larger spaces is the planned native (C++)
replacement.
"""

import numpy as np

from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo
from ..solvers.casci import casci, embed_cas_civec
from ..solvers.ci_transform import transform_ci
from ..solvers.fci import FCISolver
from .base import EVContBackend


class CASCIBackend(EVContBackend):
    def __init__(self, ncas, nelecas):
        """
        Args:
            ncas: number of active orbitals.
            nelecas: active electrons (int or (na, nb)).
        """
        super().__init__()
        self.ncas = ncas
        self.nelecas = nelecas
        self.civecs = []          # full-space CI vectors in OAO basis
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

        # embed into the full determinant space (canonical-MO basis), then
        # rotate exactly to the shared OAO basis
        ci_full = embed_cas_civec(res.ci, norb, res.ncore, res.ncas,
                                  mol.nelec)
        basis_oao = np.array(loewdin_trafo(bundle.ovlp))
        u = res.mo_coeff.T @ S_ao @ basis_oao
        ci_oao = transform_ci(ci_full, mol.nelec, u)

        if self._solver is None:
            self._solver = FCISolver(norb, mol.nelec, spin=None)
        solver = self._solver

        self.civecs.append(ci_oao)
        self.ens.append(res.e_tot)
        self.mol_index.append(
            0 if not self.mol_index else max(self.mol_index) + 1)

        ovlp_row, rdm1_row, rdm2_row = [], [], []
        for i in range(len(self.civecs)):
            ovlp_row.append(np.vdot(self.civecs[-1], self.civecs[i]))
            rdm1, rdm2 = solver.trans_rdm12(self.civecs[-1], self.civecs[i])
            rdm1_row.append(rdm1)
            rdm2_row.append(rdm2)
        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        self.civecs = [self.civecs[i] for i in keep_ids]
