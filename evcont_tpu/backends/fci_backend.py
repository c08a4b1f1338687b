"""FCI training-state backend.

Reference parity: FCI_EVCont_obj (evcont/FCI_EVCont.py:10-151), with the
pyscf FCI solver replaced by evcont_tpu.solvers.fci and integrals from the
JAX engine.

All three cibasis choices of the reference are supported ('canonical' is
its default, FCI_EVCont.py:18): the CI problem is solved in the requested
basis and the resulting vectors are rotated exactly to the shared OAO basis
via determinant-overlap transformation (solvers/ci_transform.py, replacing
pyscf's transform_ci used at FCI_EVCont.py:79-85). FCI is invariant under
orbital rotations within the full space, so 'OAO' (the default here) gives
identical t-RDMs without the rotation step.
"""

import numpy as np

from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.ci_transform import transform_ci
from ..solvers.fci import FCISolver
from ..solvers.localization import get_basis
from .base import EVContBackend


class FCIBackend(EVContBackend):
    def __init__(self, cibasis="OAO", nroots=1, roots_train=None,
                 spin="singlet", compress=False, conv_resid=1e-7):
        """
        Args:
            cibasis: orbital basis for the CI solve ('OAO', 'canonical' or
                'split'; see module docstring).
            nroots / roots_train: which FCI roots enter the training set
                (reference: FCI_EVCont.py:26-48 — e.g. roots_train=[0,1]
                trains on ground + first excited state at each geometry).
            spin: 'singlet' restricts the CI to the symmetric (S even)
                sector like pyscf's direct_spin0; None allows all states.
            compress: maintain the store in the fully compressed pair +
                exchange layouts (see EVContBackend).
            conv_resid: Davidson residual-norm convergence per root
                (pyscf's conv_tol analog). Eigenvector error — and hence
                t-RDM error — is first order in it.
        """
        super().__init__(compress=compress)
        assert cibasis in ("OAO", "canonical", "split"), cibasis
        self.cibasis = cibasis
        self.conv_resid = conv_resid
        self.nroots = nroots
        if roots_train is None:
            self.roots_train = list(range(nroots))
        else:
            assert isinstance(roots_train, list)
            self.roots_train = roots_train
        self.spin = spin
        self.fcivecs = []
        self._solver = None
        self._engine_cache = {}

    def _engine(self, mol):
        key = (mol.symbols, mol.basis, mol.charge, mol.spin)
        if key not in self._engine_cache:
            self._engine_cache[key] = IntegralEngine(mol)
        return self._engine_cache[key]

    def append_to_rdms(self, mol):
        """Solve FCI at `mol`'s geometry and grow the t-RDM store
        (reference: FCI_EVCont.py:58-131)."""
        engine = self._engine(mol)
        bundle = engine.compute_jit(np.asarray(mol.coords))
        if self.cibasis == "OAO":
            basis = np.array(loewdin_trafo(bundle.ovlp))
        else:
            basis = get_basis(engine, mol.coords, self.cibasis)
        h1, h2 = transform_integrals(
            np.array(bundle.hcore), np.array(bundle.eri), basis)
        h1, h2 = np.array(h1), np.array(h2)
        norb = engine.nao

        if self._solver is None:
            self._solver = FCISolver(norb, mol.nelec, spin=self.spin)
        solver = self._solver

        nroots_train = max(self.roots_train) + 1
        if nroots_train == 1:
            e, vec = solver.kernel(h1, h2, conv_resid=self.conv_resid)
            e_all, vec_all = [e], [vec]
        else:
            e_all, vec_all = solver.kernel(h1, h2, nroots=nroots_train,
                                           conv_resid=self.conv_resid)

        if self.cibasis != "OAO":
            # rotate training states to the shared OAO basis
            # (reference: FCI_EVCont.py:79-85)
            S_ao = np.array(bundle.ovlp)
            basis_oao = np.array(loewdin_trafo(bundle.ovlp))
            u = basis.T @ S_ao @ basis_oao
            vec_all = [transform_ci(v, mol.nelec, u) for v in vec_all]

        mindex = 0 if not self.mol_index else max(self.mol_index) + 1
        enuc = mol.energy_nuc()

        for ind in range(len(e_all)):
            if ind not in self.roots_train:
                continue
            vec = vec_all[ind]
            self.fcivecs.append(vec)
            self.ens.append(e_all[ind] + enuc)
            self.mol_index.append(mindex)

            ovlp_row, rdm1_row, rdm2_row = [], [], []
            for i in range(len(self.fcivecs)):
                ovlp_row.append(
                    np.vdot(self.fcivecs[-1], self.fcivecs[i]))
                rdm1, rdm2 = solver.trans_rdm12(
                    self.fcivecs[-1], self.fcivecs[i])
                rdm1_row.append(rdm1)
                rdm2_row.append(rdm2)
            self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        self.fcivecs = [self.fcivecs[i] for i in keep_ids]
