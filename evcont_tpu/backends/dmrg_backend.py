"""In-framework DMRG training-state backend.

Reference parity: DMRG_EVCont_obj with the default OAO-basis strategy
(evcont/DMRG_EVCont.py:17-87, 431-496) — one DMRG solve per geometry in
the Löwdin basis, pairwise t-RDMs between the stored states.

This backend uses the framework's own MPS-DMRG (solvers/dmrg.py):
Jordan-Wigner MPO compilation, two-site sweeps over the reference's
bond-dimension ladder (converge_dmrg.py:15), and exact extraction of the
particle-number-resolved CI matrix from the converged MPS so t-RDMs reduce
to the same orthonormal CI algebra as the FCI backend. The dense
extraction bounds it to ~12 spatial orbitals — production-scale DMRG
training data (H30, Zundel) continues to enter through the
external-solver file interface (backends/trdm_ingest.py); MPS-native
t-RDM sweeps are the planned lift for larger systems.
"""

import numpy as np

from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.dmrg import build_hamiltonian_mpo, dmrg_ground_state, \
    mps_to_ci
from ..solvers.fci import FCISolver
from .base import EVContBackend


class DMRGBackend(EVContBackend):
    def __init__(self, bond_dims=(16, 32, 64), sweeps_per_dim=2,
                 penalty=8.0):
        """
        Args:
            bond_dims: bond-dimension ladder (the reference's default is
                ceil(1.8^k), converge_dmrg.py:15; config.DMRGScheduleConfig
                generates it).
            sweeps_per_dim: sweeps at each rung.
            penalty: particle-number/Sz sector penalty strength.
        """
        super().__init__()
        self.bond_dims = tuple(bond_dims)
        self.sweeps_per_dim = sweeps_per_dim
        self.penalty = penalty
        self.civecs = []
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
        trafo = np.array(loewdin_trafo(bundle.ovlp))
        h1, h2 = transform_integrals(
            np.array(bundle.hcore), np.array(bundle.eri), trafo)
        h1, h2 = np.array(h1), np.array(h2)
        norb = engine.nao
        na, nb = mol.nelec

        W = build_hamiltonian_mpo(h1, h2)
        e, mps = dmrg_ground_state(
            W, 2 * norb, na + nb, sz=0.5 * (na - nb),
            bond_dims=self.bond_dims, sweeps_per_dim=self.sweeps_per_dim,
            penalty=self.penalty)
        ci = mps_to_ci(mps, norb, (na, nb))
        ci = ci / np.linalg.norm(ci)

        if self._solver is None:
            self._solver = FCISolver(norb, (na, nb), spin=None)
        solver = self._solver

        self.civecs.append(ci)
        self.ens.append(e + float(bundle.enuc))
        self.mol_index.append(
            0 if not self.mol_index else max(self.mol_index) + 1)

        ovlp_row, rdm1_row, rdm2_row = [], [], []
        for st in self.civecs:
            ovlp_row.append(np.vdot(self.civecs[-1], st))
            r1, r2 = solver.trans_rdm12(self.civecs[-1], st)
            rdm1_row.append(r1)
            rdm2_row.append(r2)
        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        self.civecs = [self.civecs[i] for i in keep_ids]
