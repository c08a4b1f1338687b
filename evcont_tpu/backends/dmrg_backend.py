"""In-framework DMRG training-state backend.

Reference parity: DMRG_EVCont_obj with the default OAO-basis strategy
(evcont/DMRG_EVCont.py:17-87, 431-496) — one DMRG solve per geometry in
the Löwdin basis, pairwise t-RDMs between the stored states.

This backend uses the framework's own MPS-DMRG (solvers/dmrg.py):
Jordan-Wigner MPO compilation and two-site sweeps over the reference's
bond-dimension ladder (converge_dmrg.py:15). Two t-RDM evaluation modes:
  * trdm_method="dense" (default): extract the particle-number-resolved
    CI matrix from the converged MPS, so t-RDMs reduce to the same
    orthonormal CI algebra as the FCI backend (fast; ~12-orbital cap).
  * trdm_method="mps": MPS-native cross expectations
    (mps_overlap / mps_transition_rdm12) — no orbital cap, exact, but the
    unoptimized O(norb^4) full-chain contraction makes large systems slow
    until the cached-environment sweeps land; production-scale DMRG data
    can also enter through the external-solver file interface
    (backends/trdm_ingest.py).
"""

import numpy as np

from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.dmrg import (build_hamiltonian_mpo, dmrg_ground_state,
                            mps_overlap, mps_to_ci, mps_transition_rdm12)
from ..solvers.fci import FCISolver
from .base import EVContBackend


class DMRGBackend(EVContBackend):
    def __init__(self, bond_dims=(16, 32, 64), sweeps_per_dim=2,
                 penalty=8.0, trdm_method="dense"):
        """
        Args:
            bond_dims: bond-dimension ladder (the reference's default is
                ceil(1.8^k), converge_dmrg.py:15; config.DMRGScheduleConfig
                generates it).
            sweeps_per_dim: sweeps at each rung.
            penalty: particle-number/Sz sector penalty strength.
            trdm_method: "dense" | "mps" (see module docstring).
        """
        super().__init__()
        self.bond_dims = tuple(bond_dims)
        self.sweeps_per_dim = sweeps_per_dim
        self.penalty = penalty
        assert trdm_method in ("dense", "mps")
        self.trdm_method = trdm_method
        self.civecs = []
        self.mps_states = []
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
        self.ens.append(e + float(bundle.enuc))
        self.mol_index.append(
            0 if not self.mol_index else max(self.mol_index) + 1)

        ovlp_row, rdm1_row, rdm2_row = [], [], []
        if self.trdm_method == "dense":
            ci = mps_to_ci(mps, norb, (na, nb))
            ci = ci / np.linalg.norm(ci)
            if self._solver is None:
                self._solver = FCISolver(norb, (na, nb), spin=None)
            self.civecs.append(ci)
            for st in self.civecs:
                ovlp_row.append(np.vdot(self.civecs[-1], st))
                r1, r2 = self._solver.trans_rdm12(self.civecs[-1], st)
                rdm1_row.append(r1)
                rdm2_row.append(r2)
        else:
            # normalize the MPS (first tensor carries the norm after the
            # final sweep)
            nrm = np.sqrt(mps_overlap(mps, mps))
            mps = [t.copy() for t in mps]
            mps[0] = mps[0] / nrm
            self.mps_states.append(mps)
            for st in self.mps_states:
                ovlp_row.append(mps_overlap(self.mps_states[-1], st))
                r1, r2 = mps_transition_rdm12(self.mps_states[-1], st,
                                              norb)
                rdm1_row.append(r1)
                rdm2_row.append(r2)
        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        if self.trdm_method == "dense":
            self.civecs = [self.civecs[i] for i in keep_ids]
        else:
            self.mps_states = [self.mps_states[i] for i in keep_ids]
