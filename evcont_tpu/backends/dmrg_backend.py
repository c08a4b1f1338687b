"""In-framework DMRG training-state backend.

Reference parity: DMRG_EVCont_obj with the default OAO-basis strategy
(evcont/DMRG_EVCont.py:17-87, 431-496) — one DMRG solve per geometry in
the Löwdin basis, pairwise t-RDMs between the stored states.

This backend uses the framework's own MPS-DMRG (solvers/dmrg.py):
Jordan-Wigner MPO compilation and two-site sweeps over the reference's
bond-dimension ladder with the converge_dmrg schedule (noise decay 4^-i,
per-rung DMRG_result_{tag}.txt logging, MPS restart) when a workdir is
set. Two t-RDM evaluation modes:
  * trdm_method="dense" (default): extract the particle-number-resolved
    CI matrix from the converged MPS, so t-RDMs reduce to the same
    orthonormal CI algebra as the FCI backend (fast; ~12-orbital cap).
  * trdm_method="mps": MPS-native cross expectations
    (mps_overlap / mps_transition_rdm12) via the batched cached-
    environment sweep — no orbital cap (H30-scale t-RDMs in seconds);
    production block2 data can also enter through the external-solver
    file interface (backends/trdm_ingest.py).
"""

import numpy as np

from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.dmrg import (build_hamiltonian_mpo, converge_dmrg,
                            dmrg_ground_state, mps_overlap, mps_to_ci,
                            mps_transition_rdm12)
from ..solvers.fci import FCISolver
from .base import EVContBackend


def reference_ladder(max_bond_dim=256):
    """The reference's bond-dimension ladder round(1.8^(6..15)), capped:
    34, 61, 110, 198, 357, ... (converge_dmrg.py:15)."""
    full = np.round(1.8 ** np.arange(6, 16)).astype(int)
    capped = [int(d) for d in full if d <= max_bond_dim]
    return tuple(capped or [int(full[0])])


class DMRGBackend(EVContBackend):
    def __init__(self, bond_dims=None, sweeps_per_dim=2,
                 penalty=8.0, trdm_method="dense", max_bond_dim=256,
                 workdir=None, tolerance=1.0e-4, device=False,
                 compress=False):
        """
        Args:
            bond_dims: bond-dimension ladder; defaults to the reference's
                round(1.8^k) ladder (converge_dmrg.py:15) capped at
                max_bond_dim.
            sweeps_per_dim: sweeps at each rung (workdir=None quick path).
            penalty: particle-number/Sz sector penalty strength.
            trdm_method: "dense" | "mps" (see module docstring).
            workdir: when set, solves through the schedule-parity
                converge_dmrg driver — per-rung noise decay, result
                logging, MPS save/restart under this directory.
            tolerance: converge_dmrg energy tolerance.
            device: route the sweeps through the jitted static-shape
                two-site kernel (solvers/dmrg_jax) AND the cross t-RDM
                extraction through the device cached-environment sweep
                (solvers/dmrg_trdm_device) so all solver FLOPs run on
                the accelerator (H30 scale: ~12 s/pair on one v5e chip
                vs ~200 s host numpy).
            compress: maintain the store in the fully compressed pair +
                exchange layouts (see EVContBackend).
        """
        super().__init__(compress=compress)
        self.bond_dims = tuple(bond_dims) if bond_dims is not None \
            else reference_ladder(max_bond_dim)
        self.sweeps_per_dim = sweeps_per_dim
        self.penalty = penalty
        assert trdm_method in ("dense", "mps")
        self.trdm_method = trdm_method
        self.workdir = workdir
        self.tolerance = tolerance
        self.device = device
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

        if self.workdir is not None:
            # schedule-parity path: noise decay, per-rung logging, restart
            tag = f"state_{len(self.ens)}"
            mps, e = converge_dmrg(
                h1, h2, (na, nb), tag,
                bond_dim_schedule=np.array(list(self.bond_dims)
                                           + [self.bond_dims[-1]]),
                tolerance=self.tolerance, restart_tag=tag,
                workdir=self.workdir, penalty=self.penalty,
                device=self.device)
        else:
            if self.device:
                from ..solvers.dmrg_jax import dmrg_ground_state_device
                e, mps = dmrg_ground_state_device(
                    h1, h2, (na, nb), bond_dims=self.bond_dims,
                    sweeps_per_dim=self.sweeps_per_dim,
                    penalty=self.penalty)
            else:
                from ..solvers.dmrg import build_hamiltonian_mpo_fast
                W = build_hamiltonian_mpo_fast(
                    h1, h2, cutoff=1e-12 if norb <= 10 else 1e-9)
                e, mps = dmrg_ground_state(
                    W, 2 * norb, na + nb, sz=0.5 * (na - nb),
                    bond_dims=self.bond_dims,
                    sweeps_per_dim=self.sweeps_per_dim,
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
            trdm = "sweep-device" if self.device else "auto"
            for st in self.mps_states:
                ovlp_row.append(mps_overlap(self.mps_states[-1], st))
                r1, r2 = mps_transition_rdm12(self.mps_states[-1], st,
                                              norb, method=trdm)
                rdm1_row.append(r1)
                rdm2_row.append(r2)
        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        if self.trdm_method == "dense":
            self.civecs = [self.civecs[i] for i in keep_ids]
        else:
            self.mps_states = [self.mps_states[i] for i in keep_ids]
