"""In-framework DMRG training-state backend.

Reference parity: DMRG_EVCont_obj (evcont/DMRG_EVCont.py:431-496) with
all three append strategies:
  * "oao" (default, DMRG_EVCont.py:17-87) — one DMRG solve per geometry
    in the shared Löwdin basis, pairwise t-RDMs between stored states;
  * "rerun" (DMRG_EVCont.py:90-272) — solve each geometry in its own
    computational basis (split/canonical, Fiedler-reordered) and re-run
    DMRG per cross term with the ket Hamiltonian rotated into the
    bra-aligned frame;
  * "orbital_rotation" (DMRG_EVCont.py:275-428) — like "rerun" but the
    stored ket MPS is ROTATED into the bra-aligned frame instead of
    re-solved (no extra DMRG solves per cross term). The reference built
    this on imaginary-time MPO evolution and records that it "never
    really worked well" (MPS_orb_rotation.py:98-101); here it uses the
    exact adjacent-orbital Givens-gate circuit
    (solvers/mps_rotation.py), which is exact up to SVD truncation.

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
                            mps_transition_rdm12,
                            mps_transition_rdm12_multi)
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
                 compress=False, append_strategy="oao", cibasis="split",
                 reorder_orbitals=True, rotation_bond_dim=None):
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
            append_strategy: "oao" (default; one DMRG solve per geometry
                in the shared Löwdin basis, DMRG_EVCont.py:17-87) or
                "rerun" (solve in a geometry-local computational basis and
                re-run DMRG for every cross term with the ket Hamiltonian
                rotated into the bra-aligned frame,
                DMRG_EVCont.py:90-272). "rerun" trades O(ntrain) extra
                DMRG solves per append for a better-conditioned local
                basis at each geometry. "orbital_rotation"
                (DMRG_EVCont.py:275-428) keeps the local bases but
                Givens-rotates the stored ket MPSes into the bra frame
                instead of re-solving — no extra DMRG solves, at the
                cost of rotation-induced bond growth (capped by
                rotation_bond_dim).
            cibasis: computational basis for the rerun/orbital_rotation
                strategies ("split" is the reference's default, or
                "canonical"/"OAO").
            reorder_orbitals: Fiedler-reorder the computational basis for
                the rerun/orbital_rotation strategies (block2's
                orbital_reordering, DMRG_EVCont.py:121-124).
            rotation_bond_dim: staircase bond-dimension cap for the
                orbital_rotation strategy (default 2 * max(bond_dims)).
        """
        super().__init__(compress=compress)
        self.bond_dims = tuple(bond_dims) if bond_dims is not None \
            else reference_ladder(max_bond_dim)
        self.sweeps_per_dim = sweeps_per_dim
        self.penalty = penalty
        assert trdm_method in ("dense", "mps")
        self.trdm_method = trdm_method
        assert append_strategy in ("oao", "rerun", "orbital_rotation")
        self.append_strategy = append_strategy
        self.rotation_bond_dim = rotation_bond_dim
        self.cibasis = cibasis
        self.reorder_orbitals = reorder_orbitals
        self.workdir = workdir
        self.tolerance = tolerance
        self.device = device
        self.civecs = []
        self.mps_states = []
        self.rerun_states = []
        self._solver = None
        self._engine_cache = {}

    def _engine(self, mol):
        key = (mol.symbols, mol.basis, mol.charge, mol.spin)
        if key not in self._engine_cache:
            self._engine_cache[key] = IntegralEngine(mol)
        return self._engine_cache[key]

    def _solve(self, h1, h2, nelec, tag):
        """One DMRG ground-state solve through whichever driver the
        backend is configured for; returns (energy, normalized mps)."""
        na, nb = nelec
        norb = h1.shape[0]
        if self.workdir is not None:
            # schedule-parity path: noise decay, per-rung logging, restart
            mps, e = converge_dmrg(
                h1, h2, (na, nb), tag,
                bond_dim_schedule=np.array(list(self.bond_dims)
                                           + [self.bond_dims[-1]]),
                tolerance=self.tolerance, restart_tag=tag,
                workdir=self.workdir, penalty=self.penalty,
                device=self.device)
        elif self.device:
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
        return e, mps

    def append_to_rdms(self, mol):
        engine = self._engine(mol)
        bundle = engine.compute_jit(np.asarray(mol.coords))
        if self.append_strategy in ("rerun", "orbital_rotation"):
            return self._append_rerun(mol, engine, bundle)
        trafo = np.array(loewdin_trafo(bundle.ovlp))
        h1, h2 = transform_integrals(
            np.array(bundle.hcore), np.array(bundle.eri), trafo)
        h1, h2 = np.array(h1), np.array(h2)
        norb = engine.nao
        na, nb = mol.nelec

        e, mps = self._solve(h1, h2, (na, nb), f"state_{len(self.ens)}")
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
            if self.device:
                # batched multi-ket sweep: one jitted site step serves
                # every stored state (amortizes per-pair dispatch + fills
                # the MXU with the whole training set's transfers)
                rdms = mps_transition_rdm12_multi(
                    self.mps_states[-1], self.mps_states, norb,
                    method="sweep-device")
            else:
                rdms = [mps_transition_rdm12(self.mps_states[-1], st,
                                             norb, method="auto")
                        for st in self.mps_states]
            for r1, r2 in rdms:
                rdm1_row.append(r1)
                rdm2_row.append(r2)
        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def _append_rerun(self, mol, engine, bundle):
        """Rerun / orbital-rotation append strategies (reference:
        DMRG_EVCont.py:90-272 / :275-428).

        The new (bra) state is solved in its own computational basis
        (`cibasis`, Fiedler-reordered when `reorder_orbitals`). For every
        stored ket, bra and ket are brought into one orbital index space:
        "rerun" re-solves the ket Hamiltonian in the bra-aligned frame;
        "orbital_rotation" Givens-rotates the stored ket MPS into it
        (solvers/mps_rotation.py — exact up to SVD truncation, no extra
        DMRG solves). Cross t-RDMs are then plain MPS expectations,
        rotated to the shared OAO store basis through the bra's
        computational->OAO map. Matches the reference's
        enforce_symmetric=True default (the (i, -1) terms are the
        conjugates of (-1, i), DMRG_EVCont.py:210-214)."""
        from ..solvers.localization import (fiedler_orbital_reordering,
                                            get_basis)

        norb = engine.nao
        nelec = tuple(mol.nelec)
        hcore, eri = np.array(bundle.hcore), np.array(bundle.eri)
        S_bra = np.array(bundle.ovlp)

        basis = np.array(get_basis(engine, mol.coords, self.cibasis))
        if self.reorder_orbitals:
            h1, h2 = transform_integrals(hcore, eri, basis)
            perm = fiedler_orbital_reordering(np.array(h1), np.array(h2))
            basis = basis[:, perm]
        h1, h2 = transform_integrals(hcore, eri, basis)
        h1, h2 = np.array(h1), np.array(h2)

        n_new = len(self.ens)
        e, mps_bra = self._solve(h1, h2, nelec, f"state_{n_new}")
        nrm = np.sqrt(mps_overlap(mps_bra, mps_bra))
        mps_bra = [t.copy() for t in mps_bra]
        mps_bra[0] = mps_bra[0] / nrm
        self.ens.append(e + float(bundle.enuc))
        self.mol_index.append(
            0 if not self.mol_index else max(self.mol_index) + 1)

        # computational -> OAO map of the bra (reference's
        # computational_to_OAO_bra, DMRG_EVCont.py:166-168)
        oao_bra = np.array(loewdin_trafo(S_bra))
        c2O_bra = oao_bra.T @ S_bra @ basis
        self.rerun_states.append(dict(
            coords=np.array(mol.coords, dtype=np.float64), nelec=nelec,
            basis=basis, c2O=c2O_bra, mps=mps_bra))

        ovlp_row, rdm1_row, rdm2_row = [], [], []
        n = len(self.rerun_states)
        t_kets = []
        for i, rec in enumerate(self.rerun_states):
            if i == n - 1:
                t_ket = mps_bra
            elif self.append_strategy == "orbital_rotation":
                # exact Givens-gate rotation of the stored ket into the
                # bra-aligned frame (reference: orbital_rotation_mps,
                # MPS_orb_rotation.py:30-81, rebuilt sound)
                from ..solvers.mps_rotation import rotate_orbitals_mps
                U = rec["c2O"].T @ c2O_bra      # (comp_ket, comp_bra)
                cap = self.rotation_bond_dim or 2 * max(self.bond_dims)
                t_ket, _ = rotate_orbitals_mps(rec["mps"], U, m=cap)
            else:
                # rotation taking the ket's computational basis into the
                # bra-aligned frame (DMRG_EVCont.py:170-176)
                U = rec["c2O"].T @ c2O_bra      # (comp_ket, comp_bra)
                bket = engine.compute_jit(rec["coords"])
                h1k, h2k = transform_integrals(
                    np.array(bket.hcore), np.array(bket.eri),
                    rec["basis"] @ U)
                _, t_ket = self._solve(np.array(h1k), np.array(h2k),
                                       rec["nelec"], f"state_{n - 1}_{i}")
                nrm = np.sqrt(mps_overlap(t_ket, t_ket))
                t_ket = [t.copy() for t in t_ket]
                t_ket[0] = t_ket[0] / nrm
            t_kets.append(t_ket)

        signs = []
        for i, t_ket in enumerate(t_kets):
            ovlp = mps_overlap(mps_bra, t_ket)
            # each RE-SOLVE returns |i> with arbitrary global sign; pin it
            # by the positive-overlap convention (ground states at nearby
            # geometries overlap positively, so the true Gram matrix of a
            # ground-state training set is entrywise positive — an
            # inconsistent per-row sign is NOT a D S D gauge and would
            # corrupt the GEP). The gate rotation is deterministic (no
            # sign ambiguity), so it keeps the ket's stored sign.
            sgn = 1.0
            if self.append_strategy == "rerun" and ovlp < 0:
                sgn = -1.0
            signs.append(sgn)
            ovlp_row.append(sgn * ovlp)
        if self.device:
            rdms = mps_transition_rdm12_multi(mps_bra, t_kets, norb,
                                              method="sweep-device")
        else:
            rdms = [mps_transition_rdm12(mps_bra, t_ket, norb,
                                         method="auto")
                    for t_ket in t_kets]
        for sgn, (r1, r2) in zip(signs, rdms):
            r1, r2 = sgn * np.array(r1), sgn * np.array(r2)
            # computational -> OAO (our transform_integrals is C^T x C,
            # the reference's is C x C^T — hence the transpose;
            # DMRG_EVCont.py:205)
            r1, r2 = transform_integrals(np.array(r1), np.array(r2),
                                         c2O_bra.T)
            rdm1_row.append(np.array(r1))
            rdm2_row.append(np.array(r2))
        self._grow(ovlp_row, rdm1_row, rdm2_row)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        keep_ids = list(keep_ids)
        # only the lists the active strategy populates are prunable:
        # "oao" fills civecs (dense) or mps_states (mps), "rerun" fills
        # rerun_states — the others stay empty
        if self.rerun_states:
            self.rerun_states = [self.rerun_states[i] for i in keep_ids]
        if self.civecs:
            self.civecs = [self.civecs[i] for i in keep_ids]
        if self.mps_states:
            self.mps_states = [self.mps_states[i] for i in keep_ids]
