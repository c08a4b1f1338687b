"""H30 chain MD workload (Figs. 4/9) — continuation from ingested t-RDMs.

Reference parity: scripts/MD/H30/md_H30_evcont_from_DMRG.py — continuation
MD (300 steps, dt = 5) whose training states come from DMRG, with restart
from saved overlap/one_rdm/two_rdm.npy artifacts (:72-87) — plus the HF
baseline MD (md_H30_HF.py).

Training-data sources (all produce the same checkpoint artifact schema):
  --train-dmrg  in-framework DMRG (solvers/dmrg.py) with cached-environment
                MPS t-RDM sweeps — the full-parity path at 30 orbitals
                (role of block2 in the reference; hours of host CPU)
  --train-fci   in-process FCI for --n-atoms <= ~12 (reduced-scale test of
                the identical restart code path)
  neither       ingest externally produced overlap/one_rdm/two_rdm.npy
"""

import argparse
import os

import numpy as np

from ..backends.trdm_ingest import TRDMIngestBackend
from ..learn.checkpoints import save_state
from ..md.driver import get_trajectory
from ..model import ContinuationModel
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.scf import rhf_energy_and_gradient
from ..integrals.engine import IntegralEngine
from .common import h_chain


def train_fci_artifacts(n_atoms, basis, train_dists, workdir):
    from ..backends.fci_backend import FCIBackend
    backend = FCIBackend()
    for d in train_dists:
        backend.append_to_rdms(h_chain(n_atoms, d, basis=basis))
    save_state(workdir, backend.overlap, backend.one_rdm, backend.two_rdm,
               trn_times=list(range(backend.ntrain)))


def train_dmrg_artifacts(n_atoms, basis, train_dists, workdir,
                         bond_dims=(16, 24, 32), device=False):
    """In-framework DMRG training at H30 scale: schedule-parity driver
    (converge_dmrg) + cached-environment MPS t-RDM sweeps
    (solvers/dmrg.py:mps_transition_rdm12) — the role of block2's
    get_1pdm/get_2pdm with bra != ket in the reference
    (DMRG_EVCont.py:70-85)."""
    import time
    from ..backends.dmrg_backend import DMRGBackend
    backend = DMRGBackend(bond_dims=bond_dims, trdm_method="mps",
                          workdir=os.path.join(workdir, "dmrg"),
                          device=device)
    for d in train_dists:
        t0 = time.time()
        backend.append_to_rdms(h_chain(n_atoms, d, basis=basis))
        print(f"[h30] DMRG state d={d}: E = {backend.ens[-1]:.6f} "
              f"({time.time() - t0:.0f} s)", flush=True)
    save_state(workdir, backend.overlap, backend.one_rdm, backend.two_rdm,
               trn_times=list(range(backend.ntrain)))


def check_accuracy(n_atoms=30, basis="sto-6g", d0=1.9, workdir=".",
                   stride=1, dmrg_reference=False, bond_dims=(16, 24, 32),
                   device=False, batch=32):
    """Evaluate the PES along the converged continuation trajectory with
    every training-set prefix N = 1..Ntrn, plus (optionally) a fresh DMRG
    reference energy per frame (reference:
    md_H30_evcont_from_DMRG_check_accuracy.py:73-92 — DMRG_energies.txt /
    continued_energies.txt, one row per frame, one column per prefix)."""
    from ..backends.trdm_ingest import TRDMIngestBackend
    mol = h_chain(n_atoms, d0, basis=basis)
    backend = TRDMIngestBackend().load_state_files(workdir)
    frames = np.load(os.path.join(workdir, "traj_H30.npy"))[::stride]
    ntrain = backend.overlap.shape[0]

    cols = []
    for i in range(ntrain):
        model = ContinuationModel(
            mol, backend.overlap[: i + 1, : i + 1],
            backend.one_rdm[: i + 1, : i + 1],
            backend.two_rdm[: i + 1, : i + 1])
        ens = [np.asarray(model.potential_batch(frames[j:j + batch]))
               for j in range(0, len(frames), batch)]
        cols.append(np.concatenate(ens))
    np.savetxt(os.path.join(workdir, "continued_energies.txt"),
               np.stack(cols, axis=1))

    if dmrg_reference:
        from ..solvers.dmrg import converge_dmrg
        eng = IntegralEngine(mol)
        ladder = np.array(list(bond_dims) + [bond_dims[-1]])
        with open(os.path.join(workdir, "DMRG_energies.txt"), "w") as fl:
            for pos in frames:
                b = eng.compute_jit(np.asarray(pos))
                trafo = np.array(loewdin_trafo(b.ovlp))
                h1, h2 = transform_integrals(np.array(b.hcore),
                                             np.array(b.eri), trafo)
                _, en = converge_dmrg(
                    np.array(h1), np.array(h2), mol.nelec, "MPS",
                    bond_dim_schedule=ladder, tolerance=1e-5,
                    restart_tag="MPS", workdir=workdir, device=device)
                fl.write(f"{en + float(b.enuc)}\n")
                fl.flush()


def dmrg_reference_md(n_atoms=30, basis="sto-6g", d0=1.9, steps=300,
                      dt=5.0, workdir=".", bond_dims=(16, 24, 32),
                      device=False):
    """Pure-DMRG MD: every step solves DMRG in the OAO basis of the
    current geometry (warm-started from the previous step's MPS) and takes
    analytic forces from the generalized Hellmann-Feynman expression at
    the converged MPS RDMs (reference: md_H30_reference_DMRG_OAO.py —
    per-step converge_dmrg with restart_tag="MPS", forces via
    get_grad_elec_OAO at get_1pdm/get_2pdm of the state). Writes
    DMRG_trajectory.xyz / DMRG_energies.txt / traj_DMRG.npy."""
    from ..solvers.dmrg import (converge_dmrg, mps_overlap,
                                mps_transition_rdm12)
    from .h10_pes import _force_fn

    os.makedirs(workdir, exist_ok=True)
    mol = h_chain(n_atoms, d0, basis=basis)
    eng = IntegralEngine(mol)
    masses = mol.masses_au()
    norb = eng.nao
    ladder = np.array(list(bond_dims) + [bond_dims[-1]])
    trdm = "sweep-device" if device else "auto"

    def e_and_force(coords):
        b = eng.compute_jit(np.asarray(coords))
        trafo = np.array(loewdin_trafo(b.ovlp))
        h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri),
                                     trafo)
        mps, en = converge_dmrg(
            np.array(h1), np.array(h2), mol.nelec, "MPS",
            bond_dim_schedule=ladder, tolerance=1e-5, restart_tag="MPS",
            workdir=workdir, device=device)
        nrm = np.sqrt(float(np.real(mps_overlap(mps, mps))))
        mps = [t.copy() for t in mps]
        mps[0] = mps[0] / nrm
        r1, r2 = mps_transition_rdm12(mps, mps, norb, method=trdm)
        _, g = _force_fn(eng)(np.asarray(coords), np.real(r1),
                              np.real(r2))
        return en + float(b.enuc), -np.array(g)

    c = np.asarray(mol.coords, dtype=float)
    v = np.zeros_like(c)
    e, F = e_and_force(c)
    traj, ens = [], []
    with open(os.path.join(workdir, "DMRG_trajectory.xyz"), "w") as tf, \
            open(os.path.join(workdir, "DMRG_energies.txt"), "w") as ef:
        for step in range(steps):
            v_half = v + 0.5 * dt * F / masses[:, None]
            c = c + dt * v_half
            e, F = e_and_force(c)
            v = v_half + 0.5 * dt * F / masses[:, None]
            traj.append(c.copy())
            ens.append(e)
            tf.write(f"{n_atoms}\nstep {step}\n")
            for sym, pos in zip(mol.symbols, c):
                tf.write(f"{sym} {pos[0]:.8f} {pos[1]:.8f} {pos[2]:.8f}\n")
            ekin = 0.5 * np.sum(masses[:, None] * v ** 2)
            ef.write(f"{step}  {e + ekin}  {e}  {ekin}\n")
            tf.flush()
            ef.flush()
    np.save(os.path.join(workdir, "traj_DMRG.npy"), np.array(traj))
    return np.array(traj), np.array(ens)


def main(n_atoms=30, basis="sto-6g", d0=1.9, steps=300, dt=5.0,
         workdir=".", train_fci=False, train_dmrg=False,
         train_dists=(1.2, 1.6, 2.0, 2.4, 2.8), hf_baseline=False,
         dft_baseline=False, gap_baseline=False, bond_dims=(16, 24, 32),
         device=False):
    os.makedirs(workdir, exist_ok=True)
    mol = h_chain(n_atoms, d0, basis=basis)

    if train_fci:
        train_fci_artifacts(n_atoms, basis, train_dists, workdir)
    elif train_dmrg:
        train_dmrg_artifacts(n_atoms, basis, train_dists, workdir,
                             bond_dims=bond_dims, device=device)

    backend = TRDMIngestBackend().load_state_files(workdir)
    model = ContinuationModel(mol, backend.overlap, backend.one_rdm,
                              backend.two_rdm)
    with open(os.path.join(workdir, "traj_H30.xyz"), "w") as tf, \
            open(os.path.join(workdir, "ens_H30.xyz"), "w") as ef:
        coords, epot, ekin = get_trajectory(
            model, init_coords=mol.coords, dt=dt, steps=steps,
            trajectory_output=tf, energy_output=ef)
    np.save(os.path.join(workdir, "traj_H30.npy"), coords)

    if gap_baseline:
        # GAP/SOAP baseline trained on the continuation's own training
        # data (reference md_H30_GAP.py: GP on training-point energies
        # from the t-RDM store, then GAP-force MD), evaluated along the
        # continuation trajectory
        from ..baselines.gap import GAPModel
        trn_geoms = [np.asarray(h_chain(n_atoms, d, basis=basis).coords)
                     for d in train_dists]
        trn_ens = [float(model.potential(g)) for g in trn_geoms]
        gap = GAPModel().fit(trn_geoms, trn_ens)
        gc = np.asarray(mol.coords)
        gv = np.zeros_like(gc)
        masses = mol.masses_au()
        e, F = gap.predict_with_forces(gc)
        gap_traj, gap_ens = [], []
        for _ in range(steps):
            v_half = gv + 0.5 * dt * F / masses[:, None]
            gc = gc + dt * v_half
            e, F = gap.predict_with_forces(gc)
            gv = v_half + 0.5 * dt * F / masses[:, None]
            gap_traj.append(gc.copy())
            gap_ens.append(e)
        np.save(os.path.join(workdir, "traj_H30_GAP.npy"),
                np.array(gap_traj))
        np.savetxt(os.path.join(workdir, "ens_H30_GAP.txt"),
                   np.array(gap_ens))
        # per-frame GAP error along the continuation trajectory
        cont_ens = np.array([float(model.potential(f)) for f in
                             coords[:: max(1, steps // 20)]])
        gap_pred = np.array([gap.predict(f) for f in
                             coords[:: max(1, steps // 20)]])
        np.savetxt(os.path.join(workdir, "GAP_en_error.txt"),
                   np.stack([cont_ens, gap_pred,
                             np.abs(cont_ens - gap_pred)], axis=1))

    if dft_baseline:
        # PBE baseline MD (reference md_H30_DFT.py) with ANALYTIC forces:
        # autodiff of the KS energy at fixed OAO density incl. grid
        # response (solvers/dft_force.py)
        from ..solvers.dft_force import rks_energy_and_force
        eng = IntegralEngine(mol)
        masses = mol.masses_au()
        c = np.asarray(mol.coords)
        v = np.zeros_like(c)
        e, F, _ = rks_energy_and_force(eng, c, xc="pbe", n_rad=40,
                                       angular=26)
        dft_traj, dft_ens = [], []
        for _ in range(steps):
            v_half = v + 0.5 * dt * F / masses[:, None]
            c = c + dt * v_half
            e, F, _ = rks_energy_and_force(eng, c, xc="pbe", n_rad=40,
                                           angular=26)
            v = v_half + 0.5 * dt * F / masses[:, None]
            dft_traj.append(c.copy())
            dft_ens.append(e)
        np.save(os.path.join(workdir, "traj_H30_DFT.npy"),
                np.array(dft_traj))
        np.savetxt(os.path.join(workdir, "ens_H30_DFT.txt"),
                   np.array(dft_ens))

    if hf_baseline:
        # host-loop HF MD (reference md_H30_HF.py); analytic HF forces
        eng = IntegralEngine(mol)
        masses = mol.masses_au()
        c = np.asarray(mol.coords)
        v = np.zeros_like(c)
        _, g, _ = rhf_energy_and_gradient(eng, c)
        f = -g
        hf_traj, hf_ens = [], []
        for _ in range(steps):
            v_half = v + 0.5 * dt * f / masses[:, None]
            c = c + dt * v_half
            e, g, _ = rhf_energy_and_gradient(eng, c)
            f = -g
            v = v_half + 0.5 * dt * f / masses[:, None]
            hf_traj.append(c.copy())
            hf_ens.append(e)
        np.save(os.path.join(workdir, "traj_H30_HF.npy"),
                np.array(hf_traj))
        np.savetxt(os.path.join(workdir, "ens_H30_HF.txt"),
                   np.array(hf_ens))
    return coords, epot


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-atoms", type=int, default=30)
    ap.add_argument("--basis", default="sto-6g")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--train-fci", action="store_true",
                    help="generate training artifacts with the in-process "
                         "FCI solver (small chains only)")
    ap.add_argument("--train-dmrg", action="store_true",
                    help="generate training artifacts with the in-framework "
                         "DMRG solver (MPS t-RDM sweeps; production scale)")
    ap.add_argument("--bond-dims", type=int, nargs="+",
                    default=[16, 24, 32])
    ap.add_argument("--train-dists", type=float, nargs="+",
                    default=[1.2, 1.6, 2.0, 2.4, 2.8])
    ap.add_argument("--hf-baseline", action="store_true")
    ap.add_argument("--gap-baseline", action="store_true",
                    help="GAP/SOAP baseline trained on continuation data "
                         "(reference md_H30_GAP.py)")
    ap.add_argument("--dft-baseline", action="store_true",
                    help="PBE baseline MD with analytic autodiff forces "
                         "(reference md_H30_DFT.py)")
    ap.add_argument("--device", action="store_true",
                    help="run DMRG sweeps + t-RDM extraction on the "
                         "accelerator (solvers/dmrg_jax + dmrg_trdm_device)")
    ap.add_argument("--check-accuracy", action="store_true",
                    help="evaluate continued_energies.txt (all training "
                         "prefixes) along the stored trajectory "
                         "(md_H30_evcont_from_DMRG_check_accuracy.py)")
    ap.add_argument("--check-dmrg", action="store_true",
                    help="with --check-accuracy: also a fresh DMRG "
                         "reference energy per frame (DMRG_energies.txt)")
    ap.add_argument("--check-stride", type=int, default=1,
                    help="frame stride for --check-accuracy")
    ap.add_argument("--dmrg-reference-md", action="store_true",
                    help="pure DMRG-per-step MD with Hellmann-Feynman "
                         "forces at the MPS RDMs "
                         "(md_H30_reference_DMRG_OAO.py)")
    args = ap.parse_args()
    if args.check_accuracy:
        check_accuracy(n_atoms=args.n_atoms, basis=args.basis,
                       workdir=args.workdir, stride=args.check_stride,
                       dmrg_reference=args.check_dmrg,
                       bond_dims=tuple(args.bond_dims), device=args.device)
    elif args.dmrg_reference_md:
        dmrg_reference_md(n_atoms=args.n_atoms, basis=args.basis,
                          steps=args.steps, workdir=args.workdir,
                          bond_dims=tuple(args.bond_dims),
                          device=args.device)
    else:
        main(n_atoms=args.n_atoms, basis=args.basis, steps=args.steps,
             workdir=args.workdir, train_fci=args.train_fci,
             train_dmrg=args.train_dmrg, bond_dims=tuple(args.bond_dims),
             train_dists=tuple(args.train_dists),
             hf_baseline=args.hf_baseline, dft_baseline=args.dft_baseline,
             gap_baseline=args.gap_baseline, device=args.device)
