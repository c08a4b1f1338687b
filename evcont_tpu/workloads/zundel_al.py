"""Zundel-cation on-the-fly active-learning MD at the reference
configuration.

Reference parity: scripts/MD/H2O-H3O+/md_H2O-H3O+_continuation_DMRG.py
(converge_EVCont_MD on the H5O2+ cation, 1000 steps, dt = 5 a.u.,
6-31G, charge +1, training states appended on the fly) — the flagship
on-the-fly workload, complementing the offline five-stage pipeline
(zundel_production.py).

TPU-native layout: MD, trajectory re-prediction and data selection run
jitted on the accelerator in f32 over the orthonormalized store; the
CAS(8o,4e) training solves run in a persistent CPU-f64 worker process
(backends/host_worker.py — the in-process form of the reference's
MPI/job-array split). The worker checkpoints its full wavefunction state
after every append, so the multi-hour run resumes from any crash:
  * solver_state.pkl present -> resume directly;
  * only the store artifacts present (overlap/one_rdm/two_rdm.npy,
    trn_times.txt; e.g. a run from before worker snapshots existed) ->
    replay the training geometries through the solver once;
  * otherwise start fresh.
"""

import argparse
import os
import time

import numpy as np

from ..backends.host_worker import HostWorkerBackend
from ..learn.active import converge_EVCont_MD
from .common import zundel


def reconstruct_training_geometries(init_mol, workdir, trn_times):
    """Training geometries from the stored per-iteration trajectories
    (reference: MD_utils.py:343-349)."""
    geoms = [np.asarray(init_mol.coords)]
    for k in range(1, len(trn_times)):
        prev = np.load(os.path.join(workdir, f"traj_EVCont_{k - 1}.npy"))
        geoms.append(prev[trn_times[k]])
    return geoms


def run(workdir="artifacts_zundel_AL", basis="6-31g", ncas=8, nelecas=4,
        steps=1000, dt=5.0, convergence_thresh=1e-3, max_iterations=60):
    os.makedirs(workdir, exist_ok=True)
    mol = zundel(basis=basis)
    t0 = time.time()

    factory = "evcont_tpu.backends.casci_backend:CASCIBackend"
    kwargs = {"ncas": ncas, "nelecas": nelecas, "compress": True}
    have_snapshot = os.path.exists(os.path.join(workdir, "solver_state.pkl"))
    tt_path = os.path.join(workdir, "trn_times.txt")
    trn_times = None
    if os.path.exists(tt_path):
        trn_times = np.loadtxt(tt_path).astype(int).reshape(-1).tolist()

    with HostWorkerBackend(factory, kwargs=kwargs, workdir=workdir,
                           compress=True,
                           resume=have_snapshot) as backend:
        if trn_times and not have_snapshot:
            # legacy checkpoint: replay the training geometries once; the
            # worker snapshots after every append, so this is a one-time
            # cost
            print(f"replaying {len(trn_times)} training geometries",
                  flush=True)
            for k, g in enumerate(reconstruct_training_geometries(
                    mol, workdir, trn_times)):
                backend.append_to_rdms(mol.set_geom(g))
                print(f"  replayed {k + 1}/{len(trn_times)} "
                      f"({time.time() - t0:.0f} s)", flush=True)
        if trn_times and have_snapshot and backend.ntrain > len(trn_times):
            # crash between append (snapshotted) and save_state: drop the
            # extra state(s) so backend and trn_times line up again
            backend.prune_datapoints(list(range(len(trn_times))))
        traj = converge_EVCont_MD(
            backend, mol, steps=steps, dt=dt,
            convergence_thresh=convergence_thresh,
            data_addition="farthest_point_ham",
            max_iterations=max_iterations, workdir=workdir,
            trn_times=trn_times)
        print("converged: ntrain =", backend.ntrain,
              "wall =", round(time.time() - t0, 1), "s", flush=True)
    return traj


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="artifacts_zundel_AL")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--dt", type=float, default=5.0)
    p.add_argument("--max-iterations", type=int, default=60)
    p.add_argument("--thresh", type=float, default=1e-3)
    a = p.parse_args()
    run(workdir=a.workdir, steps=a.steps, dt=a.dt,
        convergence_thresh=a.thresh, max_iterations=a.max_iterations)


if __name__ == "__main__":
    main()
