"""H30 chain on-the-fly active-learning MD from in-framework device DMRG.

Reference parity: scripts/MD/H30/md_H30_evcont_from_DMRG.py — the H30
flagship is converge_EVCont_MD on a DMRG_EVCont_obj (300 steps, dt = 5,
data_addition="farthest_point_ham", no pruning), with restart from saved
overlap/one_rdm/two_rdm.npy + trn_times.txt (:72-97). The fixed
training-distance mode in workloads/h30_md.py covers the restart/ingest
half; this module is the on-the-fly half, with training states solved by
the framework's own DMRG.

TPU-native layout: everything runs in ONE process on the accelerator —
the DMRG two-site sweeps (solvers/dmrg_jax), the cached-environment cross
t-RDM sweeps (solvers/dmrg_trdm_device), the MD scans, and the batched
re-prediction (learn/active.py). The store is kept pair+exchange
compressed. The backend pickles its full training state (MPS tensors
included) after every append so a crashed multi-hour run resumes without
re-solving any DMRG state.
"""

import argparse
import os
import pickle
import time

import numpy as np

from ..backends.dmrg_backend import DMRGBackend
from ..learn.active import converge_EVCont_MD
from .common import h_chain


class PersistentDMRGBackend(DMRGBackend):
    """DMRGBackend that checkpoints its snapshot after every append (the
    in-process analog of backends/host_worker.py's persist-on-append)."""

    def __init__(self, state_pkl, **kwargs):
        super().__init__(**kwargs)
        self._state_pkl = state_pkl

    def _persist(self):
        tmp = self._state_pkl + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(self.snapshot(), fh, protocol=4)
        os.replace(tmp, self._state_pkl)

    def append_to_rdms(self, mol):
        t0 = time.time()
        super().append_to_rdms(mol)
        self._persist()
        print(f"[h30-al] state {self.ntrain - 1}: E = {self.ens[-1]:.6f} "
              f"Ha ({time.time() - t0:.0f} s)", flush=True)

    def prune_datapoints(self, keep_ids):
        super().prune_datapoints(keep_ids)
        self._persist()


def run(workdir="artifacts_h30_AL", n_atoms=30, basis="sto-6g", d0=1.9,
        steps=300, dt=5.0, bond_dims=(16, 24, 32), device=True,
        convergence_thresh=1.0e-3, max_iterations=40):
    os.makedirs(workdir, exist_ok=True)
    mol = h_chain(n_atoms, d0, basis=basis)
    state_pkl = os.path.join(workdir, "solver_state.pkl")

    backend = PersistentDMRGBackend(
        state_pkl, bond_dims=bond_dims, trdm_method="mps", device=device,
        compress=True, workdir=os.path.join(workdir, "dmrg"))

    trn_times = None
    tt_path = os.path.join(workdir, "trn_times.txt")
    if os.path.exists(tt_path):
        trn_times = np.loadtxt(tt_path).astype(int).reshape(-1).tolist()
    if os.path.exists(state_pkl):
        with open(state_pkl, "rb") as fh:
            backend.restore(pickle.load(fh))
        print(f"[h30-al] resumed {backend.ntrain} training states",
              flush=True)
        if trn_times and backend.ntrain > len(trn_times):
            # crash between append (snapshotted) and save_state: drop the
            # extra state(s) so backend and trn_times line up again
            backend.prune_datapoints(list(range(len(trn_times))))

    t0 = time.time()
    traj = converge_EVCont_MD(
        backend, mol, steps=steps, dt=dt,
        convergence_thresh=convergence_thresh,
        data_addition="farthest_point_ham",
        max_iterations=max_iterations, workdir=workdir,
        trn_times=trn_times)
    print("[h30-al] converged: ntrain =", backend.ntrain,
          "wall =", round(time.time() - t0, 1), "s", flush=True)
    return traj


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="artifacts_h30_AL")
    p.add_argument("--n-atoms", type=int, default=30)
    p.add_argument("--basis", default="sto-6g")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--dt", type=float, default=5.0)
    p.add_argument("--bond-dims", type=int, nargs="+", default=[16, 24, 32])
    p.add_argument("--thresh", type=float, default=1e-3)
    p.add_argument("--max-iterations", type=int, default=40)
    p.add_argument("--host", action="store_true",
                   help="host-numpy DMRG sweeps instead of the device path")
    a = p.parse_args()
    run(workdir=a.workdir, n_atoms=a.n_atoms, basis=a.basis, steps=a.steps,
        dt=a.dt, bond_dims=tuple(a.bond_dims), device=not a.host,
        convergence_thresh=a.thresh, max_iterations=a.max_iterations)


if __name__ == "__main__":
    main()
