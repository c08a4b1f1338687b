"""H6 PES continuation workload (Fig. 1 of the companion manuscript).

Reference parity: scripts/PES_H_chain/H6_PES/H6_continuation.py — FCI
training at d in {1.0, 1.8, 2.6} Bohr, PES prediction over 50 points in
[0.8, 3.0], exact-FCI and HF reference surfaces, with the same output
files (GS_dist_*.txt, en_dist_*.txt, predicted_surface_N_datapoints.txt,
continuation_gs_N_datapoints.txt, exact_surface.txt, HF_surface.txt).

TPU divergence: the 50-point PES prediction is one batched device call
per training stage instead of a per-point Python loop.
"""

import argparse
import os

import numpy as np

from ..backends.fci_backend import FCIBackend
from ..model import ContinuationModel
from ..solvers.scf import rhf_from_engine
from ..integrals.engine import IntegralEngine
from .common import h_chain, exact_fci_energy


def main(n_atoms=6, basis="sto-6g", train_dists=(1.0, 1.8, 2.6),
         n_test=50, test_range=(0.8, 3.0), workdir=".",
         with_references=True):
    os.makedirs(workdir, exist_ok=True)
    backend = FCIBackend()
    test_dists = np.linspace(*test_range, n_test)
    test_batch = np.stack([np.asarray(h_chain(n_atoms, d).coords)
                           for d in test_dists])

    for i, trn_dist in enumerate(train_dists):
        mol = h_chain(n_atoms, trn_dist, basis=basis)
        backend.append_to_rdms(mol)

        np.savetxt(os.path.join(workdir, f"GS_dist_{trn_dist}.txt"),
                   backend.fcivecs[-1].flatten())
        np.savetxt(os.path.join(workdir, f"en_dist_{trn_dist}.txt"),
                   np.atleast_1d(backend.ens[-1]))

        model = ContinuationModel.from_backend(mol, backend)
        ens = np.array(model.potential_batch(test_batch))
        with open(os.path.join(
                workdir, f"predicted_surface_{i + 1}_datapoints.txt"),
                "w") as fl:
            for d, en in zip(test_dists, ens):
                fl.write(f"{d}  {en}\n")

        _, c = model.multistate(h_chain(n_atoms, 2.2).coords, nroots=1)
        np.savetxt(os.path.join(
            workdir, f"continuation_gs_{i + 1}_datapoints.txt"),
            np.array(c)[0])

    if with_references:
        with open(os.path.join(workdir, "exact_surface.txt"), "w") as fe, \
                open(os.path.join(workdir, "HF_surface.txt"), "w") as fh:
            for d in test_dists:
                mol = h_chain(n_atoms, d, basis=basis)
                e_fci, _ = exact_fci_energy(mol)
                fe.write(f"{d}  {e_fci}\n")
                res = rhf_from_engine(IntegralEngine(mol))
                fh.write(f"{d}  {res.e_tot}\n")

    return backend


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-atoms", type=int, default=6)
    ap.add_argument("--basis", default="sto-6g")
    ap.add_argument("--n-test", type=int, default=50)
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--no-references", action="store_true")
    args = ap.parse_args()
    main(n_atoms=args.n_atoms, basis=args.basis, n_test=args.n_test,
         workdir=args.workdir, with_references=not args.no_references)
