"""H6 excited-state continuation workload.

Reference parity: scripts/PES_H_chain/H6_PES_excited/
H6_continuation_excited.py — multistate continuation trained on ground
state, first excited state, or both (roots_train in {[0], [1], [0,1]}),
predicting up to 6 roots across the PES, against a many-root FCI
reference. Output files: predicted_surface_multistate_{tag}_{i}.txt and
exact_surface_multistate.txt (root energies per test distance).
"""

import argparse
import os

import numpy as np

from ..backends.fci_backend import FCIBackend
from ..model import ContinuationModel
from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.fci import FCISolver
from .common import h_chain


def main(n_atoms=6, basis="sto-6g", train_dists=(1.0, 1.8, 2.6),
         roots_train_l=([0], [1], [0, 1]), nroots_predict=6,
         nroots_reference=20, n_test=25, test_range=(0.8, 3.0),
         workdir="."):
    os.makedirs(workdir, exist_ok=True)
    test_dists = np.linspace(*test_range, n_test)
    test_batch = np.stack([np.asarray(h_chain(n_atoms, d).coords)
                           for d in test_dists])

    for roots_train in roots_train_l:
        tag = "_".join(map(str, roots_train))
        backend = FCIBackend(nroots=max(roots_train) + 1,
                             roots_train=roots_train)
        for trn_dist in train_dists:
            backend.append_to_rdms(h_chain(n_atoms, trn_dist, basis=basis))

        model = ContinuationModel.from_backend(
            h_chain(n_atoms, train_dists[0], basis=basis), backend)
        npred = min(nroots_predict, backend.ntrain)
        with open(os.path.join(
                workdir, f"predicted_surface_multistate_{tag}.txt"),
                "w") as fl:
            for d, coords in zip(test_dists, test_batch):
                ens, _ = model.multistate(coords, nroots=npred)
                fl.write(" ".join(
                    [f"{d}"] + [f"{e}" for e in np.array(ens)]) + "\n")

    # many-root FCI reference
    with open(os.path.join(workdir, "exact_surface_multistate.txt"),
              "w") as fl:
        for d in test_dists:
            mol = h_chain(n_atoms, d, basis=basis)
            eng = IntegralEngine(mol)
            b = eng.compute_jit(np.asarray(mol.coords))
            trafo = np.array(loewdin_trafo(b.ovlp))
            h1, h2 = transform_integrals(np.array(b.hcore),
                                         np.array(b.eri), trafo)
            es, _ = FCISolver(eng.nao, mol.nelec).kernel(
                np.array(h1), np.array(h2), nroots=nroots_reference)
            enuc = float(b.enuc)
            fl.write(" ".join([f"{d}"] + [f"{e + enuc}" for e in es]) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-atoms", type=int, default=6)
    ap.add_argument("--n-test", type=int, default=25)
    ap.add_argument("--nroots-reference", type=int, default=20)
    ap.add_argument("--workdir", default=".")
    args = ap.parse_args()
    main(n_atoms=args.n_atoms, n_test=args.n_test,
         nroots_reference=args.nroots_reference, workdir=args.workdir)
