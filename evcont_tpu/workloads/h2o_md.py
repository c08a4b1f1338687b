"""H2O MD continuation workload (Figs. 3/7/8).

Reference parity: scripts/MD/H2O/md_H2O_6_31G_FCI.py and the
continuation variants — on-the-fly active learning driving a 300-step
velocity-Verlet trajectory (dt = 5 a.u.), followed by per-frame accuracy
evaluation against the exact solver for growing training-set prefixes
(evaluate_accuracy_*.py). Artifacts follow the converge_EVCont_MD schema.
"""

import argparse
import os

import numpy as np

from ..backends.fci_backend import FCIBackend
from ..learn.active import converge_EVCont_MD
from ..model import ContinuationModel
from .common import water, exact_fci_energy


def main(basis="sto-3g", steps=300, dt=5.0, convergence_thresh=1e-3,
         data_addition="farthest_point_ham", workdir=".",
         evaluate_accuracy=True, n_eval_frames=10,
         backend_type="fci", ncas=8, nelecas=4):
    """backend_type="casci" with basis="cc-pvdz" / "cc-pvtz" reproduces the
    reference's md_H2O_vdz_CAS_continuation.py /
    md_H2O_vtz_CAS_continuation.py configuration (CAS with ncas=8 active
    orbitals, 4 active electrons, cross-geometry t-RDMs via the
    nonorthogonal Wick kernel). The vtz RHF anchor (-76.057168) is pinned
    in tests/test_integrals.py."""
    os.makedirs(workdir, exist_ok=True)
    mol = water(basis=basis)
    if backend_type == "casci":
        from ..backends.casci_backend import CASCIBackend
        backend = CASCIBackend(ncas=ncas, nelecas=nelecas)
        evaluate_accuracy = False  # FCI oracle not applicable
    elif backend_type == "dmrg":
        from ..backends.dmrg_backend import DMRGBackend
        backend = DMRGBackend()
    else:
        backend = FCIBackend()
    trajectory = converge_EVCont_MD(
        backend, mol, steps=steps, dt=dt,
        convergence_thresh=convergence_thresh,
        data_addition=data_addition, workdir=workdir)

    if evaluate_accuracy:
        # accuracy vs exact FCI for growing training prefixes
        # (reference: evaluate_accuracy_6_31G.py:52-74)
        frames = trajectory[:: max(1, len(trajectory) // n_eval_frames)]
        exact = np.array([
            exact_fci_energy(mol.set_geom(f))[0] for f in frames])
        errs = []
        for ntrn in range(1, backend.ntrain + 1):
            sub = np.ix_(range(ntrn), range(ntrn))
            m = ContinuationModel(mol, backend.overlap[sub],
                                  backend.one_rdm[sub],
                                  backend.two_rdm[sub])
            pred = np.array([float(m.potential(f)) for f in frames])
            errs.append(np.abs(pred - exact))
        errs = np.array(errs)
        np.savetxt(os.path.join(workdir, "accuracy_vs_training_size.txt"),
                   errs)
        print("max |E_cont - E_FCI| by training size:",
              errs.max(axis=1))
    return backend, trajectory


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--basis", default="sto-3g")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--dt", type=float, default=5.0)
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--no-accuracy", action="store_true")
    ap.add_argument("--backend", default="fci",
                    choices=["fci", "casci", "dmrg"])
    ap.add_argument("--ncas", type=int, default=8)
    ap.add_argument("--nelecas", type=int, default=4)
    args = ap.parse_args()
    main(basis=args.basis, steps=args.steps, dt=args.dt,
         workdir=args.workdir, evaluate_accuracy=not args.no_accuracy,
         backend_type=args.backend, ncas=args.ncas, nelecas=args.nelecas)
