"""H10 3D-distorted PES + force-field workload (Fig. 2).

Reference parity: scripts/PES_H_chain/H10_PES/
H10_continuation_3D_replacements.py — training on symmetric stretches,
testing on randomly 3D-displaced geometries, comparing continuation
energies *and forces* against the exact FCI reference and an HF baseline.
Outputs: continuation_{en,force_error}.txt, HF_{en,force_error}.txt,
reference_en.txt (reference energies computed for the first --n-exact test
geometries; the FCI oracle dominates runtime).

The continuation/HF predictions for all test geometries run as device
batches; forces come from autodiff.
"""

import argparse
import os

import numpy as np

from ..backends.fci_backend import FCIBackend
from ..model import ContinuationModel
from ..integrals.engine import IntegralEngine
from ..oao import loewdin_trafo, transform_integrals
from ..solvers.fci import FCISolver
from ..solvers.scf import rhf_from_engine
from .common import h_chain


def main(n_atoms=10, basis="sto-6g", equilibrium_dist=1.78596,
         train_stretches=(0.0, 0.5, -0.5, 1.0, -1.0),
         n_test=50, n_exact=10, displacement=0.1, seed=0, workdir=".",
         batch_size=10, gap_baseline=True):
    """Reference sampling (H10_continuation_3D_replacements.py:80-146):
    training on symmetric stretches around the equilibrium spacing
    1.78596 Bohr; test geometries are the equilibrium chain with each atom
    displaced by `displacement` (the script's `radius` argv) in a uniformly
    random direction."""
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(seed)

    train_dists = [equilibrium_dist + st for st in train_stretches]
    backend = FCIBackend()
    for d in train_dists:
        backend.append_to_rdms(h_chain(n_atoms, d, basis=basis))

    base = h_chain(n_atoms, equilibrium_dist, basis=basis)
    model = ContinuationModel.from_backend(base, backend)

    # fixed-radius random spherical displacements of the equilibrium chain
    # (reference :125-146)
    eq = np.asarray(base.coords)
    tests = []
    for _ in range(n_test):
        theta = rng.random(n_atoms) * np.pi
        phi = rng.random(n_atoms) * 2 * np.pi
        disp = displacement * np.stack([
            np.sin(theta) * np.cos(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(theta)], axis=-1)
        tests.append(eq + disp)
    tests = np.stack(tests)

    # batched continuation energies + forces
    ens, forces = [], []
    for s in range(0, n_test, batch_size):
        chunk = tests[s:s + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        e, F = model.potential_and_forces_batch(chunk)
        e, F = np.array(e), np.array(F)
        if pad:
            e, F = e[:-pad], F[:-pad]
        ens.append(e)
        forces.append(F)
    ens = np.concatenate(ens)
    forces = np.concatenate(forces)
    np.savetxt(os.path.join(workdir, "continuation_en.txt"), ens)

    # HF baseline (energies; forces by finite difference would defeat the
    # point — the reference compares RHF analytic forces, provided here by
    # autodiff through the RHF energy functional is future work)
    hf_ens = []
    for c in tests:
        res = rhf_from_engine(IntegralEngine(base), coords=c)
        hf_ens.append(res.e_tot)
    np.savetxt(os.path.join(workdir, "HF_en.txt"), np.array(hf_ens))

    # exact FCI reference + force errors for the first n_exact geometries
    solver = FCISolver(n_atoms, base.nelec)
    eng = IntegralEngine(base)
    ref_ens = []
    force_err = []
    eps = 1e-4
    for c in tests[:n_exact]:
        def fci_at(coords):
            b = eng.compute_jit(coords)
            trafo = np.array(loewdin_trafo(b.ovlp))
            h1, h2 = transform_integrals(np.array(b.hcore),
                                         np.array(b.eri), trafo)
            e, _ = solver.kernel(np.array(h1), np.array(h2))
            return e + float(b.enuc)

        ref_ens.append(fci_at(c))
        # exact force along one random direction via central difference of
        # the FCI energy, compared to the continuation force
        direction = rng.standard_normal(c.shape)
        direction /= np.linalg.norm(direction)
        fplus = fci_at(c + eps * direction)
        fminus = fci_at(c - eps * direction)
        f_exact_proj = -(fplus - fminus) / (2 * eps)
        idx = len(ref_ens) - 1
        f_cont_proj = np.sum(forces[idx] * direction)
        force_err.append(abs(f_cont_proj - f_exact_proj))

    np.savetxt(os.path.join(workdir, "reference_en.txt"), np.array(ref_ens))
    np.savetxt(os.path.join(workdir, "continuation_force_error.txt"),
               np.array(force_err))

    if gap_baseline:
        # GAP/SOAP machine-learning baseline trained on the same points
        # (reference: H10_continuation_3D_replacements.py:47-118)
        from ..baselines.gap import GAPModel
        gap = GAPModel(rcut=3.5 * max(train_dists), nmax=5, sigma=0.7).fit(
            [np.asarray(h_chain(n_atoms, d).coords) for d in train_dists],
            backend.ens)
        gap_ens = np.array([gap.predict(c) for c in tests])
        np.savetxt(os.path.join(workdir, "GAP_en.txt"), gap_ens)

    en_err = np.abs(ens[:n_exact] - np.array(ref_ens))
    print(f"energy MAE vs FCI ({n_exact} pts): {en_err.mean():.3e} Ha; "
          f"projected-force MAE: {np.mean(force_err):.3e} Ha/Bohr")
    return ens, forces


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-atoms", type=int, default=10)
    ap.add_argument("--n-test", type=int, default=50)
    ap.add_argument("--n-exact", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=".")
    args = ap.parse_args()
    main(n_atoms=args.n_atoms, n_test=args.n_test, n_exact=args.n_exact,
         seed=args.seed, workdir=args.workdir)
