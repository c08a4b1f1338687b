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


def _rdm_force_fn(eng):
    """Jitted (E, grad) of the generalized Hellmann-Feynman functional
    E = sum(rdm1 h1) + 1/2 sum(rdm2 h2) + E_nuc at FIXED OAO RDMs. The
    RDMs enter as traced arguments so ONE compilation serves every
    geometry of a scan (eager autodiff through the integral engine is
    ~100x slower per call)."""
    import jax
    import jax.numpy as jnp
    from ..continuation import oao_integrals

    @jax.jit
    def f(coords, rdm1, rdm2):
        def e_fn(c):
            h1c, h2c, enuc = oao_integrals(eng, c)
            return jnp.sum(rdm1 * h1c) \
                + 0.5 * jnp.einsum("pqrs,pqrs->", rdm2, h2c) + enuc
        return jax.value_and_grad(e_fn)(coords)
    return f


_FORCE_FNS = {}


def _force_fn(eng):
    key = (eng.mol.symbols, eng.mol.basis)
    if key not in _FORCE_FNS:
        _FORCE_FNS[key] = _rdm_force_fn(eng)
    return _FORCE_FNS[key]


def hf_energy_and_force(eng, coords):
    """RHF energy and ANALYTIC force: SCF stationarity makes the gradient
    of the HF energy functional at fixed OAO density exact, with the Pulay
    terms carried by the autodiffed OAO-integral transform (the TPU-native
    equivalent of pyscf's RHF nuc_grad_method). Expressed through the
    RDM-functional kernel: rdm1 = D, rdm2 = D x D - 1/2 D_il D_kj (the
    closed-shell HF 2-RDM), so the same jitted function serves HF and FCI
    oracles."""
    import numpy as _np

    coords = np.asarray(coords)
    res = rhf_from_engine(eng, coords=coords)
    b = eng.compute_jit(coords)
    S = np.array(b.ovlp)
    w, U = np.linalg.eigh(S)
    S_half = (U * np.sqrt(w)) @ U.T
    D = S_half @ res.dm @ S_half            # density in the OAO basis
    rdm2 = _np.einsum("ij,kl->ijkl", D, D) \
        - 0.5 * _np.einsum("il,kj->ijkl", D, D)
    e, g = _force_fn(eng)(coords, D, rdm2)
    return float(e), -np.array(g)


def fci_energy_and_force(eng, solver, coords):
    """FCI energy and ANALYTIC force via the generalized Hellmann-Feynman
    expression at the converged FCI RDMs (exact by CI variational
    stationarity — full-space FCI is invariant under the OAO orbital
    response). This replaces the round-1 finite-difference check and
    matches the reference's CASCI(10,10).nuc_grad_method() oracle
    (H10_continuation_3D_replacements.py:161)."""
    coords = np.asarray(coords)
    b = eng.compute_jit(coords)
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri), trafo)
    e_elec, civec = solver.kernel(np.array(h1), np.array(h2))
    rdm1, rdm2 = solver.trans_rdm12(civec, civec)
    e, g = _force_fn(eng)(coords, rdm1, rdm2)
    return float(e), -np.array(g)


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

    # HF baseline: energies AND analytic forces. The SCF solution is
    # stationary w.r.t. orbital rotations, so the gradient of the HF
    # energy functional at FIXED density matrix in the (orthonormal at
    # every R) OAO basis is the exact analytic RHF force; the Pulay terms
    # live inside the autodiffed OAO-integral transform (reference: pyscf
    # nuc_grad_method, H10_continuation_3D_replacements.py:156).
    eng = IntegralEngine(base)
    hf_ens, hf_forces = [], []
    for c in tests:
        e, f = hf_energy_and_force(eng, c)
        hf_ens.append(e)
        hf_forces.append(f)
    hf_forces = np.stack(hf_forces)
    np.savetxt(os.path.join(workdir, "HF_en.txt"), np.array(hf_ens))

    # exact FCI reference: energies AND analytic forces (generalized
    # Hellmann-Feynman at the converged FCI RDMs — exact by CI variational
    # stationarity; reference uses CASCI(10,10).nuc_grad_method(),
    # H10_continuation_3D_replacements.py:161)
    solver = FCISolver(n_atoms, base.nelec)
    ref_ens, ref_forces, force_err = [], [], []
    for idx, c in enumerate(tests[:n_exact]):
        e, f = fci_energy_and_force(eng, solver, c)
        ref_ens.append(e)
        ref_forces.append(f)
        force_err.append(np.abs(forces[idx] - f).max())

    ref_forces = np.stack(ref_forces) if ref_forces else \
        np.zeros((0,) + eq.shape)
    np.savetxt(os.path.join(workdir, "reference_en.txt"), np.array(ref_ens))
    np.savetxt(os.path.join(workdir, "continuation_force_error.txt"),
               np.array(force_err))
    # reference artifact schema (per-geometry gradient rows)
    rtag = f"{displacement}"
    np.savetxt(os.path.join(workdir, f"H10_continuation_gradients_{rtag}.txt"),
               -forces[:n_exact].reshape(n_exact, -1))
    np.savetxt(os.path.join(workdir, f"H10_FCI_gradients_{rtag}.txt"),
               -ref_forces.reshape(len(ref_ens), -1))
    np.savetxt(os.path.join(workdir, f"H10_HF_gradients_{rtag}.txt"),
               -hf_forces[:n_exact].reshape(n_exact, -1))

    if gap_baseline:
        # GAP/SOAP machine-learning baseline trained on the same points
        # (reference: H10_continuation_3D_replacements.py:47-118)
        from ..baselines.gap import GAPModel
        gap = GAPModel(rcut=3.5 * max(train_dists), nmax=5, sigma=0.7).fit(
            [np.asarray(h_chain(n_atoms, d).coords) for d in train_dists],
            backend.ens)
        gap_ens = np.array([gap.predict(c) for c in tests])
        np.savetxt(os.path.join(workdir, "GAP_en.txt"), gap_ens)

    # reference combined table: FCI  HF  Continuation  GAP
    # (H10_continuation_3D_replacements.py:120-123)
    gap_col = gap_ens[:n_exact] if gap_baseline else \
        np.zeros(len(ref_ens))
    np.savetxt(
        os.path.join(workdir, f"H10_predicted_energies_{rtag}.txt"),
        np.column_stack([np.array(ref_ens), np.array(hf_ens)[:n_exact],
                         ens[:n_exact], gap_col]))

    en_err = np.abs(ens[:n_exact] - np.array(ref_ens))
    hf_err = np.abs(np.array(hf_ens)[:n_exact] - np.array(ref_ens))
    f_err_hf = np.abs(hf_forces[:n_exact] - ref_forces).max(axis=(1, 2))
    print(f"vs FCI over {n_exact} geometries (radius {displacement}):")
    print(f"  continuation: energy MAE {en_err.mean():.3e} Ha, max "
          f"{en_err.max():.3e}; force max-err MAE "
          f"{np.mean(force_err):.3e} Ha/Bohr, max {np.max(force_err):.3e}")
    print(f"  HF baseline:  energy MAE {hf_err.mean():.3e} Ha; "
          f"force max-err MAE {f_err_hf.mean():.3e} Ha/Bohr")
    return ens, forces


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-atoms", type=int, default=10)
    ap.add_argument("--n-test", type=int, default=50)
    ap.add_argument("--n-exact", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--no-gap-baseline", action="store_true",
                    help="skip the GAP/SOAP baseline fit/evaluation "
                         "(reference Fig. 2 comparison; on by default)")
    args = ap.parse_args()
    main(n_atoms=args.n_atoms, n_test=args.n_test, n_exact=args.n_exact,
         seed=args.seed, workdir=args.workdir,
         gap_baseline=not args.no_gap_baseline)
