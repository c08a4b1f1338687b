"""Training-point energetics for a Zundel-cation active-learning run.

Reference parity: scripts/MD/H2O-H3O+/evaluate_energetics_training_points.py
— reconstructs the training geometries from a preceding converge_EVCont_MD
run (traj_EVCont_i.npy + trn_times.txt), then writes, one row per training
point:
  * energies_trn_points_DMRG.txt — the training solver's own energy,
    recovered from the stored diagonal t-RDM contracted with that
    geometry's OAO integrals (+ E_nuc) (reference :63-68)
  * energies_trn_points_full_continuation.txt — the full-subspace
    continuation prediction (:71-73)
  * energies_trn_points_{CCSD,DFT,HF}.txt — CCSD / B3LYP-RKS / RHF
    baselines, "converged_value  value" per row with NaN when the solver
    fails to converge (:75-121)

The t-RDM-vs-continuation column pair is the internal-consistency check:
at a training geometry the continuation must reproduce the training
solver's energy to subspace precision.
"""

import argparse
import os

import numpy as np

from ..integrals.engine import IntegralEngine
from ..model import ContinuationModel
from ..oao import loewdin_trafo, transform_integrals
from .common import zundel


def training_geometries(workdir):
    """Reference :44-49: first frame of the first trajectory, then the
    frame each later training point was selected from."""
    trn_times = list(np.atleast_1d(
        np.loadtxt(os.path.join(workdir, "trn_times.txt")).astype(int)))
    trajs = [np.load(os.path.join(workdir, f"traj_EVCont_{i}.npy"))
             for i in range(len(trn_times))]
    return [trajs[0][0]] + [trajs[k][trn_times[k + 1]]
                            for k in range(len(trajs) - 1)]


def evaluate_energetics_training_points(mol, workdir=".", methods=(
        "dmrg", "continuation", "ccsd", "ccsdt", "dft", "hf"),
        resume=False, progress=False, store_npz=None):
    """resume: reload per-method partial rows (written after every
    geometry) and skip the already-solved prefix — the per-point solves
    cost minutes each on a single core, so a wall-clock kill must not
    lose the table. progress: print one line per geometry (flushed).
    store_npz: read the t-RDM store (overlap/one_rdm/two_rdm arrays,
    full OR pair-compressed layouts) from this npz instead of the
    workdir's .npy files — e.g. the rebuilt physical anchor store when
    the multi-GB two_rdm.npy was never kept in the AL workdir."""
    geoms = training_geometries(workdir)
    eng = IntegralEngine(mol)
    paired = False
    if "dmrg" in methods or "continuation" in methods:
        # the t-RDM store is only needed for the solver/continuation
        # columns; the CCSD/CCSD(T)/DFT/HF baselines run from geometries
        # alone (matching the reference, which also solves them fresh)
        if store_npz is not None:
            with np.load(store_npz) as st:
                overlap = st["overlap"]
                one_rdm = st["one_rdm"]
                two_rdm = st["two_rdm"]
        else:
            overlap = np.load(os.path.join(workdir, "overlap.npy"))
            one_rdm = np.load(os.path.join(workdir, "one_rdm.npy"))
            two_rdm = np.load(os.path.join(workdir, "two_rdm.npy"))
        paired = one_rdm.ndim == 3
        model = ContinuationModel(mol, overlap, one_rdm, two_rdm)

    def _partial_path(m):
        return os.path.join(workdir, f"energies_trn_points_{m}.partial.npy")

    out = {m: [] for m in methods}
    start = 0
    if resume:
        loaded = {m: (np.load(_partial_path(m)).tolist()
                      if os.path.exists(_partial_path(m)) else [])
                  for m in methods}
        start = min(len(v) for v in loaded.values())
        out = {m: [tuple(r) if np.ndim(r) else float(r)
                   for r in loaded[m][:start]] for m in methods}
        if progress and start:
            print(f"[energetics] resuming at point {start}/{len(geoms)}",
                  flush=True)
    for i, g in enumerate(geoms):
        if i < start:
            continue
        g = np.asarray(g, dtype=float)
        if "dmrg" in methods or "continuation" in methods:
            b = eng.compute_jit(g)
        if "dmrg" in methods:
            trafo = np.array(loewdin_trafo(b.ovlp))
            h1, h2 = transform_integrals(np.array(b.hcore),
                                         np.array(b.eri), trafo)
            if paired:
                # tril pair enumeration: diagonal (i,i) sits at i(i+3)/2
                from ..oao import restore_exchange
                k = i * (i + 3) // 2
                r1_ii = np.asarray(one_rdm[k])
                r2_ii = np.asarray(restore_exchange(
                    np.asarray(two_rdm[k]), eng.nao))
            else:
                r1_ii, r2_ii = one_rdm[i, i], two_rdm[i, i]
            en = (np.sum(r1_ii * np.array(h1))
                  + 0.5 * np.einsum("pqrs,pqrs->", r2_ii,
                                    np.array(h2), optimize=True))
            out["dmrg"].append(en + float(b.enuc))
        if "continuation" in methods:
            out["continuation"].append(float(model.potential(g)))
        if "ccsd" in methods or "ccsdt" in methods:
            # one RHF + integral transform serves both coupled-cluster
            # columns; the (T) column is the reference's stage-5 CCSD(T)
            # comparison (05_Zundel_test_potential_energy.py:182-210)
            try:
                from ..solvers.ccsd import ccsd
                from ..solvers.ccsd_rhf import ccsd_rhf
                from ..solvers.scf import rhf_from_engine
                hf = rhf_from_engine(eng, coords=g)
                bb = eng.compute_jit(g)
                h1m, erim = transform_integrals(
                    np.array(bb.hcore), np.array(bb.eri), hf.mo_coeff)
                nelec = sum(mol.nelec)
                # closed shell: the spin-adapted solver (~16x fewer
                # iteration flops, oracle-pinned to the spin-orbital one
                # in tests/test_ccsd_rhf.py) makes the 34-point
                # production table tractable on this host
                cc = ccsd_rhf if nelec % 2 == 0 else ccsd
                res = cc(np.array(h1m), np.array(erim), nelec,
                         with_triples="ccsdt" in methods)
                if "ccsdt" in methods:
                    ec, et_corr, _ = res
                    et = hf.e_tot + ec + et_corr
                    out["ccsdt"].append(
                        (et if hf.converged else np.nan, et))
                else:
                    ec, _ = res
                if "ccsd" in methods:
                    e = hf.e_tot + ec
                    out["ccsd"].append((e if hf.converged else np.nan, e))
            except Exception:
                for m in ("ccsd", "ccsdt"):
                    # fill only the columns this row has not produced yet
                    if m in methods and len(out[m]) == i:
                        out[m].append((np.nan, np.nan))
        if "dft" in methods:
            try:
                from ..solvers.dft import rks
                r = rks(eng, coords=g, xc="b3lyp", n_rad=40, angular=26)
                out["dft"].append(
                    (r.e_tot if r.converged else np.nan, r.e_tot))
            except Exception:
                out["dft"].append((np.nan, np.nan))
        if "hf" in methods:
            try:
                from ..solvers.scf import rhf_from_engine
                r = rhf_from_engine(eng, coords=g)
                out["hf"].append(
                    (r.e_tot if r.converged else np.nan, r.e_tot))
            except Exception:
                out["hf"].append((np.nan, np.nan))
        for m in methods:
            # atomic: a wall-clock kill inside np.save must not leave a
            # truncated .npy that crashes the next resume=True np.load
            # (np.save appends ".npy" when missing, so keep the suffix)
            tmp = _partial_path(m)[:-len(".npy")] + ".tmp.npy"
            np.save(tmp, np.asarray(out[m]))
            os.replace(tmp, _partial_path(m))
        if progress:
            print(f"[energetics] point {i + 1}/{len(geoms)} done",
                  flush=True)

    if "dmrg" in methods:
        np.savetxt(os.path.join(workdir, "energies_trn_points_DMRG.txt"),
                   np.array(out["dmrg"]))
    if "continuation" in methods:
        np.savetxt(
            os.path.join(workdir,
                         "energies_trn_points_full_continuation.txt"),
            np.array(out["continuation"]))
    for m, name in (("ccsd", "CCSD"), ("ccsdt", "CCSD_T"),
                    ("dft", "DFT"), ("hf", "HF")):
        if m in methods:
            np.savetxt(
                os.path.join(workdir, f"energies_trn_points_{name}.txt"),
                np.array(out[m]))
    return out


def _oao_density(engine, coords, dm_ao):
    """AO-basis density -> OAO basis (D_oao = S^1/2 D_ao S^1/2), the
    layout md/observables.dipole_moment / mulliken_charges consume."""
    S = np.array(engine.overlap(np.asarray(coords)))
    w, U = np.linalg.eigh(S)
    S_half = (U * np.sqrt(w)) @ U.T
    return S_half @ dm_ao @ S_half


def evaluate_dipole_charges_method(mol, method, workdir=".", stride=1,
                                   trajectory=None):
    """PES + dipole moments + Mulliken charges along the final
    continuation trajectory with an independent electronic-structure
    method (reference: evaluate_dipole_moment_charges_{HF,DFT,CCSD}
    _final_continuation_trajectory.py — method in {"hf", "dft", "ccsd"};
    "dft" = B3LYP as in the reference :57). Writes
    {dipole_moment,atom_charges,energies}_{METHOD}_final_trajectory.txt."""
    from ..md.observables import dipole_moment, mulliken_charges

    if trajectory is None:
        n_last = len(np.atleast_1d(
            np.loadtxt(os.path.join(workdir, "trn_times.txt")))) - 1
        trajectory = np.load(
            os.path.join(workdir, f"traj_EVCont_{n_last}.npy"))
    frames = np.asarray(trajectory)[::stride]
    eng = IntegralEngine(mol)
    masses = mol.masses_au()
    tag = method.upper()

    dips, charges, ens = [], [], []
    for g in frames:
        g = np.asarray(g, dtype=float)
        if method == "hf":
            from ..solvers.scf import rhf_from_engine
            r = rhf_from_engine(eng, coords=g)
            dm_ao, en = r.dm, (r.e_tot if r.converged else np.nan)
        elif method == "dft":
            from ..solvers.dft import rks
            r = rks(eng, coords=g, xc="b3lyp", n_rad=40, angular=26)
            dm_ao, en = r.dm, (r.e_tot if r.converged else np.nan)
        elif method == "ccsd":
            from ..solvers.ccsd import ccsd_rdm1
            from ..solvers.scf import rhf_from_engine
            hf = rhf_from_engine(eng, coords=g)
            b = eng.compute_jit(g)
            h1m, erim = transform_integrals(
                np.array(b.hcore), np.array(b.eri), hf.mo_coeff)
            D_mo, e_elec = ccsd_rdm1(np.array(h1m), np.array(erim),
                                     sum(mol.nelec))
            dm_ao = hf.mo_coeff @ D_mo @ hf.mo_coeff.T
            en = e_elec + float(b.enuc) if hf.converged else np.nan
        else:
            raise ValueError(method)
        d_oao = _oao_density(eng, g, np.asarray(dm_ao))
        dips.append(np.array(dipole_moment(eng, masses, g, d_oao)))
        charges.append(np.array(mulliken_charges(eng, g, d_oao)))
        ens.append(en)

    np.savetxt(os.path.join(
        workdir, f"dipole_moment_{tag}_final_trajectory.txt"),
        np.array(dips))
    np.savetxt(os.path.join(
        workdir, f"atom_charges_{tag}_final_trajectory.txt"),
        np.array(charges))
    np.savetxt(os.path.join(
        workdir, f"energies_{tag}_final_trajectory.txt"), np.array(ens))
    return np.array(dips), np.array(charges), np.array(ens)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--basis", default="6-31g")
    ap.add_argument("--methods", nargs="+",
                    default=["dmrg", "continuation", "ccsd", "ccsdt",
                             "dft", "hf"])
    ap.add_argument("--final-trajectory", choices=["hf", "dft", "ccsd"],
                    help="instead of training-point energetics: dipole/"
                         "charges/PES along the final trajectory with "
                         "this method")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--store-npz", default=None,
                    help="t-RDM store npz for the dmrg/continuation "
                         "columns (e.g. the rebuilt physical anchor "
                         "store)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="host solver workload: force the CPU backend "
                         "(the axon sitecustomize pins jax_platforms to "
                         "the TPU, which emulated-f64 solvers must not "
                         "ride); 'default' leaves jax untouched")
    args = ap.parse_args(argv)
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    mol = zundel(basis=args.basis)
    if args.final_trajectory:
        evaluate_dipole_charges_method(mol, args.final_trajectory,
                                       workdir=args.workdir,
                                       stride=args.stride)
    else:
        evaluate_energetics_training_points(mol, workdir=args.workdir,
                                            methods=tuple(args.methods),
                                            resume=args.resume,
                                            progress=True,
                                            store_npz=args.store_npz)


if __name__ == "__main__":
    main()
