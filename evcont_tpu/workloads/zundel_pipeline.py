"""Zundel-thermodynamics production pipeline (Figs. 5/10/12).

Reference parity: the five-stage batch/offline flow of
scripts/MD/Zundel_thermodynamics/continuation/01..05:

  stage 1  training-set selection from trajectory pools by integral-space
           farthest-point sampling            (01_..._trn_set_generation.py)
  stage 2  one exact solver job per training geometry
           (02_..._run_DMRG.py; here: the package FCI solver — block2 is
           unavailable, external DMRG results enter via the stage-3 file
           schema instead)
  stage 3  pairwise t-RDMs, one (i, j) job per pair, written to
           MPS_cross_i_j/{ovlp,one_rdm,two_rdm}.npy with exchange-
           compressed two_rdm                  (03_..._evaluate_MPS_t_RDMs.py)
  stage 4  NVT-Berendsen MD per seed (Maxwell-Boltzmann init at 298.15 K)
           consuming the pairwise matrix elements, with dipole-moment and
           Mulliken-charge observables         (04_..._continuation_MD.py)
  stage 5  PES accuracy test vs reference energies for training subsets
           (05_..._test_potential_energy.py)

Each stage is an independent function operating through the file system —
the job-array pattern of the reference — so stages can run as separate
processes/machines. Stages 1, 4, 5 are device-batched.
"""

import argparse
import os

import jax
import numpy as np

from ..backends.trdm_ingest import TRDMIngestBackend
from ..integrals.engine import IntegralEngine
from ..learn import selection
from ..md.driver import get_trajectory
from ..md.integrators import maxwell_boltzmann
from ..md.observables import dipole_moment, mulliken_charges
from ..model import ContinuationModel
from ..oao import loewdin_trafo, transform_integrals, compress_exchange
from ..solvers.fci import FCISolver
import jax.numpy as jnp


# ---------------------------------------------------------------------------
def stage1_select_training_set(mol, pool_trajectories, n_train, workdir="."):
    """Greedy integral-space farthest-point selection of n_train geometries
    from candidate trajectory frames (reference 01:107-124, MPI loop ->
    device batch)."""
    os.makedirs(workdir, exist_ok=True)
    pool = np.concatenate([np.asarray(t).reshape(-1, mol.natm, 3)
                           for t in pool_trajectories])
    engine = IntegralEngine(mol)

    # evaluate every candidate's integrals ONCE, then run the greedy
    # max-min selection with incremental distance updates (the reference
    # re-evaluates distances per iteration across MPI ranks, 01:107-124;
    # one pass + O(pool) updates is equivalent and ~n_train times cheaper)
    from ..continuation import oao_integrals

    @jax.jit
    def ints(coords):
        h1, h2, _ = oao_integrals(engine, coords)
        return h1, h2

    h1_pool = []
    h2_pool = []
    for c in pool:
        h1, h2 = ints(jnp.asarray(c))
        h1_pool.append(np.asarray(h1))
        h2_pool.append(np.asarray(h2).reshape(-1))
    h1_pool = np.stack(h1_pool).reshape(len(pool), -1)
    h2_pool = np.stack(h2_pool)

    def dist_to(k):
        d1 = np.sum((h1_pool - h1_pool[k]) ** 2, axis=1)
        d2 = 0.5 * np.sum((h2_pool - h2_pool[k]) ** 2, axis=1)
        return d1 + d2

    chosen = [0]
    min_d = dist_to(0)
    for _ in range(n_train - 1):
        idx = int(np.argmax(min_d))
        chosen.append(idx)
        min_d = np.minimum(min_d, dist_to(idx))
    geoms = pool[chosen]
    np.save(os.path.join(workdir, "trn_geometries.npy"), geoms)
    with open(os.path.join(workdir, "trn_geometries.txt"), "w") as fl:
        for k, g in enumerate(geoms):
            fl.write(f"# geometry {k}\n")
            for sym, xyz in zip(mol.symbols, g):
                fl.write(f"{sym} {xyz[0]} {xyz[1]} {xyz[2]}\n")
    return geoms


# ---------------------------------------------------------------------------
def stage2_solve_training_state(mol, train_id, workdir=".", solver="fci",
                                ncas=8, nelecas=4):
    """Solve one training geometry exactly and store the state
    (job-array style: one call per training id, reference 02:22).

    solver="fci" stores the full CI vector (small molecules);
    solver="casci" stores the CAS CI vector + MO coefficients in this
    geometry's OAO frame for the stage-3 nonorthogonal Wick evaluation
    (production scale — the role DMRG/MPS files play in the reference).
    External DMRG states enter through the stage-3 output schema directly.
    """
    geoms = np.load(os.path.join(workdir, "trn_geometries.npy"))
    mol_i = mol.set_geom(geoms[train_id])
    engine = IntegralEngine(mol_i)
    b = engine.compute_jit(np.asarray(mol_i.coords))
    out = os.path.join(workdir, f"solver_{train_id}")
    os.makedirs(out, exist_ok=True)

    if solver == "fci":
        trafo = np.array(loewdin_trafo(b.ovlp))
        h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri),
                                     trafo)
        e, vec = FCISolver(engine.nao, mol_i.nelec).kernel(
            np.array(h1), np.array(h2))
        e_tot = e + float(b.enuc)
        np.savez(os.path.join(out, "state.npz"), kind="fci", vec=vec,
                 energy=e_tot)
    elif solver == "casci":
        from ..solvers.casci import casci
        S_ao = np.array(b.ovlp)
        res = casci(S_ao, np.array(b.hcore), np.array(b.eri),
                    float(b.enuc), mol_i.nelec, ncas, nelecas)
        w, V = np.linalg.eigh(S_ao)
        d = (V * np.sqrt(np.maximum(w, 0.0))) @ V.T @ res.mo_coeff
        e_tot = res.e_tot
        na, nb = res.nelecas
        np.savez(os.path.join(out, "state.npz"), kind="casci", ci=res.ci,
                 mo_oao=d, ncore=res.ncore, ncas=res.ncas,
                 nelecas=np.array([na, nb]), energy=e_tot)
    else:
        raise ValueError(solver)
    return e_tot


def _load_state(workdir, idx, mol):
    data = np.load(os.path.join(workdir, f"solver_{idx}", "state.npz"))
    kind = str(data["kind"])
    if kind == "fci":
        return ("fci", data["vec"])
    from ..solvers.nonorthogonal import cas_no_state
    na, nb = [int(x) for x in data["nelecas"]]
    return ("casci", cas_no_state(data["ci"], data["mo_oao"],
                                  int(data["ncore"]), int(data["ncas"]),
                                  (na, nb)))


# ---------------------------------------------------------------------------
def stage3_pair_trdm(mol, i, j, workdir="."):
    """t-RDMs for one training pair (i, j), written in the MPS_cross
    schema with exchange-compressed two_rdm (reference 03:108-110)."""
    from ..solvers.nonorthogonal import trans_rdm12_nonorthogonal

    kind_i, st_i = _load_state(workdir, i, mol)
    kind_j, st_j = _load_state(workdir, j, mol)
    assert kind_i == kind_j
    if kind_i == "fci":
        engine = IntegralEngine(mol)
        solver = FCISolver(engine.nao, mol.nelec)
        rdm1, rdm2 = solver.trans_rdm12(st_i, st_j)
        ovlp = np.vdot(st_i, st_j)
    else:
        ovlp, rdm1, rdm2 = trans_rdm12_nonorthogonal(st_i, st_j)
    out = os.path.join(workdir, f"MPS_cross_{i}_{j}")
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, "ovlp.npy"), np.atleast_1d(ovlp))
    np.save(os.path.join(out, "one_rdm.npy"), rdm1)
    np.save(os.path.join(out, "two_rdm.npy"),
            np.array(compress_exchange(jnp.asarray(rdm2))))



def _orthonormalized_model(mol, workdir, n_train):
    """Build the production-conditioned model: training basis
    orthonormalized once in f64 (raw f32 whitening collapses at the
    84-state store's kappa(S) ~ 2e6) and cached on disk in f64, so the
    per-seed MD/observable jobs skip both the 3,570-file reload and the
    transform (an f32 process downcasts on device transfer)."""
    cache = os.path.join(workdir, f"ortho_store_{n_train}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return ContinuationModel(mol, z["ov"], z["r1"], z["r2"])
    backend = TRDMIngestBackend().load(workdir, n_train)
    from ..continuation import orthonormalize_store
    ov, r1, r2 = orthonormalize_store(backend.overlap, backend.one_rdm,
                                      backend.two_rdm)
    np.savez(cache, ov=ov, r1=r1, r2=r2)
    return ContinuationModel(mol, ov, r1, r2)


# ---------------------------------------------------------------------------
def stage4_continuation_md(mol, n_train, seed, steps=10000, dt=25.0,
                           T=298.15, taut=250.0, workdir=".",
                           observable_stride=1):
    """NVT continuation MD for one seed with dipole/Mulliken observables
    (reference 04). Returns (trajectory, dipoles, charges)."""
    model = _orthonormalized_model(mol, workdir, n_train)
    masses = mol.masses_au()
    v0 = np.array(maxwell_boltzmann(jax.random.PRNGKey(seed), masses, T))
    engine = model.engine

    # observables evaluated INSIDE the MD scan (no per-frame host loop):
    # predicted 1-RDM -> dipole + Mulliken charges
    from ..continuation import oao_integrals, approximate_ground_state, \
        predicted_rdm1

    def aux_fn(c, overlap, one_rdm, two_rdm):
        # 4-arg form: the driver passes the t-RDM store as traced
        # arguments (closure capture would embed 4+ GiB in the program)
        h1, h2, _ = oao_integrals(engine, c)
        _, vec = approximate_ground_state(h1, h2, one_rdm, two_rdm,
                                          overlap,
                                          packed_layout=model.packed_layout)
        rdm1 = predicted_rdm1(vec, one_rdm)
        return (dipole_moment(engine, masses, c, rdm1),
                mulliken_charges(engine, c, rdm1))

    aux_out = {}
    with open(os.path.join(workdir, f"traj_seed{seed}.xyz"), "w") as tf, \
            open(os.path.join(workdir, f"ens_seed{seed}.xyz"), "w") as ef:
        coords, epot, ekin = get_trajectory(
            model, init_coords=mol.coords, dt=dt, steps=steps,
            init_veloc=v0, ensemble="nvt_berendsen", T=T, taut=taut,
            trajectory_output=tf, energy_output=ef,
            aux_fn=aux_fn, aux_out=aux_out,
            chunk_steps=min(500, steps))
    dips, charges = aux_out["aux"]
    dips = dips[::observable_stride]
    charges = charges[::observable_stride]
    np.save(os.path.join(workdir, f"dipole_moments_seed{seed}.npy"), dips)
    np.save(os.path.join(workdir, f"charges_seed{seed}.npy"), charges)
    np.save(os.path.join(workdir, f"trajectory_seed{seed}.npy"), coords)
    return coords, dips, charges


def stage4_continuation_md_ensemble(mol, n_train, seeds, steps=10000,
                                    dt=25.0, T=298.15, taut=250.0,
                                    workdir=".", chunk_steps=500):
    """All NVT seeds as ONE vmapped on-device scan — the TPU-native form
    of the reference's job-array ensemble (one process per seed,
    04_Zundel_continuation_MD.py:32). Measured at the 84-state production
    scale: 2 seeds x 10k steps in 2957 s vs 1199 s for one — per-seed
    cost is roughly flat (the step is NOT dominated by the store
    bandwidth at this size; see ROADMAP profiling item), so the win is
    operational (one process, shared compile) rather than throughput.
    Writes the same per-seed artifact files as stage4_continuation_md."""
    import jax
    import jax.numpy as jnp
    from ..md.integrators import run_nvt_berendsen

    model = _orthonormalized_model(mol, workdir, n_train)
    masses = mol.masses_au()
    energy_fn, store = model.energy_fn_with_store()
    v0 = np.stack([
        np.array(maxwell_boltzmann(jax.random.PRNGKey(s_), masses, T))
        for s_ in seeds])
    c0 = np.broadcast_to(np.asarray(mol.coords), v0.shape).copy()

    n_chunks = -(-steps // chunk_steps)

    @jax.jit
    def run_chunk(c, v, ov, r1, r2):
        efn = lambda cc: energy_fn(cc, ov, r1, r2)
        return jax.vmap(
            lambda ci, vi: run_nvt_berendsen(efn, masses, ci, vi, dt,
                                             chunk_steps, T, taut)
        )(c, v)

    parts = []
    for _ in range(n_chunks):
        out = jax.tree_util.tree_map(np.array, run_chunk(
            jnp.asarray(c0), jnp.asarray(v0), *store))
        parts.append(out)
        c0 = out["coords"][:, -1]
        v0 = out["veloc"][:, -1]
    out = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=1)[:, :steps], *parts)

    for k, s_ in enumerate(seeds):
        np.save(os.path.join(workdir, f"trajectory_seed{s_}.npy"),
                out["coords"][k])
        np.savetxt(os.path.join(workdir, f"epot_seed{s_}.txt"),
                   out["epot"][k])
    return out


# ---------------------------------------------------------------------------
def evaluate_observables(mol, n_train, trajectory, workdir=".",
                         chunk_size=16):
    """Dipole moments and Mulliken charges along a *stored* trajectory
    (reference: evaluate_dipole_moment_charges_continuation.py — the
    standalone post-processing variant of the stage-4 in-scan observables).
    Device-batched over frames; writes dipoles_eval.npy / charges_eval.npy.
    """
    import jax.numpy as jnp
    from ..continuation import (oao_integrals, approximate_ground_state,
                                predicted_rdm1)

    model = _orthonormalized_model(mol, workdir, n_train)
    engine = model.engine
    masses = mol.masses_au()

    @jax.jit
    def obs_batch(frames, overlap, one_rdm, two_rdm, whitening):
        # store passed as traced args (not closure constants — see
        # model.energy_fn_with_store)
        def one(c):
            h1, h2, _ = oao_integrals(engine, c)
            _, vec = approximate_ground_state(
                h1, h2, one_rdm, two_rdm, overlap, whitening=whitening,
                packed_layout=model.packed_layout)
            rdm1 = predicted_rdm1(vec, one_rdm)
            return (dipole_moment(engine, masses, c, rdm1),
                    mulliken_charges(engine, c, rdm1))
        return jax.vmap(one)(frames)

    traj = np.asarray(trajectory)
    dips, charges = [], []
    for start in range(0, traj.shape[0], chunk_size):
        chunk = traj[start:start + chunk_size]
        pad = chunk_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        d, q = obs_batch(jnp.asarray(chunk), model.overlap, model.one_rdm,
                         model.two_rdm, model.whitening)
        d, q = np.array(d), np.array(q)
        if pad:
            d, q = d[:-pad], q[:-pad]
        dips.append(d)
        charges.append(q)
    dips = np.concatenate(dips)
    charges = np.concatenate(charges)
    np.save(os.path.join(workdir, "dipoles_eval.npy"), dips)
    np.save(os.path.join(workdir, "charges_eval.npy"), charges)
    return dips, charges


# ---------------------------------------------------------------------------
def stage5_test_potential(mol, n_train, test_geometries, workdir=".",
                          subset_sizes=None, reference_energies=None):
    """Per-frame PES comparison for growing training subsets
    (reference 05:182-210). Writes pes_subset_{N}.txt; if
    reference_energies given, also pes_errors.txt."""
    subset_sizes = subset_sizes or [n_train]
    test = np.asarray(test_geometries)
    results = {}
    for N in subset_sizes:
        backend = TRDMIngestBackend().load(workdir, n_train)
        keep = list(range(N))
        backend.prune_datapoints(keep)
        model = ContinuationModel.orthonormalized(
            mol, backend.overlap, backend.one_rdm, backend.two_rdm)
        ens = np.array([float(model.potential(c)) for c in test])
        np.savetxt(os.path.join(workdir, f"pes_subset_{N}.txt"), ens)
        results[N] = ens
    if reference_energies is not None:
        errs = np.stack([np.abs(results[N] - reference_energies)
                         for N in subset_sizes])
        np.savetxt(os.path.join(workdir, "pes_errors.txt"), errs)
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", type=int, choices=[1, 2, 3, 4, 5])
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--basis", default="sto-3g")
    ap.add_argument("--n-train", type=int, default=4)
    ap.add_argument("--train-id", type=int, default=0)
    ap.add_argument("--pair", type=int, nargs=2, default=(0, 0))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    from .common import water
    mol = water(basis=args.basis)
    if args.stage == 1:
        rng = np.random.default_rng(0)
        pool = np.asarray(mol.coords)[None] \
            + 0.05 * rng.standard_normal((50, mol.natm, 3))
        stage1_select_training_set(mol, [pool], args.n_train,
                                   workdir=args.workdir)
    elif args.stage == 2:
        stage2_solve_training_state(mol, args.train_id,
                                    workdir=args.workdir)
    elif args.stage == 3:
        stage3_pair_trdm(mol, args.pair[0], args.pair[1],
                         workdir=args.workdir)
    elif args.stage == 4:
        stage4_continuation_md(mol, args.n_train, args.seed,
                               steps=args.steps, workdir=args.workdir)
    elif args.stage == 5:
        geoms = np.load(os.path.join(args.workdir, "trn_geometries.npy"))
        stage5_test_potential(mol, args.n_train, geoms,
                              workdir=args.workdir,
                              subset_sizes=[2, args.n_train])


if __name__ == "__main__":
    main()
