"""Active-learning driver: on-the-fly training of the continuation during MD.

Reference parity: converge_EVCont_MD (evcont/MD_utils.py:128-502), with the
same control flow and file artifacts:
  * per-iteration trajectory files traj_EVCont_i.{xyz,npy}, ens_EVCont_i.xyz
  * continuation state overlap/one_rdm/two_rdm.npy (+_i when pruning),
    trn_times.txt
  * per-iteration energy-difference files en_diff_i.txt
  * convergence = two consecutive passes with max per-frame |dE| below
    convergence_thresh (MD_utils.py:326-337)
  * three data-selection criteria (learn/selection.py)
  * optional leave-one-out pruning of redundant training points
    (MD_utils.py:279-305, 463-489)

TPU divergences: the MD trajectory is one on-device scan; the per-frame
re-prediction sweeps (reference loops approximate_ground_state_OAO over all
frames, MD_utils.py:265-275, 448-458) are vmapped batch evaluations; MPI
rank gymnastics disappear under JAX's single-controller model.
"""

import os

import jax
import numpy as np

from ..md.driver import get_trajectory
from ..model import ContinuationModel
from . import selection
from .checkpoints import save_state


def _drop_last_state(overlap, one_rdm, two_rdm):
    """Training store without its most recent state, for any layout. Full
    (Ntrn, Ntrn, ...) stores slice both leading axes; pair-compressed
    stores drop the last Ntrn packed entries (the tril row of the newest
    state)."""
    ntrain = overlap.shape[0]
    ov = overlap[:-1, :-1]
    def drop(arr):
        if arr.ndim >= 2 and arr.shape[0] == ntrain and \
                arr.shape[1] == ntrain:
            return arr[:-1, :-1]
        # pair-compressed: leading axis is Ntrn(Ntrn+1)/2
        return arr[:-(ntrain)]
    return ov, drop(one_rdm), drop(two_rdm)


def _subset_state(overlap, one_rdm, two_rdm, keep_ids):
    """Training store restricted to `keep_ids`, for any layout. Full
    (Ntrn, Ntrn, ...) stores slice both leading axes; pair-compressed
    stores (leading axis Ntrn(Ntrn+1)/2) remap through the tril pair index
    — the same mapping TRDMIngestBackend.prune_datapoints applies."""
    overlap = np.asarray(overlap)
    ntrain = overlap.shape[0]
    keep = sorted(int(k) for k in keep_ids)
    ix = np.ix_(keep, keep)
    rows, cols = np.tril_indices(ntrain)
    pos = {(int(a), int(b)): k for k, (a, b) in enumerate(zip(rows, cols))}
    sel = np.array([pos[(i, j)] for k, i in enumerate(keep)
                    for j in keep[:k + 1]])

    def take(arr):
        arr = np.asarray(arr)
        if arr.ndim >= 2 and arr.shape[0] == ntrain and \
                arr.shape[1] == ntrain:
            return arr[ix]
        return arr[sel]

    return overlap[ix], take(one_rdm), take(two_rdm)


def _make_model(mol, overlap, one_rdm, two_rdm, hermitian=True):
    """AL-loop model constructor: on the hermitian path the store is
    S-orthonormalized once in f64 (continuation.orthonormalize_store)
    before the jitted f32 solves — growing training sets go
    ill-conditioned fast (the Zundel cation reaches kappa(S) ~ 4e5 by 6
    states), and the raw-store f32 GEP then feeds garbage energies back
    into the selection loop. Non-hermitian stores keep the raw layout
    (the host-eig path is f64 end-to-end)."""
    if hermitian:
        return ContinuationModel.orthonormalized(
            mol, overlap, one_rdm, two_rdm, hermitian=hermitian)
    return ContinuationModel(mol, overlap, one_rdm, two_rdm,
                             hermitian=hermitian)


def _predict_batch(mol, overlap, one_rdm, two_rdm, trajectory,
                   chunk_size=32, hermitian=True):
    """Re-predict a trajectory's energies with a (sub)set of training data,
    batched on device."""
    model = _make_model(mol, overlap, one_rdm, two_rdm,
                        hermitian=hermitian)
    traj = np.asarray(trajectory)
    out = []
    for start in range(0, traj.shape[0], chunk_size):
        chunk = traj[start:start + chunk_size]
        pad = chunk_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        vals = np.array(model.potential_batch(chunk))
        out.append(vals[:chunk_size - pad] if pad else vals)
    return np.concatenate(out)


def converge_EVCont_MD(backend, init_mol, steps=100, dt=1.0,
                       convergence_thresh=1.0e-3,
                       prune_irrelevant_data=False,
                       data_addition="farthest_point_ham",
                       max_iterations=100, workdir=".",
                       md_kwargs=None, trn_times=None, hermitian=True):
    """Iteratively: run MD with the current continuation, pick the frame
    farthest from the training set, solve it exactly, repeat until the
    trajectory's energy change from the last added point stays below
    convergence_thresh for two consecutive iterations.

    Passing a non-empty `trn_times` resumes a previous run (reference:
    MD_utils.py:217-258): the backend must already hold the matching
    training data (e.g. via TRDMIngestBackend.load_state_files or by
    re-appending), previously computed traj_EVCont_i.npy files are reused,
    and iteration continues from i = len(trn_times) - 1.

    Returns the final trajectory (steps, natm, 3) in Bohr.
    """
    md_kwargs = md_kwargs or {}
    os.makedirs(workdir, exist_ok=True)

    def run_traj(i, reuse=False):
        traj_npy = os.path.join(workdir, f"traj_EVCont_{i}.npy")
        ens_file = os.path.join(workdir, f"ens_EVCont_{i}.xyz")
        if reuse and os.path.exists(traj_npy) and os.path.exists(ens_file):
            # resume: reuse the stored trajectory + its energies
            # (reference: traj_computed check, MD_utils.py:220,240-252)
            coords = np.load(traj_npy)
            epot = np.genfromtxt(ens_file)[:, 1]
            return coords, epot
        model = _make_model(init_mol, backend.overlap, backend.one_rdm,
                            backend.two_rdm, hermitian=hermitian)
        with open(os.path.join(workdir, f"traj_EVCont_{i}.xyz"), "w") as tf, \
                open(ens_file, "w") as ef:
            coords, epot, ekin = get_trajectory(
                model, init_coords=init_mol.coords, dt=dt, steps=steps,
                trajectory_output=tf, energy_output=ef, **md_kwargs)
        np.save(traj_npy, coords)
        return coords, epot

    def save(i):
        suffix = str(i) if prune_irrelevant_data else ""
        save_state(workdir, backend.overlap, backend.one_rdm,
                   backend.two_rdm, trn_times, suffix=suffix)

    def reconstruct_geometries(trn_times):
        """Training geometries from stored trajectories (reference:
        MD_utils.py:343-349)."""
        geoms = [np.asarray(init_mol.coords)]
        for k in range(1, len(trn_times)):
            prev = np.load(os.path.join(workdir,
                                        f"traj_EVCont_{k - 1}.npy"))
            geoms.append(prev[trn_times[k]])
        return geoms

    if trn_times:
        # ---- resume path ---------------------------------------------
        trn_times = [int(t) for t in trn_times]
        assert backend.ntrain == len(trn_times), (
            "backend training data does not match trn_times; load the "
            "checkpoint artifacts first")
        i = len(trn_times) - 1
        trn_geometries = reconstruct_geometries(trn_times)
        save(i)
        trajectory, updated_ens = run_traj(i, reuse=True)
        if i > 0:
            reference_ens = _predict_batch(
                init_mol, *_drop_last_state(backend.overlap,
                                            backend.one_rdm,
                                            backend.two_rdm),
                trajectory, hermitian=hermitian)
        else:
            reference_ens = np.full_like(updated_ens, updated_ens[0])
        converged = False
        prev_diff = os.path.join(workdir, f"en_diff_{i - 1}.txt")
        if i >= 1 and os.path.exists(prev_diff):
            converged = np.loadtxt(prev_diff).max() <= convergence_thresh
    else:
        # ---- bootstrap: train on the initial geometry ------------------
        i = 0
        trn_times = [0]
        trn_geometries = [np.asarray(init_mol.coords)]
        backend.append_to_rdms(init_mol)
        save(i)
        trajectory, updated_ens = run_traj(i)
        reference_ens = np.full_like(updated_ens, updated_ens[0])
        converged = False

    from ..integrals.engine import IntegralEngine
    engine = IntegralEngine(init_mol)

    for _ in range(max_iterations):
        # Drop all jit caches between iterations: the store shapes grow
        # every pass (forcing recompiles anyway), and the cache keys of
        # the model's static-self jits would otherwise retain every
        # iteration's device-resident store — the accumulation exhausts
        # HBM after ~16 Zundel-size iterations (measured). The persistent
        # on-disk compile cache keeps repeated shapes cheap.
        jax.clear_caches()
        en_diff = np.abs(reference_ens - updated_ens)
        np.savetxt(os.path.join(workdir, f"en_diff_{i}.txt"), en_diff)
        i += 1

        if converged and en_diff.max() <= convergence_thresh:
            break
        converged = en_diff.max() <= convergence_thresh

        # ---- data selection -------------------------------------------
        if data_addition == "energy":
            trn_time = selection.select_energy(en_diff)
        elif data_addition == "farthest_point":
            trn_time = selection.select_farthest_point(
                trn_geometries, trajectory)
        elif data_addition == "farthest_point_ham":
            trn_time = selection.select_farthest_point_ham(
                engine, trn_geometries, trajectory)
        else:
            raise ValueError(f"unknown data_addition {data_addition!r}")

        trn_geometry = trajectory[trn_time]
        trn_times.append(int(trn_time))
        trn_geometries.append(np.asarray(trn_geometry))
        backend.append_to_rdms(init_mol.set_geom(trn_geometry))
        save(i)

        # ---- new trajectory with the enlarged subspace ------------------
        trajectory, updated_ens = run_traj(i)

        # ---- re-predict with the previous subspace ----------------------
        reference_ens = _predict_batch(
            init_mol, *_drop_last_state(backend.overlap, backend.one_rdm,
                                        backend.two_rdm),
            trajectory, hermitian=hermitian)

        # ---- optional leave-one-out pruning -----------------------------
        if prune_irrelevant_data:
            keep = np.ones(len(trn_times), dtype=bool)
            for j in range(len(trn_times)):
                test_keep = keep.copy()
                test_keep[j] = False
                if test_keep.sum() < 1:
                    continue
                ids = np.nonzero(test_keep)[0]
                ens_removed = _predict_batch(
                    init_mol,
                    *_subset_state(backend.overlap, backend.one_rdm,
                                   backend.two_rdm, ids),
                    trajectory, hermitian=hermitian)
                if np.all(np.abs(ens_removed - updated_ens)
                          < convergence_thresh):
                    keep = test_keep
            keep_ids = np.nonzero(keep)[0].tolist()
            if len(keep_ids) < len(trn_times):
                trn_times = [trn_times[j] for j in keep_ids]
                trn_geometries = [trn_geometries[j] for j in keep_ids]
                backend.prune_datapoints(keep_ids)

    return trajectory
