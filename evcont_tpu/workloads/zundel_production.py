"""Zundel production-shape run: 84 training states through pipeline
stages 1-5 (reference flagship scale: traj_EVCont_83 in
evaluate_dipole_moment_charges_continuation.py:56, subsets N=20..100 in
05_Zundel_test_potential_energy.py:184).

Single-process sequential driver over the job-array stages of
workloads/zundel_pipeline.py, with file-level resume (completed
solver_{i}/ and MPS_cross_{i}_{j}/ directories are skipped), so the run
survives interruption and can be spread over sessions. Stage costs are
dominated by the 84*(84+1)/2 = 3,570 nonorthogonal-Wick pair jobs —
exactly the part the reference farms out as a cluster job array
(03_Zundel_continuation_evaluate_MPS_t_RDMs.py:35-36).

Usage:
    python -m evcont_tpu.workloads.zundel_production --workdir wd \
        [--n-train 84] [--ncas 8] [--nelecas 4] [--steps 2000]
        [--stages 1 2 3 4 5]
"""

import argparse
import os
import sys
import time

import numpy as np


def run(workdir, n_train=84, ncas=8, nelecas=4, steps=2000, dt=25.0,
        seed=0, stages=(1, 2, 3, 4, 5), subset_sizes=(20, 40, 60, 80),
        pool_size=600, pool_scale=0.08, platform="cpu"):
    # training stages are f64 host solves (the role of block2/pyscf
    # cluster jobs in the reference); force the CPU backend unless the
    # caller wants the device for stage 4/5 batch evaluation
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from .common import zundel
    from . import zundel_pipeline as zp

    os.makedirs(workdir, exist_ok=True)
    mol = zundel(basis="6-31g")

    if 1 in stages:
        # candidate pool: thermal-scale random distortions of the cation
        # (the reference draws from prior CCSD/DFT NVT trajectory pools,
        # 01:25-31; random thermal displacements stand in for those here)
        path = os.path.join(workdir, "trn_geometries.npy")
        if not os.path.exists(path):
            rng = np.random.default_rng(seed)
            pool = np.asarray(mol.coords)[None] + pool_scale * \
                rng.standard_normal((pool_size, mol.natm, 3))
            t0 = time.time()
            zp.stage1_select_training_set(mol, [pool], n_train,
                                          workdir=workdir)
            print(f"[stage1] selected {n_train} geometries "
                  f"({time.time() - t0:.0f} s)", flush=True)
        else:
            print("[stage1] trn_geometries.npy exists, skipping",
                  flush=True)

    if 2 in stages:
        for i in range(n_train):
            out = os.path.join(workdir, f"solver_{i}", "state.npz")
            if os.path.exists(out):
                continue
            t0 = time.time()
            e = zp.stage2_solve_training_state(
                mol, i, workdir=workdir, solver="casci", ncas=ncas,
                nelecas=nelecas)
            print(f"[stage2] state {i}: E = {e:.6f} "
                  f"({time.time() - t0:.0f} s)", flush=True)

    if 3 in stages:
        rows, cols = np.tril_indices(n_train)
        done = 0
        t_start = time.time()
        for k, (i, j) in enumerate(zip(rows, cols)):
            out = os.path.join(workdir, f"MPS_cross_{i}_{j}", "two_rdm.npy")
            if os.path.exists(out):
                continue
            zp.stage3_pair_trdm(mol, int(i), int(j), workdir=workdir)
            done += 1
            if done % 50 == 0:
                rate = done / (time.time() - t_start)
                left = (len(rows) - k - 1) / max(rate, 1e-9)
                print(f"[stage3] {k + 1}/{len(rows)} pairs "
                      f"({rate:.2f} pairs/s, ~{left / 60:.0f} min left)",
                      flush=True)
        print(f"[stage3] all {len(rows)} pairs present", flush=True)

    if 4 in stages:
        t0 = time.time()
        coords, dips, charges = zp.stage4_continuation_md(
            mol, n_train, seed, steps=steps, dt=dt, workdir=workdir)
        print(f"[stage4] {steps}-step NVT seed {seed} done "
              f"({time.time() - t0:.0f} s); dipole shape {dips.shape}",
              flush=True)

    if 5 in stages:
        geoms = np.load(os.path.join(workdir, "trn_geometries.npy"))
        # test on held-out thermal distortions + reference = full-subspace
        # prediction (the monotone-decay ablation of 05:182-210)
        rng = np.random.default_rng(seed + 1)
        test = np.asarray(mol.coords)[None] + pool_scale * \
            rng.standard_normal((40, mol.natm, 3))
        sizes = [s for s in subset_sizes if s < n_train] + [n_train]
        results = zp.stage5_test_potential(mol, n_train, test,
                                           workdir=workdir,
                                           subset_sizes=sizes)
        full = results[n_train]
        maes = {N: float(np.abs(results[N] - full).mean()) for N in sizes}
        print("[stage5] MAE vs full-subspace prediction by subset size:",
              {k: f"{v:.2e}" for k, v in maes.items()}, flush=True)
        np.savetxt(os.path.join(workdir, "subset_ablation_mae.txt"),
                   np.array([[N, maes[N]] for N in sizes]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n-train", type=int, default=84)
    ap.add_argument("--ncas", type=int, default=8)
    ap.add_argument("--nelecas", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stages", type=int, nargs="+",
                    default=[1, 2, 3, 4, 5])
    args = ap.parse_args(argv)
    run(args.workdir, n_train=args.n_train, ncas=args.ncas,
        nelecas=args.nelecas, steps=args.steps, seed=args.seed,
        stages=tuple(args.stages))


if __name__ == "__main__":
    main()
