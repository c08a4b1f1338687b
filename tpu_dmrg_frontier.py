"""TPU study: device-DMRG bond-dimension frontier at H30 scale.

VERDICT r4 missing #3: the in-framework DMRG was demonstrated at m=32
(device, H30 AL run) and m=100 (host, H20); the reference's ladder
reaches m ~ 6,747 (converge_dmrg.py:15). This measures, on the real
chip, for m in a doubling ladder:

  * s/sweep of the jitted two-site device sweep (solvers/dmrg_jax)
  * ground-state energy E(m) (warm-started from the previous rung),
    with convergence quoted against the largest measured m
  * cross t-RDM sweep time per pair (solvers/dmrg_trdm_device) where
    the element buffers still fit

and records where the ladder becomes infeasible in-framework and why
(wall time per sweep / buffer memory), giving the honest frontier
against block2's production schedule.

Precision note: the device sweeps run in f32 (the production device-DMRG
configuration used for the H30 AL run); energy differences are
meaningful to the f32 Lanczos floor (~1e-5 Ha at this scale), which is
far below the m-convergence spacings measured here.

Usage: python tpu_dmrg_frontier.py [m ...]        (default 32 64 128 256)
Writes artifacts_h30_devdmrg/frontier_result.json.
"""

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "artifacts_h30_devdmrg", "frontier_result.json")
N_ATOMS = 30
TRDM_MAX_M = 128    # element-buffer capacity bound for the t-RDM sweep


def main():
    import jax
    from evcont_tpu.integrals.engine import IntegralEngine
    from evcont_tpu.oao import loewdin_trafo, transform_integrals
    from evcont_tpu.solvers.dmrg import (build_hamiltonian_mpo_fast,
                                         mpo_add, mpo_compress,
                                         mpo_expectation,
                                         number_penalty_mpo)
    from evcont_tpu.solvers.dmrg_jax import DeviceDMRG
    from evcont_tpu.workloads.common import h_chain

    ms = [int(a) for a in sys.argv[1:]] or [32, 64, 128, 256]
    mol = h_chain(N_ATOMS, 1.8, basis="sto-6g")
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp), dtype=np.float64)
    h1, h2 = transform_integrals(
        np.array(b.hcore, dtype=np.float64),
        np.array(b.eri, dtype=np.float64), trafo)
    h1, h2 = np.asarray(h1, dtype=np.float64), np.asarray(h2,
                                                          dtype=np.float64)
    na = nb = N_ATOMS // 2
    n_sites = 2 * N_ATOMS
    enuc = float(b.enuc)

    t0 = time.time()
    W_ham = build_hamiltonian_mpo_fast(h1, h2, cutoff=1e-9)
    W_pen = number_penalty_mpo(n_sites, na + nb, 0.0, lam=8.0)
    W = mpo_compress(mpo_add(W_ham, W_pen))
    D = max(w.shape[0] for w in W)
    print(f"[frontier] platform={jax.devices()[0].platform} "
          f"norb={N_ATOMS} sites={n_sites} MPO D={D} "
          f"(built in {time.time() - t0:.0f} s)", flush=True)

    rows = []
    solver = None
    noise = 1e-4
    for m in ms:
        try:
            if solver is None:
                solver = DeviceDMRG(W, n_sites, m, n_elec=na + nb, sz=0.0)
            else:
                solver = DeviceDMRG(W, n_sites, m, mps0=solver.mps())
            # sweep to energy convergence at this rung (a cold start
            # needs ~10 sweeps; warm-started rungs converge in a few);
            # per-sweep time is taken from the last, noise-free sweep
            t0 = time.time()
            solver.sweep(noise=noise, k=20, seed=1)
            t_first = time.time() - t0
            e_prev, t_sweep, n_sweeps = None, t_first, 1
            for s in range(2, 26):
                nz = noise * 0.25 ** (s - 1)
                t0 = time.time()
                solver.sweep(noise=nz if nz > 1e-8 else 0.0, k=20,
                             seed=s)
                t_sweep = time.time() - t0
                n_sweeps = s
                e_now = float(mpo_expectation(solver.mps(), W_ham))
                if e_prev is not None and abs(e_now - e_prev) < 1e-6:
                    break
                e_prev = e_now
            mps = solver.mps()
            e = float(mpo_expectation(mps, W_ham)) + enuc
            row = {"m": m, "sweep_seconds": t_sweep,
                   "first_sweep_seconds": t_first, "n_sweeps": n_sweeps,
                   "energy": e}
            print(f"[frontier] m={m}: E = {e:.6f} Ha after {n_sweeps} "
                  f"sweeps, {t_sweep:.2f} s/sweep (first {t_first:.0f} s "
                  "incl. compile)", flush=True)

            if m <= TRDM_MAX_M:
                try:
                    from evcont_tpu.solvers.dmrg import (
                        mps_transition_rdm12)
                    t0 = time.time()
                    mps_transition_rdm12(mps, mps, N_ATOMS,
                                         method="sweep-device")
                    row["trdm_pair_seconds"] = time.time() - t0
                    print(f"[frontier] m={m}: t-RDM pair sweep "
                          f"{row['trdm_pair_seconds']:.1f} s", flush=True)
                except Exception as err:
                    row["trdm_error"] = f"{type(err).__name__}: {err}"
                    print(f"[frontier] m={m}: t-RDM failed "
                          f"({row['trdm_error']})", flush=True)
            rows.append(row)
            os.makedirs(os.path.dirname(OUT), exist_ok=True)
            with open(OUT, "w") as fh:
                json.dump({"mpo_D": D, "rows": rows}, fh, indent=1)
        except Exception as err:
            print(f"[frontier] m={m} infeasible: "
                  f"{type(err).__name__}: {err}", flush=True)
            rows.append({"m": m, "error": f"{type(err).__name__}: {err}"})
            break
        noise *= 0.5

    if len([r for r in rows if "energy" in r]) >= 2:
        e_best = min(r["energy"] for r in rows if "energy" in r)
        for r in rows:
            if "energy" in r:
                r["dE_vs_best"] = r["energy"] - e_best
        with open(OUT, "w") as fh:
            json.dump({"mpo_D": D, "rows": rows}, fh, indent=1)
        for r in rows:
            if "energy" in r:
                print(f"[frontier] m={r['m']}: E-E(best) = "
                      f"{r['dE_vs_best']:.3e} Ha, {r['sweep_seconds']:.1f}"
                      " s/sweep", flush=True)


if __name__ == "__main__":
    main()
