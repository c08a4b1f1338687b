"""A/B the serial-MD eigensolve variants on the chip (round-5 frontier #1).

Variants of the 100-step Zundel-84 NVE scan:
  * eigh path (run_nve, per-step GEP)                 — bench headline rung
  * warm Krylov (run_nve_stateful) small="eigh"       — round-5 landed, 120/s
  * warm Krylov small="nocall" at k in {8, 4, 2}      — this session: the
    k x k stage (cholesky + triangular_solve + eigh custom calls) replaced
    by unrolled scalar Cholesky-QR + cyclic-Jacobi rotations; inside a
    latency-bound scan body each custom call costs O(100 us) fixed, so
    removing all of them is the targeted lever for >= 150 steps/s.

Accuracy gate per variant: max |epot - epot_eigh| over the 100 f32 steps
(chaotic-divergence-dominated, cf. tests/test_md.py f64 parity at 5e-9).

Run on the TPU:  python tpu_md_krylov_ab.py
"""

import time

import numpy as np

import bench


def main():
    import jax

    model, _, nao = bench._build_model()
    mol, batch1 = bench.eval_geometry(1)
    c = batch1[0]
    masses = mol.masses_au().astype(np.float32)
    n_md = 100
    dt = np.float32(5.0)
    print(f"platform={jax.devices()[0].platform} nao={nao} "
          f"store={tuple(model.two_rdm.shape)}", flush=True)

    from evcont_tpu.md.integrators import run_nve, run_nve_stateful

    results = {}

    def timed(tag, fn, *args):
        t0 = time.time()
        ep = np.array(fn(*args)["epot"])
        print(f"  [{tag}] compile+first {time.time() - t0:.1f} s",
              flush=True)
        reps = []
        for _ in range(3):
            t0 = time.time()
            ep = np.array(fn(*args)["epot"])
            reps.append(time.time() - t0)
        sps = n_md / float(np.median(reps))
        results[tag] = (sps, ep)
        ref = results.get("eigh")
        dd = np.abs(ep - ref[1]).max() if ref is not None else 0.0
        print(f"  [{tag}] {sps:.1f} steps/s  max|dEpot|={dd:.2e} Ha",
              flush=True)
        return sps

    efn_s, store = model.energy_fn_with_store()
    run_eigh = jax.jit(lambda cc, ov, r1, r2: run_nve(
        lambda x: efn_s(x, ov, r1, r2), masses, cc, None, dt, n_md))
    timed("eigh", run_eigh, c, *store)

    for tag, k, small in [("krylov-k8-eigh", 8, "eigh"),
                          ("krylov-k8-nocall", 8, "nocall"),
                          ("krylov-k4-nocall", 4, "nocall"),
                          ("krylov-k2-nocall", 2, "nocall")]:
        fK, (r1k, r2k), y0 = model.energy_fn_with_store_krylov(
            k=k, small=small, init_coords=np.asarray(c))
        runk = jax.jit(lambda cc, y, r1, r2, fK=fK: run_nve_stateful(
            lambda x, s: fK(x, s, r1, r2), masses, cc, None, dt, n_md, y))
        timed(tag, runk, c, y0, r1k, r2k)

    print("\nsummary:", flush=True)
    for tag, (sps, _) in results.items():
        print(f"  {tag:20s} {sps:7.1f} steps/s")


if __name__ == "__main__":
    main()
