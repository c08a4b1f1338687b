"""A/B: per-seed cost of vmapped multi-seed MD ensembles on the real chip.

The reference's Zundel-thermodynamics production stage runs many
independent NVT seeds as a job array (one process per seed,
scripts/MD/Zundel_thermodynamics/continuation/04_Zundel_continuation_MD.py:32).
The TPU-native form is ONE vmapped lax.scan over the seed axis
(workloads/zundel_pipeline.stage4_continuation_md_ensemble). This script
measures how the per-seed step cost amortizes with the ensemble width at
the flagship store scale (Zundel 6-31G, ntrain=84, 4.1 GiB f32 in HBM),
using bench.py's exactly-reproducible synthetic store (identical compute
and memory cost to the trained one).

Run on the TPU:  python tpu_md_ensemble_ab.py [steps]
"""

import sys
import time

import numpy as np

import bench


def main(steps=200, widths=(1, 2, 4, 8)):
    import jax
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.integrals.engine import IntegralEngine
    from evcont_tpu.md.integrators import run_nve_ensemble, \
        maxwell_boltzmann

    mol, batch1 = bench.eval_geometry(1)
    nao = IntegralEngine(mol).nao
    ov, r1, r2 = bench.make_store_device(nao)
    model = ContinuationModel(mol, ov, r1, r2)
    print(f"platform={jax.devices()[0].platform} ntrain={bench.NTRAIN} "
          f"steps={steps}", flush=True)

    masses = mol.masses_au().astype(np.float32)
    efn = model.energy_fn()
    c0 = batch1[0]
    rows = []
    for n in widths:
        v0 = np.stack([
            np.array(maxwell_boltzmann(jax.random.PRNGKey(s), masses,
                                       298.15), dtype=np.float32)
            for s in range(n)])
        cb = np.broadcast_to(c0, (n,) + c0.shape).astype(np.float32).copy()

        run = jax.jit(lambda c, v: run_nve_ensemble(
            efn, masses, c, v, np.float32(5.0), steps))
        np.array(run(cb, v0)["epot"])          # compile + first execution
        t0 = time.time()
        out = run(cb * np.float32(1.0 + 1e-6), v0)
        ep = np.array(out["epot"])
        dt = time.time() - t0
        assert np.all(np.isfinite(ep))
        ms = 1e3 * dt / (steps * n)
        rows.append((n, dt, ms))
        print(f"seeds={n:2d}  wall={dt:7.2f} s  {ms:6.1f} ms/seed-step  "
              f"({steps * n / dt:7.1f} seed-steps/s)", flush=True)

    base = rows[0][2]
    print("amortization vs single seed: "
          + ", ".join(f"{n}x: {base / ms:.2f}" for n, _, ms in rows))


if __name__ == "__main__":
    main(steps=int(sys.argv[1]) if len(sys.argv) > 1 else 200)
