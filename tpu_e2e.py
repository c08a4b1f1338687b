"""End-to-end latency/throughput of the flagship model paths on the chip:
batched PES+forces (the bench metric), single-eval latency (the MD floor),
and the MD scan step. Uses bench.py's synthetic Zundel-84 store.

Run: python tpu_e2e.py [batch]
"""

import sys
import time

import numpy as np

import bench


def timeit(f, *args, reps=5):
    np.array(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.array(f(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main(batch=32):
    import jax
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.integrals.engine import IntegralEngine
    from evcont_tpu.md.integrators import run_nve

    mol, _ = bench.eval_geometry(1)
    nao = IntegralEngine(mol).nao
    ov, r1, r2 = bench.make_store_device(nao)
    model = ContinuationModel(mol, ov, r1, r2)
    print(f"platform={jax.devices()[0].platform} ntrain={bench.NTRAIN}",
          flush=True)

    _, cb = bench.eval_geometry(batch)
    t = timeit(lambda c: model.potential_and_forces_batch(c)[0], cb)
    print(f"PES+forces batch {batch}: {1e3 * t:7.1f} ms "
          f"({batch / t:6.1f} evals/s)", flush=True)

    t = timeit(lambda c: model.potential_batch(c), cb)
    print(f"PES only   batch {batch}: {1e3 * t:7.1f} ms "
          f"({batch / t:6.1f} evals/s)", flush=True)

    c1 = cb[0]
    t = timeit(lambda c: model.potential_and_forces(c)[0], c1)
    print(f"single PES+forces: {1e3 * t:7.1f} ms", flush=True)
    t = timeit(lambda c: model.potential(c), c1)
    print(f"single PES:        {1e3 * t:7.1f} ms", flush=True)

    masses = mol.masses_au().astype(np.float32)
    efn, store = model.energy_fn_with_store()
    for n_md in (50,):
        run_md = jax.jit(
            lambda cc, ov, r1_, r2_: run_nve(
                lambda c: efn(c, ov, r1_, r2_), masses, cc, None,
                np.float32(5.0), n_md))
        t = timeit(lambda c: run_md(c, *store)["epot"], c1, reps=3)
        print(f"MD scan {n_md} steps: {1e3 * t:7.1f} ms "
              f"({1e3 * t / n_md:6.1f} ms/step, "
              f"{n_md / t:5.1f} steps/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
