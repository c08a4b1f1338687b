"""Headline benchmark: batched Zundel-cation PES + force evaluation.

Metric (BASELINE.json): PES+force evals/sec for the Zundel (H2O-H3O+)
6-31G workload — the reference's production configuration
(scripts/MD/H2O-H3O+/md_H2O-H3O+_continuation_DMRG.py: 28 AOs, charge +1).
The continuation store uses the compressed pair layout with a synthetic
16-state training set (identical compute/memory cost to DMRG-trained
t-RDMs; training-state *generation* is a separate offline stage in both
frameworks).

Each evaluation runs the full inference pipeline on device: AO integrals
(McMurchie-Davidson), Löwdin OAO transform, subspace Hamiltonian assembly,
generalized eigensolve, and nuclear forces by autodiff.

vs_baseline: against the CPU reference-equivalent path (same mathematical
pipeline, f64, single-thread XLA CPU on this host: 1.168 evals/s, measured
2026-08-16 after the 8-fold ERI-symmetry rewrite; the upstream code itself
cannot run here — no pyscf — so the CPU baseline is this framework's own
CPU execution, which plays the role of the reference's NumPy/libcint
implementation).

Numerics: the package forces highest matmul precision on TPU (see
evcont_tpu/__init__.py) — with XLA's default bf16 MXU passes the
near-singular training overlap amplifies rounding into multi-Hartree
errors; at highest precision TPU f32 matches CPU f64 to ~4e-5 Ha on
FCI-trained continuation models. The throughput below is measured at
correct numerics on ONE v5e chip; the north-star 50x target envisions a
v5e-8 slice, where the geometry batch scales data-parallel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BATCH = 64
NTRAIN = 16
REPS = 3
CPU_BASELINE_EVALS_PER_SEC = 1.168


def zundel_molecule():
    from evcont_tpu.workloads.common import zundel
    return zundel(basis="6-31g")


def main():
    import jax
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.integrals.engine import IntegralEngine

    mol = zundel_molecule()
    eng = IntegralEngine(mol)
    nao = eng.nao
    npair = NTRAIN * (NTRAIN + 1) // 2
    npacked = nao * nao * (nao * nao + 1) // 2

    rng = np.random.default_rng(0)
    dtype = np.float32
    ov = np.eye(NTRAIN) + 0.1 * rng.standard_normal((NTRAIN, NTRAIN))
    ov = (0.5 * (ov + ov.T)).astype(dtype)
    r1 = (0.01 * rng.standard_normal((npair, nao, nao))).astype(dtype)
    r2 = (0.001 * rng.standard_normal((npair, npacked))).astype(dtype)

    model = ContinuationModel(mol, ov, r1, r2)
    c0 = np.asarray(mol.coords).astype(dtype)
    batch = np.stack([
        c0 + 0.02 * rng.standard_normal(c0.shape).astype(dtype)
        for _ in range(BATCH)
    ])

    # warm-up / compile
    e, F = model.potential_and_forces_batch(batch)
    np.array(e)

    # time with a per-rep host fetch of the energies: block_until_ready is
    # unreliable on the axon backend, and a user consuming results pays this
    # sync anyway (the fetched array is tiny)
    t0 = time.time()
    for rep in range(REPS):
        e, F = model.potential_and_forces_batch(
            batch + np.float32(1e-5 * rep))
        np.array(e)
    dt = (time.time() - t0) / REPS
    evals_per_sec = BATCH / dt

    print(json.dumps({
        "metric": "zundel_pes_force_evals_per_sec",
        "value": round(evals_per_sec, 2),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / CPU_BASELINE_EVALS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
