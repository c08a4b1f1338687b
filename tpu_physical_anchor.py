"""Physical-store anchor: the flagship eval path measured on a REAL
trained CAS t-RDM store (VERDICT r3 #7 — close the "synthetic-store
benchmark" objection with one anchored run on physical training data).

The committed `artifacts_zundel_AL/` run (Zundel cation, 6-31G,
CAS(8o,4e), converged on-the-fly active learning at 34 states) holds
`trn_times.txt`, the per-iteration trajectories, and the overlap/one_rdm
store — but the ~1.4 GB two_rdm was never committed. Phase 1 rebuilds the
full store by replaying the 34 training geometries through the same CAS
solver (the zundel_al.py legacy-replay branch); the worker snapshots
after every append, so the rebuild is resumable and can be run in
background chunks (`kill $(cat /tmp/anchor_rebuild.pid)` for a clean TPU
measurement window, rerun to continue). Phase 2 loads the rebuilt store
and measures, on the TPU, the same quantities the synthetic bench
reports: batched PES+forces evals/s and the f32 ladder vs this host's
CPU f64 — at the physical 34-state store (595 pairs; the synthetic
flagship has 84 states / 3,570 pairs; per-eval assembly cost is linear
in pairs, quoted per-pair for comparison).

Phases:
  python tpu_physical_anchor.py rebuild     # CPU, hours, resumable
  python tpu_physical_anchor.py measure     # TPU, minutes
  python tpu_physical_anchor.py cpu         # CPU-f64 single-eval anchor
"""

import json
import os
import sys
import time

import numpy as np

SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "artifacts_zundel_AL")
WORKDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts_zundel_anchor")
STORE = os.path.join(WORKDIR, "store_rebuilt.npz")
RESULT = os.path.join(WORKDIR, "anchor_result.json")


def _mol():
    from evcont_tpu.workloads.common import zundel
    return zundel(basis="6-31g")


def rebuild():
    """Replay the 34 training geometries through the CAS solver; snapshot
    after every append (resume = rerun this command)."""
    from evcont_tpu.backends.host_worker import HostWorkerBackend
    from evcont_tpu.workloads.zundel_al import (
        reconstruct_training_geometries)

    os.makedirs(WORKDIR, exist_ok=True)
    mol = _mol()
    trn_times = np.loadtxt(os.path.join(SRC, "trn_times.txt")) \
        .astype(int).reshape(-1).tolist()
    geoms = reconstruct_training_geometries(mol, SRC, trn_times)
    have = os.path.exists(os.path.join(WORKDIR, "solver_state.pkl"))
    t0 = time.time()
    with HostWorkerBackend(
            "evcont_tpu.backends.casci_backend:CASCIBackend",
            kwargs={"ncas": 8, "nelecas": 4, "compress": True},
            workdir=WORKDIR, compress=True, resume=have) as backend:
        start = backend.ntrain if have else 0
        print(f"[anchor] resuming at state {start}/{len(geoms)}",
              flush=True)
        for k in range(start, len(geoms)):
            backend.append_to_rdms(mol.set_geom(geoms[k]))
            print(f"[anchor] appended {k + 1}/{len(geoms)} "
                  f"({time.time() - t0:.0f} s)", flush=True)
        # cross-check against the committed artifacts: same training set
        # must reproduce the same overlaps up to the arbitrary global sign
        # of each CI vector (continuation energies are invariant under
        # D S D, D = diag(+-1)); residual = SCF/Davidson iteration noise
        ov_ref = np.load(os.path.join(SRC, "overlap.npy"))
        ov_new = np.asarray(backend.overlap)
        # np.sign would return 0 on a (numerically) zero first-row overlap
        # and zero out that state's whole row/column; gauge must be +-1
        s = np.where(ov_new[0] * ov_ref[0] >= 0, 1.0, -1.0)
        s[0] = 1.0
        dov = np.abs(s[:, None] * ov_new * s[None, :] - ov_ref).max()
        print(f"[anchor] max|overlap - committed| (sign-gauge-fixed) = "
              f"{dov:.3e}", flush=True)
        np.savez(STORE, overlap=np.asarray(backend.overlap),
                 one_rdm=np.asarray(backend.one_rdm),
                 two_rdm=np.asarray(backend.two_rdm))
        print(f"[anchor] store saved: {STORE}", flush=True)


def _load_model(f32=True, compress_s8=False):
    from evcont_tpu.model import ContinuationModel
    with np.load(STORE) as st:
        ov, r1, r2 = st["overlap"], st["one_rdm"], st["two_rdm"]
    if f32:
        r1, r2 = r1.astype(np.float32), r2.astype(np.float32)
    mol = _mol()
    # production conditioning, as in the AL driver and stage-4 pipeline
    return mol, ContinuationModel.orthonormalized(
        mol, ov, r1, r2, compress_s8=compress_s8)


def measure():
    """TPU: batched PES+forces throughput + single-geometry values on the
    physical store. Pass `s8` on the command line to measure the
    production s8 layout (oao.py 8-fold ERI-symmetry projection) instead
    of rfp — both are recorded under distinct keys."""
    import jax
    import bench

    s8 = "s8" in sys.argv[1:]
    mol, model = _load_model(f32=True, compress_s8=s8)
    ntrain = model.overlap.shape[0]
    npair = model.one_rdm.shape[0]
    print(f"[anchor] platform={jax.devices()[0].platform} "
          f"ntrain={ntrain} pairs={npair} layout={model.packed_layout}",
          flush=True)
    _, batch = bench.eval_geometry(64)
    e, F = model.potential_and_forces_batch(batch)
    np.array(e)
    times = []
    for rep in range(5):
        t0 = time.time()
        e, F = model.potential_and_forces_batch(
            batch + np.float32(1e-5 * (rep + 1)))
        np.array(e)
        times.append(time.time() - t0)
    eps = len(batch) / float(np.median(times))
    c = bench.eval_geometry(1)[1][0]
    e1, f1 = model.potential_and_forces(c)
    out = {"evals_per_sec": eps, "batch": len(batch), "ntrain": ntrain,
           "npair": npair, "evals_per_sec_per_kpair": eps * npair / 1e3,
           "e_f32": float(e1),
           "f_f32": np.asarray(f1, dtype=np.float64).ravel().tolist()}
    if s8:
        out = {f"s8_{k}": v for k, v in out.items()}
    os.makedirs(WORKDIR, exist_ok=True)
    prev = {}
    if os.path.exists(RESULT):
        with open(RESULT) as fh:
            prev = json.load(fh)
    prev.update(out)
    with open(RESULT, "w") as fh:
        json.dump(prev, fh, indent=1)
    print(f"[anchor] physical-store throughput ({model.packed_layout}): "
          f"{eps:.1f} evals/s (batch {len(batch)}, {npair} pairs; "
          f"{eps * npair / 1e3:.1f} evals/s per kpair)", flush=True)


def cpu():
    """CPU-f64 single-eval numerics + timing anchor on the same store."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import bench

    mol, model = _load_model(f32=False)
    c = np.asarray(bench.eval_geometry(1)[1][0], dtype=np.float64)
    e, f = model.potential_and_forces(c)
    e = float(e)
    times = []
    for rep in range(3):
        t0 = time.time()
        e2, f2 = model.potential_and_forces(c * (1.0 + 1e-9 * (rep + 1)))
        float(e2), np.asarray(f2)
        times.append(time.time() - t0)
    with open(RESULT) as fh:
        prev = json.load(fh)
    prev.update(cpu_eval_seconds=float(np.median(times)), e_cpu=e,
                f_cpu=np.asarray(f).ravel().tolist())
    if "e_f32" in prev:
        de = abs(prev["e_f32"] - e)
        df = np.abs(np.array(prev["f_f32"])
                    - np.asarray(f).ravel()).max()
        prev.update(ladder_f32_dE=de, ladder_f32_dF=float(df))
        print(f"[anchor] f32 vs CPU f64 on the physical store: "
              f"|dE| = {de:.3e} Ha, max|dF| = {df:.3e} Ha/Bohr",
              flush=True)
    with open(RESULT, "w") as fh:
        json.dump(prev, fh, indent=1)
    print(f"[anchor] cpu: {float(np.median(times)):.2f} s/eval, "
          f"E = {e:.8f}", flush=True)


if __name__ == "__main__":
    {"rebuild": rebuild, "measure": measure,
     "cpu": cpu}[sys.argv[1] if len(sys.argv) > 1 else "measure"]()
