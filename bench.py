"""Headline benchmark: batched Zundel-cation PES + force evaluation at the
reference's production training-set scale.

Metric (BASELINE.json): PES+force evals/sec for the Zundel (H2O-H3O+)
6-31G workload at NTRAIN=84 training states — the reference's flagship
configuration (scripts/MD/H2O-H3O+/md_H2O-H3O+_continuation_DMRG.py:82-83,
evaluate_dipole_moment_charges_continuation.py:56): 3,570 training pairs x
307,720 packed two-body entries (~4.4 GB f32 store resident in HBM).

Each evaluation runs the full inference pipeline on device: AO integrals
(McMurchie-Davidson), Löwdin OAO transform, subspace Hamiltonian assembly
over the pair-compressed store, generalized eigensolve, and nuclear forces
by autodiff.

Store construction: synthetic training data with the exact compute/memory
cost of DMRG-trained t-RDMs (training-state generation is a separate
offline stage in both frameworks), generated ON DEVICE from
jax.random.bits — backend-deterministic integers mapped to exactly-f32-
representable uniforms, so (a) no multi-GB host->device transfer through
the tunnel, and (b) the CPU-f64 reference process reconstructs bitwise-
identical store values, making the TPU-vs-CPU error measurement free of
representation noise.

vs_baseline: measured IN-RUN against the same mathematical pipeline in
f64 on single-thread XLA CPU on this host (the reference role: its
NumPy/libcint implementation cannot run here — no pyscf). The CPU process
evaluates the identical model at the identical geometry; its energy/force
values also anchor the TPU numerics:

Precision ladder (reported on stderr): plain f32 | compensated assembly
(MXU, chunked two-float) | exact assembly (VPU TwoProd, f64-class
contraction) — see evcont_tpu/subspace/compensated.py for the error
model. The residual gap to CPU f64 after the exact rung is the f32
integral pipeline itself.

Numerics: the package forces highest matmul precision on TPU (see
evcont_tpu/__init__.py); with XLA's default bf16 MXU passes the
near-singular training overlap amplifies rounding into multi-Hartree
errors.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NTRAIN = 84
BATCH_CANDIDATES = (32, 16, 8)
REPS = 5
SEED = 0


def store_shapes(nao):
    npair = NTRAIN * (NTRAIN + 1) // 2
    npacked = nao * nao * (nao * nao + 1) // 2
    return npair, npacked


def make_store_device(nao):
    """Synthetic pair-compressed store, generated on device from
    backend-deterministic random bits; every value is exactly
    f32-representable (k * 2^-24 arithmetic)."""
    import jax
    import jax.numpy as jnp

    npair, npacked = store_shapes(nao)
    key = jax.random.PRNGKey(SEED)
    k_ov, k_r1, k_r2 = jax.random.split(key, 3)

    def uniform_pm(k, shape, scale):
        bits = jax.random.bits(k, shape, dtype=jnp.uint32)
        u = (bits >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)
        return (u - jnp.float32(0.5)) * jnp.float32(scale)

    @jax.jit
    def build():
        ov = jnp.eye(NTRAIN, dtype=jnp.float32) \
            + uniform_pm(k_ov, (NTRAIN, NTRAIN), 0.2)
        ov = 0.5 * (ov + ov.T)
        r1 = uniform_pm(k_r1, (npair, nao, nao), 0.02)
        r2 = uniform_pm(k_r2, (npair, npacked), 0.002)
        return ov, r1, r2

    return build()


def eval_geometry(batch_size=1):
    """Deterministic evaluation geometries (small; host numpy is fine)."""
    from evcont_tpu.workloads.common import zundel
    mol = zundel(basis="6-31g")
    c0 = np.asarray(mol.coords, dtype=np.float32)
    rng = np.random.default_rng(7)
    batch = np.stack([
        (c0 + 0.02 * rng.standard_normal(c0.shape)).astype(np.float32)
        for _ in range(batch_size)
    ])
    return mol, batch


def cpu_reference():
    """Run the CPU-f64 reference in a subprocess (the axon sitecustomize
    pins this process's backend, so a fresh interpreter is required)."""
    code = (
        "import os, json, time\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import bench\n"
        "from evcont_tpu.model import ContinuationModel\n"
        "mol, batch = bench.eval_geometry(1)\n"
        "from evcont_tpu.integrals.engine import IntegralEngine\n"
        "nao = IntegralEngine(mol).nao\n"
        "ov, r1, r2 = bench.make_store_device(nao)\n"
        "ov64, r164, r264 = (np.asarray(a, dtype=np.float64)"
        " for a in (ov, r1, r2))\n"
        "model = ContinuationModel(mol, ov64, r164, r264)\n"
        "c = np.asarray(batch[0], dtype=np.float64)\n"
        "e, f = model.potential_and_forces(c)   # compile + warm\n"
        "e = float(e); f = np.asarray(f)\n"
        "t0 = time.time()\n"
        "e2, f2 = model.potential_and_forces(c * (1.0 + 1e-9))\n"
        "float(e2); np.asarray(f2)\n"
        "dt = time.time() - t0\n"
        "print(json.dumps({'cpu_eval_seconds': dt, 'energy': e,"
        " 'forces': f.ravel().tolist()}))\n"
    )
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=os.path.dirname(os.path.abspath(__file__)),
                          capture_output=True, text=True, timeout=7200)
    if proc.returncode != 0:
        raise RuntimeError("CPU reference failed:\n" + proc.stderr[-4000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    import jax
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.integrals.engine import IntegralEngine

    t_start = time.time()
    mol, _ = eval_geometry(1)
    eng = IntegralEngine(mol)
    nao = eng.nao
    print(f"[bench] platform={jax.devices()[0].platform} nao={nao} "
          f"ntrain={NTRAIN} store="
          f"{store_shapes(nao)[0]}x{store_shapes(nao)[1]} "
          f"({store_shapes(nao)[0] * store_shapes(nao)[1] * 4 / 2**30:.2f}"
          f" GiB f32)", file=sys.stderr)

    ov, r1, r2 = make_store_device(nao)
    model = ContinuationModel(mol, ov, r1, r2)

    # ---- throughput: batched PES + forces ------------------------------
    evals_per_sec, batch_used, rep_times = None, None, []
    for B in BATCH_CANDIDATES:
        try:
            _, batch = eval_geometry(B)
            e, F = model.potential_and_forces_batch(batch)
            np.array(e)   # force a host sync (block_until_ready is a
            #               no-op through the axon tunnel)
            rep_times = []
            for rep in range(REPS):
                t0 = time.time()
                e, F = model.potential_and_forces_batch(
                    batch + np.float32(1e-5 * (rep + 1)))
                np.array(e)
                rep_times.append(time.time() - t0)
            dt = float(np.median(rep_times))
            evals_per_sec = B / dt
            batch_used = B
            break
        except Exception as err:  # OOM at this batch size: step down
            print(f"[bench] batch {B} failed ({type(err).__name__}); "
                  "trying smaller", file=sys.stderr)
    if evals_per_sec is None:
        raise RuntimeError("all batch sizes failed")
    print(f"[bench] batch={batch_used} rep times="
          f"{[round(t, 3) for t in rep_times]} s "
          f"(median {np.median(rep_times):.3f}, "
          f"min {min(rep_times):.3f})", file=sys.stderr)

    # ---- precision ladder on one geometry ------------------------------
    _, batch1 = eval_geometry(1)
    c = batch1[0]
    e_f32, f_f32 = model.potential_and_forces(c)
    e_f32 = float(e_f32)
    f_f32 = np.asarray(f_f32, dtype=np.float64)
    model.enable_compensated()   # store values are exactly f32: lo = 0
    e_comp = float(model.potential_compensated(c))

    # ---- CPU f64 reference (throughput baseline + numerics anchor) -----
    print("[bench] running CPU f64 reference subprocess...",
          file=sys.stderr)
    ref = cpu_reference()
    cpu_evals_per_sec = 1.0 / ref["cpu_eval_seconds"]
    e_ref = ref["energy"]
    f_ref = np.array(ref["forces"]).reshape(f_f32.shape)

    print(f"[bench] CPU f64: {ref['cpu_eval_seconds']:.2f} s/eval "
          f"({cpu_evals_per_sec:.4f} evals/s)", file=sys.stderr)
    print("[bench] precision ladder vs CPU f64 at ntrain=84:",
          file=sys.stderr)
    print(f"[bench]   f32 assembly:         |dE| = {abs(e_f32 - e_ref):.3e}"
          f" Ha, max|dF| = {np.abs(f_f32 - f_ref).max():.3e}",
          file=sys.stderr)
    print(f"[bench]   exact assembly (VPU): |dE| = {abs(e_comp - e_ref):.3e}"
          " Ha (residual = f32 integral pipeline)", file=sys.stderr)

    print(f"[bench] total wall time {time.time() - t_start:.0f} s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "zundel84_pes_force_evals_per_sec",
        "value": round(evals_per_sec, 2),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / cpu_evals_per_sec, 1),
    }))


if __name__ == "__main__":
    main()
