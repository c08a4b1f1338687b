"""Headline benchmark: batched Zundel-cation PES + force evaluation at the
reference's production training-set scale.

Metric (BASELINE.json): PES+force evals/sec for the Zundel (H2O-H3O+)
6-31G workload at NTRAIN=84 training states — the reference's flagship
configuration (scripts/MD/H2O-H3O+/md_H2O-H3O+_continuation_DMRG.py:82-83,
evaluate_dipole_moment_charges_continuation.py:56): 3,570 training pairs x
307,720 packed two-body entries (~4.1 GiB f32 store resident in HBM).

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
values also anchor the TPU numerics.

Precision ladder (reported on stderr), all rungs vs CPU f64:
  f32       — the throughput path (store + integrals f32, highest matmul
              precision; see evcont_tpu/__init__.py — XLA's default bf16
              MXU passes amplify to multi-Ha errors here)
  exact asm — error-free TwoProd/TwoSum contraction over the f32 store
              (subspace/compensated.py); residual = f32 integral pipeline
  precise   — emulated-f64 integrals + eigh-polished Löwdin +
              exact f32-store assembly + f64 GEP + Hellmann-Feynman forces
              (model.potential_and_forces_precise) — the accuracy mode,
              targeting the 1e-8 Ha / 1e-6 Ha/Bohr north star on f32
              hardware

Process structure: each hardware context (TPU f32, TPU x64, CPU f64) runs
in its own subprocess — the jax x64 flag is global per process, and the
axon TPU is exclusive per process. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Run modes:
  python bench.py            the driver path — tpu32 worker only, headline
                             JSON printed the moment it returns; all other
                             rungs served from bench_cache.json (stale =>
                             warning, never recompute)
  python bench.py --refresh [cpu] [tpu64] [--reanchor]
                             untimed builder action: recompute the
                             deterministic rungs under the pinned protocol
                             (cpu: idle host, median of 5 reps, loadavg
                             recorded) and rewrite the per-rung cache
"""

import hashlib
import json
import os
import subprocess
import sys
import time

import numpy as np

NTRAIN = 84
# (batch, chunk): chunk=None is a fused vmap; chunk=C processes the batch
# as lax.map sub-batches of C inside one dispatch (HBM stays at the
# chunk's footprint — a fused 128-wide vmap OOMs at the flagship store,
# BENCH_r04, so the large batches ride the known-good 64-wide body)
BATCH_CANDIDATES = ((256, 64), (128, 64), (64, None), (32, None))
REPS = 5
SEED = 0

# The CPU-f64 reference and the emulated-f64 precise rung are fully
# deterministic given (store bits, pipeline source): their values are
# cached on disk and SERVED, never recomputed, by the default run. The
# default `python bench.py` therefore costs exactly one tpu32 worker and
# prints the headline JSON the moment that worker returns — a driver
# kill at ANY later point cannot lose the round's metric (rounds 2 and 3
# both died rc=124 inside optional-rung recomputes; this structure makes
# that class of failure impossible). Refreshing the deterministic rungs
# is an explicit, untimed builder action: `python bench.py --refresh`.
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_cache.json")

# Physical-store rung (VERDICT r4 weak #1): the same eval path measured
# on REAL trained CAS t-RDMs — the rebuilt 34-state Zundel active-
# learning store (tpu_physical_anchor.py). The synthetic flagship store
# is well-conditioned by construction; the physical store is what
# production data looks like, and its accuracy ladder ships with the
# headline every run.
PHYS_STORE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "artifacts_zundel_anchor", "store_rebuilt.npz")
PHYS_BATCH = 64

# Last-resort CPU-f64 baseline (s/eval) if bench_cache.json is missing
# entirely: the 2026-08-20 protocol run on this host (idle, single core;
# BENCH_r03.json tail, reps [2.68, 3.37, 2.75]). Only used — with a loud
# warning — when there is no cache at all; vs_baseline stays defined.
FALLBACK_CPU_S = 2.75


def _pipeline_fingerprint():
    """md5 over the source files whose changes could alter the cached
    CPU-f64 / precise-rung values (numerics, not perf)."""
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "evcont_tpu")
    files = ["model.py", "continuation.py", "oao.py", "molecule.py",
             "basis_data.py",
             os.path.join("subspace", "compensated.py"),
             os.path.join("subspace", "ozaki.py")]
    files += sorted(
        os.path.join("integrals", f)
        for f in os.listdir(os.path.join(root, "integrals"))
        if f.endswith(".py"))
    h = hashlib.md5()
    h.update(f"NTRAIN={NTRAIN};SEED={SEED}".encode())
    for rel in files:
        with open(os.path.join(root, rel), "rb") as fh:
            h.update(hashlib.md5(fh.read()).digest())
    return h.hexdigest()


def _cache_load():
    try:
        with open(CACHE_PATH) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _cache_store(cache):
    tmp = CACHE_PATH + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cache, fh, indent=1)
    os.replace(tmp, CACHE_PATH)


def store_shapes(nao):
    npair = NTRAIN * (NTRAIN + 1) // 2
    npacked = nao * nao * (nao * nao + 1) // 2
    return npair, npacked


def make_store_device(nao):
    """Synthetic pair-compressed store, generated on device from
    backend-deterministic random bits (threefry integer arithmetic).

    Every floating step is EXACT under any operation reassociation:
    16-bit centered integers scaled by powers of two, and the only
    addition (eye + perturbation, symmetrized) stays within the f32
    mantissa. This matters: XLA's backend-specific algebraic rewrites
    round `(u - 0.5) * scale` differently on TPU vs CPU (measured: 1-ulp
    store differences producing a false 2.7e-8 Ha floor in the precision
    ladder). With exact construction the CPU-f64 reference reconstructs
    the identical store; the main process cross-checks a store hash."""
    import jax
    import jax.numpy as jnp

    npair, npacked = store_shapes(nao)
    key = jax.random.PRNGKey(SEED)
    k_ov, k_r1, k_r2 = jax.random.split(key, 3)

    def centered16(k, shape):
        bits = jax.random.bits(k, shape, dtype=jnp.uint32)
        return (bits >> 16).astype(jnp.float32) - jnp.float32(32768.0)

    @jax.jit
    def build():
        # ov = I + symmetric perturbation, entries 1 + m * 2^-19 (exact)
        v = centered16(k_ov, (NTRAIN, NTRAIN)) * jnp.float32(2.0 ** -18)
        ov = jnp.eye(NTRAIN, dtype=jnp.float32) + 0.5 * (v + v.T)
        r1 = centered16(k_r1, (npair, nao, nao)) * jnp.float32(2.0 ** -21)
        r2 = centered16(k_r2, (npair, npacked)) * jnp.float32(2.0 ** -25)
        return ov, r1, r2

    return build()


def store_hash(ov):
    """Hash of the (small) training-overlap block, used to verify the
    TPU and CPU processes built bitwise-identical stores."""
    import hashlib
    return hashlib.md5(np.asarray(ov, dtype=np.float32)
                       .tobytes()).hexdigest()


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


def _build_model(overlap_f64=False, store_f64=False,
                 f64_contract="emulated", ozaki_depth=(6, 5),
                 ozaki_min_elems=1_000_000):
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.integrals.engine import IntegralEngine

    mol, batch = eval_geometry(1)
    nao = IntegralEngine(mol).nao
    ov, r1, r2 = make_store_device(nao)
    if overlap_f64:
        ov = np.asarray(ov, dtype=np.float64)
    if store_f64:
        # exact f64 interpretation of the bitwise-identical f32 values
        # (CPU reference only — the TPU keeps the store f32 in HBM)
        r1 = np.asarray(r1, dtype=np.float64)
        r2 = np.asarray(r2, dtype=np.float64)
    # the synthetic store's slot order carries no physical meaning, so it
    # is declared RFP-native: no 4-GiB conversion copy on device, and the
    # CPU-f64 reference interprets the identical bits the same way.
    # compress_s8 then projects onto the full 8-fold ERI-symmetry layout
    # (oao.py s8 block) — 3.72x fewer store bytes per HBM stream at
    # identical model predictions (the dropped components are orthogonal
    # to every real-orbital h2); real DMRG t-RDM stores convert the same
    # way. The projection arithmetic is exact here (store values are
    # 16-bit-integer multiples of 2^-25 and the orbit sums stay inside
    # the f32 mantissa), so the CPU-f64 reference still reconstructs
    # bitwise-identical store values.
    return ContinuationModel(mol, ov, r1, r2,
                             packed_layout="rfp-native", compress_s8=True,
                             f64_contract=f64_contract,
                             ozaki_depth=ozaki_depth,
                             ozaki_min_elems=ozaki_min_elems), batch, nao


def _phys_arrays():
    """(overlap, one_rdm, two_rdm) f64 arrays of the rebuilt physical
    store, orthonormalized (the production conditioning step used by the
    AL driver and the anchor measurements), or None when the store file
    is absent."""
    if not os.path.exists(PHYS_STORE):
        return None
    from evcont_tpu.continuation import orthonormalize_store
    with np.load(PHYS_STORE) as st:
        ov, r1, r2 = st["overlap"], st["one_rdm"], st["two_rdm"]
    ov, r1, r2 = orthonormalize_store(ov, r1, r2)
    return np.asarray(ov), np.asarray(r1), np.asarray(r2)


def _phys_md5(ov):
    return hashlib.md5(np.asarray(ov, dtype=np.float64)
                       .tobytes()).hexdigest()


def _build_phys_model(f32=True):
    """ContinuationModel on the physical store (s8 production layout).
    Returns (model, (ov64, r1_64, r2_64)) or (None, None)."""
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.workloads.common import zundel

    arrs = _phys_arrays()
    if arrs is None:
        return None, None
    ov, r1, r2 = arrs
    mol = zundel(basis="6-31g")
    if f32:
        model = ContinuationModel(mol, ov, r1.astype(np.float32),
                                  r2.astype(np.float32), compress_s8=True)
    else:
        model = ContinuationModel(mol, ov, r1, r2, compress_s8=True)
    return model, arrs


def worker_tpu32():
    """Throughput + f32/exact-assembly ladder rungs on the TPU."""
    import jax
    model, _, nao = _build_model()
    npair, npacked = store_shapes(nao)
    np8 = model.two_rdm.shape[-1]
    print(f"[bench] platform={jax.devices()[0].platform} nao={nao} "
          f"ntrain={NTRAIN} store={npair}x{npacked} "
          f"({npair * npacked * 4 / 2**30:.2f} GiB f32 source) -> s8 "
          f"{npair}x{np8} ({npair * np8 * 4 / 2**30:.2f} GiB resident)",
          file=sys.stderr)

    # probe every candidate batch size that fits and keep the fastest —
    # per-eval cost is not monotone in batch (HBM pressure vs dispatch
    # amortization), so "first that fits" can leave throughput on the table
    evals_per_sec, batch_used, rep_times = None, None, []
    for B, chunk in BATCH_CANDIDATES:
        try:
            _, batch = eval_geometry(B)
            e, F = model.potential_and_forces_batch(batch, chunk=chunk)
            np.array(e)   # force a host sync (block_until_ready is a
            #               no-op through the axon tunnel)
            times = []
            for rep in range(REPS):
                t0 = time.time()
                e, F = model.potential_and_forces_batch(
                    batch + np.float32(1e-5 * (rep + 1)), chunk=chunk)
                np.array(e)
                times.append(time.time() - t0)
            eps = B / float(np.median(times))
            tag = f"batch={B}" + (f" (chunk {chunk})" if chunk else "")
            print(f"[bench] {tag}: {eps:.1f} evals/s", file=sys.stderr)
            if evals_per_sec is None or eps > evals_per_sec:
                evals_per_sec, batch_used, rep_times = eps, B, times
        except Exception as err:  # OOM at this batch size: step down
            print(f"[bench] batch {B} (chunk {chunk}) failed "
                  f"({type(err).__name__}); trying smaller",
                  file=sys.stderr)
    if evals_per_sec is None:
        raise RuntimeError("all batch sizes failed")
    print(f"[bench] batch={batch_used} rep times="
          f"{[round(t, 3) for t in rep_times]} s", file=sys.stderr)

    mol, batch1 = eval_geometry(1)
    c = batch1[0]
    e_f32, f_f32 = model.potential_and_forces(c)
    model.enable_compensated()   # store values are exactly f32: lo = 0
    e_comp = float(model.potential_compensated(c))

    # MD steps/sec — the second half of the BASELINE.json metric: a whole
    # NVE trajectory as ONE on-device lax.scan at the same 84-state store
    # (the reference's MD scanner round-trips host<->libcint every step,
    # MD_utils.py:20-57; here the step body is the jitted pipeline).
    md_steps_per_sec = ep_eigh = None
    try:
        from evcont_tpu.md.integrators import run_nve
        masses = mol.masses_au().astype(np.float32)
        # thread the 4.4 GiB store as traced arguments — closing over it
        # (energy_fn) embeds it as compile-time constants, which kills the
        # remote-compile RPC at this scale (measured: broken pipe)
        efn_s, store = model.energy_fn_with_store()
        n_md = 100

        def _run(cc, ov, r1, r2):
            return run_nve(lambda x: efn_s(x, ov, r1, r2), masses, cc,
                           None, np.float32(5.0), n_md)
        run_md = jax.jit(_run)
        ep_eigh = np.array(run_md(c, *store)["epot"])   # compile + first
        t0 = time.time()
        np.array(run_md(c * np.float32(1.0 + 1e-6), *store)["epot"])
        md_steps_per_sec = n_md / (time.time() - t0)
        print(f"[bench] MD: {md_steps_per_sec:.1f} steps/s "
              f"({n_md}-step on-device NVE scan, dt=5)", file=sys.stderr)
    except Exception as err:   # the MD rung must not sink the benchmark
        print(f"[bench] MD rung failed: {type(err).__name__}: {err}",
              file=sys.stderr)

    # warm-started Krylov MD (per-step GEP replaced by the carried-vector
    # custom-call-free Rayleigh-Ritz refinement, continuation.
    # krylov_ground_state_refine small="nocall"): the serial-MD
    # throughput path. Accuracy gate: f64 parity pinned in
    # tests/test_md.py; here the f32 epot drift vs the eigh scan is
    # printed (chaotic-trajectory-divergence-dominated).
    md_steps_krylov = md_krylov_dev = None
    try:
        from evcont_tpu.md.integrators import run_nve_stateful
        fK, (r1k, r2k), y0 = model.energy_fn_with_store_krylov(
            k=4, small="nocall", init_coords=np.asarray(c))

        def _runk(cc, y, r1, r2):
            return run_nve_stateful(lambda x, s: fK(x, s, r1, r2), masses,
                                    cc, None, np.float32(5.0), n_md, y)
        run_mdk = jax.jit(_runk)
        ep_k = np.array(run_mdk(c, y0, r1k, r2k)["epot"])  # compile+first
        t0 = time.time()
        np.array(run_mdk(c * np.float32(1.0 + 1e-6), y0, r1k, r2k)["epot"])
        md_steps_krylov = n_md / (time.time() - t0)
        md_krylov_dev = None if ep_eigh is None \
            else float(np.abs(ep_k - ep_eigh).max())
        dev_txt = "" if md_krylov_dev is None else \
            (f", max|dEpot| vs eigh scan {md_krylov_dev:.1e} Ha "
             f"over {n_md} f32 steps")
        print(f"[bench] MD (warm Krylov k=4 nocall): "
              f"{md_steps_krylov:.1f} steps/s{dev_txt}", file=sys.stderr)
        if md_steps_per_sec is None or md_steps_krylov > md_steps_per_sec:
            md_steps_per_sec = md_steps_krylov
    except Exception as err:
        print(f"[bench] Krylov MD rung failed: {type(err).__name__}: "
              f"{err}", file=sys.stderr)

    out = {
        "evals_per_sec": evals_per_sec, "batch": batch_used,
        "rep_times": rep_times, "e_f32": float(e_f32),
        "f_f32": np.asarray(f_f32, dtype=np.float64).ravel().tolist(),
        "e_comp": e_comp, "md_steps_per_sec": md_steps_per_sec,
        "md_steps_krylov": md_steps_krylov,
        "md_krylov_dev": md_krylov_dev,
        "store_md5": store_hash(model.overlap),
    }

    # ---- physical-store rung: REAL trained CAS t-RDMs (34-state Zundel
    # AL store) — throughput + f32/compensated values measured every run;
    # the accuracy ladder compares against the cached phys_cpu rung ----
    try:
        del model  # release the synthetic store's HBM first
        pm, arrs = _build_phys_model(f32=True)
        if pm is not None:
            ov64, r1_64, r2_64 = arrs
            _, pbatch = eval_geometry(PHYS_BATCH)
            e, F = pm.potential_and_forces_batch(pbatch)
            np.array(e)
            times = []
            for rep in range(REPS):
                t0 = time.time()
                e, F = pm.potential_and_forces_batch(
                    pbatch + np.float32(1e-5 * (rep + 1)))
                np.array(e)
                times.append(time.time() - t0)
            out["phys_evals_per_sec"] = PHYS_BATCH / float(np.median(times))
            e1, f1 = pm.potential_and_forces(batch1[0])
            out["phys_e_f32"] = float(e1)
            out["phys_f_f32"] = np.asarray(
                f1, dtype=np.float64).ravel().tolist()
            # compensated assembly with the true f64 store (hi+lo split):
            # fixes representation AND accumulation error of the store
            # contraction; residual = the f32 integral pipeline
            pm.enable_compensated(store_f64_one_rdm=r1_64,
                                  store_f64_two_rdm=r2_64)
            out["phys_e_comp"] = float(pm.potential_compensated(batch1[0]))
            out["phys_store_md5"] = _phys_md5(ov64)
            print(f"[bench] physical store (34-state Zundel CAS): "
                  f"{out['phys_evals_per_sec']:.1f} evals/s "
                  f"(batch {PHYS_BATCH})", file=sys.stderr)
        else:
            print("[bench] physical store absent — rung skipped",
                  file=sys.stderr)
    except Exception as err:   # must not sink the headline rungs
        print(f"[bench] physical rung failed: {type(err).__name__}: {err}",
              file=sys.stderr)

    print(json.dumps(out))


def worker_tpu64():
    """Full-precision rungs (VERDICT r4 #1 — the matched-accuracy north
    star): the precise pipeline on the ozaki-selective engine (exact
    bf16-digit MXU passes for the large f64 contractions of the integral
    pipeline, XLA emulated-f64 for the rest; measured round 5: single
    0.229 vs 0.44 s/eval emulated at |dE| 9.0e-12 Ha, batched B=16
    chunk 2 = 6.8 evals/s — the >= 6.3 evals/s/chip rung). Falls back
    to the emulated engine if the selective program stops compiling."""
    import jax
    jax.config.update("jax_enable_x64", True)
    c = np.asarray(eval_geometry(1)[1][0], dtype=np.float64)

    model = None
    engine_used = "ozaki-selective"
    try:
        model, _, _ = _build_model(overlap_f64=True,
                                   f64_contract="ozaki-selective",
                                   ozaki_depth=(6, 5),
                                   ozaki_min_elems=500_000)
        t0 = time.time()
        e, f = model.potential_and_forces_precise(c)
        e = float(e)
        f = np.asarray(f)
        t_first = time.time() - t0
    except Exception as err:
        print(f"[bench] ozaki-selective precise failed "
              f"({type(err).__name__}: {err}) — falling back to the "
              "emulated-f64 engine", file=sys.stderr)
        engine_used = "emulated"
        model, _, _ = _build_model(overlap_f64=True)
        t0 = time.time()
        e, f = model.potential_and_forces_precise(c)
        e = float(e)
        f = np.asarray(f)
        t_first = time.time() - t0
    t0 = time.time()
    e2, f2 = model.potential_and_forces_precise(c * (1.0 + 1e-10))
    float(e2), np.asarray(f2)
    print(f"[bench] precise ({engine_used}) first {t_first:.1f} s, warm "
          f"{time.time() - t0:.2f} s/eval", file=sys.stderr)

    out = {"e_precise": e, "f_precise": f.ravel().tolist(),
           "precise_engine": engine_used,
           "store_md5": store_hash(model.overlap)}

    # the north-star rung: BATCHED precise throughput — vmap turns the
    # per-geometry store contractions into GEMMs streaming the s8 store
    # once per chunk and batching amortizes the integral pipeline. Runs
    # on the same engine as the anchor values above; the accuracy values
    # (e_precise_batch0 vs the CPU reference) are taken from a final
    # UNPERTURBED evaluation — comparing the perturbed timing batch
    # would contaminate |dE| by the perturbation's physical energy
    # change (~eps * E_nuc ~ 1e-8 Ha at eps = 3e-10).
    try:
        _, batch16 = eval_geometry(16)
        b16 = np.asarray(batch16, dtype=np.float64)
        chunk = 2 if engine_used == "ozaki-selective" else 4
        eb, fb = model.potential_and_forces_precise_batch(
            b16, mode="exact", chunk=chunk)
        np.array(eb)
        times = []
        for rep in range(3):
            t0 = time.time()
            eb, fb = model.potential_and_forces_precise_batch(
                b16 * (1.0 + 1e-10 * (rep + 1)), mode="exact",
                chunk=chunk)
            np.array(eb)
            times.append(time.time() - t0)
        out["precise_batch"] = len(b16)
        out["precise_chunk"] = chunk
        out["precise_evals_per_sec"] = len(b16) / float(np.median(times))
        eb0, fb0 = model.potential_and_forces_precise_batch(
            b16, mode="exact", chunk=chunk)
        out["e_precise_batch0"] = float(np.asarray(eb0)[0])
        out["f_precise_batch0"] = np.asarray(fb0)[0].ravel().tolist()
        print(f"[bench] precise batched ({engine_used}, exact assembly): "
              f"{out['precise_evals_per_sec']:.2f} evals/s "
              f"(batch {len(b16)}, chunk {chunk})", file=sys.stderr)
    except Exception as err:
        print(f"[bench] precise batched rung failed: "
              f"{type(err).__name__}: {err}", file=sys.stderr)
        out.setdefault("precise_evals_per_sec", None)
        out.setdefault("precise_batch", None)

    # ---- physical-store precise rung: full accuracy on REAL t-RDMs ----
    try:
        try:
            del model_oz
        except NameError:
            pass
        pm, arrs = _build_phys_model(f32=True)
        if pm is not None:
            ov64, r1_64, r2_64 = arrs
            pm.enable_compensated(store_f64_one_rdm=r1_64,
                                  store_f64_two_rdm=r2_64)
            ep, fp_ = pm.potential_and_forces_precise(c)
            out["phys_e_precise"] = float(ep)
            out["phys_f_precise"] = np.asarray(fp_).ravel().tolist()
            out["phys_store_md5"] = _phys_md5(ov64)
            _, pb = eval_geometry(8)
            pb = np.asarray(pb, dtype=np.float64)
            eb, fb = pm.potential_and_forces_precise_batch(
                pb, mode="exact", chunk=4)
            np.array(eb)
            times = []
            for rep in range(3):
                t0 = time.time()
                eb, fb = pm.potential_and_forces_precise_batch(
                    pb * (1.0 + 1e-10 * (rep + 1)), mode="exact", chunk=4)
                np.array(eb)
                times.append(time.time() - t0)
            out["phys_precise_evals_per_sec"] = \
                len(pb) / float(np.median(times))
            print(f"[bench] physical precise: E = {float(ep):.10f}, "
                  f"batched {out['phys_precise_evals_per_sec']:.2f} "
                  f"evals/s", file=sys.stderr)
    except Exception as err:
        print(f"[bench] physical precise rung failed: "
              f"{type(err).__name__}: {err}", file=sys.stderr)
    print(json.dumps(out))


def worker_cpu():
    """CPU-f64 single-core reference (throughput baseline + numerics
    anchor): the identical model at the identical geometry.

    Measurement protocol (VERDICT r3 #3 — the 112x/866x/541x swing across
    rounds was host contention, not performance): median over 5 reps,
    load average recorded before and after, and a loud warning when the
    host was not idle at start (the measurement should be rerun)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    load_before = os.getloadavg()
    if load_before[0] > 0.5:
        print(f"[bench] WARNING: 1-min loadavg {load_before[0]:.2f} > 0.5 "
              "at CPU-baseline start — timings may be contended; rerun "
              "--refresh on an idle host", file=sys.stderr)
    model, batch, _ = _build_model(overlap_f64=True, store_f64=True)
    c = np.asarray(batch[0], dtype=np.float64)
    e, f = model.potential_and_forces(c)   # compile + warm
    e = float(e)
    f = np.asarray(f)
    times = []
    for rep in range(5):
        t0 = time.time()
        e2, f2 = model.potential_and_forces(c * (1.0 + 1e-9 * (rep + 1)))
        float(e2), np.asarray(f2)
        times.append(time.time() - t0)
    print(f"[bench] cpu rep times={[round(t, 2) for t in times]} s, "
          f"loadavg before={load_before} after={os.getloadavg()}",
          file=sys.stderr)
    print(json.dumps({"cpu_eval_seconds": float(np.median(times)),
                      "cpu_rep_times": times,
                      "loadavg_before": list(load_before),
                      "loadavg_after": list(os.getloadavg()),
                      "energy": e, "forces": f.ravel().tolist(),
                      "store_md5": store_hash(model.overlap)}))


def worker_phys_cpu():
    """CPU-f64 reference on the physical store: numerics anchor for the
    physical accuracy ladder + its own s/eval baseline. Deterministic
    given (store file, pipeline source) — cached like the cpu rung."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    load_before = os.getloadavg()
    if load_before[0] > 0.5:
        print(f"[bench] WARNING: 1-min loadavg {load_before[0]:.2f} > 0.5 "
              "at phys-cpu start — timings may be contended",
              file=sys.stderr)
    pm, arrs = _build_phys_model(f32=False)
    if pm is None:
        raise RuntimeError(f"physical store absent: {PHYS_STORE}")
    _, batch1 = eval_geometry(1)
    c = np.asarray(batch1[0], dtype=np.float64)
    e, f = pm.potential_and_forces(c)
    e = float(e)
    f = np.asarray(f)
    times = []
    for rep in range(5):
        t0 = time.time()
        e2, f2 = pm.potential_and_forces(c * (1.0 + 1e-9 * (rep + 1)))
        float(e2), np.asarray(f2)
        times.append(time.time() - t0)
    print(json.dumps({"cpu_eval_seconds": float(np.median(times)),
                      "cpu_rep_times": times,
                      "loadavg_before": list(load_before),
                      "loadavg_after": list(os.getloadavg()),
                      "energy": e, "forces": f.ravel().tolist(),
                      "store_md5": _phys_md5(arrs[0])}))


def _run_worker(name, timeout=7200):
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", name],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    sys.stderr.write(proc.stderr[-4000:] if proc.returncode else proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"worker {name} failed (rc={proc.returncode})")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _migrate_cache(cache):
    """Old cache schema kept one global fingerprint for all rungs; the
    per-rung schema records which source state each rung was computed at,
    so a stale rung can never be silently blessed by a later refresh of a
    different rung (ADVICE r3, medium)."""
    glob_fp = cache.get("fingerprint")
    glob_md5 = cache.get("store_md5")
    for rung in ("cpu", "tpu64"):
        if cache.get(rung) is not None:
            cache.setdefault(f"{rung}_fingerprint", glob_fp)
            cache.setdefault(f"{rung}_store_md5",
                             cache[rung].get("store_md5", glob_md5))
    return cache


def _rung(cache, name, fp, store_md5):
    """(entry, status) for a cached rung: status is "fresh", "stale"
    (source fingerprint or store bits changed since it was computed), or
    None when absent."""
    entry = cache.get(name)
    if entry is None:
        return None, None
    ok = (cache.get(f"{name}_fingerprint") == fp
          and cache.get(f"{name}_store_md5") == store_md5)
    return entry, ("fresh" if ok else "stale")


def refresh(rungs=("cpu", "tpu64")):
    """Recompute the deterministic rungs and rewrite the cache — the
    explicit, untimed builder action (never done by the default run)."""
    fp = _pipeline_fingerprint()
    cache = _migrate_cache(_cache_load())
    for name in rungs:
        t0 = time.time()
        entry = _run_worker(name)
        cache[name] = entry
        cache[f"{name}_fingerprint"] = fp
        cache[f"{name}_store_md5"] = entry["store_md5"]
        cache[f"{name}_wall_s"] = time.time() - t0
        cache[f"{name}_date"] = time.strftime("%Y-%m-%d")
        if name == "cpu":
            # the anchored cross-round baseline: pinned at the first
            # protocol-conformant measurement, NOT silently re-anchored
            # (vs_baseline must stay comparable across driver rounds);
            # pass --reanchor to move it deliberately.
            if ("cpu_anchor_s" not in cache
                    or "--reanchor" in sys.argv):
                cache["cpu_anchor_s"] = entry["cpu_eval_seconds"]
                cache["cpu_anchor_date"] = time.strftime("%Y-%m-%d")
        _cache_store(cache)
        print(f"[bench] refreshed rung {name} "
              f"({cache[f'{name}_wall_s']:.0f} s)", file=sys.stderr)


def main():
    t_start = time.time()
    r32 = _run_worker("tpu32")

    fp = _pipeline_fingerprint()
    cache = _migrate_cache(_cache_load())
    ref, cpu_status = _rung(cache, "cpu", fp, r32["store_md5"])

    # vs_baseline uses the ANCHORED CPU s/eval (pinned once under the
    # idle-host 5-rep protocol) so the multiplier is comparable across
    # rounds; the live cached measurement + its variance go to stderr.
    if ref is not None:
        anchor_s = cache.get("cpu_anchor_s", ref["cpu_eval_seconds"])
    else:
        anchor_s = FALLBACK_CPU_S
        print("[bench] WARNING: no cached CPU baseline at all — using the "
              f"recorded fallback {FALLBACK_CPU_S} s/eval; run `python "
              "bench.py --refresh` untimed to measure one", file=sys.stderr)

    # physical-store accuracy fields for the headline: compare the
    # tpu32 worker's physical values against the cached phys_cpu
    # reference (cache read only — nothing here can stall the headline)
    headline = {
        "metric": "zundel84_pes_force_evals_per_sec",
        "value": round(r32["evals_per_sec"], 2),
        "unit": "evals/s",
        "vs_baseline": round(r32["evals_per_sec"] * anchor_s, 1),
    }
    pref = pstat = None
    if r32.get("phys_evals_per_sec"):
        headline["physical_evals_per_sec"] = round(
            r32["phys_evals_per_sec"], 1)
        pref, pstat = _rung(cache, "phys_cpu", fp,
                            r32.get("phys_store_md5"))
        if pref is not None:
            headline["physical_f32_dE_Ha"] = float(
                f"{abs(r32['phys_e_f32'] - pref['energy']):.3e}")
            headline["physical_f32_dF_Ha_Bohr"] = float(
                f"{np.abs(np.array(r32['phys_f_f32']) - np.array(pref['forces'])).max():.3e}")
            if r32.get("phys_e_comp") is not None:
                headline["physical_comp_dE_Ha"] = float(
                    f"{abs(r32['phys_e_comp'] - pref['energy']):.3e}")
    r64c = cache.get("tpu64") or {}
    if r64c.get("phys_e_precise") is not None and pref is not None \
            and r64c.get("phys_store_md5") == r32.get("phys_store_md5"):
        headline["physical_precise_dE_Ha"] = float(
            f"{abs(r64c['phys_e_precise'] - pref['energy']):.3e}")
        if r64c.get("phys_precise_evals_per_sec"):
            headline["physical_precise_evals_per_sec"] = round(
                r64c["phys_precise_evals_per_sec"], 2)
    if r64c.get("precise_evals_per_sec"):
        headline["precise_batched_evals_per_sec"] = round(
            r64c["precise_evals_per_sec"], 2)
        headline["precise_batched_vs_baseline"] = round(
            r64c["precise_evals_per_sec"] * anchor_s, 1)
        if r64c.get("e_precise_batch0") is not None and ref is not None \
                and r64c.get("store_md5") == ref.get("store_md5"):
            headline["precise_batched_dE_Ha"] = float(
                f"{abs(r64c['e_precise_batch0'] - ref['energy']):.3e}")

    # THE HEADLINE, immediately after the tpu32 worker: nothing printed
    # or computed past this line can lose the round's metric.
    print(json.dumps(headline), flush=True)

    if cpu_status == "stale":
        print("[bench] WARNING: cached CPU baseline is STALE (pipeline "
              f"fingerprint or store bits changed since "
              f"{cache.get('cpu_date', '?')}) — accuracy ladder below "
              "compares against outdated reference values; run `python "
              "bench.py --refresh` untimed", file=sys.stderr)
    if ref is None:
        print(f"[bench] total wall time {time.time() - t_start:.0f} s",
              file=sys.stderr)
        return

    # ---- informational ladder (all cached; no recomputation) ----------
    r64, t64_status = _rung(cache, "tpu64", fp, r32["store_md5"])
    cpu_s = ref["cpu_eval_seconds"]
    reps = ref.get("cpu_rep_times")
    spread = (f" (reps {[round(t, 2) for t in reps]})" if reps else "")
    print(f"[bench] CPU f64: {cpu_s:.2f} s/eval{spread}, anchored "
          f"{anchor_s:.2f} s/eval "
          f"[{cpu_status}, {cache.get('cpu_date', '?')}]", file=sys.stderr)
    if r32.get("md_steps_per_sec"):
        print(f"[bench] MD steps/sec (100-step on-device NVE scan): "
              f"{r32['md_steps_per_sec']:.1f}", file=sys.stderr)
    if r32.get("md_steps_krylov"):
        dev = r32.get("md_krylov_dev")
        print(f"[bench] MD steps/sec (warm Krylov k=4 nocall): "
              f"{r32['md_steps_krylov']:.1f}"
              + ("" if dev is None else f" (|dEpot| {dev:.1e} Ha)"),
              file=sys.stderr)

    if ref["store_md5"] != r32["store_md5"]:
        print("[bench] WARNING: store bits differ between the tpu32 run "
              "and the cached CPU reference — skipping the accuracy "
              "ladder (not comparing identical models)", file=sys.stderr)
    else:
        e_ref = ref["energy"]
        f_ref = np.array(ref["forces"])
        f_f32 = np.array(r32["f_f32"])
        print(f"[bench] precision ladder vs CPU f64 at ntrain={NTRAIN}"
              f" [{cpu_status}]:", file=sys.stderr)
        print(f"[bench]   f32:        |dE| = "
              f"{abs(r32['e_f32'] - e_ref):.3e} Ha, max|dF| = "
              f"{np.abs(f_f32 - f_ref).max():.3e} Ha/Bohr", file=sys.stderr)
        print(f"[bench]   exact asm:  |dE| = "
              f"{abs(r32['e_comp'] - e_ref):.3e} Ha", file=sys.stderr)
        if r64 is not None and r64["store_md5"] == ref["store_md5"]:
            f_pre = np.array(r64["f_precise"])
            print(f"[bench]   precise:    |dE| = "
                  f"{abs(r64['e_precise'] - e_ref):.3e} Ha, max|dF| = "
                  f"{np.abs(f_pre - f_ref).max():.3e} Ha/Bohr "
                  f"[{t64_status}, {cache.get('tpu64_date', '?')}]",
                  file=sys.stderr)
            if r64.get("e_ozaki") is not None:
                f_oz = np.array(r64["f_ozaki"])
                print(f"[bench]   precise/ozaki (MXU): |dE| = "
                      f"{abs(r64['e_ozaki'] - e_ref):.3e} Ha, max|dF| = "
                      f"{np.abs(f_oz - f_ref).max():.3e} Ha/Bohr",
                      file=sys.stderr)
            if r64.get("precise_evals_per_sec"):
                pes = r64["precise_evals_per_sec"]
                acc = ""
                if r64.get("e_precise_batch0") is not None:
                    acc = (f" at |dE| = "
                           f"{abs(r64['e_precise_batch0'] - e_ref):.3e}"
                           " Ha")
                print(f"[bench]   precise batched "
                      f"({r64.get('precise_engine', 'emulated')}, exact "
                      f"assembly, batch {r64.get('precise_batch')} chunk "
                      f"{r64.get('precise_chunk', 4)}, per chip): "
                      f"{pes:.2f} evals/s = {pes * anchor_s:.1f}x CPU f64"
                      f"{acc}; geometry-batched PES is data-parallel, so "
                      f"an 8-chip north-star slice scales this 8x "
                      f"(model.potential_and_forces_precise_sharded)",
                      file=sys.stderr)

    # ---- physical-store ladder (REAL trained t-RDMs) ------------------
    if r32.get("phys_evals_per_sec"):
        print(f"[bench] physical 34-state store: "
              f"{r32['phys_evals_per_sec']:.1f} evals/s (batch "
              f"{PHYS_BATCH})", file=sys.stderr)
        if pref is None:
            print("[bench] physical ladder: no cached phys_cpu reference "
                  "— run `python bench.py --refresh phys_cpu` untimed",
                  file=sys.stderr)
        else:
            print(f"[bench] physical ladder vs CPU f64 [{pstat}, "
                  f"{cache.get('phys_cpu_date', '?')}] (CPU "
                  f"{pref['cpu_eval_seconds']:.2f} s/eval):",
                  file=sys.stderr)
            for key, label in (("physical_f32_dE_Ha", "f32:     |dE|"),
                               ("physical_comp_dE_Ha", "comp:    |dE|"),
                               ("physical_precise_dE_Ha",
                                "precise: |dE|")):
                if headline.get(key) is not None:
                    print(f"[bench]   {label} = {headline[key]:.3e} Ha",
                          file=sys.stderr)
            if headline.get("physical_f32_dF_Ha_Bohr") is not None:
                print(f"[bench]   f32:  max|dF| = "
                      f"{headline['physical_f32_dF_Ha_Bohr']:.3e} Ha/Bohr",
                      file=sys.stderr)

    print(f"[bench] total wall time {time.time() - t_start:.0f} s",
          file=sys.stderr)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        {"tpu32": worker_tpu32, "tpu64": worker_tpu64,
         "cpu": worker_cpu, "phys_cpu": worker_phys_cpu}[
             sys.argv[sys.argv.index("--worker") + 1]]()
    elif "--refresh" in sys.argv:
        names = [a for a in sys.argv[1:]
                 if a in ("cpu", "tpu64", "phys_cpu")]
        refresh(tuple(names) or ("cpu", "tpu64", "phys_cpu"))
    else:
        main()
