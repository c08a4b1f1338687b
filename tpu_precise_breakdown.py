"""TPU study: stage breakdown of the batched precise mode at Zundel-84.

Times the two halves of model._ef_precise_batch separately on hardware:

  integrals — the emulated-f64 per-geometry pipeline (overlap, hcore, ERI,
              Newton-Schulz-refined Löwdin, 4-index OAO transform, RFP
              pack) with value_and_grad w.r.t. coords (the force path runs
              through it), vmapped over the batch
  assembly  — the error-free store contraction (TwoProd "exact" and MXU
              "compensated") over the (3570, 307720) two-float store, plus
              the Hellmann-Feynman weight GEMV (wp @ r2), per batch

The sum should reproduce the end-to-end tpu_precise_batch.py numbers; the
larger half is the optimization target for the 50x north-star rung
(VERDICT r2 #2).

Usage: python tpu_precise_breakdown.py [B]    (default 4)
"""

import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import bench


def timed(fn, *args, reps=3, label=""):
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(np.array, out)
    t_first = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(np.array, out)
        times.append(time.time() - t0)
    print(f"[breakdown] {label}: {np.median(times) * 1e3:.1f} ms "
          f"(first {t_first:.1f} s, reps {[round(t, 3) for t in times]})",
          flush=True)
    return float(np.median(times))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    model, _, nao = bench._build_model(overlap_f64=True)
    if not hasattr(model, "_comp_r1"):
        model.enable_compensated()
    r1_hi, r1_lo = model._comp_r1
    r2_hi, r2_lo = model._comp_r2
    _, batch = bench.eval_geometry(B)
    cb = jnp.asarray(np.asarray(batch, dtype=np.float64))
    print(f"[breakdown] platform={jax.devices()[0].platform} nao={nao} "
          f"B={B}", flush=True)

    from evcont_tpu.continuation import oao_integrals
    from evcont_tpu.continuation import packed_fold
    pack = packed_fold(model.packed_layout)
    from evcont_tpu.subspace.compensated import (
        compensated_pair_assembly, split_two_float_device)

    # --- stage 1: emulated-f64 integral pipeline, forward only ---------
    @jax.jit
    def integrals_fwd(cbatch):
        def one(c):
            h1, h2, enuc = oao_integrals(model.engine, c,
                                         refine_loewdin=True)
            return h1, pack(h2, diag_multiplier=0.5), enuc
        return jax.vmap(one)(cbatch)

    t_int_fwd = timed(integrals_fwd, cb, label="integrals fwd (f64)")

    # --- stage 1b: with the force pullback (the real cost in _ef) ------
    @jax.jit
    def integrals_vjp(cbatch):
        def scalar(c):
            h1, h2c, enuc = (lambda r: (r[0], pack(r[1], 0.5), r[2]))(
                oao_integrals(model.engine, c, refine_loewdin=True))
            # a fixed linear functional stands in for <g1,h1>+<g2,h2c>
            return jnp.sum(h1) * 1e-3 + jnp.sum(h2c) * 1e-6 + enuc
        return jax.vmap(jax.value_and_grad(scalar))(cbatch)

    t_int_vjp = timed(integrals_vjp, cb, label="integrals fwd+grad (f64)")

    # --- stage 2: store contraction (per batch, both modes) ------------
    h1_f64 = np.random.default_rng(0).standard_normal((nao, nao))
    h1_f64 = np.asarray(h1_f64 + h1_f64.T, dtype=np.float64)
    h2c_f64 = np.asarray(
        np.random.default_rng(1).standard_normal(r2_hi.shape[1]),
        dtype=np.float64)
    h1b = jnp.asarray(np.broadcast_to(h1_f64, (B,) + h1_f64.shape))
    h2b = jnp.asarray(np.broadcast_to(h2c_f64, (B,) + h2c_f64.shape))

    def assembly(mode, kblock):
        @jax.jit
        def run(h1bb, h2bb):
            def one(h1, h2c):
                h1s = split_two_float_device(h1)
                h2s = split_two_float_device(h2c)
                return compensated_pair_assembly(
                    r1_hi, r1_lo, r2_hi, r2_lo, h1s, h2s, mode=mode,
                    kblock=kblock)
            return jax.vmap(one)(h1bb, h2bb)
        return run

    t_asm_exact = timed(assembly("exact", 1024), h1b, h2b,
                        label="assembly exact (TwoProd VPU)")
    t_asm_comp = timed(assembly("compensated", 8192), h1b, h2b,
                       label="assembly compensated (MXU)")

    # --- stage 3: Hellmann-Feynman weight GEMV over the store ----------
    npair = r1_hi.shape[0]
    wp = jnp.asarray(np.random.default_rng(2)
                     .standard_normal((B, npair)).astype(np.float32))

    @jax.jit
    def hf_weights(w):
        g2 = w @ r2_hi + w @ r2_lo if r2_lo is not None else w @ r2_hi
        g1 = jnp.tensordot(w, r1_hi, axes=1)
        return g1, g2

    t_hf = timed(hf_weights, wp, label="HF weight GEMM (wp @ store)")

    per = 1e3 / B
    print(f"[breakdown] per-eval at B={B}: integrals fwd+grad "
          f"{t_int_vjp * per:.1f} ms, assembly exact {t_asm_exact * per:.1f}"
          f" ms / comp {t_asm_comp * per:.1f} ms, HF GEMM "
          f"{t_hf * per:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
