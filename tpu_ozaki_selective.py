"""TPU study: selective Ozaki routing of the precise integral pipeline.

Round-5 measurement for the matched-accuracy north star. The precise-
batched breakdown shows integrals fwd+grad = ~199 of ~210 ms/eval
(tpu_precise_breakdown.py, B=8); the store assembly is already cheap.
The ozaki-selective engine routes only the f64 contractions with a
static operand above a size threshold through exact bf16-digit MXU
passes — bounding the XLA program growth that SIGKILLed the full-ozaki
pipeline (RESULTS r4) while the FLOP-dominant einsums leave XLA's
off-MXU emulated-f64 dots.

Measured so far (synthetic Zundel-84 store, vs cached CPU-f64):
  single geometry, min_elems=5e5, depth (6,5): 0.229 s/eval warm
  (first 1476 s), |dE| = 9.0e-12 Ha, max|dF| = 1.5e-8 — viable.
  batched chunk 4: compile helper SIGKILL (program ~4x the single
  body) -> probe smaller chunks.

Usage:
  python tpu_ozaki_selective.py [min_elems] [depth] [grad_depth] [B] [chunk]
  defaults: 500000 6 5 16 4
  OZSEL_SKIP_SINGLE=1 skips the single-geometry stage (already
  measured) and goes straight to the batched probe.
"""

import os
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np

import bench


def main():
    argv = sys.argv[1:]
    min_elems = int(argv[0]) if len(argv) > 0 else 500_000
    depth = int(argv[1]) if len(argv) > 1 else 6
    grad_depth = int(argv[2]) if len(argv) > 2 else 5
    B = int(argv[3]) if len(argv) > 3 else 16
    chunk = int(argv[4]) if len(argv) > 4 else 4
    skip_single = os.environ.get("OZSEL_SKIP_SINGLE") == "1"

    model, batch, nao = bench._build_model(
        overlap_f64=True, f64_contract="ozaki-selective",
        ozaki_depth=(depth, grad_depth), ozaki_min_elems=min_elems)
    cache = bench._cache_load()
    ref = cache.get("cpu")
    e_ref = ref["energy"] if ref else None
    f_ref = np.array(ref["forces"]).reshape(-1, 3) if ref else None
    c = np.asarray(batch[0], dtype=np.float64)
    print(f"[ozsel] platform={jax.devices()[0].platform} nao={nao} "
          f"min_elems={min_elems} depth=({depth},{grad_depth})",
          flush=True)

    if not skip_single:
        t0 = time.time()
        e, f = model.potential_and_forces_precise(c)
        e = float(e)
        f = np.asarray(f)
        t_first = time.time() - t0
        times = []
        for rep in range(3):
            t0 = time.time()
            e2, f2 = model.potential_and_forces_precise(c * (1.0 + 1e-10))
            float(e2), np.asarray(f2)
            times.append(time.time() - t0)
        line = (f"[ozsel] single: {np.median(times):.3f} s/eval warm "
                f"(first {t_first:.0f} s)")
        if e_ref is not None:
            line += (f" | vs CPU f64: |dE|={abs(e - e_ref):.2e} Ha, "
                     f"max|dF|={np.abs(f - f_ref).max():.2e}")
        print(line, flush=True)

    _, ball = bench.eval_geometry(B)
    bb = np.asarray(ball, dtype=np.float64)
    t0 = time.time()
    eb, fb = model.potential_and_forces_precise_batch(bb, mode="exact",
                                                      chunk=chunk)
    np.array(eb)
    t_compile = time.time() - t0
    times = []
    for rep in range(3):
        t0 = time.time()
        eb, fb = model.potential_and_forces_precise_batch(
            bb * (1.0 + 1e-10 * (rep + 1)), mode="exact", chunk=chunk)
        np.array(eb)
        times.append(time.time() - t0)
    per = float(np.median(times)) / B
    line = (f"[ozsel] batched B={B} chunk {chunk}: {per * 1e3:.1f} "
            f"ms/eval ({1.0 / per:.2f} evals/s), first {t_compile:.0f} s")
    if e_ref is not None:
        dE = abs(float(np.array(eb)[0]) - e_ref)
        dF = np.abs(np.array(fb)[0] - f_ref).max()
        line += f" | vs CPU f64: |dE|={dE:.2e} Ha, max|dF|={dF:.2e}"
    print(line, flush=True)


if __name__ == "__main__":
    main()
