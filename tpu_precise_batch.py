"""TPU study: batched precise-mode throughput + accuracy at Zundel-84 scale.

Round-3 question (VERDICT r2 #2): can one mode meet the north star's BOTH
halves — <=1e-8 Ha vs CPU f64 AND >=50x the CPU-f64 single-core eval rate?
The round-2 precise path was single-geometry (0.91 s/eval, 9.1e-12 Ha);
this measures the vmapped rungs:

  exact       — TwoProd/TwoSum store contraction (f64-class, VPU-bound)
  compensated — MXU chunked two-float contraction (~1e-7-class)

both on top of the emulated-f64 integral pipeline. Accuracy is measured at
the bench geometry against the committed CPU-f64 reference
(bench_cache.json), which was built from a bitwise-identical store.

Usage: python tpu_precise_batch.py [batch_sizes...]   (default 4 8 16)
"""

import json
import os
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np

import bench


def main():
    # batches above the known-good fused size run as chunk-4 lax.map
    # sub-batches inside one dispatch (the emulated-f64 program at B>4
    # exhausts the axon remote-compile helper; the chunked program stays
    # at the B=4 footprint)
    chunk = int(os.environ.get("PRECISE_CHUNK", "4"))
    sizes = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    model, _, nao = bench._build_model(overlap_f64=True)
    cache = bench._cache_load()
    ref = cache.get("cpu")
    e_ref = ref["energy"] if ref else None
    f_ref = np.array(ref["forces"]).reshape(-1, 3) if ref else None

    _, batch_all = bench.eval_geometry(max(sizes))
    print(f"[study] platform={jax.devices()[0].platform} nao={nao}",
          flush=True)

    for mode in ("exact", "compensated"):
        for B in sizes:
            batch = batch_all[:B].astype(np.float64)
            try:
                ck = chunk if B > chunk else None
                t0 = time.time()
                e, F = model.potential_and_forces_precise_batch(
                    batch, mode=mode, chunk=ck)
                np.array(e)
                t_compile = time.time() - t0
                times = []
                for rep in range(3):
                    t0 = time.time()
                    e, F = model.potential_and_forces_precise_batch(
                        batch * (1.0 + 1e-9 * (rep + 1)), mode=mode,
                        chunk=ck)
                    np.array(e)
                    times.append(time.time() - t0)
                per = float(np.median(times)) / B
                line = (f"[study] {mode} B={B}: {per * 1e3:.1f} ms/eval "
                        f"({1.0 / per:.1f} evals/s), first {t_compile:.0f}s,"
                        f" reps {[round(t, 2) for t in times]}")
                if e_ref is not None:
                    # batch[0] is the bench geometry (same rng seed)
                    e0, F0 = model.potential_and_forces_precise_batch(
                        batch_all[: B].astype(np.float64), mode=mode,
                        chunk=ck)
                    dE = abs(float(np.array(e0)[0]) - e_ref)
                    dF = np.abs(np.array(F0)[0] - f_ref).max()
                    line += f" | vs CPU f64: |dE|={dE:.2e} Ha, " \
                            f"max|dF|={dF:.2e}"
                print(line, flush=True)
            except Exception as err:
                print(f"[study] {mode} B={B} FAILED: "
                      f"{type(err).__name__}: {err}", flush=True)
                break


if __name__ == "__main__":
    main()
