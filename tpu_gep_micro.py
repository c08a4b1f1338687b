"""Micro-benchmark: per-eval cost of whitening the CONSTANT training
overlap inside the GEP vs a precomputed whitening (VERDICT r4 follow-on
to the MD-step profile: 'energy fwd' minus 'oao+pack' leaves ~2.4 ms at
batch 1, suspected to be the two 84x84 eighs in solve_gep).

Run on the TPU:  python tpu_gep_micro.py
"""

import numpy as np

import bench
from tpu_stage_profile import slope_time


def main():
    import jax
    import jax.numpy as jnp
    from evcont_tpu.continuation import (
        approximate_ground_state, oao_integrals, whitening_matrix)

    model, _, nao = bench._build_model()
    eng = model.engine
    ov, r1, r2 = model.overlap, model.one_rdm, model.two_rdm
    layout = model.packed_layout
    X = whitening_matrix(ov)
    _, cb = bench.eval_geometry(1)
    c = cb[0]
    print(f"platform={jax.devices()[0].platform} layout={layout}",
          flush=True)

    def energy(cc, ov, r1, r2):
        h1, h2, enuc = oao_integrals(eng, cc)
        en, _ = approximate_ground_state(h1, h2, r1, r2, ov,
                                         packed_layout=layout)
        return en + enuc

    def energy_wh(cc, X, ov, r1, r2):
        h1, h2, enuc = oao_integrals(eng, cc)
        en, _ = approximate_ground_state(h1, h2, r1, r2, ov,
                                         whitening=X,
                                         packed_layout=layout)
        return en + enuc

    for name, fn, extra in (
            ("energy fwd (eigh(S) inside)", energy, (ov, r1, r2)),
            ("energy fwd (whitened)", energy_wh, (X, ov, r1, r2))):
        t = slope_time(fn, c, *extra)
        print(f"{name:34s} {t * 1e3:8.2f} ms", flush=True)

    for name, fn, extra in (
            ("e+grad (eigh(S) inside)", energy, (ov, r1, r2)),
            ("e+grad (whitened)", energy_wh, (X, ov, r1, r2))):
        def eg(cc, *ex, _f=fn):
            return jax.value_and_grad(lambda x: _f(x, *ex))(cc)[1].sum()
        t = slope_time(eg, c, *extra)
        print(f"{name:34s} {t * 1e3:8.2f} ms", flush=True)

    # batched (the headline path): per-eval cost at batch 32
    _, cb32 = bench.eval_geometry(32)
    for name, fn, extra in (
            ("batch32 e+grad (eigh inside)", energy, (ov, r1, r2)),
            ("batch32 e+grad (whitened)", energy_wh, (X, ov, r1, r2))):
        def egb(ccb, *ex, _f=fn):
            e, g = jax.vmap(
                jax.value_and_grad(lambda x: _f(x, *ex)))(ccb)
            return e.sum() + g.sum()
        t = slope_time(egb, cb32, *extra, k_lo=1, k_hi=3)
        print(f"{name:34s} {t * 1e3:8.2f} ms/batch "
              f"({t / 32 * 1e3:.2f} ms/eval)", flush=True)


if __name__ == "__main__":
    main()
