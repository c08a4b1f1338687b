"""Stage profile of the SERIAL (batch-1) MD step after the s8 store layout.

The MD scanner's step body is value_and_grad of the full pipeline at one
geometry; this script times nested prefixes of that body with the
scan-count slope method (cancels the ~30 ms axon dispatch+fetch cost,
see tpu_stage_profile.py) to show where the remaining per-step
milliseconds live.

Run on the TPU:  python tpu_md_step_profile.py
"""

import sys
import time

import numpy as np

import bench
from tpu_stage_profile import slope_time


def main():
    import jax
    import jax.numpy as jnp
    from evcont_tpu.continuation import (
        approximate_ground_state, oao_integrals, packed_fold)

    model, _, nao = bench._build_model()
    eng = model.engine
    ov, r1, r2 = model.overlap, model.one_rdm, model.two_rdm
    layout = model.packed_layout
    pack = packed_fold(layout)
    _, cb = bench.eval_geometry(1)
    c = cb[0]
    print(f"platform={jax.devices()[0].platform} nao={nao} "
          f"layout={layout} store={tuple(r2.shape)}", flush=True)

    stages = {}

    def stage(name, fn, *extra):
        t = slope_time(fn, c, *extra)
        stages[name] = t
        print(f"{name:28s} {t * 1e3:8.2f} ms", flush=True)

    stage("eri fwd", lambda cc: jnp.sum(eng.eri(cc)))
    stage("eri fwd+bwd",
          lambda cc: jax.value_and_grad(
              lambda x: (eng.eri(x) ** 2).sum())(cc)[1].sum())
    stage("ints fwd (ovlp+hcore+eri)",
          lambda cc: jnp.sum(eng.overlap(cc)) + jnp.sum(eng.hcore(cc))
          + jnp.sum(eng.eri(cc)))
    stage("oao fwd (loewdin+trafo)",
          lambda cc: sum(jnp.sum(x) for x in oao_integrals(eng, cc)[:2]))
    stage("oao+pack fwd",
          lambda cc: (lambda h1, h2, e: jnp.sum(h1)
                      + jnp.sum(pack(h2, diag_multiplier=0.5)))(
              *oao_integrals(eng, cc)))

    def energy(cc, ov, r1, r2):
        h1, h2, enuc = oao_integrals(eng, cc)
        en, _ = approximate_ground_state(h1, h2, r1, r2, ov,
                                         packed_layout=layout)
        return en + enuc

    stage("energy fwd", energy, ov, r1, r2)
    stage("energy+grad (MD step body)",
          lambda cc, ov, r1, r2: jax.value_and_grad(
              lambda x: energy(x, ov, r1, r2))(cc)[1].sum(),
          ov, r1, r2)

    # store-contraction-only bound: one fwd stream + one bwd stream at a
    # fixed packed h2 (isolates the HBM floor from the integral pipeline)
    h2c_fix = np.asarray(jax.jit(
        lambda cc: pack(oao_integrals(eng, cc)[1], diag_multiplier=0.5))(c))

    def contraction(cc, h2c, r2):
        def f(x):
            return jnp.vdot(r2 @ (h2c * (1.0 + x.sum() * 1e-9)),
                            jnp.ones((r2.shape[0],), h2c.dtype))
        return jax.value_and_grad(f)(cc)[1].sum()

    stage("store fwd+bwd streams", contraction, jnp.asarray(h2c_fix), r2)

    print("\nderived:", flush=True)
    print(f"  non-eri remainder of step: "
          f"{(stages['energy+grad (MD step body)'] - stages['eri fwd+bwd']) * 1e3:.2f} ms")
    print(f"  MD steps/s bound from step body: "
          f"{1.0 / stages['energy+grad (MD step body)']:.1f}")


if __name__ == "__main__":
    main()
