"""Tunnel-overhead-free stage profile of the flagship batched eval.

Each stage prefix of potential_and_forces_batch (Zundel-84, batch 32) is
timed as K iterations inside ONE lax.scan dispatch; per-iteration cost is
the slope between K_lo and K_hi, which cancels the ~30 ms fixed
dispatch+fetch cost of the axon tunnel (tpu_dispatch_overhead.py).

Run on the TPU:  python tpu_stage_profile.py [batch]
"""

import sys
import time

import numpy as np

import bench


def slope_time(fn, coords, *extra, k_lo=1, k_hi=5, reps=3):
    """Per-iteration seconds of fn(coords, *extra)->scalar via scan-count
    slope. `extra` (e.g. the 4 GiB t-RDM store) is threaded as jit
    arguments so it is NOT captured as multi-GB executable constants."""
    import jax
    import jax.numpy as jnp

    def runner(k):
        @jax.jit
        def run(c, *ex):
            def body(carry, i):
                val = fn(c * (1.0 + 1e-6 * i), *ex)
                return carry + val, None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(1, k + 1, dtype=jnp.float32))
            return out
        return run

    times = {}
    for k in (k_lo, k_hi):
        run = runner(k)
        np.array(run(coords, *extra))          # compile + warm
        ts = []
        for r in range(reps):
            cr = coords * np.float32(1.0 + 1e-7 * (r + 1))
            t0 = time.time()
            np.array(run(cr, *extra))
            ts.append(time.time() - t0)
        times[k] = float(np.median(ts))
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def main(batch=32):
    import jax
    import jax.numpy as jnp
    from evcont_tpu.continuation import (
        oao_integrals, assemble_hamiltonian, solve_gep, whitening_matrix)
    from evcont_tpu.oao import compress_exchange, loewdin_trafo
    from evcont_tpu.model import ContinuationModel

    model, _, nao = bench._build_model()
    eng = model.engine
    ov, r1, r2 = model.overlap, model.one_rdm, model.two_rdm
    _, cb = bench.eval_geometry(batch)
    print(f"platform={jax.devices()[0].platform} nao={nao} batch={batch}",
          flush=True)

    def ints(c):
        def one(cc):
            return (jnp.sum(eng.overlap(cc)) + jnp.sum(eng.hcore(cc))
                    + jnp.sum(eng.eri(cc)))
        return jax.vmap(one)(c).sum()

    def eri_only(c):
        return jax.vmap(lambda cc: jnp.sum(eng.eri(cc)))(c).sum()

    def oao(c):
        def one(cc):
            h1, h2, enuc = oao_integrals(eng, cc)
            return jnp.sum(h1) + jnp.sum(h2) + enuc
        return jax.vmap(one)(c).sum()

    def pack(c):
        def one(cc):
            h1, h2, enuc = oao_integrals(eng, cc)
            return jnp.sum(h1) + jnp.sum(
                compress_exchange(h2, diag_multiplier=0.5)) + enuc
        return jax.vmap(one)(c).sum()

    def energy(c, ov, r1, r2):
        def one(cc):
            return model._energy_raw(cc, ov, r1, r2)
        return jax.vmap(one)(c).sum()

    def energy_grad(c, ov, r1, r2):
        def one(cc):
            return model._energy_raw(cc, ov, r1, r2)
        e, g = jax.vmap(jax.value_and_grad(one))(c)
        return e.sum() + g.sum()

    def _fixed_h():
        h1, h2, _ = jax.jit(lambda cc: oao_integrals(eng, cc))(cb[0])
        return np.asarray(h1), np.asarray(h2)

    h1_fix, h2_fix = _fixed_h()

    def gep_only(c, ov, r1, r2):
        # assembly + GEP at a FIXED full h2 (isolates pack + store
        # contraction + eigensolve from the integral pipeline); the tiny
        # per-geometry scale makes each batch element distinct work
        def one(cc):
            s = 1.0 + 1e-9 * cc.sum()
            H = assemble_hamiltonian(h1_fix * s, h2_fix * s, r1, r2)
            w, C = solve_gep(H, ov)
            return w[0]
        return jax.vmap(one)(c).sum()

    def eri_grad(c):
        return jax.grad(
            lambda cc: jax.vmap(lambda x: (eng.eri(x) ** 2).sum())(cc).sum()
        )(c).sum()

    def oao_grad(c):
        def one(cc):
            h1, h2, enuc = oao_integrals(eng, cc)
            return (h1 ** 2).sum() + (h2 ** 2).sum() + enuc
        return jax.grad(lambda cc: jax.vmap(one)(cc).sum())(c).sum()

    def pack_grad(c):
        def one(cc):
            h1, h2, enuc = oao_integrals(eng, cc)
            h2c = compress_exchange(h2, diag_multiplier=0.5)
            return (h1 ** 2).sum() + (h2c ** 2).sum() + enuc
        return jax.grad(lambda cc: jax.vmap(one)(cc).sum())(c).sum()

    from evcont_tpu.oao import rfp_fold

    def rfp(c):
        def one(cc):
            h1, h2, enuc = oao_integrals(eng, cc)
            return jnp.sum(h1) + jnp.sum(
                rfp_fold(h2, diag_multiplier=0.5)) + enuc
        return jax.vmap(one)(c).sum()

    def rfp_grad(c):
        def one(cc):
            h1, h2, enuc = oao_integrals(eng, cc)
            h2c = rfp_fold(h2, diag_multiplier=0.5)
            return (h1 ** 2).sum() + (h2c ** 2).sum() + enuc
        return jax.grad(lambda cc: jax.vmap(one)(cc).sum())(c).sum()

    stages = [
        ("eri fwd", eri_only, ()),
        ("ints fwd (ovlp+hcore+eri)", ints, ()),
        ("oao fwd (+loewdin+trafo)", oao, ()),
        ("pack fwd (+compress)", pack, ()),
        ("rfp fwd (+rfp_fold)", rfp, ()),
        ("rfp fwd+grad", rfp_grad, ()),
        ("gep only (fixed h1/h2c)", gep_only, (ov, r1, r2)),
        ("energy fwd (full)", energy, (ov, r1, r2)),
        ("eri fwd+grad", eri_grad, ()),
        ("oao fwd+grad", oao_grad, ()),
        ("pack fwd+grad", pack_grad, ()),
        ("energy+forces (full)", energy_grad, (ov, r1, r2)),
    ]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, fn, extra in stages:
        if only and not any(tag in name for tag in only):
            continue
        print(f"[timing] {name} ...", flush=True)
        t = slope_time(fn, cb, *extra)
        print(f"{name:28s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / batch:6.2f} ms/eval)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
