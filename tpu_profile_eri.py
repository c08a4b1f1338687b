"""Stage-level timing of the ERI kernel at the flagship configuration.

Splits IntegralEngine.eri into cumulative stages (pair data -> Hermite R ->
gather -> contraction -> aggregation -> scatter -> symmetrization) and
times each prefix as its own jitted function at Zundel/6-31G batch 32, so
stage costs come out as successive differences (XLA fusion makes them
approximate but directionally reliable; this reproduces the table in
RESULTS.md "f32 eval-path profile").

Run on the TPU:  python tpu_profile_eri.py [batch] [--f64]

--f64 runs the identical stages with f64 coords under jax_enable_x64 —
the emulated-f64 cost map that drives the precise-mode optimization
(which stage pays the ~100x emulation factor).
"""

import itertools
import sys
import time

import numpy as np

import bench


def _stage_fn(eng, stage):
    """Return f(coords)->scalar computing eri() up to `stage`."""
    import jax.numpy as jnp
    from evcont_tpu.integrals.engine import _conv_table

    only_combo = None
    if stage.startswith("combo"):
        only_combo = int(stage.split(":")[1])
        stage = "contract"

    def fn(coords):
        acc = jnp.zeros((), dtype=coords.dtype)
        pairs = eng._eri_pair_data(coords)
        if stage == "pairdata":
            for d in pairs:
                acc += jnp.sum(d["E3"]) + jnp.sum(d["P"])
            return acc
        nao = eng._nao_cart
        out = None
        combo = -1
        for bi, bra in enumerate(pairs):
            for ket in pairs[bi:]:
                combo += 1
                if only_combo is not None and combo != only_combo:
                    continue
                same_class = ket is bra
                p, q = bra["p"], ket["p"]
                alpha = p[:, None] * q[None, :] / (p[:, None] + q[None, :])
                L = bra["L"] + ket["L"]
                PQ = bra["P"][:, None, :] - ket["P"][None, :, :]
                from evcont_tpu.integrals.mcmurchie import hermite_R_dense
                Rd = hermite_R_dense(L, alpha, PQ)
                if stage == "hermiteR":
                    acc += jnp.sum(Rd)
                    continue
                n1, n2 = Rd.shape[0], Rd.shape[1]
                table = _conv_table(bra["L"] + 1, ket["L"] + 1, L)
                M = Rd.reshape(n1, n2, -1)[:, :, table]
                nb3, nk3 = (bra["L"] + 1) ** 3, (ket["L"] + 1) ** 3
                M = M.reshape(n1, n2, nb3, nk3)
                if stage == "gather":
                    acc += jnp.sum(M)
                    continue
                par = np.array([(-1.0) ** (t + u + v)
                                for t, u, v in itertools.product(
                                    range(ket["L"] + 1), repeat=3)])
                E3k = ket["E3"] * par[None, None, :]
                pref = (2.0 * jnp.pi ** 2.5
                        / (p[:, None] * q[None, :]
                           * jnp.sqrt(p[:, None] + q[None, :])))
                pref = pref * bra["cc"][:, None] * ket["cc"][None, :]
                if same_class:
                    pref = pref * 0.5
                block = jnp.einsum("ait,abtu,bju->abij", bra["E3"], M, E3k)
                block = block * pref[:, :, None, None]
                if stage == "contract":
                    acc += jnp.sum(block)
                    continue
                block = jnp.einsum("Aa,abij,Bb->ABij",
                                   bra["agg"], block, ket["agg"])
                if stage == "aggregate":
                    acc += jnp.sum(block)
                    continue
                itype = np.int32
                bra_idx = jnp.asarray(bra["ao_pair"].astype(itype))
                ket_idx = jnp.asarray(ket["ao_pair"].astype(itype))
                idx = (bra_idx[:, None, :, None] * itype(nao * nao)
                       + ket_idx[None, :, None, :])
                if out is None:
                    out = jnp.zeros(nao ** 4, dtype=block.dtype)
                out = out.at[idx.reshape(-1)].add(block.reshape(-1))
        if stage in ("hermiteR", "gather", "contract", "aggregate"):
            return acc
        if stage == "scatter":
            return acc + jnp.sum(out)
        G = out.reshape(nao, nao, nao, nao)
        G = G + jnp.transpose(G, (2, 3, 0, 1))
        G = G + jnp.transpose(G, (0, 1, 3, 2))
        G = G + jnp.transpose(G, (1, 0, 2, 3))
        return acc + jnp.sum(eng._to_sph4(G))

    return fn


def _time(f, x, reps=5):
    np.array(f(x))                      # compile + warm
    ts = []
    for r in range(reps):
        xr = x * np.float32(1.0 + 1e-6 * (r + 1))
        t0 = time.time()
        np.array(f(xr))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main(batch=32, f64=False):
    import jax
    if f64:
        jax.config.update("jax_enable_x64", True)
    from evcont_tpu.integrals.engine import IntegralEngine

    mol, cb = bench.eval_geometry(batch)
    if f64:
        cb = np.asarray(cb, dtype=np.float64)
    eng = IntegralEngine(mol)
    print(f"platform={jax.devices()[0].platform} nao={eng.nao} "
          f"batch={batch} dtype={cb.dtype}", flush=True)

    n_up = len(eng._upairs)
    n_combo = n_up * (n_up + 1) // 2
    labels = []
    k = 0
    for bi in range(n_up):
        for ki in range(bi, n_up):
            b, kk = eng._upairs[bi], eng._upairs[ki]
            labels.append(f"combo:{k} ({b.la}{b.lb}|{kk.la}{kk.lb}) "
                          f"{len(b.a)}x{len(kk.a)}")
            k += 1

    stages = ["pairdata", "hermiteR", "gather", "contract", "aggregate",
              "scatter", "full"]
    if not f64:   # per-combo compiles are prohibitive under emulated f64
        stages += [f"combo:{j}" for j in range(n_combo)]
    prev = 0.0
    t_pairdata = 0.0
    for si, s in enumerate(stages):
        fn = _stage_fn(eng, s)
        f = jax.jit(lambda c, fn=fn: jax.vmap(fn)(c).sum())
        t = _time(f, cb)
        if s == "pairdata":
            t_pairdata = t
        if s.startswith("combo"):
            lab = labels[int(s.split(":")[1])]
            print(f"{lab:28s} {1e3 * (t - t_pairdata):7.1f} ms "
                  "(incl its hermiteR/gather)", flush=True)
        else:
            print(f"{s:10s} cum {1e3 * t:7.1f} ms   delta "
                  f"{1e3 * (t - prev):7.1f} ms", flush=True)
            prev = t

    # forward vs backward of the real eri under the force cotangent
    def esum(c):
        return jax.vmap(lambda cc: (eng.eri(cc) ** 2).sum())(c).sum()

    t_f = _time(jax.jit(esum), cb)
    t_g = _time(jax.jit(jax.grad(esum)), cb)
    print(f"eri fwd    {1e3 * t_f:7.1f} ms;  fwd+grad {1e3 * t_g:7.1f} ms",
          flush=True)

    # one-electron side for completeness
    def onee(c):
        return jax.vmap(lambda cc: (eng.hcore(cc).sum()
                                    + eng.overlap(cc).sum()))(c).sum()
    print(f"hcore+ovlp {1e3 * _time(jax.jit(onee), cb):7.1f} ms", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--f64"]
    main(int(args[0]) if args else 32, f64="--f64" in sys.argv)
