"""Micro-benchmark: alternative formulations of the ERI quartet angular
contraction  block[g,i,j] = sum_{t,u} F[a,i,t] H[b,j,u] M[a,b,t,u]
with M[a,b,tb,tk] = Rd[a,b,conv_table] gathered from the dense Hermite
tensor Rd (a,b,(L+1)^3).

The per-combo TPU profile (tpu_profile_eri.py) shows cost is op-shape
overhead, not flops: (11|11) with a 1.3k grid costs 7.9 ms while (00|00)
with a 672k grid costs 2.5 ms. Variants:

  A  current: gather + einsum("ait,abtu,bju->abij")
  B  gather replaced by one-hot GEMM (s -> tb*tk is a 0/1 linear map)
  C  B + manual two-step contraction T1=(abtu,bju)->abtj, (ait,abtj)->abij
  D  fold the one-hot into the ket side: W[b,j,(s,u->)]... skipped
  E  B + two-step the other way: T1=(ait,abtu)->aibu then (aibu,bju)
  F  one GEMM per grid row: contract s directly with a combined
     weight built per (a) ... skipped (a-dependent weights too large)

Run: python tpu_micro_contract.py
"""

import itertools
import time

import numpy as np


def conv_table(nb, nk, L):
    table = np.zeros((nb ** 3, nk ** 3), dtype=np.int32)
    for bi, (t, u, v) in enumerate(itertools.product(range(nb), repeat=3)):
        for ki, (x, y, z) in enumerate(
                itertools.product(range(nk), repeat=3)):
            table[bi, ki] = ((t + x) * (L + 1) + (u + y)) * (L + 1) + (v + z)
    return table


COMBOS = [
    # name, n1, n2, Lb, Lk, ca_cb_bra, ca_cb_ket
    ("(00|01)", 820, 320, 0, 1, 1, 3),
    ("(00|11)", 820, 36, 0, 2, 1, 6),
    ("(01|01)", 320, 320, 1, 1, 3, 3),
    ("(01|11)", 320, 36, 1, 2, 3, 6),
    ("(11|11)", 36, 36, 2, 2, 6, 6),
]

B = 32


def variants(n1, n2, Lb, Lk, ci, cj):
    import jax.numpy as jnp

    L = Lb + Lk
    nb3, nk3 = (Lb + 1) ** 3, (Lk + 1) ** 3
    s = (L + 1) ** 3
    tab = conv_table(Lb + 1, Lk + 1, L)
    onehot = np.zeros((s, nb3 * nk3), dtype=np.float32)
    onehot[tab.reshape(-1), np.arange(nb3 * nk3)] = 1.0
    onehot_j = jnp.asarray(onehot)
    tab_flat = jnp.asarray(tab.reshape(-1))

    def vA(Rd, F, H):
        M = Rd.reshape(B, n1, n2, s)[..., tab_flat]
        M = M.reshape(B, n1, n2, nb3, nk3)
        return jnp.einsum("Bait,Babtu,Bbju->Babij", F, M, H)

    def vB(Rd, F, H):
        M = jnp.einsum("Bgs,so->Bgo", Rd.reshape(B, n1 * n2, s), onehot_j)
        M = M.reshape(B, n1, n2, nb3, nk3)
        return jnp.einsum("Bait,Babtu,Bbju->Babij", F, M, H)

    def vC(Rd, F, H):
        M = jnp.einsum("Bgs,so->Bgo", Rd.reshape(B, n1 * n2, s), onehot_j)
        M = M.reshape(B, n1, n2, nb3, nk3)
        T1 = jnp.einsum("Babtu,Bbju->Babtj", M, H)
        return jnp.einsum("Bait,Babtj->Babij", F, T1)

    def vE(Rd, F, H):
        M = jnp.einsum("Bgs,so->Bgo", Rd.reshape(B, n1 * n2, s), onehot_j)
        M = M.reshape(B, n1, n2, nb3, nk3)
        T1 = jnp.einsum("Bait,Babtu->Baibu", F, M)
        return jnp.einsum("Baibu,Bbju->Babij", T1, H)

    def vG(Rd, F, H):
        # fold the one-hot into the bra side once per geometry:
        # W[a,i,s,u] = sum_t F[a,i,t] onehot[s,(t,u)]  (pair-level, small)
        W = jnp.einsum("Bait,sto->Baiso",
                       F, onehot_j.reshape(s, nb3, nk3))
        T1 = jnp.einsum("Bais o,Babs->Babio".replace(" ", ""), W, Rd)
        return jnp.einsum("Babio,Bbjo->Babij", T1, H)

    return {"A": vA, "B": vB, "C": vC, "E": vE, "G": vG}


def main():
    import jax

    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} batch={B}", flush=True)
    for name, n1, n2, Lb, Lk, ci, cj in COMBOS:
        L = Lb + Lk
        nb3, nk3 = (Lb + 1) ** 3, (Lk + 1) ** 3
        s = (L + 1) ** 3
        Rd = jax.device_put(
            rng.standard_normal((B, n1, n2, s)).astype(np.float32))
        F = jax.device_put(
            rng.standard_normal((B, n1, ci, nb3)).astype(np.float32))
        H = jax.device_put(
            rng.standard_normal((B, n2, cj, nk3)).astype(np.float32))
        ref = None
        row = [f"{name} g={n1 * n2:7d} s={s:3d}"]
        for vn, fn in variants(n1, n2, Lb, Lk, ci, cj).items():
            # correctness: compare a small slice (full fetches would time
            # the tunnel, not the chip)
            fs = jax.jit(lambda *a, fn=fn: fn(*a)[0, :4, :4].sum())
            K = 10   # in-jit repetitions: the ~22 ms per-dispatch tunnel
            #          latency otherwise swamps every variant

            def rep(Rd, F, H, fn=fn):
                import jax.numpy as jnp

                def body(i, acc):
                    scale = 1.0 + 1e-6 * i.astype(jnp.float32)
                    return acc + fn(Rd * scale, F, H).sum()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

            f = jax.jit(rep)
            try:
                out = float(fs(Rd, F, H))
                if ref is None:
                    ref = out
                else:
                    assert abs(out - ref) < 1e-2 * max(1.0, abs(ref)), \
                        f"{name} {vn} mismatch {out} vs {ref}"
                float(f(Rd, F, H))
                ts = []
                for r in range(5):
                    t0 = time.time()
                    float(f(Rd, F, H))
                    ts.append(time.time() - t0)
                row.append(f"{vn}={1e3 * np.median(ts) / K:6.2f}ms")
            except Exception as err:
                row.append(f"{vn}=FAIL({type(err).__name__}:{err})"[:60])
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
