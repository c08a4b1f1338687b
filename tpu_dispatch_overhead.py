"""Separate axon-tunnel dispatch overhead from true on-chip kernel time.

The bandwidth study (tpu_assembly_bw.py) shows every variant pinned at
~80-130 GiB/s, far under the 819 GB/s HBM spec.  If each host-synced
dispatch through the tunnel costs a fixed ~25-30 ms, the *on-chip* matvec
could already be near the single-trip floor and the "assembly is 6x off
the roofline" conclusion would be wrong.

Method: jit a lax.scan that runs the store matvec N times with N distinct
x vectors (no CSE) and returns all outputs; time at N in {1, 4, 16}.  The
slope of t(N) is the true per-matvec time; the intercept is the dispatch
overhead.  Also times a trivial kernel as a direct overhead probe.

Run: python tpu_dispatch_overhead.py [ntrain] [reps]
"""

import sys
import time

import numpy as np

import bench


def timed(fn, *args, reps=5):
    out = np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    ntrain = int(sys.argv[1]) if len(sys.argv) > 1 else 84
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    bench.NTRAIN = ntrain
    nao = 28
    npair, npacked = bench.store_shapes(nao)
    _, _, A = bench.make_store_device(nao)
    gib = npair * npacked * 4 / 2 ** 30
    print(f"store {npair} x {npacked} f32 = {gib:.2f} GiB")

    key = jax.random.PRNGKey(0)

    # trivial-kernel dispatch probe
    small = jax.random.normal(key, (128, 128), dtype=jnp.float32)
    t0 = timed(jax.jit(lambda a: jnp.sum(a * a)), small, reps=reps)
    print(f"trivial dispatch+fetch        {t0 * 1e3:8.2f} ms")

    for N in (1, 4, 16):
        X = jax.random.normal(key, (N, npacked), dtype=jnp.float32)

        def many(a, xs):
            def step(_, x):
                return 0, jax.lax.dot_general(
                    a, x, (((1,), (0,)), ((), ())), precision="highest")
            _, outs = jax.lax.scan(step, 0, xs)
            return outs

        t = timed(jax.jit(many), A, X, reps=reps)
        print(f"scan matvec N={N:<3d}             {t * 1e3:8.2f} ms   "
              f"({t / N * 1e3:6.2f} ms/mv amortized, "
              f"{gib / (t / N):6.1f} GiB/s)")

    # the batched fwd/bwd GEMM shapes of the assembly under value_and_grad
    # at batch B geometries, amortized over N in-dispatch repeats
    B, N = 32, 8
    XB = jax.random.normal(key, (N, npacked, B), dtype=jnp.float32)
    YB = jax.random.normal(key, (N, npair, B), dtype=jnp.float32)

    def amort(name, step, xs):
        def many(a, xs_):
            def s(_, x):
                return 0, step(a, x)
            _, outs = jax.lax.scan(s, 0, xs_)
            return outs
        t = timed(jax.jit(many), A, xs, reps=reps)
        print(f"{name:28s} {t * 1e3:8.2f} ms   ({t / N * 1e3:6.2f} ms/call, "
              f"{gib / (t / N):6.1f} GiB/s)")

    # forward: H = A @ X  (npair, B)
    amort(f"fwd A@X B={B} xN={N}",
          lambda a, x: jax.lax.dot_general(
              a, x, (((1,), (0,)), ((), ())), precision="highest"), XB)
    # backward, transposed-stream form: G = A.T @ Y  (npacked, B)
    amort(f"bwd A.T@Y B={B} xN={N}",
          lambda a, y: jax.lax.dot_general(
              a, y, (((0,), (0,)), ((), ())), precision="highest"), YB)
    # backward, row-major-stream form: G = (Y.T @ A).T
    amort(f"bwd (Y.T@A) B={B} xN={N}",
          lambda a, y: jax.lax.dot_general(
              y, a, (((0,), (0,)), ((), ())), precision="highest"), YB)


if __name__ == "__main__":
    main()
