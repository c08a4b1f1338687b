"""Bandwidth study of the subspace-assembly store contraction on the TPU.

Hypothesis (from the measured 34 ms for BOTH matvec and B=32 matmat over
the 4.1 GiB flagship store): XLA's f32-HIGHEST GEMM materializes the
3x-bf16 split of the big operand and re-reads the components across the
six passes, paying ~5-6 HBM trips where one suffices (single-trip floor
at v5e's ~819 GB/s: ~5.4 ms). A Pallas kernel that streams each f32
block into VMEM once and runs the multi-pass dot from VMEM should sit
near the floor.

Variants timed (median of reps, host-fetch sync):
  xla_highest      A @ x / A @ X          (the current default path)
  xla_high         3-pass f32             (accuracy loss measured)
  pallas_mxu:BPxBK in-VMEM dot, precision HIGHEST, various blocks
  pallas_vpu:BPxBK elementwise multiply + lane reduction (matvec only)
  + the transposed stream  g = A.T @ y    (the backward-pass shape)

Accuracy: max |H - H_exact| / scale vs the on-device error-free
compensated assembly (exact for f32 inputs).

Run: python tpu_assembly_bw.py [ntrain] [reps]
"""

import functools
import sys
import time

import numpy as np

import bench


def timed(fn, *args, reps=5):
    out = fn(*args)
    out = np.asarray(out)   # sync through the tunnel
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    ntrain = int(sys.argv[1]) if len(sys.argv) > 1 else 84
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    bench.NTRAIN = ntrain
    nao = 28
    npair, npacked = bench.store_shapes(nao)
    _, _, A = bench.make_store_device(nao)          # (npair, npacked) f32
    gib = npair * npacked * 4 / 2 ** 30
    print(f"store {npair} x {npacked} f32 = {gib:.2f} GiB  "
          f"(single-trip floor ~{gib / 0.76:.1f} ms at 819 GB/s)")

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (npacked,), dtype=jnp.float32)
    B = 32
    X = jax.random.normal(key, (npacked, B), dtype=jnp.float32)
    y = jax.random.normal(key, (npair,), dtype=jnp.float32)

    # exact reference via compensated assembly (error-free for f32 inputs)
    from evcont_tpu.subspace.compensated import exact_matvec
    hi, lo = jax.jit(lambda a, v: exact_matvec(a, None, v, None))(A, x)
    href = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    scale = np.abs(href).max()

    def report(name, t, out=None, ref=None):
        bw = gib / t
        err = ""
        if out is not None and ref is not None:
            e = np.abs(np.asarray(out, np.float64) - ref).max() / scale
            err = f"  relerr {e:.2e}"
        print(f"{name:34s} {t * 1e3:8.2f} ms   {bw:6.1f} GiB/s{err}")

    # ---- XLA GEMM precisions ------------------------------------------
    for prec in ("highest", "high", "default"):
        mv = jax.jit(lambda a, v, p=prec: jax.lax.dot_general(
            a, v, (((1,), (0,)), ((), ())), precision=p))
        t, out = timed(mv, A, x, reps=reps)
        report(f"xla_{prec} matvec", t, out, href)
        mm = jax.jit(lambda a, v, p=prec: jax.lax.dot_general(
            a, v, (((1,), (0,)), ((), ())), precision=p))
        t, _ = timed(mm, A, X, reps=reps)
        report(f"xla_{prec} matmat B={B}", t)
        tv = jax.jit(lambda a, w, p=prec: jax.lax.dot_general(
            w, a, (((0,), (0,)), ((), ())), precision=p))
        t, _ = timed(tv, A, y, reps=reps)
        report(f"xla_{prec} A.T@y", t)

    # ---- Pallas MXU: stream once, multi-pass from VMEM ----------------
    def mxu_kernel(a_ref, x_ref, o_ref, *, prec):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jax.lax.dot_general(
            a_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

    def pallas_mm(A_, X_, BP, BK, prec="highest"):
        P, K = A_.shape
        Bc = X_.shape[1]
        Pp, Kp = -(-P // BP) * BP, -(-K // BK) * BK
        Ap = jnp.pad(A_, ((0, Pp - P), (0, Kp - K)))
        Xp = jnp.pad(X_, ((0, Kp - K), (0, 0)))
        out = pl.pallas_call(
            functools.partial(mxu_kernel, prec=prec),
            grid=(Pp // BP, Kp // BK),
            in_specs=[pl.BlockSpec((BP, BK), lambda i, k: (i, k)),
                      pl.BlockSpec((BK, Bc), lambda i, k: (k, 0))],
            out_specs=pl.BlockSpec((BP, Bc), lambda i, k: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((Pp, Bc), jnp.float32),
        )(Ap, Xp)
        return out[:P]

    # axon's scoped-vmem stack limit is 16 MiB: keep BP*BK*4 <= ~4 MiB so
    # the double-buffered input block + x + out fit.
    for BP, BK in ((256, 2048), (256, 4096), (512, 2048), (128, 8192)):
        try:
            f = jax.jit(lambda a, v, bp=BP, bk=BK:
                        pallas_mm(a, v, bp, bk)[:, 0])
            t, out = timed(f, A, x.reshape(-1, 1), reps=reps)
            report(f"pallas_mxu {BP}x{BK} matvec", t, out, href)
            fm = jax.jit(lambda a, v, bp=BP, bk=BK: pallas_mm(a, v, bp, bk))
            t, _ = timed(fm, A, X, reps=reps)
            report(f"pallas_mxu {BP}x{BK} matmat B={B}", t)
        except Exception as e:
            print(f"pallas_mxu {BP}x{BK}: {type(e).__name__}: {e}")

    # ---- Pallas VPU matvec: multiply + lane-sum (true f32, one pass) --
    def vpu_kernel(a_ref, x_ref, o_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:, 0] += jnp.sum(a_ref[:] * x_ref[0][None, :], axis=1)

    def pallas_vpu_mv(A_, x_, BP, BK):
        P, K = A_.shape
        Pp, Kp = -(-P // BP) * BP, -(-K // BK) * BK
        Ap = jnp.pad(A_, ((0, Pp - P), (0, Kp - K)))
        xp = jnp.pad(x_, (0, Kp - K)).reshape(1, Kp)
        out = pl.pallas_call(
            vpu_kernel,
            grid=(Pp // BP, Kp // BK),
            in_specs=[pl.BlockSpec((BP, BK), lambda i, k: (i, k)),
                      pl.BlockSpec((1, BK), lambda i, k: (0, k))],
            out_specs=pl.BlockSpec((BP, 1), lambda i, k: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
        )(Ap, xp)
        return out[:P, 0]

    for BP, BK in ((256, 2048), (256, 4096), (512, 2048)):
        try:
            f = jax.jit(lambda a, v, bp=BP, bk=BK:
                        pallas_vpu_mv(a, v, bp, bk))
            t, out = timed(f, A, x, reps=reps)
            report(f"pallas_vpu {BP}x{BK} matvec", t, out, href)
        except Exception as e:
            print(f"pallas_vpu {BP}x{BK}: {type(e).__name__}: {e}")

    # ---- Pallas transposed stream: g = A.T @ y (backward shape) -------
    def tr_kernel(a_ref, y_ref, o_ref):
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[0, :] += jnp.sum(a_ref[:] * y_ref[0][:, None], axis=0)

    def pallas_tr(A_, y_, BP, BK):
        P, K = A_.shape
        Pp, Kp = -(-P // BP) * BP, -(-K // BK) * BK
        Ap = jnp.pad(A_, ((0, Pp - P), (0, Kp - K)))
        yp = jnp.pad(y_, (0, Pp - P)).reshape(1, Pp)
        out = pl.pallas_call(
            tr_kernel,
            grid=(Kp // BK, Pp // BP),
            in_specs=[pl.BlockSpec((BP, BK), lambda k, p: (p, k)),
                      pl.BlockSpec((1, BP), lambda k, p: (0, p))],
            out_specs=pl.BlockSpec((1, BK), lambda k, p: (0, k)),
            out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        )(Ap, yp)
        return out[0, :K]

    for BP, BK in ((256, 2048), (256, 4096), (512, 2048)):
        try:
            f = jax.jit(lambda a, v, bp=BP, bk=BK: pallas_tr(a, v, bp, bk))
            t, _ = timed(f, A, y, reps=reps)
            report(f"pallas_tr {BP}x{BK} A.T@y", t)
        except Exception as e:
            print(f"pallas_tr {BP}x{BK}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
