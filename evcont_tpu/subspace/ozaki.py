"""Ozaki-scheme matrix products: f64-class GEMMs from exact f32 MXU passes.

The precise-mode bottleneck (tpu_precise_breakdown.py) is the emulated-f64
integral pipeline — XLA's f64 emulation keeps every contraction off the
MXU. This module restores the MXU for f64-class contractions with the
Ozaki splitting (Ozaki et al., "Error-free transformations of matrix
multiplication", 2012; the scheme behind bf16x6/f32xN emulated GEMMs on
ML accelerators):

  * each operand row (along the contraction axis) is scaled by a power of
    two to a common exponent, then sliced into w-bit fixed-point digits;
    with 2w + ceil(log2 K) <= 24 every slice-by-slice product AND its
    K-term accumulation is EXACT in f32 — the MXU does integer-exact
    arithmetic on scaled digits;
  * the final result sums the (i, j) slice products with i + j < depth in
    f64 (tiny (M, N) tensors), so the ONLY error is the dropped tail:
    |err| <= 2^(-w*depth) * K * rowmax(A) * colmax(B) — f64-class at
    depth*w >= ~45 bits, BETTER than f64 at >= 53.

Cost: nslice_a * nslice_b - overlap GEMMs of the original shape in plain
f32 — e.g. 15 MXU passes for depth 5 — versus an emulated-f64 dot that
never touches the MXU at all.

Reference context: the reference runs these contractions in NumPy f64 on
the host (evcont/electron_integral_utils.py:21-35,
ab_initio_eigenvector_continuation.py:38-71); this is the TPU-native way
to match that accuracy at MXU speed.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def _slice_digits(x, scale, w, nslice):
    """Fixed-point digits of x / scale in base 2^w: returns a list of
    nslice f32 arrays d_i with x = scale * sum_i d_i * 2^(-w*(i+1)) (up to
    the dropped tail), each d_i an integer in [-2^w, 2^w].

    x is f64 (emulated on TPU — only cheap elementwise ops are used here);
    scale is a power of two broadcastable to x."""
    r = x / scale
    digits = []
    for _ in range(nslice):
        r = r * np.float64(2.0 ** w)
        d = jnp.round(r)
        r = r - d
        digits.append(d.astype(jnp.float32))
    return digits


def _pow2_rowmax(a, axis):
    """Per-row power-of-two scale covering max|a| along axis (f64 in,
    f64 out, exact by construction)."""
    m = jnp.max(jnp.abs(a), axis=axis, keepdims=True)
    m = jnp.where(m > 0, m, 1.0)
    e = jnp.ceil(jnp.log2(m))
    return jnp.exp2(e)


def ozaki_matmul(A, B, w=None, depth=5, precision=None):
    """C = A @ B with f64-class accuracy from exact f32 MXU passes.

    A: (M, K) f64, B: (K, N) f64. depth: number of slice-product
    diagonals kept; error <= 2^(-w*depth) * K * rowmax*colmax. With
    w = floor((24 - ceil(log2 K)) / 2) and depth = 5 this is ~1e-13
    relative to the row/col maxima (tighter than the f32 pipeline by ~6
    orders); depth = 6 beats genuine f64.
    """
    M, K = A.shape
    K2, N = B.shape
    assert K == K2, (A.shape, B.shape)
    if w is None:
        w = int((24 - int(np.ceil(np.log2(max(K, 2))))) // 2)
    nsa = nsb = depth                    # need i + j < depth, i, j >= 0
    sa = _pow2_rowmax(A, axis=1)            # (M, 1)
    sb = _pow2_rowmax(B, axis=0)            # (1, N)
    da = _slice_digits(A, sa, w, nsa)
    db = _slice_digits(B, sb, w, nsb)
    prec = precision or jax.lax.Precision.DEFAULT
    out = jnp.zeros((M, N), dtype=jnp.float64)
    for i in range(nsa):
        for j in range(nsb):
            if i + j >= depth:
                continue
            p = jnp.matmul(da[i], db[j], precision=prec)
            out = out + p.astype(jnp.float64) * np.float64(
                2.0 ** (-w * (i + j + 2)))
    return out * sa * sb


def _slice_digits_bf16(x, scale, nslice):
    """8-bit digits of x / scale as bf16 arrays: x = scale * sum_i d_i *
    2^(-8(i+1)) (up to the tail), d_0 in [-256, 256], later digits in
    [-128, 128] — all exactly representable in bf16 (8 mantissa bits)."""
    r = x / scale
    digits = []
    for _ in range(nslice):
        r = r * np.float64(256.0)
        d = jnp.round(r)
        r = r - d
        digits.append(d.astype(jnp.bfloat16))
    return digits


def _ozaki_bf16_raw(A, B, depth):
    """Core of ozaki_matmul_bf16 without the custom-VJP wrapper."""
    M, K = A.shape
    K2, N = B.shape
    assert K == K2, (A.shape, B.shape)
    sa = _pow2_rowmax(A, axis=1)            # (M, 1)
    sb = _pow2_rowmax(B, axis=0)            # (1, N)
    da = _slice_digits_bf16(A, sa, depth)
    db = _slice_digits_bf16(B, sb, depth)
    # K-blocking keeps every in-hardware accumulation <= 2^24 (exact in
    # the MXU's f32 accumulator): digit products <= 2^16, 256 of them.
    nb = -(-K // 256)
    Kp = nb * 256
    if nb > 1 and Kp != K:
        da = [jnp.pad(d, ((0, 0), (0, Kp - K))) for d in da]
        db = [jnp.pad(d, ((0, Kp - K), (0, 0))) for d in db]
    out = jnp.zeros((M, N), dtype=jnp.float64)
    for i in range(depth):
        for j in range(depth):
            if i + j >= depth:
                continue
            if nb == 1:
                p = jnp.matmul(da[i], db[j],
                               preferred_element_type=jnp.float32)
                ps = p.astype(jnp.float64)
            else:
                a = da[i].reshape(M, nb, 256).transpose(1, 0, 2)
                b = db[j].reshape(nb, 256, N)
                p = jax.lax.dot_general(
                    a, b, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ps = jnp.sum(p.astype(jnp.float64), axis=0)
            out = out + ps * np.float64(2.0 ** (-8 * (i + j + 2)))
    return out * sa * sb


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ozaki_matmul_bf16(A, B, depth=6, grad_depth=4):
    """C = A @ B (f64 operands) from EXACT single-pass bf16 MXU GEMMs.

    Each operand row/col is scaled to a power-of-two and sliced into
    8-bit digits that are exact in bf16; every digit-by-digit MXU pass
    (f32 accumulation, K blocked at 256) is then integer-exact, and the
    only error is the dropped i+j >= depth tail: ~2^(-8*depth) relative
    to rowmax(A)*colmax(B) — 2^-48 (f64-class) at depth 6 for
    depth*(depth+1)/2 = 21 single-pass bf16 GEMMs, ~3.5x ONE f32
    HIGHEST (bf16_6x) GEMM. This is the MXU path for f64-class
    contractions on TPU; the plain-f32 variant (ozaki_matmul) needs
    ~2x more, wider passes.

    Differentiation: digit slicing is piecewise constant (round()), so
    autodiff through the raw form would produce zero gradients; the
    custom VJP contracts cotangents with the SAME scheme at grad_depth
    (2^-32 at depth 4 — force-path accuracy) against the saved operands.
    """
    return _ozaki_bf16_raw(A, B, depth)


def _ozaki_bf16_fwd(A, B, depth, grad_depth):
    return _ozaki_bf16_raw(A, B, depth), (A, B)


def _ozaki_bf16_bwd(depth, grad_depth, res, ct):
    A, B = res
    dA = _ozaki_bf16_raw(ct, B.T, grad_depth)
    dB = _ozaki_bf16_raw(A.T, ct, grad_depth)
    return dA, dB


ozaki_matmul_bf16.defvjp(_ozaki_bf16_fwd, _ozaki_bf16_bwd)


def _ozaki_bf16_batched(A, B, depth):
    """C[b] = A[b] @ B[b] (f64) from exact bf16 digit passes, K-blocked.

    A: (bt, M, K) f64, B: (bt, K, N) f64. Per-row/col power-of-two
    scaling as in _ozaki_bf16_raw; every digit-product accumulation runs
    over at most 256 terms (exact in the f32 accumulator), the 256-blocks
    are then summed in f64."""
    bt, M, K = A.shape
    bt2, K2, N = B.shape
    assert bt == bt2 and K == K2, (A.shape, B.shape)
    sa = _pow2_rowmax(A, axis=2)            # (bt, M, 1)
    sb = _pow2_rowmax(B, axis=1)            # (bt, 1, N)
    da = _slice_digits_bf16(A, sa, depth)
    db = _slice_digits_bf16(B, sb, depth)
    nb = -(-K // 256)
    Kp = nb * 256
    # pad only when blocking actually happens: at nb == 1 the single
    # dot_general runs at the original K (the engine's quartet classes
    # often have K < 30 — padding them to 256 would be a ~10x inflation
    # of the contraction axis for zero accuracy benefit)
    if nb > 1 and Kp != K:
        da = [jnp.pad(d, ((0, 0), (0, 0), (0, Kp - K))) for d in da]
        db = [jnp.pad(d, ((0, 0), (0, Kp - K), (0, 0))) for d in db]
    out = jnp.zeros((bt, M, N), dtype=jnp.float64)
    for i in range(depth):
        for j in range(depth - i):
            if nb == 1:
                p = jax.lax.dot_general(
                    da[i], db[j], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ps = p.astype(jnp.float64)
            else:
                a = (da[i].reshape(bt, M, nb, 256)
                     .transpose(0, 2, 1, 3))           # (bt, nb, M, 256)
                b = db[j].reshape(bt, nb, 256, N)
                p = jax.lax.dot_general(
                    a, b, (((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                ps = jnp.sum(p.astype(jnp.float64), axis=1)
            out = out + ps * np.float64(2.0 ** (-8 * (i + j + 2)))
    return out * sa * sb


def _parse_einsum2(spec, A, B):
    """Decompose a two-operand einsum spec (no repeated indices within an
    operand) into batch / contracted / free index groups."""
    ins, out = spec.split("->")
    xs, ys = ins.split(",")
    assert len(set(xs)) == len(xs) and len(set(ys)) == len(ys), spec
    batch = [c for c in xs if c in ys and c in out]
    contr = [c for c in xs if c in ys and c not in out]
    fa = [c for c in xs if c not in ys]
    fb = [c for c in ys if c not in xs]
    assert set(fa) <= set(out) and set(fb) <= set(out), \
        f"{spec}: free index summed out (not expressible as a GEMM)"
    assert set(out) == set(batch) | set(fa) | set(fb), spec
    dims = {c: A.shape[xs.index(c)] for c in xs}
    for c in ys:
        if c in dims:
            assert B.shape[ys.index(c)] == dims[c], (
                f"{spec}: operand shapes disagree on index {c!r}: "
                f"A{tuple(A.shape)} vs B{tuple(B.shape)}")
        else:
            dims[c] = B.shape[ys.index(c)]
    return xs, ys, out, batch, contr, fa, fb, dims


def _ozaki_einsum_raw(spec, A, B, depth):
    """einsum(spec, A, B) (two f64 operands) through the exact bf16-digit
    GEMM core: operands are transposed/reshaped to a batched matmul,
    contracted with _ozaki_bf16_batched, and reshaped back."""
    xs, ys, out, batch, contr, fa, fb, dims = _parse_einsum2(spec, A, B)
    pr = lambda idx: int(np.prod([dims[c] for c in idx])) if idx else 1
    bt, M, K, N = pr(batch), pr(fa), pr(contr), pr(fb)
    At = jnp.transpose(A, [xs.index(c) for c in batch + fa + contr])
    Bt = jnp.transpose(B, [ys.index(c) for c in batch + contr + fb])
    C = _ozaki_bf16_batched(At.reshape(bt, M, K), Bt.reshape(bt, K, N),
                            depth)
    C = C.reshape([dims[c] for c in batch + fa + fb])
    order = batch + fa + fb
    return jnp.transpose(C, [order.index(c) for c in out])


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def ozaki_einsum(spec, A, B, depth=6, grad_depth=5):
    """Two-operand einsum on f64 operands at f64-class accuracy from
    exact single-pass bf16 MXU GEMMs (see ozaki_matmul_bf16) — the drop-in
    for the emulated-f64 contractions that dominate the precise-mode
    integral pipeline (tpu_precise_breakdown.py). Error ~2^(-8*depth)
    relative to per-row operand maxima. The custom VJP contracts
    cotangents with the same scheme at grad_depth via the adjoint specs
    (K-blocking keeps the digit accumulations exact at any contraction
    size, so gradients hold f64-class accuracy too)."""
    return _ozaki_einsum_raw(spec, A, B, depth)


def _adjoint_specs(spec):
    ins, out = spec.split("->")
    xs, ys = ins.split(",")
    return f"{out},{ys}->{xs}", f"{xs},{out}->{ys}"


def _oz_ein_fwd(spec, A, B, depth, grad_depth):
    return _ozaki_einsum_raw(spec, A, B, depth), (A, B)


def _oz_ein_bwd(spec, depth, grad_depth, res, ct):
    A, B = res
    spec_a, spec_b = _adjoint_specs(spec)
    dA = _ozaki_einsum_raw(spec_a, ct, B, grad_depth)
    dB = _ozaki_einsum_raw(spec_b, A, ct, grad_depth)
    return dA, dB


ozaki_einsum.defvjp(_oz_ein_fwd, _oz_ein_bwd)


def ozaki_contract_last(A, B, w=None, depth=5):
    """y[..., :] = A[..., k] contracted with B[k, ...]: reshapes to a
    single (M, K) @ (K, N) ozaki_matmul. A: (..., K) f64, B: (K, ...)
    f64."""
    K = A.shape[-1]
    assert B.shape[0] == K
    M = int(np.prod(A.shape[:-1])) if A.ndim > 1 else 1
    N = int(np.prod(B.shape[1:])) if B.ndim > 1 else 1
    C = ozaki_matmul(A.reshape(M, K), B.reshape(K, N), w=w, depth=depth)
    return C.reshape(A.shape[:-1] + B.shape[1:])
