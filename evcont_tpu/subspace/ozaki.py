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
