"""Compensated-precision subspace assembly for f32 TPU hardware.

The TPU's fast path is f32 (x64 is software-emulated and impractically
slow through the remote-compile tunnel), but the continuation's H/S
assembly reduces ~3e5 packed products per training pair — a plain f32
contraction loses ~sqrt(N)*eps_f32 ~ 3e-5 relative, the dominant term in
the round-1 TPU-vs-CPU-f64 error of ~4e-5 Ha (BASELINE.json north-star is
1e-8 Ha). This module attacks the two biggest error sources without
leaving f32 hardware:

  1. **Operand splitting (double-f32 representation).** Host-side f64
     arrays are stored as (hi, lo) f32 pairs with hi = f32(x),
     lo = f32(x - hi); the contraction sums hi*hi + hi*lo + lo*hi,
     removing the f32 *representation* error of the store and the
     integrals.
  2. **Chunked two-float accumulation.** Each matmul accumulates only a
     CHUNK of the packed axis in hardware f32 (error ~ sqrt(chunk)*eps);
     the per-chunk partial sums are then combined with error-free TwoSum
     arithmetic, cutting the sqrt(N) accumulation growth to sqrt(chunk).
  3. **Rayleigh-quotient refinement of the GEP.** The eigenvector from
     the f32 whitened eigh carries O(eps*kappa) error, but the Rayleigh
     quotient E = c^T H c / c^T S c is *second order* in the vector
     error — evaluating it with the compensated H (and exact S algebra)
     squares the eigensolver's error away.

What this does NOT fix: the integrals h1/h2 are still produced by the f32
McMurchie-Davidson pipeline on device (Loewdin transform + 4-index
transforms), which carries its own ~1e-6-level rounding. The measured
per-mitigation error ladder lives in RESULTS.md; tests pin the compensated
contraction at <= 1e-7 relative against f64 on CPU.

Reference context: the reference runs everything in NumPy f64 on CPU
(evcont/ab_initio_eigenvector_continuation.py:38-78); this module is the
TPU-native answer to matching that accuracy on f32 hardware.
"""

import numpy as np

import jax
import jax.numpy as jnp


def split_two_float(x):
    """Host-side split of an f64 array into a (hi, lo) f32 pair."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def split_two_float_device(x):
    """On-device split of an f64 array into a (hi, lo) f32 pair (requires
    jax_enable_x64; TPU emulated-f64 subtraction is exact here since
    hi is exactly representable in f64)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly (Knuth TwoSum),
    elementwise in f32 on device."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _twofloat_add(s_hi, s_lo, x):
    """Accumulate x into the running two-float sum (s_hi, s_lo)."""
    t, e = two_sum(s_hi, x)
    return t, s_lo + e


def _twofloat_tree_sum(parts_hi, parts_lo):
    """Exact pairwise reduction of two-float values along the last axis:
    log2(n) vectorized levels of double-double addition."""
    n = parts_hi.shape[-1]
    size = 1
    while size < n:
        size *= 2
    pad = size - n
    if pad:
        parts_hi = jnp.pad(parts_hi, [(0, 0)] * (parts_hi.ndim - 1)
                           + [(0, pad)])
        parts_lo = jnp.pad(parts_lo, [(0, 0)] * (parts_lo.ndim - 1)
                           + [(0, pad)])
    while parts_hi.shape[-1] > 1:
        a_hi, b_hi = parts_hi[..., 0::2], parts_hi[..., 1::2]
        a_lo, b_lo = parts_lo[..., 0::2], parts_lo[..., 1::2]
        s, e = two_sum(a_hi, b_hi)
        lo = e + a_lo + b_lo
        parts_hi, parts_lo = two_sum(s, lo)
    return parts_hi[..., 0], parts_lo[..., 0]


def _divisor_chunk(K, chunk):
    """The smallest divisor of K in [chunk, 4*chunk], or None. Used to
    avoid padding the contraction axis inside jit: for a multi-GB store
    operand an in-jit pad materializes a full HLO-temp copy (the round-3
    Zundel-84 batched-precise OOM — pad of f32[3570,307720] cost 2x4.1 GB
    of HBM temps), whereas a slightly larger exact-divisor chunk only
    nudges the sqrt(chunk)*eps accumulation error."""
    for c in range(chunk, 4 * chunk + 1):
        if K % c == 0:
            return c
    return None


def compensated_matvec(A_hi, A_lo, x_hi, x_lo, chunk=128):
    """y = A @ x with double-f32 operands and chunked two-float
    accumulation.

    Error model: the splits remove the f32 *representation* error; the
    hardware f32 accumulation (sequential, error ~ eps * chunk * rms)
    only ever spans `chunk` terms, and the per-chunk partial sums are
    combined with an exact two-float pairwise tree. chunk=128 (the MXU
    contraction depth) gives ~5e-9 relative on 1e5-term reductions
    (tests/test_compensated.py). When chunk does not divide K, a nearby
    exact divisor is preferred over padding (no in-jit copy of A)."""
    M, K = A_hi.shape
    if K % chunk:
        chunk = _divisor_chunk(K, chunk) or chunk
    nchunk = -(-K // chunk)
    Kp = nchunk * chunk
    pad = Kp - K

    def padk(a):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad),)) if a.ndim == 1 else \
            jnp.pad(a, ((0, 0), (0, pad)))

    Ah = padk(A_hi).reshape(M, nchunk, chunk)
    Al = None if A_lo is None else padk(A_lo).reshape(M, nchunk, chunk)
    xh = padk(x_hi).reshape(nchunk, chunk)
    xl = None if x_lo is None else padk(x_lo).reshape(nchunk, chunk)

    # per-chunk partial sums: leading product + the nonzero cross terms
    # (lo=None marks an operand whose f64 value is exactly f32)
    lead = jnp.einsum("mck,ck->mc", Ah, xh)
    cross = 0.0
    if xl is not None:
        cross = cross + jnp.einsum("mck,ck->mc", Ah, xl)
    if Al is not None:
        cross = cross + jnp.einsum("mck,ck->mc", Al, xh)
    parts = lead if isinstance(cross, float) else \
        jnp.concatenate([lead, cross], axis=1)
    return _twofloat_tree_sum(parts, jnp.zeros_like(parts))


_DEKKER = np.float32(4097.0)        # 2^12 + 1 splitter for f32


def _dekker_split(x):
    """Split an f32 array into 12-bit-high + low halves; products of two
    high (or high*low) parts are then EXACT in f32."""
    t = _DEKKER * x
    hi = t - (t - x)
    return hi, x - hi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker TwoProd without
    FMA), elementwise f32."""
    p = a * b
    a_hi, a_lo = _dekker_split(a)
    b_hi, b_lo = _dekker_split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def exact_matvec(A_hi, A_lo, x_hi, x_lo, kblock=8192):
    """y = A @ x in full double-f32 arithmetic: error-free products
    (TwoProd) and exact two-float pairwise summation — the VPU-bound
    accuracy mode (error ~ n * eps_f32^2, i.e. f64-class). Processes the
    contraction axis in blocks to bound memory (kblock=8192 keeps the
    ~(Npair, kblock) TwoProd temporaries, several of which are live at
    once under the force JVP, inside HBM next to the 4 GiB store)."""
    M, K = A_hi.shape
    acc_hi = jnp.zeros(M, dtype=jnp.float32)
    acc_lo = jnp.zeros(M, dtype=jnp.float32)
    for start in range(0, K, kblock):
        Ah = A_hi[:, start:start + kblock]
        xh = x_hi[start:start + kblock]
        p, e = two_prod(Ah, xh[None, :])
        if x_lo is not None:
            e = e + Ah * x_lo[start:start + kblock][None, :]
        if A_lo is not None:
            e = e + A_lo[:, start:start + kblock] * xh[None, :]
        b_hi, b_lo = _twofloat_tree_sum(p, e)
        s, e2 = two_sum(acc_hi, b_hi)
        acc_hi, acc_lo = two_sum(s, e2 + acc_lo + b_lo)
    return acc_hi, acc_lo


def compensated_pair_assembly(r1_hi, r1_lo, r2_hi, r2_lo, h1, h2c,
                              chunk=128, mode="compensated", kblock=8192):
    """H[pair] for the pair-compressed store with compensated arithmetic.

    r1: (Npair, n, n) as (hi, lo); r2: (Npair, Npacked) as (hi, lo);
    h1: (n, n) f32; h2c: exchange-compressed integrals (Npacked,) f32
    (diag_multiplier 0.5 already applied). Returns two-float
    (H_hi, H_lo) per pair. mode: "compensated" (MXU matmuls, chunked
    two-float combine) | "exact" (TwoProd + exact summation, VPU-bound,
    f64-class)."""
    mv = compensated_matvec if mode == "compensated" else \
        (lambda *a, **k: exact_matvec(*a, **k))
    kw = {"chunk": chunk} if mode == "compensated" else {"kblock": kblock}
    npair = r1_hi.shape[0]

    def as_pair(x):
        if isinstance(x, tuple):
            lo = x[1].reshape(-1) if x[1] is not None else None
            return x[0].reshape(-1), lo
        return x.reshape(-1), None

    h1h, h1l = as_pair(h1)
    h2h, h2l = as_pair(h2c)
    r1l = r1_lo.reshape(npair, -1) if r1_lo is not None else None
    oh, ol = mv(r1_hi.reshape(npair, -1), r1l, h1h, h1l, **kw)
    th, tl = mv(r2_hi, r2_lo, h2h, h2l, **kw)
    s_hi, e = two_sum(oh, th)
    return s_hi, e + ol + tl


def rayleigh_refined_ground_state(H_hi, H_lo, S, vec):
    """Second-order-accurate ground-state energy from an approximate
    (f32) eigenvector: E = c^T H c / c^T S c with the two-float H.

    The vector error delta from the f32 whitened eigh enters E only at
    O(delta^2) (Rayleigh quotient stationarity)."""
    num_hi = vec @ (H_hi @ vec)
    num_lo = vec @ (H_lo @ vec)
    den = vec @ (S @ vec)
    return (num_hi + num_lo) / den
