"""Löwdin symmetric orthogonalization (OAO basis) and integral transforms.

Reference parity:
  * get_loewdin_trafo          (evcont/electron_integral_utils.py:6-18)
  * transform_integrals        (evcont/electron_integral_utils.py:21-35)
  * compress/restore_electron_exchange_symmetry (":38-88")
  * loewdin_trafo_grad         (evcont/ab_initio_gradients_loewdin.py:41-112)

Design divergence (TPU-first): the reference differentiates the Löwdin
transformation with explicit degenerate perturbation theory (rounding
eigenvalues to 5 decimals and diagonalizing the perturbation inside each
degenerate block). Here S^(-1/2) gets a custom JVP built on the
Daleckii-Krein theorem for matrix functions: in the eigenbasis of S,

    d f(S)_ij = f[s_i, s_j] * (V^T dS V)_ij,
    f[x, y]   = (f(x) - f(y)) / (x - y),  f[x, x] = f'(x),

and for f(x) = x^(-1/2) the divided difference has the closed form
    f[x, y] = -1 / (sqrt(x) sqrt(y) (sqrt(x) + sqrt(y))),

which is smooth for all positive eigenvalues *including degeneracies* — no
rounding, no block diagonalization, exactly equal to the reference's
degenerate PT result (the matrix function is well-defined even though the
eigenvectors are not). This keeps the whole pipeline jit-safe with static
shapes; symmetric H-chain geometries (degenerate overlap spectra) work
without special-casing.
"""

import jax
import jax.numpy as jnp
import numpy as np

# Löwdin pseudo-inverse cutoff, matching the reference's 1e-15
# (evcont/electron_integral_utils.py:17)
LOEWDIN_CUTOFF = 1.0e-15


@jax.custom_jvp
def loewdin_trafo(overlap_mat):
    """S^(-1/2) via eigendecomposition with pseudo-inverse cutoff."""
    vals, vecs = jnp.linalg.eigh(overlap_mat)
    inv_sqrt = jnp.where(
        vals > LOEWDIN_CUTOFF, 1.0 / jnp.sqrt(jnp.maximum(vals, LOEWDIN_CUTOFF)), 0.0
    )
    return (vecs * inv_sqrt) @ vecs.T


@loewdin_trafo.defjvp
def _loewdin_trafo_jvp(primals, tangents):
    (S,), (dS,) = primals, tangents
    vals, vecs = jnp.linalg.eigh(S)
    sq = jnp.sqrt(jnp.maximum(vals, LOEWDIN_CUTOFF))
    keep = vals > LOEWDIN_CUTOFF
    inv_sqrt = jnp.where(keep, 1.0 / sq, 0.0)
    primal_out = (vecs * inv_sqrt) @ vecs.T

    # Daleckii-Krein divided-difference kernel for f(x) = x^(-1/2)
    denom = sq[:, None] * sq[None, :] * (sq[:, None] + sq[None, :])
    K = -1.0 / denom
    # zero out modes below the pseudo-inverse cutoff (their contribution is
    # defined to be 0, matching the reference's where() on eigenvalues)
    mask = keep[:, None] & keep[None, :]
    K = jnp.where(mask, K, 0.0)

    dS_eig = vecs.T @ dS @ vecs
    d_out = vecs @ (K * dS_eig) @ vecs.T
    return primal_out, d_out


def polished_eigh(A, vals, vecs, gap_floor_rel=1.0e-6):
    """First-order polish of a full (possibly inaccurate) eigendecomposition
    of symmetric A, using only matmuls and elementwise ops.

    B = V^T A V is nearly diagonal when V is nearly exact; the corrections
        vals'  = diag(B)                       (Rayleigh quotients: 2nd order)
        V'     = V (I + C),  C[q,p] = B[q,p] / (vals[p] - vals[q])
    remove the leading eigenpair errors wherever the gap is resolvable.
    Unresolvable gaps (|gap| < gap_floor_rel * spread) are skipped — the
    rotation inside a (near-)degenerate block is gauge for any matrix
    function f(A), so those directions never matter downstream.

    Rationale: XLA:TPU's f64 eigh delivers only ~6e-9 relative accuracy
    (measured — it is the one TPU primitive that is not genuinely double
    precision) while f64 matmuls are exact to ~4e-15. Note the one-sided
    Newton-Schulz inverse-sqrt iteration is NOT a usable alternative: it
    amplifies the non-commuting part of the seed error (verified to
    diverge geometrically on real AO overlaps)."""
    B = vecs.T @ (A @ vecs)
    d = jnp.diag(B)
    scale = jnp.maximum(jnp.max(d) - jnp.min(d), 1e-300)
    den = d[None, :] - d[:, None]            # vals[p] - vals[q] at [q, p]
    safe = jnp.where(jnp.abs(den) > gap_floor_rel * scale, den, jnp.inf)
    C = B / safe                             # off-diagonal only (diag -> 0)
    vecs = vecs + vecs @ C
    # first-order orthonormality restore (C is antisymmetric to leading
    # order; column renormalization removes the quadratic norm drift)
    vecs = vecs / jnp.linalg.norm(vecs, axis=0, keepdims=True)
    return d, vecs


def loewdin_trafo_refined(overlap_mat):
    """S^(-1/2) at full working precision on any backend: eigh + the
    matmul-exact first-order polish of both eigenvalues and eigenvectors
    (see polished_eigh). On CPU this is a no-op refinement; on TPU it
    repairs the backend eigh's ~6e-9 error, which otherwise propagates
    linearly into the OAO integrals. Pseudo-inverse cutoff semantics
    match loewdin_trafo."""
    vals, vecs = jnp.linalg.eigh(overlap_mat)
    vals, vecs = polished_eigh(overlap_mat, vals, vecs)
    inv_sqrt = jnp.where(
        vals > LOEWDIN_CUTOFF,
        1.0 / jnp.sqrt(jnp.maximum(vals, LOEWDIN_CUTOFF)), 0.0)
    return (vecs * inv_sqrt) @ vecs.T


def get_basis(bundle_ovlp):
    """OAO basis from the AO overlap matrix. The canonical/split basis
    choices (evcont/electron_integral_utils.py:91-119) live in
    evcont_tpu.solvers.scf / basis_variants since they need an SCF solve."""
    return loewdin_trafo(bundle_ovlp)


def transform_integrals(h1, h2, trafo):
    """AO -> orthogonal-basis transform of one-/two-electron integrals.

    trafo has AO rows, MO columns: h1' = C^T h1 C. Two-electron transform is
    four successive matmuls (MXU-friendly) rather than one 8-index einsum.
    """
    h1_t = trafo.T @ h1 @ trafo
    # (ij|kl) -> (ab|cd): contract the leading AO axis four times; tensordot
    # appends the new orbital axis last, so after four rounds the axis order
    # is restored to (a, b, c, d).
    h2_t = h2
    for _ in range(4):
        h2_t = jnp.tensordot(h2_t, trafo, axes=[[0], [0]])
    return h1_t, h2_t


def exchange_compression_maps(norb):
    """Static index maps for electron-exchange-symmetry compression of a
    (norb, norb, norb, norb) tensor viewed as (norb^2, norb^2)."""
    n2 = norb * norb
    rows, cols = np.tril_indices(n2)
    diag_mask = (rows == cols)
    return rows.astype(np.int32), cols.astype(np.int32), diag_mask


def compress_exchange(h2, diag_multiplier=1.0):
    """Pack a 4-index tensor with (ij)<->(kl) exchange symmetry into its
    lower triangle over combined indices; optionally scale the diagonal
    (reference: compress_electron_exchange_symmetry,
    electron_integral_utils.py:38-66)."""
    norb = h2.shape[-1]
    n2 = norb * norb
    rows, cols, diag_mask = exchange_compression_maps(norb)
    flat = h2.reshape(h2.shape[:-4] + (n2, n2))
    vals = flat[..., rows, cols]
    scale = jnp.where(jnp.asarray(diag_mask), diag_multiplier, 1.0)
    return vals * scale


def restore_exchange(packed, norb):
    """Inverse of compress_exchange (reference:
    restore_electron_exchange_symmetry, electron_integral_utils.py:69-88)."""
    n2 = norb * norb
    rows, cols, _ = exchange_compression_maps(norb)
    batch = packed.shape[:-1]
    out = jnp.zeros(batch + (n2, n2), dtype=packed.dtype)
    out = out.at[..., rows, cols].set(packed)
    upper = jnp.swapaxes(out, -1, -2)
    eye = jnp.eye(n2, dtype=packed.dtype)
    out = out + upper * (1.0 - eye)
    return out.reshape(batch + (norb, norb, norb, norb))


# ---------------------------------------------------------------------------
# RFP (rectangular-full-packed) exchange compression — the TPU-internal
# packed layout.
#
# compress_exchange/restore_exchange implement the reference's tril packing
# (electron_integral_utils.py:38-88), which on TPU lowers to an
# element-serial gather (fwd) and scatter (VJP): measured ~31 ms/batch of
# the flagship 162 ms batched energy+forces eval (tpu_stage_profile.py).
# The RFP layout packs the same N(N+1)/2 unique entries of the symmetric
# (N, N) matrix (N = norb^2) into a DENSE (N+1, N/2) [N even] or
# (N, (N+1)/2) [N odd] rectangle using only slices, one transpose, and one
# select — no gathers, trivially differentiable, exactly sized. The t-RDM
# store is permuted into the matching slot order once at model
# construction (rfp_permutation); the contraction store @ packed is
# order-agnostic.
# ---------------------------------------------------------------------------
def _rfp_geometry(N):
    """(k, rows) of the RFP rectangle for an N x N symmetric matrix."""
    k = (N + 1) // 2
    rows = N + 1 if N % 2 == 0 else N
    return k, rows


def rfp_fold(h2, diag_multiplier=1.0):
    """Pack a 4-index tensor with (ij)<->(kl) exchange symmetry into the
    dense RFP rectangle, flattened to (..., N(N+1)/2) with N = norb^2.

    Same information content as compress_exchange (each unique unordered
    pair once, diagonal optionally scaled) in a different, fixed slot
    order: rfp_fold(x, m) == compress_exchange(x, m)[..., rfp_permutation].
    Built from slices + transpose + one select, so both the forward and
    the VJP are dense TPU ops (no serial gather/scatter)."""
    norb = h2.shape[-1]
    N = norb * norb
    batch = h2.shape[:-4]
    return _sym_fold(h2.reshape(batch + (N, N)), diag_multiplier)


def _sym_fold(M, diag_multiplier=1.0):
    """RFP fold of a symmetric (..., N, N) matrix into its N(N+1)/2 unique
    entries (dense slices + transpose + select; see rfp_fold)."""
    N = M.shape[-1]
    batch = M.shape[:-2]
    if diag_multiplier != 1.0:
        eye = jnp.eye(N, dtype=M.dtype)
        M = M * (1.0 + (diag_multiplier - 1.0) * eye)
    k, rows = _rfp_geometry(N)
    nb = len(batch)
    Left = M[..., :, :k]
    C = M[..., k:, k:]          # (k, k) for even N, (k-1, k-1) for odd
    Ct = jnp.swapaxes(C, -1, -2)
    r = jnp.arange(rows)[:, None]
    c = jnp.arange(k)[None, :]
    pad0 = [(0, 0)] * nb
    if N % 2 == 0:
        # slots r > c: Left shifted down one row; slots r <= c: C[c, r]
        Lpad = jnp.pad(Left, pad0 + [(1, 0), (0, 0)])
        Cpad = jnp.pad(Ct, pad0 + [(0, rows - k), (0, 0)])
        P = jnp.where(r > c, Lpad, Cpad)
    else:
        # slots r >= c: Left; slots r < c: C[c-1, r] (C is (k-1, k-1))
        Cpad = jnp.pad(Ct, pad0 + [(0, rows - (k - 1)), (1, 0)])
        P = jnp.where(r >= c, Left, Cpad)
    return P.reshape(batch + (rows * k,))


def rfp_unfold(packed, norb):
    """Inverse of rfp_fold (diag_multiplier=1): dense reconstruction of the
    full symmetric (..., norb, norb, norb, norb) tensor (slices +
    transposes + selects only)."""
    norb2 = norb * norb
    M = _sym_unfold(packed, norb2)
    return M.reshape(packed.shape[:-1] + (norb, norb, norb, norb))


def _sym_unfold(packed, N):
    """Inverse of _sym_fold (diag_multiplier=1): the full symmetric
    (..., N, N) matrix."""
    k, rows = _rfp_geometry(N)
    batch = packed.shape[:-1]
    nb = len(batch)
    P = packed.reshape(batch + (rows, k))
    r = jnp.arange(rows)[:, None]
    c = jnp.arange(k)[None, :]
    pad0 = [(0, 0)] * nb
    if N % 2 == 0:
        Left = jnp.where(r > c, P, 0.0)[..., 1:, :]          # (N, k) tril part
        Ct = jnp.where(r <= c, P, 0.0)[..., :k, :]           # C[c, r] at (r, c)
        C = jnp.swapaxes(Ct, -1, -2)                          # lower tri of C
    else:
        Left = jnp.where(r >= c, P, 0.0)
        Ct = jnp.where(r < c, P, 0.0)[..., : k - 1, 1:]
        C = jnp.swapaxes(Ct, -1, -2)
    # Left holds the lower trapezoid {(i, j): i >= j, j < k}; C holds the
    # lower triangle of the bottom-right block. Assemble the lower triangle
    # of M (each unique entry exactly once, columns < k vs >= k disjoint),
    # then complete symmetrically (the diagonal appears only in Mlow).
    Mlow = jnp.pad(Left, pad0 + [(0, 0), (0, N - k)]) \
        + jnp.pad(C, pad0 + [(N - C.shape[-2], 0), (N - C.shape[-1], 0)])
    eye = jnp.eye(N, dtype=packed.dtype)
    return Mlow + jnp.swapaxes(Mlow, -1, -2) * (1.0 - eye)


def rfp_permutation(norb):
    """Index map from reference tril packing to RFP slot order:
    packed_rfp = packed_tril[..., perm]. Host-side numpy, cached."""
    if norb in _RFP_PERM_CACHE:
        return _RFP_PERM_CACHE[norb]
    perm = _sym_permutation(norb * norb)
    _RFP_PERM_CACHE[norb] = perm
    return perm


def _sym_permutation(N):
    """Per-slot tril-linear index of the _sym_fold layout for an (N, N)
    symmetric matrix: slot s of the fold holds the unique entry (i >= j)
    with i*(i+1)/2 + j == perm[s]. Host numpy."""
    i, j = np.tril_indices(N)
    lin = (i * (i + 1) // 2 + j)
    idx = np.zeros((N, N), dtype=np.int64)
    idx[i, j] = lin
    idx[j, i] = lin
    k, rows = _rfp_geometry(N)
    Left = idx[:, :k]
    C = idx[k:, k:]
    r = np.arange(rows)[:, None]
    c = np.arange(k)[None, :]
    if N % 2 == 0:
        Lpad = np.pad(Left, [(1, 0), (0, 0)])
        Cpad = np.pad(C.T, [(0, rows - k), (0, 0)])
        P = np.where(r > c, Lpad, Cpad)
    else:
        Cpad = np.pad(C.T, [(0, rows - (k - 1)), (1, 0)])
        P = np.where(r >= c, Left, Cpad)
    return P.reshape(-1)


_RFP_PERM_CACHE = {}


# ---------------------------------------------------------------------------
# s8: full 8-fold ERI-symmetry packing — the serial-MD streaming layout.
#
# The OAO two-electron tensor (real orbitals) is invariant under the full
# 8-group {i<->j, k<->l, (ij)<->(kl)}, so only the 8-fold-symmetric
# projection of a t-RDM store contributes to any assembly against it. The
# rfp/tril layouts exploit only (ij)<->(kl): npacked = M(M+1)/2 with
# M = nao^2. Projecting onto the full group packs to P(P+1)/2 with
# P = nao(nao+1)/2 — 3.72x fewer store bytes at Zundel/6-31G (307,720 ->
# 82,621 slots), which is exactly the factor the serial-MD step's two
# full-store HBM streams (forward H assembly + Hellmann-Feynman weight
# contraction) are bandwidth-bound by. Energies/forces are EXACTLY
# unchanged in exact arithmetic: the dropped store components are
# orthogonal to every 8-symmetric h2.
#
# Conventions (mirroring rfp): for an underlying per-pair Gamma, the s8
# slot for unordered composite {P, Q} (P, Q tril pair indices) holds the
# orbit sum A(P,Q) + A(Q,P) over ordered members, halved off-diagonal —
# equivalently g(P) g(Q) Gamma_s[P,Q] for the symmetrized Gamma_s, with
# g(P) = 2 - delta_ij. The h2 side (s8_fold) packs plain canonical values
# with the diagonal optionally scaled, so
#   store_s8 @ s8_fold(h2, 0.5) == store_rfp @ rfp_fold(h2, 0.5)
# for every 8-symmetric h2 (tests/test_s8.py).
# ---------------------------------------------------------------------------
def s8_rows(norb):
    """Representative ordered composite index i*norb + j (i >= j) of each
    tril pair slot P."""
    i, j = np.tril_indices(norb)
    return (i * norb + j).astype(np.int32)


def s8_npacked(norb):
    T = norb * (norb + 1) // 2
    return T * (T + 1) // 2


_S8_GATHER_CACHE = {}


def _s8_gather_matrix(norb):
    """The s8_rows composite-pair gather as a static 0/1 matrix (N, T):
    on TPU a minor-axis jnp.take lowers to element-serial loads and its
    VJP to an element-serial scatter, while the identical linear map as
    a GEMM rides the MXU (same trick as engine._conv_onehot; measured
    ~1 ms of the 8.4 ms serial MD step in the fold's take pair,
    tpu_md_step_profile.py)."""
    if norb not in _S8_GATHER_CACHE:
        rows = s8_rows(norb)
        G = np.zeros((norb * norb, len(rows)), dtype=np.float32)
        G[rows, np.arange(len(rows))] = 1.0
        _S8_GATHER_CACHE[norb] = G
    return _S8_GATHER_CACHE[norb]


def s8_fold(h2, diag_multiplier=1.0):
    """Pack an 8-fold-symmetric 4-index tensor into its s8 slot vector
    (..., P(P+1)/2): the composite-pair row/column selection (as 0/1
    GEMMs for f32 — MXU; as gathers for f64, where an emulated-f64 GEMM
    would cost more than the serial loads) followed by the dense
    _sym_fold."""
    norb = h2.shape[-1]
    N = norb * norb
    batch = h2.shape[:-4]
    M = h2.reshape(batch + (N, N))
    if M.dtype == jnp.float32:
        G = jnp.asarray(_s8_gather_matrix(norb))
        M = jnp.einsum("...ab,as->...sb", M, G)
        M = jnp.einsum("...sb,bt->...st", M, G)
    else:
        rows = jnp.asarray(s8_rows(norb))
        M = jnp.take(M, rows, axis=-2)
        M = jnp.take(M, rows, axis=-1)
    return _sym_fold(M, diag_multiplier)


def s8_unfold(packed, norb):
    """Full symmetrized 4-index tensor from an s8 store vector: the unique
    8-fold-symmetric Gamma_s with sum(Gamma_s * h2) = sum(Gamma * h2) for
    every 8-symmetric h2 (what predicted-RDM observables contracted with
    symmetric kernels see)."""
    T = norb * (norb + 1) // 2
    M = _sym_unfold(packed, T)                     # entries g(P) g(Q) Gamma
    i, j = np.tril_indices(norb)
    g = jnp.asarray((2.0 - (i == j)).astype(np.float64), dtype=packed.dtype)
    M = M / (g[:, None] * g[None, :])
    # broadcast each unordered composite value to all ordered members
    pq = np.zeros((norb, norb), dtype=np.int32)
    pq[i, j] = np.arange(T)
    pq[j, i] = np.arange(T)
    pqf = jnp.asarray(pq.reshape(-1))
    M = jnp.take(M, pqf, axis=-2)
    M = jnp.take(M, pqf, axis=-1)
    return M.reshape(packed.shape[:-1] + (norb,) * 4)


def s8_from_packed_maps(norb, order="rfp"):
    """(src, w): for each s8 slot, the <= 4 source slots of an rfp/tril
    exchange-compressed store and 0/1 weights such that
    store_s8[..., q] = sum_t w[t, q] * store[..., src[t, q]].

    Host numpy, cached per (norb, order). The combos are the g(P) g(Q)
    ordered representatives of the slot's bra/ket pairs; colliding combos
    (the {IJ, JI} diagonal case) appear as duplicate indices, which is
    exactly the factor-2 the orbit sum requires."""
    key = (norb, order)
    if key in _S8_MAP_CACHE:
        return _S8_MAP_CACHE[key]
    T = norb * (norb + 1) // 2
    lin = _sym_permutation(T)                    # slot -> P*(P+1)/2 + Q
    P = ((np.sqrt(8.0 * lin + 1.0) - 1.0) / 2.0).astype(np.int64)
    # exact integer correction of the float isqrt
    P = np.where((P + 1) * (P + 2) // 2 <= lin, P + 1, P)
    P = np.where(P * (P + 1) // 2 > lin, P - 1, P)
    Q = lin - P * (P + 1) // 2
    ti, tj = np.tril_indices(norb)
    i, j = ti[P], tj[P]
    k, l = ti[Q], tj[Q]
    IJ = np.stack([i * norb + j, j * norb + i])          # (2, nslot)
    KL = np.stack([k * norb + l, l * norb + k])
    ij_ok = np.stack([np.ones_like(i, bool), i != j])
    kl_ok = np.stack([np.ones_like(k, bool), k != l])
    srcs, ws = [], []
    if order == "rfp":
        M = norb * norb
        inv = np.empty(M * (M + 1) // 2, dtype=np.int64)
        inv[_sym_permutation(M)] = np.arange(inv.shape[0])
    for a in range(2):
        for b in range(2):
            hi = np.maximum(IJ[a], KL[b])
            lo = np.minimum(IJ[a], KL[b])
            slot = hi * (hi + 1) // 2 + lo               # tril linear
            if order == "rfp":
                slot = inv[slot]
            valid = ij_ok[a] & kl_ok[b]
            srcs.append(np.where(valid, slot, 0).astype(np.int32))
            ws.append(valid.astype(np.float32))
    out = (np.stack(srcs), np.stack(ws))
    _S8_MAP_CACHE[key] = out
    return out


_S8_MAP_CACHE = {}


def s8_to_tril_maps(norb):
    """(idx, w): reference-tril-order view of an s8 store —
    store_tril_sym[..., t] = store_s8[..., idx[t]] * w[t], the symmetrized
    store in the reference's compress_exchange slot order (for file
    export/interop; energies against real-orbital h2 are identical)."""
    N = norb * norb
    I, J = np.tril_indices(N)                      # composite IJ >= KL
    i, j = I // norb, I % norb
    k, l = J // norb, J % norb
    T = norb * (norb + 1) // 2
    ti, tj = np.tril_indices(norb)
    pq = np.zeros((norb, norb), dtype=np.int64)
    pq[ti, tj] = np.arange(T)
    pq[tj, ti] = np.arange(T)
    P, Q = pq[i, j], pq[k, l]
    hi, lo = np.maximum(P, Q), np.minimum(P, Q)
    inv = np.empty(T * (T + 1) // 2, dtype=np.int64)
    inv[_sym_permutation(T)] = np.arange(inv.shape[0])
    idx = inv[hi * (hi + 1) // 2 + lo]
    w = 1.0 / ((2.0 - (i == j)) * (2.0 - (k == l)))
    return idx.astype(np.int32), w.astype(np.float32)


def store_to_s8(two_rdm, norb, order="rfp", chunk_rows=256,
                chunk_slots=16384):
    """Project an exchange-compressed (..., npacked) t-RDM store onto the
    s8 layout (one-time, at model construction).

    numpy input: chunked fancy-indexing over leading rows (no transient
    transpose — the CPU-f64 reference process is RAM-bound).
    jax input: the store is transposed once and gathered by LEADING-axis
    rows in slot chunks (minor-axis gathers are element-serial on TPU;
    row gathers are DMA copies), bounding transient HBM at roughly
    2x store + output."""
    src, w = s8_from_packed_maps(norb, order)
    nslot = src.shape[1]
    if isinstance(two_rdm, np.ndarray):
        out = np.empty(two_rdm.shape[:-1] + (nslot,), dtype=two_rdm.dtype)
        flat = two_rdm.reshape(-1, two_rdm.shape[-1])
        oflat = out.reshape(-1, nslot)
        for lo in range(0, flat.shape[0], chunk_rows):
            blk = flat[lo:lo + chunk_rows]
            acc = blk[:, src[0]] * w[0]
            for t in range(1, 4):
                acc += blk[:, src[t]] * w[t]
            oflat[lo:lo + chunk_rows] = acc
        return out
    st = jnp.swapaxes(jnp.asarray(two_rdm), -1, -2)
    dt = st.dtype
    outs = []
    for lo in range(0, nslot, chunk_slots):
        sl = slice(lo, min(lo + chunk_slots, nslot))
        acc = None
        for t in range(4):
            g = jnp.take(st, jnp.asarray(src[t][sl]), axis=-2) \
                * jnp.asarray(w[t][sl], dtype=dt)[:, None]
            acc = g if acc is None else acc + g
        outs.append(acc)
    return jnp.swapaxes(jnp.concatenate(outs, axis=-2), -1, -2)


def pair_compression_maps(ntrain):
    """Static index maps for data-pair symmetry: (a, b) -> packed tril index
    over training-state pairs (the reference's 'data symmetry' layouts)."""
    rows, cols = np.tril_indices(ntrain)
    return rows.astype(np.int32), cols.astype(np.int32)
