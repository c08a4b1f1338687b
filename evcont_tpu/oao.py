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
    M = h2.reshape(batch + (N, N))
    if diag_multiplier != 1.0:
        eye = jnp.eye(N, dtype=h2.dtype)
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
    N = norb * norb
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
    M = Mlow + jnp.swapaxes(Mlow, -1, -2) * (1.0 - eye)
    return M.reshape(batch + (norb, norb, norb, norb))


def rfp_permutation(norb):
    """Index map from reference tril packing to RFP slot order:
    packed_rfp = packed_tril[..., perm]. Host-side numpy, cached."""
    if norb in _RFP_PERM_CACHE:
        return _RFP_PERM_CACHE[norb]
    N = norb * norb
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
    perm = P.reshape(-1)
    _RFP_PERM_CACHE[norb] = perm
    return perm


_RFP_PERM_CACHE = {}


def pair_compression_maps(ntrain):
    """Static index maps for data-pair symmetry: (a, b) -> packed tril index
    over training-state pairs (the reference's 'data symmetry' layouts)."""
    rows, cols = np.tril_indices(ntrain)
    return rows.astype(np.int32), cols.astype(np.int32)
