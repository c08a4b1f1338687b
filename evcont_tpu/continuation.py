"""Eigenvector-continuation core: subspace Hamiltonian/overlap assembly and
the generalized eigenvalue solve.

Reference parity (evcont/ab_initio_eigenvector_continuation.py):
  * approximate_ground_state       (:12-90)   -> approximate_ground_state
  * approximate_multistate         (:93-175)  -> approximate_multistate
  * the four t-RDM storage layouts (:41-71), distinguished by ndim:
      6d (Ntrn, Ntrn, n, n, n, n)           no symmetry
      5d (Npair, n, n, n, n)                data (pair) symmetry
      3d (Ntrn, Ntrn, n^2(n^2+1)/2)         exchange symmetry
      2d (Npair, n^2(n^2+1)/2)              both
  * predicted RDMs from the subspace eigenvector
    (evcont/ab_initio_gradients_loewdin.py:343-361)

Design divergences (TPU-first):
  * The generalized eigenproblem is solved by spectral whitening of S with a
    pseudo-inverse cutoff (static shapes, jit-safe, robust to the nearly
    linearly dependent training overlaps that appear as the training set
    grows) instead of scipy.linalg.eigh's Cholesky reduction, which fails
    outright for singular S.
  * lowest_states carries a custom JVP implementing the Hellmann-Feynman
    derivative dE_k = c_k^T (dH - E_k dS) c_k (with c_k^T S c_k = 1). This
    makes jax.grad of the continuation energy reproduce the reference's
    hand-assembled analytic nuclear gradient exactly. Eigenvector
    tangents are the exact first-order perturbation sums (degenerate
    directions gauge-projected), so derivatives of predicted-RDM
    observables (dipole derivatives, etc.) are also correct; S is the
    geometry-independent training overlap, so its tangent is only folded
    into dE, not the vector gauge.
  * hermitian=False (scipy.linalg.eig, reference :78) is host-only and not
    differentiable; the default hermitian path is fully on-device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .oao import (
    compress_exchange,
    loewdin_trafo,
    pair_compression_maps,
    restore_exchange,
    rfp_fold,
    rfp_unfold,
    s8_fold,
    s8_unfold,
)


def packed_fold(packed_layout):
    """The h2-side packing kernel matching a store's packed_layout:
    "tril" (reference schema), "rfp" (dense TPU fold), or "s8" (full
    8-fold ERI-symmetry projection, oao.py)."""
    kernels = {"tril": compress_exchange, "rfp": rfp_fold, "s8": s8_fold}
    try:
        return kernels[packed_layout]
    except KeyError:
        raise ValueError(
            f"unknown packed_layout {packed_layout!r}; valid layouts are "
            f"{sorted(kernels)}") from None

# numerical floor for whitening the training-state overlap matrix
GEP_CUTOFF = 1.0e-12


# ---------------------------------------------------------------------------
# subspace Hamiltonian assembly
# ---------------------------------------------------------------------------
def assemble_hamiltonian(h1, h2, one_rdm, two_rdm, two_body_backend="xla",
                         packed_layout="tril", ntrain=None):
    """H[a,b] = sum_ij gamma[a,b,i,j] h1[ij] + 1/2 sum Gamma[a,b,ijkl] h2[ijkl]
    for any of the four storage layouts. Returns the full symmetric matrix
    (the reference leaves the upper triangle unset for pair-compressed
    layouts because scipy's eigh only reads the lower triangle; here the
    whitened solve consumes the full matrix).

    two_body_backend selects the packed-store contraction kernel for the
    fully-compressed (2-d) layout: "xla" einsum or the "pallas" blocked
    streaming kernel (subspace/pallas_assembly.py).

    packed_layout names the slot order of exchange-compressed two_rdm axes:
    "tril" (the reference's schema, oao.compress_exchange), "rfp" (the
    TPU-internal dense fold, oao.rfp_fold — avoids the element-serial
    gather/scatter the tril packing costs on TPU), or "s8" (the full
    8-fold ERI-symmetry projection, oao.s8_fold — 3.7x fewer store bytes
    streamed per assembly). ContinuationModel converts its store to "rfp"
    (or "s8" with compress_s8=True) at construction."""
    pack = packed_fold(packed_layout)
    if one_rdm.ndim == 3:
        # pair-compressed one-body store (Npair, n, n) — the sharded layout.
        # The store may carry zero-padded tail rows (parallel.mesh pads the
        # pair axis to a mesh multiple for even sharding); `ntrain` then
        # cannot be derived from the row count, so callers that know S pass
        # it explicitly.
        npair = one_rdm.shape[0]
        if ntrain is None:
            ntrain = int((np.sqrt(8 * npair + 1) - 1) / 2)
            if ntrain * (ntrain + 1) // 2 != npair:
                raise ValueError(
                    f"pair axis {npair} is not a triangular number — for "
                    "padded (sharded) stores pass ntrain explicitly")
        Hone = jnp.einsum("pij,ij->p", one_rdm, h1)
        H = _unpack_pairs(Hone, ntrain, Hone.dtype)
    else:
        ntrain = one_rdm.shape[0]
        H = jnp.einsum("abij,ij->ab", one_rdm, h1)

    ndim = two_rdm.ndim
    if ndim == 6:
        H = H + 0.5 * jnp.einsum("abijkl,ijkl->ab", two_rdm, h2)
    elif ndim == 5:
        Htwo = 0.5 * jnp.einsum("pijkl,ijkl->p", two_rdm, h2)
        H = H + _unpack_pairs(Htwo, ntrain, H.dtype)
    elif ndim == 3:
        h2c = pack(h2, diag_multiplier=0.5)
        H = H + jnp.einsum("abp,p->ab", two_rdm, h2c)
    elif ndim == 2:
        h2c = pack(h2, diag_multiplier=0.5)
        if two_body_backend == "pallas":
            from .subspace.pallas_assembly import assemble_two_body
            Htwo = assemble_two_body(two_rdm, h2c, backend="pallas")
        else:
            Htwo = two_rdm @ h2c
        H = H + _unpack_pairs(Htwo, ntrain, H.dtype)
    else:
        raise ValueError(f"unsupported two_rdm rank {ndim}")
    return H


def _unpack_pairs(packed, ntrain, dtype):
    """Scatter a packed lower-triangular pair vector into a full symmetric
    (ntrain, ntrain) matrix. Accepts a zero-padded tail (sharded stores pad
    the pair axis to a mesh multiple): pad slots scatter-add into a scratch
    row that is sliced away, so no gather of the tail is needed and the
    scatter stays a single static-shape op."""
    rows, cols = pair_compression_maps(ntrain)
    npair = rows.shape[0]
    pad = packed.shape[0] - npair
    if pad == 0:
        M = jnp.zeros((ntrain, ntrain), dtype=dtype)
        M = M.at[rows, cols].set(packed)
    else:
        rows_p = jnp.concatenate(
            [jnp.asarray(rows), jnp.full((pad,), ntrain, dtype=rows.dtype)])
        cols_p = jnp.concatenate(
            [jnp.asarray(cols), jnp.full((pad,), ntrain, dtype=cols.dtype)])
        M = jnp.zeros((ntrain + 1, ntrain + 1), dtype=dtype)
        M = M.at[rows_p, cols_p].add(packed)[:ntrain, :ntrain]
    return M + M.T - jnp.diag(jnp.diag(M))


def pad_pair_weights(weights, npair_store):
    """Zero-pad per-pair weights (length ntrain(ntrain+1)/2) to a padded
    store's pair-axis length before contracting against it."""
    pad = npair_store - weights.shape[0]
    if pad < 0:
        raise ValueError(f"store pair axis {npair_store} shorter than "
                         f"weight vector {weights.shape[0]}")
    return weights if pad == 0 else jnp.pad(weights, (0, pad))


# ---------------------------------------------------------------------------
# generalized eigensolve
# ---------------------------------------------------------------------------
def solve_gep(H, S, cutoff=GEP_CUTOFF):
    """All eigenpairs of H c = E S c via spectral whitening of S.

    Returns (energies ascending, coefficients with columns c_k, S-normalized
    on the retained subspace). Modes of S below `cutoff` (relative to the
    largest eigenvalue) are projected out; their slots surface as zero
    eigenvalues, which sit above every physical (negative) electronic
    energy and therefore never pollute root selection."""
    s, U = jnp.linalg.eigh(S)
    thresh = cutoff * jnp.max(jnp.abs(s))
    inv_sqrt = jnp.where(s > thresh, 1.0 / jnp.sqrt(jnp.maximum(s, thresh)), 0.0)
    X = U * inv_sqrt
    A = X.T @ H @ X
    A = 0.5 * (A + A.T)
    w, Y = jnp.linalg.eigh(A)
    C = X @ Y
    return w, C


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def lowest_states(H, S, nroots=1):
    """The lowest `nroots` generalized eigenpairs, with Hellmann-Feynman
    derivatives for the energies (see module docstring).

    Returns (energies (nroots,), vectors (nroots, ntrain))."""
    w, C = solve_gep(H, S)
    return w[:nroots], C[:, :nroots].T


def _eigvec_tangent(w, C, dA, nroots, gap_floor=1e-10):
    """First-order eigenvector perturbation for the whitened symmetric
    problem: dY_j = sum_{k != j} Y_k (Y_k^T dA Y_j) / (w_j - w_k), with
    degenerate directions projected out (gap below gap_floor contributes
    zero — the rotation within a degenerate block is gauge)."""
    G = C.T @ dA @ C                           # (n, n) in the eigenbasis
    gaps = w[None, :nroots] - w[:, None]       # w_j - w_k
    safe = jnp.where(jnp.abs(gaps) > gap_floor, gaps, jnp.inf)
    coeff = G[:, :nroots] / safe               # (n, nroots)
    return C @ coeff                           # (ntrain, nroots)


@lowest_states.defjvp
def _lowest_states_jvp(nroots, primals, tangents):
    H, S = primals
    dH, dS = tangents
    w, C = solve_gep(H, S)
    E = w[:nroots]
    V = C[:, :nroots].T                       # (nroots, ntrain)
    dE = jnp.einsum("ka,ab,kb->k", V, dH, V) \
        - E * jnp.einsum("ka,ab,kb->k", V, dS, V)
    # exact eigenvector tangent from dH (the training overlap S is
    # geometry-independent in every caller; its tangent shifts only the
    # whitening gauge and is not propagated into V). Removes the round-1
    # limitation of hard-zeroed vector tangents — derivatives of
    # predicted-RDM observables are now first-order correct.
    dA = 0.5 * (dH + dH.T)
    dV = _eigvec_tangent(w, C, dA, nroots).T
    return (E, V), (dE, dV)


def polish_ground_vector(A, Y, gap_floor_rel=1.0e-6):
    """First-order polish of the ground eigenvector of symmetric A given a
    possibly inaccurate eigenbasis Y (ascending eigenvalues).

    B = Y^T A Y is nearly diagonal when Y is nearly exact; the correction
    y = e_0 + sum_k B[k,0] / (B[0,0] - B[k,k]) e_k removes the leading
    eigenvector error wherever the gap is resolvable. Directions with
    |gap| below gap_floor_rel * spread(A) are skipped — their residual
    contributes only O(gap * delta^2) to any Rayleigh quotient, so they
    never matter for energies. Repairs the backend eigh's vector error
    (XLA:TPU's f64 eigh is the one TPU primitive that is not genuinely
    double precision, ~6e-9 relative measured; matmuls here are exact to
    ~4e-15)."""
    B = Y.T @ (A @ Y)
    d = jnp.diag(B)
    den = B[0, 0] - d
    scale = jnp.maximum(jnp.max(d) - jnp.min(d), 1e-300)
    safe = jnp.where(jnp.abs(den) > gap_floor_rel * scale, den, jnp.inf)
    coef = (B[:, 0] / safe).at[0].set(1.0)
    y = Y @ coef
    return y / jnp.linalg.norm(y)


def ground_state_polished(H, S, cutoff=GEP_CUTOFF):
    """Ground-state GEP solve with the eigh-basis polish (full working
    precision on TPU): whiten S, eigh, first-order vector correction,
    S-normalize. Energy should be taken as the Rayleigh quotient
    c^T H c / c^T S c of the returned vector (second order in the
    remaining vector error)."""
    s, U = jnp.linalg.eigh(S)
    thresh = cutoff * jnp.max(jnp.abs(s))
    inv_sqrt = jnp.where(s > thresh,
                         1.0 / jnp.sqrt(jnp.maximum(s, thresh)), 0.0)
    X = U * inv_sqrt
    A = X.T @ H @ X
    A = 0.5 * (A + A.T)
    w, Y = jnp.linalg.eigh(A)
    y = polish_ground_vector(A, Y)
    c = X @ y
    nrm = c @ (S @ c)
    return c / jnp.sqrt(jnp.maximum(nrm, 1e-300))


def whitening_matrix(S, cutoff=GEP_CUTOFF):
    """Precomputable whitening X of the training overlap (S is geometry-
    independent, so models compute this once instead of re-diagonalizing S
    inside every evaluation)."""
    s, U = jnp.linalg.eigh(jnp.asarray(S))
    thresh = cutoff * jnp.max(jnp.abs(s))
    inv_sqrt = jnp.where(s > thresh, 1.0 / jnp.sqrt(jnp.maximum(s, thresh)),
                         0.0)
    return U * inv_sqrt


def _chol_unrolled(G):
    """Cholesky of a small static-k SPD matrix as fully unrolled scalar
    ops. No LAPACK-style custom call: inside a latency-bound MD scan body
    on TPU, a cholesky/triangular-solve/eigh custom call each costs
    O(100 us) in fixed overhead regardless of size — for k <= 8 the
    unrolled scalar chain fuses into a handful of elementwise kernels."""
    k = G.shape[0]
    tiny = jnp.finfo(G.dtype).tiny
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        s = G[i, i]
        for j in range(i):
            s = s - L[i][j] * L[i][j]
        L[i][i] = jnp.sqrt(jnp.maximum(s, tiny))
        for j in range(i + 1, k):
            t = G[j, i]
            for m in range(i):
                t = t - L[j][m] * L[i][m]
            L[j][i] = t / L[i][i]
    zero = jnp.zeros_like(G[0, 0])
    return jnp.stack([
        jnp.stack([L[i][j] if j <= i else zero for j in range(k)])
        for i in range(k)])


def _forward_sub_unrolled(L, B):
    """Row-unrolled solve of L X = B (L lower-triangular, static k rows).
    B rows may be length-n vectors; each step is one vector FMA."""
    k = L.shape[0]
    rows = []
    for i in range(k):
        r = B[i]
        for j in range(i):
            r = r - L[i, j] * rows[j]
        rows.append(r / L[i, i])
    return jnp.stack(rows)


def _jacobi_eigh_small(M, sweeps=3):
    """Cyclic-Jacobi eigendecomposition of a static-k symmetric matrix via
    explicit (p, q) rotations — GEMMs on k x k blocks plus scalar angle
    math, zero custom calls. Quadratically convergent; sweeps=3 reaches
    working precision for k <= 8. Returns (diag approx eigenvalues, V)."""
    k = M.shape[0]
    V = jnp.eye(k, dtype=M.dtype)
    for _ in range(sweeps):
        for p in range(k - 1):
            for q in range(p + 1, k):
                # arctan2 handles the b -> 0 limit (theta -> 0 or pi/2)
                theta = 0.5 * jnp.arctan2(2.0 * M[p, q], M[q, q] - M[p, p])
                c, s = jnp.cos(theta), jnp.sin(theta)
                R = jnp.eye(k, dtype=M.dtype)
                R = R.at[p, p].set(c).at[q, q].set(c)
                R = R.at[p, q].set(s).at[q, p].set(-s)
                M = R.T @ M @ R
                V = V @ R
    return jnp.diag(M), V


@partial(jax.jit, static_argnums=(2, 3, 4))
def krylov_ground_state_refine(A, y, k=8, small="eigh", sweeps=3):
    """Warm-started ground-state refinement of a small symmetric matrix:
    build the k-dimensional Krylov space of A at the previous step's
    vector y, orthonormalize it through a Cholesky factorization (dense
    GEMMs — no per-step eigh(ntrain)), and Rayleigh-Ritz in the k-space
    (one k x k solve, k << ntrain).

    This is the serial-MD eigensolve replacement: along a trajectory the
    whitened subspace Hamiltonian A(R_t) drifts slowly, so the previous
    step's eigenvector is an excellent start and a handful of Krylov
    vectors pin the ground state to solver precision — without the
    eigh(ntrain) + eigenvector-JVP machinery that costs ~half the serial
    MD step on TPU (tpu_md_step_profile.py round 5). Returns the refined
    unit vector; differentiation is intentionally blocked (consumers
    evaluate a Rayleigh quotient at the stop-gradient vector —
    generalized Hellmann-Feynman, like the precise paths).

    small selects the k x k stage implementation:
      * "eigh"   — cholesky + triangular_solve + eigh backend calls.
      * "nocall" — fully unrolled Cholesky-QR + cyclic-Jacobi Rayleigh-
        Ritz (zero custom calls). On TPU the small-stage custom calls are
        latency-bound fixed costs inside the scan body, so this variant
        is the serial-MD throughput path (measured round 5: see RESULTS);
        numerically it matches "eigh" to working precision (sweeps=3
        Jacobi is quadratically converged at k <= 8; for k = 2 one sweep
        is exact)."""
    A = jax.lax.stop_gradient(A)
    y = jax.lax.stop_gradient(y)
    n = A.shape[0]
    k = min(k, n)
    cols = [y / jnp.linalg.norm(y)]
    for _ in range(k - 1):
        w = A @ cols[-1]
        cols.append(w / jnp.linalg.norm(w))
    K = jnp.stack(cols, axis=1)                       # (n, k)
    eps = jnp.finfo(A.dtype).eps
    eye = jnp.eye(k, dtype=A.dtype)

    def chol_orth(K):
        # eps-scaled ridge: Krylov columns become linearly dependent as
        # the start converges — exactly the regime where the span
        # already contains the answer, so the ridge only damps the
        # redundant directions
        G = K.T @ K
        G = G + 100.0 * eps * jnp.trace(G) / k * eye
        if small == "nocall":
            L = _chol_unrolled(G)
            return _forward_sub_unrolled(L, K.T).T
        L = jnp.linalg.cholesky(G)
        return jax.scipy.linalg.solve_triangular(L, K.T, lower=True).T

    # CholeskyQR2: the second pass restores near-machine orthogonality
    # that a single ridged pass loses on ill-conditioned Krylov blocks
    Q = chol_orth(chol_orth(K))
    M = Q.T @ (A @ Q)
    M = 0.5 * (M + M.T)
    if small == "nocall":
        d, U = _jacobi_eigh_small(M, sweeps=sweeps)
        ynew = Q @ U[:, jnp.argmin(d)]
    else:
        w_, U = jnp.linalg.eigh(M)
        ynew = Q @ U[:, 0]
    return ynew / jnp.linalg.norm(ynew)


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def lowest_states_whitened(H, X, nroots=1):
    """lowest_states with a precomputed whitening X = whitening_matrix(S).
    Same Hellmann-Feynman energy derivatives (S constant: dE = c^T dH c)."""
    A = X.T @ H @ X
    A = 0.5 * (A + A.T)
    w, Y = jnp.linalg.eigh(A)
    C = X @ Y
    return w[:nroots], C[:, :nroots].T


@lowest_states_whitened.defjvp
def _lowest_states_whitened_jvp(nroots, primals, tangents):
    H, X = primals
    dH, _ = tangents
    A = X.T @ H @ X
    w, Y = jnp.linalg.eigh(0.5 * (A + A.T))
    C = X @ Y
    E = w[:nroots]
    V = C[:, :nroots].T
    dE = jnp.einsum("ka,ab,kb->k", V, dH, V)
    dV = _eigvec_tangent(w, C, 0.5 * (dH + dH.T), nroots).T
    return (E, V), (dE, dV)


# ---------------------------------------------------------------------------
# reference-parity front doors
# ---------------------------------------------------------------------------
def _eig_host(H, S):
    """Non-hermitian generalized solve (reference hermitian=False branch,
    ab_initio_eigenvector_continuation.py:78-88): host-only scipy.eig with
    the reference's imaginary-eigenvalue filter."""
    from scipy.linalg import eig

    vals, vecs = eig(np.asarray(H), np.asarray(S))
    valid = np.abs(vals.imag) < 1.0e-5
    order = np.argsort(vals[valid].real)
    return vals[valid].real[order], vecs[:, valid][:, order].real


def _host_lowest_nonhermitian(H, S, nroots):
    """Fixed-shape host kernel for the non-hermitian branch: lowest nroots
    real-eigenvalue states, S-normalized, zero-padded if the imaginary-
    eigenvalue filter leaves fewer than nroots states."""
    vals, vecs = _eig_host(H, S)
    n = S.shape[0]
    E = np.zeros(nroots, dtype=S.dtype)
    V = np.zeros((nroots, n), dtype=S.dtype)
    k = min(nroots, vals.shape[0])
    E[:k] = vals[:k]
    for i in range(k):
        c = vecs[:, i]
        nrm = float(c @ np.asarray(S) @ c)
        V[i] = c / np.sqrt(abs(nrm)) if abs(nrm) > 1e-300 else c
    return E, V


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def lowest_states_nonhermitian(H, S, nroots=1):
    """Jit-safe non-hermitian generalized eigensolve via a host callback
    (TPU has no QZ). Energy derivatives use the same generalized
    Hellmann-Feynman expression as the hermitian path with the right
    eigenvector — exactly what the reference's force assembly does with the
    hermitian=False eigenvector (ab_initio_gradients_loewdin.py:341-361)."""
    nt = S.shape[0]
    dtype = S.dtype
    return jax.pure_callback(
        lambda h, s: _host_lowest_nonhermitian(np.asarray(h), np.asarray(s),
                                               nroots),
        (jax.ShapeDtypeStruct((nroots,), dtype),
         jax.ShapeDtypeStruct((nroots, nt), dtype)),
        H, S, vmap_method="sequential")


@lowest_states_nonhermitian.defjvp
def _lowest_states_nonhermitian_jvp(nroots, primals, tangents):
    H, S = primals
    dH, dS = tangents
    E, V = lowest_states_nonhermitian(H, S, nroots)
    dE = jnp.einsum("ka,ab,kb->k", V, dH, V) \
        - E * jnp.einsum("ka,ab,kb->k", V, dS, V)
    # Eigenvector tangents on the non-hermitian path are NOT implemented
    # (they would need the left eigenvectors, and complex pairs make the
    # real first-order expansion ill-defined). Returning zeros here would
    # make derivatives of predicted-RDM observables silently WRONG, so the
    # tangent is NaN instead: energy/force differentiation (which consumes
    # only dE) is unaffected, while any computation that actually uses the
    # vector tangent surfaces as NaN rather than a plausible wrong number.
    # The reference's hermitian=False branch likewise provides only the
    # Hellmann-Feynman energy derivative
    # (ab_initio_eigenvector_continuation.py:78-88,
    #  ab_initio_gradients_loewdin.py:341-361).
    #
    # The NaN must enter as a *linear* function of the input tangent (NaN
    # coefficient), not a constant: reverse-mode transposition drops
    # tangent-independent constants (silently-zero again), while a linear
    # term propagates NaN into the cotangent exactly when the vector
    # cotangent is nonzero — energy-only grads see a symbolic-zero vector
    # cotangent and stay clean.
    dV = (jnp.sum(dH) + jnp.sum(dS)) * jnp.full_like(V, jnp.nan)
    return (E, V), (dE, dV)


def approximate_ground_state(h1, h2, one_rdm, two_rdm, S, hermitian=True,
                             whitening=None, two_body_backend="xla",
                             packed_layout="tril"):
    """Subspace ground-state energy and eigenvector (electronic part only).

    Reference: approximate_ground_state
    (ab_initio_eigenvector_continuation.py:12-90). Pass a precomputed
    whitening (whitening_matrix(S)) to skip the per-call diagonalization of
    the geometry-independent training overlap."""
    H = assemble_hamiltonian(h1, h2, one_rdm, two_rdm,
                             two_body_backend=two_body_backend,
                             packed_layout=packed_layout,
                             ntrain=S.shape[0])
    if not hermitian:
        E, V = lowest_states_nonhermitian(H, S, 1)
        return E[0], V[0]
    if whitening is not None:
        E, V = lowest_states_whitened(H, whitening, 1)
    else:
        E, V = lowest_states(H, S, 1)
    return E[0], V[0]


def approximate_multistate(h1, h2, one_rdm, two_rdm, S, nroots=1,
                           hermitian=True, whitening=None,
                           packed_layout="tril"):
    """Lowest nroots subspace states (reference: approximate_multistate,
    ab_initio_eigenvector_continuation.py:93-175)."""
    H = assemble_hamiltonian(h1, h2, one_rdm, two_rdm,
                             packed_layout=packed_layout,
                             ntrain=S.shape[0])
    if not hermitian:
        assert S.shape[0] >= nroots
        return lowest_states_nonhermitian(H, S, nroots)
    assert S.shape[0] >= nroots
    if whitening is not None:
        return lowest_states_whitened(H, whitening, nroots)
    return lowest_states(H, S, nroots)


# ---------------------------------------------------------------------------
# training-basis orthonormalization (production conditioning)
# ---------------------------------------------------------------------------
def orthonormalize_store(overlap, one_rdm, two_rdm, cutoff=GEP_CUTOFF,
                         chunk=4096):
    """Re-express the training states S-orthonormally (canonical
    orthogonalization of the TRAINING basis, computed once in f64).

    The training overlap S is geometry-independent, so its conditioning
    can be paid for once, offline, in full precision: with
    X = U_keep / sqrt(s_keep), the transformed t-RDMs
        gamma~[A,B] = sum_ab X[a,A] X[b,B] gamma[a,b]
    satisfy S~ = I, and the per-geometry generalized eigenproblem becomes
    an ordinary symmetric eigensolve. This is what makes the f32
    throughput path robust on production training sets: the 84-state
    Zundel store has kappa(S) ~ 2e6, and raw f32 assembly collapses to
    spurious states ~80 Ha below the physical ground state, while the
    orthonormalized f32 store stays accurate (see
    tests/test_precision_precise.py). Eigenvalues identical in exact
    arithmetic (same whitened matrix as solve_gep).

    Accepts full ((N,N,n,n) / (N,N,...)) or pair-compressed
    ((Npair,n,n) / (Npair,P)) layouts; returns
    (identity_overlap, one_rdm_t, two_rdm_t) in the SAME layout family
    (pair-compressed stays pair-compressed), possibly with fewer states
    when S has numerically null directions. Host numpy, f64, chunked
    over the trailing axis to bound memory."""
    S = np.asarray(overlap, dtype=np.float64)
    one_rdm = np.asarray(one_rdm)
    two_rdm = np.asarray(two_rdm)
    N = S.shape[0]
    s, U = np.linalg.eigh(S)
    keep = s > cutoff * np.abs(s).max()
    X = U[:, keep] / np.sqrt(s[keep])
    M = X.shape[1]

    pair_in = one_rdm.ndim == 3
    rows, cols = np.tril_indices(N)

    def unpack(vals):
        # (Npair, k) packed-symmetric -> (N, N, k)
        full = np.zeros((N, N) + vals.shape[1:], dtype=np.float64)
        full[rows, cols] = vals
        full[cols, rows] = vals
        return full

    def transform(full):
        # (N, N, ...) -> (M, M, ...) as two GEMMs (tensordot hits BLAS;
        # the equivalent einsum path measured ~1000x slower here)
        t = np.tensordot(X, full, axes=(0, 0))       # (A, b, ...)
        t = np.tensordot(X, t, axes=(0, 1))          # (B, A, ...)
        return np.swapaxes(t, 0, 1)

    r1_full = unpack(one_rdm.astype(np.float64)) if pair_in \
        else one_rdm.astype(np.float64)
    r1_t = transform(r1_full)

    if two_rdm.ndim in (2, 3):
        P = two_rdm.shape[-1]
        packed = two_rdm.astype(np.float64)
        if two_rdm.ndim == 3:
            packed = packed[rows, cols]
        out = np.empty((M, M, P), dtype=np.float64)
        for start in range(0, P, chunk):
            sl = slice(start, start + chunk)
            out[:, :, sl] = transform(unpack(packed[:, sl]))
        if pair_in or two_rdm.ndim == 3:
            tr, tc = np.tril_indices(M)
            r2_t = out[tr, tc]
            if two_rdm.ndim == 3:
                full3 = np.zeros((M, M, P))
                full3[tr, tc] = r2_t
                full3[tc, tr] = r2_t
                r2_t = full3
        else:
            r2_t = out
    else:   # 5-d / 6-d uncompressed layouts
        full = two_rdm.astype(np.float64)
        if two_rdm.ndim == 5:
            f6 = np.zeros((N, N) + two_rdm.shape[1:])
            f6[rows, cols] = full
            f6[cols, rows] = full
            full = f6
        r2_t = transform(full)
        if two_rdm.ndim == 5:
            tr, tc = np.tril_indices(M)
            r2_t = r2_t[tr, tc]

    if pair_in:
        tr, tc = np.tril_indices(M)
        r1_t = r1_t[tr, tc]
    return np.eye(M), r1_t, r2_t


# ---------------------------------------------------------------------------
# predicted RDMs (for observables: dipole moments, Mulliken charges)
# ---------------------------------------------------------------------------
def to_pair_layout(one_rdm, two_rdm, compress_two=True):
    """Convert full (Ntrn, Ntrn, ...) t-RDM stores to pair-compressed
    layouts for sharding: one_rdm -> (Npair, n, n),
    two_rdm -> (Npair, n^2(n^2+1)/2) when compress_two (host-side numpy)."""
    one_rdm = np.asarray(one_rdm)
    two_rdm = np.asarray(two_rdm)
    ntrain = one_rdm.shape[0]
    rows, cols = pair_compression_maps(ntrain)
    one_p = one_rdm[rows, cols]
    if two_rdm.ndim == 6:
        two_p = two_rdm[rows, cols]
        if compress_two:
            two_p = np.asarray(compress_exchange(jnp.asarray(two_p)))
    elif two_rdm.ndim == 3:
        two_p = two_rdm[rows, cols]
    else:
        two_p = two_rdm
    return one_p, two_p


def predicted_rdm1(vec, one_rdm):
    """Predicted one-body RDM only (cheap path for per-step observables)."""
    if one_rdm.ndim == 3:
        ntrain = vec.shape[0]
        mat = 2.0 * jnp.outer(vec, vec)
        mat = mat - 0.5 * jnp.diag(jnp.diag(mat))
        rows, cols = pair_compression_maps(ntrain)
        w = pad_pair_weights(mat[rows, cols], one_rdm.shape[0])
        return jnp.tensordot(w, one_rdm, axes=1)
    return jnp.einsum("a,b,abij->ij", vec, vec, one_rdm)


def predicted_rdms(vec, one_rdm, two_rdm, norb, packed_layout="tril"):
    """Predicted one- and two-body RDMs from the subspace eigenvector.

    Reference: evcont/ab_initio_gradients_loewdin.py:343-361. Handles all
    storage layouts (incl. pair-compressed one_rdm); always returns the
    restored 4-index 2-RDM. packed_layout names the exchange-compressed
    slot order of two_rdm ("tril" reference schema / "rfp" TPU-internal,
    see assemble_hamiltonian)."""
    if one_rdm.ndim == 3:
        ntrain = vec.shape[0]
        mat = 2.0 * jnp.outer(vec, vec)
        mat = mat - 0.5 * jnp.diag(jnp.diag(mat))
        rows, cols = pair_compression_maps(ntrain)
        w = pad_pair_weights(mat[rows, cols], one_rdm.shape[0])
        rdm1 = jnp.tensordot(w, one_rdm, axes=1)
    else:
        rdm1 = jnp.einsum("a,b,abij->ij", vec, vec, one_rdm)

    ndim = two_rdm.ndim
    ntrain = vec.shape[0]
    if ndim in (5, 2):
        # pair-compressed: weight off-diagonal pairs twice
        mat = 2.0 * jnp.outer(vec, vec)
        mat = mat - 0.5 * jnp.diag(jnp.diag(mat))
        rows, cols = pair_compression_maps(ntrain)
        weights = pad_pair_weights(mat[rows, cols], two_rdm.shape[0])
        rdm2 = jnp.tensordot(weights, two_rdm, axes=1)
    else:
        rdm2 = jnp.einsum("a,b,ab...->...", vec, vec, two_rdm)

    if rdm2.ndim == 1:
        rdm2 = {"rfp": rfp_unfold, "s8": s8_unfold,
                "tril": restore_exchange}[packed_layout](rdm2, norb)
    return rdm1, rdm2


# ---------------------------------------------------------------------------
# OAO wrappers operating on a geometry via the integral engine
# ---------------------------------------------------------------------------
def oao_integrals(engine, coords, refine_loewdin=False):
    """h1, h2 in the Löwdin-orthogonalized AO basis at a geometry, plus the
    nuclear repulsion (reference: get_integrals(mol, get_basis(mol)),
    electron_integral_utils.py:122-138).

    refine_loewdin polishes S^(-1/2) with Newton-Schulz steps — required
    for full f64 accuracy on TPU, where the backend eigh is the one
    primitive that is not genuinely double precision (see
    oao.loewdin_trafo_refined)."""
    from .oao import loewdin_trafo_refined

    S_ao = engine.overlap(coords)
    trafo = loewdin_trafo_refined(S_ao) if refine_loewdin \
        else loewdin_trafo(S_ao)
    h1 = trafo.T @ engine.hcore(coords) @ trafo
    h2 = engine.eri(coords)
    ein = engine._f64_ein(h2.dtype)
    for _ in range(4):
        if ein is jnp.einsum:
            h2 = jnp.tensordot(h2, trafo, axes=[[0], [0]])
        else:
            h2 = ein("abcd,ax->bcdx", h2, trafo)
    return h1, h2, engine.energy_nuc(coords)


def approximate_ground_state_OAO(engine, coords, one_rdm, two_rdm, S,
                                 hermitian=True):
    """Total ground-state energy (electronic + nuclear) at a geometry
    (reference: approximate_ground_state_OAO,
    ab_initio_eigenvector_continuation.py:178-211)."""
    h1, h2, enuc = oao_integrals(engine, coords)
    en, vec = approximate_ground_state(h1, h2, one_rdm, two_rdm, S,
                                       hermitian=hermitian)
    return en + enuc, vec


def approximate_multistate_OAO(engine, coords, one_rdm, two_rdm, S, nroots=1,
                               hermitian=True):
    """Total multistate energies at a geometry (reference:
    approximate_multistate_OAO, ab_initio_eigenvector_continuation.py:214-250)."""
    h1, h2, enuc = oao_integrals(engine, coords)
    en, vecs = approximate_multistate(h1, h2, one_rdm, two_rdm, S,
                                      nroots=nroots, hermitian=hermitian)
    return en + enuc, vecs
