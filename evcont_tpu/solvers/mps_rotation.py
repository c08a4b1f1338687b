"""Exact MPS orbital rotation via adjacent-orbital Givens gates.

Role parity: evcont/MPS_orb_rotation.py (orbital_rotation_mps :30-81,
converge_orbital_rotation_mps :84-189) — re-expressing a stored MPS in a
rotated orthonormal orbital basis, so cross t-RDMs between training
states solved in *different* computational bases become plain MPS
expectations (DMRG_EVCont.py:275-428, append_to_rdms_orbital_rotation).

The reference implements the rotation as imaginary-time evolution of the
exp(kappa) one-body MPO with an RK4 stepper and itself records that it
"never really worked well" (MPS_orb_rotation.py:98-101). This module is
a from-scratch replacement built on the numerically sound circuit
construction instead:

  1. Decompose the orthogonal orbital rotation U into a staircase of
     Givens rotations between ADJACENT spatial orbitals (adjacent-row
     elimination; any U in O(n) factors as G_1 ... G_K D with
     K <= n(n-1)/2 and D = diag(+-1)).
  2. Each adjacent Givens G_p(theta) lifts to the second-quantized
     rotation exp(theta * sum_sigma (a+_{p+1,sigma} a_{p,sigma} - h.c.)),
     which is STRICTLY LOCAL on the interleaved Jordan-Wigner chain: all
     four affected modes (alpha/beta of orbitals p, p+1) occupy the
     contiguous site window [2p, 2p+3], so every JW string is internal
     and the gate is an exact 16x16 orthogonal matrix on the window.
  3. Gates are applied in sequence with a moving canonical center
     (QR shifts, truncated SVD splits), so each truncation is optimal
     and the total discarded weight is tracked exactly.

Unlike the reference's time-evolution approach there is no stepper
error: at unbounded bond dimension the rotation is exact to machine
precision (tests/test_mps_rotation.py validates against the
determinant-algebra CI transform, solvers/ci_transform.py).

Sign conventions: `rotate_orbitals_mps(mps, U)` returns the SAME
physical state re-expressed in the new orbital basis B' = B @ U, i.e.
it applies Gamma(U^T) with Gamma(W) a+_p Gamma(W)^+ = sum_q W_qp a+_q —
matching transform_ci(civec, nelec, u=U).
"""

import numpy as np
from scipy.linalg import expm

from .dmrg import mpo_to_dense, term_mpo

_Z1 = np.diag([1.0, -1.0])


def givens_decompose_adjacent(U, tol=1e-10):
    """Factor an orthogonal U as G_1 @ G_2 @ ... @ G_K @ diag(signs) with
    every G_k a Givens rotation between ADJACENT rows (p, p+1).

    Adjacent-row elimination: for each column j (left to right), entries
    below the diagonal are zeroed bottom-up by rotations of rows
    (i-1, i); the orthogonal upper-triangular remainder is diag(+-1).

    Returns:
        rots: list of (p, theta), multiplication order (G_1 first).
        signs: (n,) array of +-1.
    """
    U = np.asarray(U, dtype=np.float64)
    n = U.shape[0]
    err = np.abs(U.T @ U - np.eye(n)).max()
    if err > 1e-8:
        raise ValueError(f"U is not orthogonal (|U^T U - I| = {err:.2e})")
    V = U.copy()
    rots = []
    for j in range(n - 1):
        for i in range(n - 1, j, -1):
            a, b = V[i - 1, j], V[i, j]
            if abs(b) <= tol:
                continue
            r = np.hypot(a, b)
            c, s = a / r, b / r
            # left-multiply by G^T (G = [[c,-s],[s,c]] on rows i-1, i)
            V[[i - 1, i]] = np.array([[c, s], [-s, c]]) @ V[[i - 1, i]]
            rots.append((i - 1, float(np.arctan2(s, c))))
    signs = np.sign(np.diag(V))
    if np.abs(V - np.diag(np.diag(V))).max() > 1e-7:
        raise ValueError("adjacent elimination left a non-diagonal "
                         "remainder; U was not orthogonal enough")
    return rots, signs


def _window_gate(theta):
    """16x16 orthogonal gate for the adjacent-orbital Givens rotation
    G_p(theta) on the 4-site JW window (alpha_p, beta_p, alpha_p+1,
    beta_p+1): expm of theta * sum_s (a+_{p+1,s} a_{p,s} - h.c.), built
    from term MPOs on a standalone 4-site chain (all JW strings are
    window-internal)."""
    terms = [([("+", 2), ("-", 0)], theta),   # alpha: a+_{p+1} a_p
             ([("+", 3), ("-", 1)], theta),   # beta
             ([("+", 0), ("-", 2)], -theta),
             ([("+", 1), ("-", 3)], -theta)]
    K = np.zeros((16, 16))
    for ops, c in terms:
        K += mpo_to_dense(term_mpo(4, ops, c))
    return expm(K)


def _shift_center_right(mps, c):
    """QR: site c becomes left-canonical, center moves to c+1."""
    Dl, d, Dr = mps[c].shape
    Q, R = np.linalg.qr(mps[c].reshape(Dl * d, Dr))
    mps[c] = Q.reshape(Dl, d, -1)
    mps[c + 1] = np.einsum("ab,bdc->adc", R, mps[c + 1], optimize=True)


def _shift_center_left(mps, c):
    """LQ: site c becomes right-canonical, center moves to c-1."""
    Dl, d, Dr = mps[c].shape
    Q, R = np.linalg.qr(mps[c].reshape(Dl, d * Dr).T)
    mps[c] = Q.T.reshape(-1, d, Dr)
    mps[c - 1] = np.einsum("adb,cb->adc", mps[c - 1], R, optimize=True)


def _apply_window(mps, s, gate, m, cutoff, center_to):
    """Contract the 4-site window starting at s (canonical center inside
    [s, s+3]), apply the 16x16 gate, split back with truncation. Leaves
    the center at s (center_to="left") or s+3 ("right"). Returns the
    discarded weight of the window's three SVDs."""
    th = np.einsum("axb,byc->axyc", mps[s], mps[s + 1], optimize=True)
    th = np.einsum("axyc,czd->axyzd", th, mps[s + 2], optimize=True)
    th = np.einsum("axyzd,dwe->axyzwe", th, mps[s + 3], optimize=True)
    Dl, Dr = th.shape[0], th.shape[5]
    th = th.reshape(Dl, 16, Dr)
    th = np.einsum("xy,ayb->axb", gate, th, optimize=True)

    dw = 0.0

    def split(mat):
        nonlocal dw
        U_, sv, Vt = np.linalg.svd(mat, full_matrices=False)
        keep = int(np.sum(sv > cutoff * max(sv[0], 1e-300)))
        if m is not None:
            keep = min(keep, m)
        keep = max(keep, 1)
        dw += float(np.sum(sv[keep:] ** 2))
        return U_[:, :keep], sv[:keep], Vt[:keep]

    if center_to == "right":
        carry = th.reshape(Dl, 2, 2, 2, 2, Dr)
        for k in range(3):
            Dl_c = carry.shape[0]
            rest = carry.shape[2:]
            U_, sv, Vt = split(carry.reshape(Dl_c * 2, -1))
            mps[s + k] = U_.reshape(Dl_c, 2, -1)
            carry = (sv[:, None] * Vt).reshape((len(sv),) + rest)
        mps[s + 3] = carry
    else:
        carry = th.reshape(Dl, 2, 2, 2, 2, Dr)
        for k in range(3, 0, -1):
            Dr_c = carry.shape[-1]
            rest = carry.shape[:-2]
            U_, sv, Vt = split(carry.reshape(-1, 2 * Dr_c))
            mps[s + k] = Vt.reshape(-1, 2, Dr_c)
            carry = (U_ * sv).reshape(rest + (len(sv),))
        mps[s] = carry
    return dw


def rotate_orbitals_mps(mps, U, m=None, cutoff=1e-12):
    """Re-express an MPS in the rotated orbital basis B' = B @ U.

    Args:
        mps: list of (Dl, 2, Dr) site tensors over 2*norb interleaved JW
            spin-orbital sites ((p, sigma) -> 2p + sigma).
        U: (norb, norb) orthogonal rotation (det +1 or -1).
        m: bond-dimension cap during the gate staircase (None: unbounded
            — exact up to `cutoff`).
        cutoff: relative singular-value cutoff per split.

    Returns:
        (rotated_mps, discarded_weight_total).
    """
    n_sites = len(mps)
    norb = n_sites // 2
    U = np.asarray(U, dtype=np.float64)
    if U.shape != (norb, norb):
        raise ValueError(f"U shape {U.shape} != ({norb}, {norb})")
    # re-expression = Gamma(U^T); Gamma(G1..GK D) applies D first, then
    # the gates right-to-left
    rots, signs = givens_decompose_adjacent(U.T)

    out = [t.astype(np.float64, copy=True) for t in mps]
    for p in np.nonzero(signs < 0)[0]:
        # orbital sign flip: (-1)^(n_alpha + n_beta) on sites 2p, 2p+1
        for site in (2 * p, 2 * p + 1):
            out[site] = np.einsum("xy,ayb->axb", _Z1, out[site],
                                  optimize=True)

    # right-canonicalize (QR only, exact); center at site 0
    for c in range(n_sites - 1, 0, -1):
        _shift_center_left(out, c)
    center = 0

    dw_total = 0.0
    for p, theta in reversed(rots):
        s = 2 * p
        gate = _window_gate(theta)
        # move the canonical center into the window
        while center < s:
            _shift_center_right(out, center)
            center += 1
        while center > s + 3:
            _shift_center_left(out, center)
            center -= 1
        # leave the center on the side the next gate will need; default
        # left (staircases in `reversed(rots)` mostly descend)
        dw_total += _apply_window(out, s, gate, m, cutoff, "left")
        center = s
    return out, dw_total


def converge_orbital_rotation_mps(mps, U, init_bond_dim=None, tol=1e-10,
                                  max_bond_dim=4096, cutoff=1e-12):
    """Bond-dimension escalation wrapper (API parity with the reference's
    converge_orbital_rotation_mps, MPS_orb_rotation.py:84-189, which
    escalated until norm and a test expectation stabilized): doubles the
    staircase cap until the total discarded weight drops below `tol`.

    Returns (rotated_mps, discarded_weight, bond_dim_used)."""
    m = init_bond_dim or max(max(t.shape[0] for t in mps), 2) * 2
    while True:
        out, dw = rotate_orbitals_mps(mps, U, m=m, cutoff=cutoff)
        if dw < tol or m >= max_bond_dim:
            return out, dw, m
        m = min(2 * m, max_bond_dim)
