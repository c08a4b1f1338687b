"""Nonorthogonal transition matrix elements between CAS-type states.

This replaces pygnme's Wick-theorem kernel (wick.wick_rscf.evaluate_rdm12,
used in evcont/CASCI_EVCont.py:173-319 with an MPI-parallel quadruple loop
over occupation strings) for computing

    S_AB      = <psi_A | psi_B>
    gamma     = <psi_A | E_pq | psi_B>
    Gamma     = <psi_A | a+_ps a+_rt a_st a_qs | psi_B>   (chemist order)

between CI expansions |psi> = sum_I c_I |D_I> whose determinants are built
from *different, mutually nonorthogonal* orbital sets (one MO basis per
geometry), expressed in a common orthonormal (OAO) frame.

Method (Löwdin pairing, vectorized over all determinant pairs):
for each same-spin string pair, SVD the occupied-overlap matrix
M = D_A^T D_B = U s V^T and form biorthogonal channel vectors
a_i = D_A U[:, i], b_i = D_B V[:, i]. Then with phase phi = det(U) det(V):

    det(M)              = phi * prod_k s_k
    det(M) M^-T channel = w1_i = phi * prod_{k != i} s_k
    two-channel weight    w2_ij = phi * prod_{k != i,j} s_k   (i != j)

so  <D_A| a+_p a_q |D_B> = sum_i w1_i b_i[q] a_i[p], and the same-spin
two-body Wick contraction uses w2 (same-channel direct/exchange terms
cancel identically). The w1/w2 products vanish automatically whenever a
*different* channel has zero overlap — the generalized Slater-Condon
zero-overlap rules fall out with no case analysis, numerically stable for
any number of zero singular values.

All cross-determinant sums are then dense contractions over the
(string-pair x channel) axis — batched SVDs plus a handful of GEMMs, which
is exactly the shape TPUs want (the JAX port of this kernel is mechanical;
this host version is used by the training-side CASCI backend).
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class NOState:
    """A CI expansion over determinants of nonorthogonal orbitals.

    Attributes:
        ci: (Nstr_a, Nstr_b) CI coefficients.
        occ_a: (Nstr_a, nocc_a) occupied-orbital index lists per alpha
            string (into the columns of `orbs`).
        occ_b: (Nstr_b, nocc_b) likewise for beta.
        orbs: (norb_common, nmo) orbital coefficients in a common
            orthonormal frame (e.g. OAO): column j = orbital j.
    """
    ci: np.ndarray
    occ_a: np.ndarray
    occ_b: np.ndarray
    orbs: np.ndarray


def cas_no_state(ci, mo_coeff_common, ncore, ncas, nelecas):
    """Package a CASCI solution as an NOState.

    Args:
        ci: active-space CI matrix.
        mo_coeff_common: (norb_common, nmo) MOs in the common orthonormal
            frame (for AO-based MOs: S_ao^(1/2) @ mo_coeff).
        ncore, ncas, nelecas: active-space definition.
    """
    from .fci import make_strings

    if isinstance(nelecas, (tuple, list)):
        na, nb = nelecas
    else:
        nb = nelecas // 2
        na = nelecas - nb
    core = list(range(ncore))
    sa = [core + [ncore + o for o in s] for s in make_strings(ncas, na)]
    sb = [core + [ncore + o for o in s] for s in make_strings(ncas, nb)]
    return NOState(ci=np.asarray(ci),
                   occ_a=np.array(sa, dtype=np.int64),
                   occ_b=np.array(sb, dtype=np.int64),
                   orbs=np.asarray(mo_coeff_common))


def _pair_channels(stateA, stateB, occ_attr):
    """Per-spin channel data for all (A-string, B-string) pairs.

    Returns dict with:
        det:  (PA* PB,) reshaped (NA, NB) determinant of M
        w1:   (P, n) one-removed products
        w2:   (P, n, n) two-removed products (zero diagonal)
        A:    (P, n, norb) channel bra vectors a_i
        B:    (P, n, norb) channel ket vectors b_i
    """
    occA = getattr(stateA, occ_attr)
    occB = getattr(stateB, occ_attr)
    DA = stateA.orbs[:, occA]          # (norb, NA, n)
    DB = stateB.orbs[:, occB]
    DA = np.ascontiguousarray(np.moveaxis(DA, 0, -2))   # (NA, norb, n)
    DB = np.ascontiguousarray(np.moveaxis(DB, 0, -2))
    NA, nb_dim = DA.shape[0], DB.shape[0]
    n = occA.shape[1]
    assert occB.shape[1] == n, "electron-number mismatch between states"

    # all pair overlap matrices M[I,J] = DA[I]^T DB[J]
    M = np.einsum("iak,jal->ijkl", DA, DB, optimize=True)
    M = M.reshape(NA * nb_dim, n, n)
    U, s, Vt = np.linalg.svd(M)
    phi = np.linalg.det(U) * np.linalg.det(Vt)

    # products with one/two channels removed, branch-free in zeros
    P = s.shape[0]
    eye = np.eye(n, dtype=bool)
    # w1_i = phi * prod_{k != i} s_k
    s_mat = np.broadcast_to(s[:, None, :], (P, n, n)).copy()
    s_mat[:, eye] = 1.0
    w1 = phi[:, None] * np.prod(s_mat, axis=-1)          # (P, n)
    det = phi * np.prod(s, axis=-1)
    # w2_ij = phi * prod_{k != i,j} s_k, i != j
    s4 = np.broadcast_to(s[:, None, None, :], (P, n, n, n)).copy()
    ii = np.arange(n)
    s4[:, ii, :, ii] = 1.0
    s4[:, :, ii, ii] = 1.0
    w2 = phi[:, None, None] * np.prod(s4, axis=-1)
    w2[:, ii, ii] = 0.0

    # channel vectors: a_i = DA[I] U[:, i], b_i = DB[J] V[:, i]
    DA_pairs = DA[np.repeat(np.arange(NA), nb_dim)]      # (P, norb, n)
    DB_pairs = DB[np.tile(np.arange(nb_dim), NA)]
    A = np.einsum("pak,pki->pia", DA_pairs, U, optimize=True)
    B = np.einsum("pak,pik->pia", DB_pairs, Vt, optimize=True)

    return {
        "det": det.reshape(NA, nb_dim),
        "w1": w1, "w2": w2, "A": A, "B": B,
        "NA": NA, "NB": nb_dim, "n": n,
        "Ia": np.repeat(np.arange(NA), nb_dim),
        "Jb": np.tile(np.arange(nb_dim), NA),
    }


def trans_rdm12_nonorthogonal(stateA, stateB, with_rdm2=True):
    """Overlap, transition 1-RDM, and (optionally) transition 2-RDM between
    two NOStates, in the common orthonormal frame.

    Conventions match solvers/fci.py: gamma[p,q] = <A|E_pq|B>,
    Gamma[p,q,r,s] chemist-ordered so that
    E = sum h gamma + 1/2 sum (pq|rs) Gamma."""
    cA, cB = stateA.ci, stateB.ci
    alpha = _pair_channels(stateA, stateB, "occ_a")
    beta = _pair_channels(stateA, stateB, "occ_b")
    norb = stateA.orbs.shape[0]

    # beta-traced weight for alpha string pairs, and vice versa
    omega_a = cA @ beta["det"] @ cB.T          # (NAa, NBa)
    omega_b = cA.T @ alpha["det"] @ cB         # (NAb, NBb)

    ovlp = float(np.sum(alpha["det"] * omega_a))

    # channel dyads D[p, i, (x, y)] = a_i[x] b_i[y], shared by every block
    def dyads(ch):
        P, n = ch["w1"].shape
        return np.ascontiguousarray(
            (ch["A"][:, :, :, None] * ch["B"][:, :, None, :])
            .reshape(P, n, norb * norb))

    D_a = dyads(alpha)
    D_b = dyads(beta)

    # gamma[x,y] = sum_pi w[p,i] a[p,i,x] b[p,i,y]  (one GEMV per spin)
    def gamma_spin(ch, D, omega):
        w = omega[ch["Ia"], ch["Jb"]][:, None] * ch["w1"]
        return (w.reshape(-1) @ D.reshape(-1, norb * norb)) \
            .reshape(norb, norb)

    rdm1 = gamma_spin(alpha, D_a, omega_a) + gamma_spin(beta, D_b, omega_b)
    if not with_rdm2:
        return ovlp, rdm1, None

    # ---- opposite-spin block ------------------------------------------
    # Naively Omega[la, lb] = w1a[la] w1b[lb] cA[Ia, Ib] cB[Ja, Jb] over
    # (string-pair x channel) indices la/lb — but the CI coefficients
    # depend only on the string pair, so the channel sums factorize per
    # side: with dtil[pair, (p,q)] = sum_i w1[pair, i] a_i[p] b_i[q],
    # Gamma_ab = dtil_a^T (cA ox cB)[pair_a, pair_b] dtil_b.
    # This turns the (P n)^2-sized contraction into P^2 GEMMs (~50x fewer
    # flops at the Zundel CAS(8,4) configuration: the per-pair cost that
    # the reference MPI-splits, CASCI_EVCont.py:260-319).
    def dtil(ch, D):
        return np.matmul(ch["w1"][:, None, :], D)[:, 0, :]

    dta = dtil(alpha, D_a)                # (Pa, norb^2)
    dtb = dtil(beta, D_b)                 # (Pb, norb^2)
    OmP = (cA[alpha["Ia"][:, None], beta["Ia"][None, :]]
           * cB[alpha["Jb"][:, None], beta["Jb"][None, :]])   # (Pa, Pb)
    G_ab = (dta.T @ OmP @ dtb).reshape(norb, norb, norb, norb)
    # both spin orders: (alpha,beta) + (beta,alpha)
    rdm2 = G_ab + G_ab.transpose(2, 3, 0, 1)

    # ---- same-spin blocks ---------------------------------------------
    def same_spin(ch, D, omega):
        P, n = ch["w1"].shape
        w_pair = omega[ch["Ia"], ch["Jb"]]
        Wm = w_pair[:, None, None] * ch["w2"]          # (P, n, n)
        # one contraction serves both Wick terms: with
        # D_l[(x,y)] = a_l[x] b_l[y],
        #   direct   + sum_{i!=j} w2 D_i[(p,q)] D_j[(r,s)]
        #   exchange - sum_{i!=j} w2 D_i[(p,s)] D_j[(r,q)]
        # i.e. the same (L, norb^2) x (L, norb^2) product read out with
        # different slot assignments. Batched GEMM + one big GEMM.
        T = np.matmul(Wm, D)                           # (P, n, norb^2)
        G = D.reshape(P * n, -1).T @ T.reshape(P * n, -1)
        G4 = G.reshape(norb, norb, norb, norb)
        return G4 - G4.transpose(0, 3, 2, 1)

    rdm2 = rdm2 + same_spin(alpha, D_a, omega_a) \
        + same_spin(beta, D_b, omega_b)
    return ovlp, rdm1, rdm2


# ---------------------------------------------------------------------------
# JAX device kernel
# ---------------------------------------------------------------------------
def make_wick_kernel(occ_a_A, occ_b_A, occ_a_B, occ_b_B, with_rdm2=True):
    """Build a jitted device version of trans_rdm12_nonorthogonal for fixed
    occupation tables (static shapes). Returns
        kernel(ciA, orbsA, ciB, orbsB) -> (ovlp, rdm1[, rdm2]).

    Everything inside is batched SVDs plus dense GEMMs over the
    (string-pair x channel) axis — the MXU-friendly formulation; on TPU the
    determinant-pair enumeration that the reference MPI-splits across ranks
    (CASCI_EVCont.py:260-319) becomes a handful of device contractions.
    """
    import jax
    import jax.numpy as jnp

    occ_a_A = np.asarray(occ_a_A)
    occ_b_A = np.asarray(occ_b_A)
    occ_a_B = np.asarray(occ_a_B)
    occ_b_B = np.asarray(occ_b_B)

    def pair_channels(orbsA, orbsB, occA, occB):
        DA = jnp.moveaxis(orbsA[:, occA], 0, -2)     # (NA, norb, n)
        DB = jnp.moveaxis(orbsB[:, occB], 0, -2)
        NA, NB = DA.shape[0], DB.shape[0]
        n = occA.shape[1]
        M = jnp.einsum("iak,jal->ijkl", DA, DB).reshape(NA * NB, n, n)
        U, s, Vt = jnp.linalg.svd(M, full_matrices=False)
        phi = jnp.linalg.det(U) * jnp.linalg.det(Vt)
        P = s.shape[0]
        eye = np.eye(n, dtype=bool)
        s_mat = jnp.broadcast_to(s[:, None, :], (P, n, n))
        s_mat = jnp.where(eye[None], 1.0, s_mat)
        w1 = phi[:, None] * jnp.prod(s_mat, axis=-1)
        det = phi * jnp.prod(s, axis=-1)
        s4 = jnp.broadcast_to(s[:, None, None, :], (P, n, n, n))
        mask_i = np.zeros((n, n, n), dtype=bool)
        ii = np.arange(n)
        mask_i[ii, :, ii] = True
        mask_i[:, ii, ii] = True
        s4 = jnp.where(mask_i[None], 1.0, s4)
        w2 = phi[:, None, None] * jnp.prod(s4, axis=-1)
        w2 = w2 * (1.0 - np.eye(n))[None]
        Ia = np.repeat(np.arange(NA), NB)
        Jb = np.tile(np.arange(NB), NA)
        A = jnp.einsum("pak,pki->pia", DA[Ia], U)
        B = jnp.einsum("pak,pik->pia", DB[Jb], Vt)
        return dict(det=det.reshape(NA, NB), w1=w1, w2=w2, A=A, B=B,
                    n=n, Ia=Ia, Jb=Jb)

    def kernel(ciA, orbsA, ciB, orbsB):
        norb = orbsA.shape[0]
        al = pair_channels(orbsA, orbsB, occ_a_A, occ_a_B)
        be = pair_channels(orbsA, orbsB, occ_b_A, occ_b_B)
        omega_a = ciA @ be["det"] @ ciB.T
        omega_b = ciA.T @ al["det"] @ ciB
        ovlp = jnp.sum(al["det"] * omega_a)

        def gamma_spin(ch, omega):
            w = omega[ch["Ia"], ch["Jb"]][:, None] * ch["w1"]
            return jnp.einsum("pi,pix,piy->xy", w, ch["A"], ch["B"])

        rdm1 = gamma_spin(al, omega_a) + gamma_spin(be, omega_b)
        if not with_rdm2:
            return ovlp, rdm1

        na, nb = al["n"], be["n"]
        La = al["w1"].shape[0] * na
        Lb = be["w1"].shape[0] * nb
        Ia = np.repeat(al["Ia"], na)
        Ja = np.repeat(al["Jb"], na)
        Ib = np.repeat(be["Ia"], nb)
        Jb_ = np.repeat(be["Jb"], nb)
        Omega = (al["w1"].reshape(La)[:, None]
                 * be["w1"].reshape(Lb)[None, :]
                 * ciA[Ia[:, None], Ib[None, :]]
                 * ciB[Ja[:, None], Jb_[None, :]])
        Da = jnp.einsum("lx,ly->lxy", al["A"].reshape(La, norb),
                        al["B"].reshape(La, norb)).reshape(La, -1)
        Db = jnp.einsum("lx,ly->lxy", be["A"].reshape(Lb, norb),
                        be["B"].reshape(Lb, norb)).reshape(Lb, -1)
        G_ab = (Da.T @ Omega @ Db).reshape(norb, norb, norb, norb)
        rdm2 = G_ab + jnp.transpose(G_ab, (2, 3, 0, 1))

        def same_spin(ch, omega):
            P, n = ch["w1"].shape
            Wm = omega[ch["Ia"], ch["Jb"]][:, None, None] * ch["w2"]
            D = jnp.einsum("pix,piy->pixy", ch["A"], ch["B"]) \
                .reshape(P, n, norb * norb)
            T = jnp.einsum("pij,pjc->pic", Wm, D)
            G = jnp.einsum("pic,pid->cd", D, T)
            G4 = G.reshape(norb, norb, norb, norb)
            return G4 - jnp.transpose(G4, (0, 3, 2, 1))

        rdm2 = rdm2 + same_spin(al, omega_a) + same_spin(be, omega_b)
        return ovlp, rdm1, rdm2

    return jax.jit(kernel)
