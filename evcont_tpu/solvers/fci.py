"""String-based full configuration interaction (direct CI).

Replaces pyscf.fci.direct_spin0/direct_spin1 used by the reference for
training-state generation (evcont/FCI_EVCont.py:17,70-71,121-123):
  * FCI.kernel(h1, h2, norb, nelec, nroots)   -> FCISolver.kernel
  * FCI.trans_rdm12(bra, ket, norb, nelec)    -> FCISolver.trans_rdm12

Host-side training tool (numpy + scipy.sparse, f64): training states are
computed once per geometry; only their t-RDMs flow to the device. The
determinant basis is alpha-strings x beta-strings; single-excitation
operators E_pq^sigma are precomputed sparse matrices, so the sigma build is
sparse matmuls + one dense GEMM over the ERI — the Knowles-Handy scheme.

Conventions:
  * E_pq = sum_sigma p+_sigma q_sigma (spin-summed excitation).
  * rdm1[p,q]     = <bra| E_pq |ket>
  * rdm2[p,q,r,s] = <bra| E_pq E_rs - delta_qr E_ps |ket>  (chemist order)
    so that  E = sum h_pq rdm1[p,q] + 1/2 sum (pq|rs) rdm2[p,q,r,s].
  * spin='singlet' projects the CI matrix onto C = C^T each Davidson
    iteration, the equivalent of pyscf's direct_spin0 sector restriction
    (relevant for excited-state root ordering, FCI_EVCont.py:17).
"""

import itertools
from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp


# ---------------------------------------------------------------------------
# string machinery
# ---------------------------------------------------------------------------
def make_strings(norb, nelec):
    """All nelec-in-norb occupation strings as sorted orbital tuples,
    lexicographic order."""
    return list(itertools.combinations(range(norb), nelec))


def _string_index(strings):
    return {s: i for i, s in enumerate(strings)}


def excitation_matrices(norb, nelec):
    """Sparse single-excitation matrices: E[p*norb+q] is the (Nstr, Nstr)
    matrix of a+_p a_q restricted to one spin sector, with fermionic signs
    for ascending-ordered strings."""
    strings = make_strings(norb, nelec)
    index = _string_index(strings)
    nstr = len(strings)
    rows = [[] for _ in range(norb * norb)]
    cols = [[] for _ in range(norb * norb)]
    vals = [[] for _ in range(norb * norb)]
    for j, occ in enumerate(strings):
        occ_set = set(occ)
        for q in occ:
            # remove q
            kq = occ.index(q)
            sign_q = (-1) ** kq
            rest = occ[:kq] + occ[kq + 1:]
            for p in range(norb):
                if p != q and p in occ_set:
                    continue
                if p == q:
                    new = occ
                    sign = 1.0
                else:
                    kp = sum(1 for o in rest if o < p)
                    sign = sign_q * ((-1) ** kp)
                    new = tuple(sorted(rest + (p,)))
                i = index[new]
                key = p * norb + q
                rows[key].append(i)
                cols[key].append(j)
                vals[key].append(float(sign))
    mats = []
    for key in range(norb * norb):
        mats.append(sp.csr_matrix(
            (vals[key], (rows[key], cols[key])), shape=(nstr, nstr)))
    return strings, mats


def gather_link_tables(norb, nelec):
    """Gather-form link tables for the native kernels: entries grouped by
    *target* string I so OpenMP threads own disjoint outputs.

    Returns (row_ptr int64 (nstr+1,), tbl_pq int32, tbl_src int32,
    tbl_sign float64)."""
    strings = make_strings(norb, nelec)
    index = _string_index(strings)
    nstr = len(strings)
    per_target = [[] for _ in range(nstr)]
    for j, occ in enumerate(strings):
        occ_set = set(occ)
        for q in occ:
            kq = occ.index(q)
            sign_q = (-1) ** kq
            rest = occ[:kq] + occ[kq + 1:]
            for p in range(norb):
                if p != q and p in occ_set:
                    continue
                if p == q:
                    i, sign = j, 1.0
                else:
                    kp = sum(1 for o in rest if o < p)
                    sign = sign_q * ((-1) ** kp)
                    i = index[tuple(sorted(rest + (p,)))]
                per_target[i].append((p * norb + q, j, float(sign)))
    row_ptr = np.zeros(nstr + 1, dtype=np.int64)
    pqs, srcs, signs = [], [], []
    for i in range(nstr):
        row_ptr[i + 1] = row_ptr[i] + len(per_target[i])
        for (pq, j, s) in per_target[i]:
            pqs.append(pq)
            srcs.append(j)
            signs.append(s)
    return (row_ptr, np.array(pqs, dtype=np.int32),
            np.array(srcs, dtype=np.int32),
            np.array(signs, dtype=np.float64))


def occupation_table(strings, norb):
    occ = np.zeros((len(strings), norb))
    for i, s in enumerate(strings):
        occ[i, list(s)] = 1.0
    return occ


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------
@dataclass
class _Space:
    norb: int
    na: int
    nb: int
    strings_a: list
    strings_b: list
    Ea: list   # sparse E_pq for alpha sector
    Eb: list
    occ_a: np.ndarray
    occ_b: np.ndarray


class FCISolver:
    """Direct-CI solver with Davidson diagonalization.

    Usage (mirrors pyscf's functional kernel):
        solver = FCISolver(norb, nelec)
        e, vec = solver.kernel(h1, h2)                  # ground state
        es, vecs = solver.kernel(h1, h2, nroots=3)
        rdm1, rdm2 = solver.trans_rdm12(bra, ket)
    """

    def __init__(self, norb, nelec, spin="singlet", use_native=True):
        if isinstance(nelec, (tuple, list)):
            na, nb = nelec
        else:
            nb = nelec // 2
            na = nelec - nb
        self.norb = norb
        self.na, self.nb = na, nb
        strings_a, Ea = excitation_matrices(norb, na)
        if nb == na:
            strings_b, Eb = strings_a, Ea
        else:
            strings_b, Eb = excitation_matrices(norb, nb)
        self.space = _Space(
            norb=norb, na=na, nb=nb,
            strings_a=strings_a, strings_b=strings_b,
            Ea=Ea, Eb=Eb,
            occ_a=occupation_table(strings_a, norb),
            occ_b=occupation_table(strings_b, norb),
        )
        self.spin = spin if na == nb else None
        self.dim = (len(strings_a), len(strings_b))

        # native (C++/OpenMP) kernels for the excitation scatter/gather
        self._native = None
        if use_native:
            from ..native import load_native
            lib = load_native()
            if lib is not None:
                links_a = gather_link_tables(norb, na)
                links_b = (links_a if nb == na
                           else gather_link_tables(norb, nb))
                self._native = (lib, links_a, links_b)

    # -- operator application ------------------------------------------------
    def _apply_E(self, C):
        """D[pq] = (E_pq C) for all pq; shape (norb^2, Na, Nb)."""
        n2 = self.norb ** 2
        C = np.ascontiguousarray(C, dtype=np.float64)
        Na, Nb = C.shape
        if self._native is not None:
            import ctypes
            lib, la, lb = self._native
            D = np.zeros((n2, Na, Nb))

            def ptr(a):
                return a.ctypes.data_as(ctypes.c_void_p)

            lib.expand_alpha(ptr(C), ptr(D), ptr(la[0]), ptr(la[1]),
                             ptr(la[2]), ptr(la[3]),
                             ctypes.c_int64(Na), ctypes.c_int64(Nb),
                             ctypes.c_int64(n2))
            lib.expand_beta(ptr(C), ptr(D), ptr(lb[0]), ptr(lb[1]),
                            ptr(lb[2]), ptr(lb[3]),
                            ctypes.c_int64(Na), ctypes.c_int64(Nb),
                            ctypes.c_int64(n2))
            return D
        sps = self.space
        D = np.empty((n2, Na, Nb))
        for k in range(n2):
            D[k] = sps.Ea[k] @ C + (sps.Eb[k] @ C.T).T
        return D

    def _contract_E(self, G):
        """sigma += sum_pq E_pq G[pq]; G shape (norb^2, Na, Nb)."""
        n2 = self.norb ** 2
        Na, Nb = G.shape[1], G.shape[2]
        if self._native is not None:
            import ctypes
            lib, la, lb = self._native
            G = np.ascontiguousarray(G, dtype=np.float64)
            sig = np.zeros((Na, Nb))

            def ptr(a):
                return a.ctypes.data_as(ctypes.c_void_p)

            lib.contract_alpha(ptr(G), ptr(sig), ptr(la[0]), ptr(la[1]),
                               ptr(la[2]), ptr(la[3]),
                               ctypes.c_int64(Na), ctypes.c_int64(Nb),
                               ctypes.c_int64(n2))
            lib.contract_beta(ptr(G), ptr(sig), ptr(lb[0]), ptr(lb[1]),
                              ptr(lb[2]), ptr(lb[3]),
                              ctypes.c_int64(Na), ctypes.c_int64(Nb),
                              ctypes.c_int64(n2))
            return sig
        sps = self.space
        sig = np.zeros((Na, Nb))
        for k in range(n2):
            sig += sps.Ea[k] @ G[k] + (sps.Eb[k] @ G[k].T).T
        return sig

    def sigma(self, C, h1, eri):
        """H C with H = sum k_pq E_pq + 1/2 sum (pq|rs) E_pq E_rs,
        k = h1 - 1/2 tr_r (pr|rq)."""
        n = self.norb
        k1 = h1 - 0.5 * np.einsum("prrq->pq", eri)
        D = self._apply_E(C)
        sig = np.tensordot(k1.reshape(-1), D, axes=1)
        G = np.tensordot(eri.reshape(n * n, n * n),
                         D.reshape(n * n, -1), axes=1).reshape(D.shape)
        sig += 0.5 * self._contract_E(G)
        return sig

    def make_hdiag(self, h1, eri):
        """Diagonal of H over determinants, for the Davidson preconditioner."""
        J = np.einsum("ppqq->pq", eri)
        K = np.einsum("pqqp->pq", eri)
        oa, ob = self.space.occ_a, self.space.occ_b
        hpp = np.diag(h1)
        da = oa @ hpp + 0.5 * np.einsum("ip,iq,pq->i", oa, oa, J - K)
        db = ob @ hpp + 0.5 * np.einsum("ip,iq,pq->i", ob, ob, J - K)
        cross = oa @ J @ ob.T
        return da[:, None] + db[None, :] + cross

    # -- pspace initial guesses ----------------------------------------------
    def _pspace_block(self, k1, eri2, Asel, Bsel):
        """Dense Hamiltonian block over the product grid Asel x Bsel of
        alpha/beta strings, from the precomputed excitation matrices.

        With E_pq = Ea_pq (x) I + I (x) Eb_pq and eri2 symmetric,
          H = sum_x k1_x E_x + 1/2 sum_xy eri2_xy E_x E_y
        restricted to the grid splits into alpha-alpha, beta-beta and one
        mixed term (the two cross terms coincide under x<->y symmetry)."""
        sps = self.space
        ma, mb = len(Asel), len(Bsel)
        n2 = len(sps.Ea)

        def blocks(E, sel, m):
            rows = np.empty((n2, m, E[0].shape[0]))
            cols = np.empty((n2, E[0].shape[0], m))
            sub = np.empty((n2, m, m))
            for x in range(n2):
                d = E[x].toarray()
                rows[x] = d[sel, :]
                cols[x] = d[:, sel]
                sub[x] = d[np.ix_(sel, sel)]
            return rows, cols, sub

        rowsA, colsA, EaA = blocks(sps.Ea, Asel, ma)
        if Bsel is Asel and sps.Eb is sps.Ea:
            rowsB, colsB, EbB = rowsA, colsA, EaA
        else:
            rowsB, colsB, EbB = blocks(sps.Eb, Bsel, mb)

        def same_spin(rows, cols, sub, m):
            # K + 1/2 sum_xy eri2_xy (E_x E_y)|_sel
            K = np.tensordot(k1.ravel(), sub, axes=1)
            W = np.einsum("xy,ynm->xnm", eri2, cols, optimize=True)
            EE = np.einsum("xmn,xnk->mk", rows, W, optimize=True)
            return K + 0.5 * EE

        HA = same_spin(rowsA, colsA, EaA, ma)
        HB = HA if (Bsel is Asel and sps.Eb is sps.Ea) else \
            same_spin(rowsB, colsB, EbB, mb)
        M = np.einsum("xab,xy,ycd->abcd", EaA, eri2, EbB, optimize=True)

        Hp = (np.einsum("ac,bd->abcd", HA, np.eye(mb))
              + np.einsum("ac,bd->abcd", np.eye(ma), HB) + M)
        return Hp.reshape(ma * mb, ma * mb)

    def _pspace_guesses(self, h1, eri, hdiag, nroots, project,
                        max_strings=40, max_dets=1600):
        """Davidson initial guesses from a dense diagonalization of the
        Hamiltonian over a low-diagonal determinant product grid — the
        robustness device pyscf's kernels get from fci.pspace (reference:
        FCI_EVCont.py:70 relies on it for excited roots). Unit-vector
        guesses can MISS a root when near-degenerate excited states split
        across the Davidson's explored subspace (observed: H4 OAO basis,
        nroots=2 converged to the 2nd excited state instead of the 1st);
        pspace eigenvectors start the iteration on the right states."""
        Na, Nb = self.dim
        order = np.argsort(hdiag.ravel())
        ia, ib = np.unravel_index(order, (Na, Nb))
        if self.spin == "singlet":
            # symmetric grid (Asel == Bsel) so the singlet projection of a
            # grid eigenvector stays on the grid
            sel, seen = [], set()
            for k in range(order.size):
                for s in (ia[k], ib[k]):
                    if s not in seen:
                        seen.add(s)
                        sel.append(s)
                if (len(sel) >= max_strings
                        or len(sel) ** 2 >= max_dets):
                    break
            Asel = Bsel = np.array(sorted(sel))
        else:
            sa, sb, seen_a, seen_b = [], [], set(), set()
            for k in range(order.size):
                if ia[k] not in seen_a:
                    seen_a.add(ia[k])
                    sa.append(ia[k])
                if ib[k] not in seen_b:
                    seen_b.add(ib[k])
                    sb.append(ib[k])
                if ((len(sa) >= max_strings and len(sb) >= max_strings)
                        or len(sa) * len(sb) >= max_dets):
                    break
            Asel, Bsel = np.array(sorted(sa)), np.array(sorted(sb))

        k1 = h1 - 0.5 * np.einsum("prrq->pq", eri)
        n = self.norb
        Hp = self._pspace_block(k1, eri.reshape(n * n, n * n)
                                .astype(np.float64), Asel, Bsel)
        wp, yp = np.linalg.eigh(0.5 * (Hp + Hp.T))

        guesses = []
        for col in range(wp.size):
            g = np.zeros((Na, Nb))
            g[np.ix_(Asel, Bsel)] = yp[:, col].reshape(len(Asel), len(Bsel))
            g = project(g.ravel())
            for b in guesses:
                g = g - b * (b @ g)
            nrm = np.linalg.norm(g)
            if nrm > 1e-6:
                guesses.append(g / nrm)
            if len(guesses) >= nroots:
                break
        return guesses

    # -- Davidson ------------------------------------------------------------
    def kernel(self, h1, h2, norb=None, nelec=None, nroots=1, tol=1e-10,
               max_cycle=200, max_space=None, conv_resid=1e-7):
        """Lowest nroots eigenpairs. Returns (e, vec) for nroots == 1,
        (list_of_e, list_of_vec) otherwise — matching the pyscf kernel's
        return convention used in FCI_EVCont.py:70-77.

        conv_resid bounds the residual norm per root: eigenVECTOR error is
        first order in it (~resid/gap) and flows into the stored t-RDMs,
        so 1e-7 keeps continuation energies at the 1e-8 Ha parity target
        (eigenvalue error is second order and converges much earlier)."""
        h1 = np.asarray(h1, dtype=np.float64)
        eri = np.asarray(h2, dtype=np.float64)
        Na, Nb = self.dim
        dim = Na * Nb
        hdiag = self.make_hdiag(h1, eri).ravel()

        def project(v):
            if self.spin == "singlet":
                M = v.reshape(Na, Nb)
                v = (0.5 * (M + M.T)).ravel()
            return v

        def matvec(v):
            return self.sigma(v.reshape(Na, Nb), h1, eri).ravel()

        # initial guesses: eigenvectors of a low-diagonal pspace block
        # (robust against missed excited roots); fall back to lowest-
        # diagonal unit determinants if the projected pspace runs short
        guesses = self._pspace_guesses(h1, eri, hdiag, nroots, project)
        order = np.argsort(hdiag)
        for idx in order:
            if len(guesses) >= nroots:
                break
            g = np.zeros(dim)
            g[idx] = 1.0
            g = project(g)
            nrm = np.linalg.norm(g)
            if nrm < 1e-12:
                continue
            g = g / nrm
            for b in guesses:
                g = g - b * (b @ g)
            nrm = np.linalg.norm(g)
            if nrm > 1e-6:
                guesses.append(g / nrm)

        max_space = max_space or max(20, 6 * nroots)
        V = list(guesses)
        AV = [matvec(v) for v in V]
        last_e = None
        for _ in range(max_cycle):
            Vm = np.array(V)
            AVm = np.array(AV)
            Hs = Vm @ AVm.T
            Hs = 0.5 * (Hs + Hs.T)
            w, y = np.linalg.eigh(Hs)
            w, y = w[:nroots], y[:, :nroots]
            X = y.T @ Vm          # Ritz vectors (nroots, dim)
            AX = y.T @ AVm
            resid = AX - w[:, None] * X
            rnorm = np.linalg.norm(resid, axis=1)
            if last_e is not None and np.all(np.abs(w - last_e) < tol) \
                    and np.all(rnorm < conv_resid):
                break
            last_e = w
            added = False
            for k in range(nroots):
                if rnorm[k] < 0.1 * conv_resid:
                    continue
                denom = hdiag - w[k]
                denom = np.where(np.abs(denom) < 1e-8,
                                 np.sign(denom + 1e-30) * 1e-8, denom)
                t = project(resid[k] / denom)
                # DGKS double re-orthogonalization: a single Gram-Schmidt
                # pass loses orthogonality to ~eps/cos(angle), which stalls
                # the residual around 1e-6 and makes the `not added` exit
                # fire before tight conv_resid targets are reached
                for _ in range(2):
                    for v in V:
                        t = t - v * (v @ t)
                nrm = np.linalg.norm(t)
                if nrm > 1e-10:
                    t = t / nrm
                    V.append(t)
                    AV.append(matvec(t))
                    added = True
            if not added:
                break
            if len(V) > max_space:
                # restart with current Ritz vectors
                V = [x / np.linalg.norm(x) for x in X]
                AV = [matvec(v) for v in V]

        vecs = [X[k].reshape(Na, Nb) / np.linalg.norm(X[k])
                for k in range(nroots)]
        if nroots == 1:
            return float(w[0]), vecs[0]
        return list(map(float, w)), vecs

    # -- transition RDMs -----------------------------------------------------
    def trans_rdm12(self, bra, ket, norb=None, nelec=None):
        """Spin-summed transition 1- and 2-RDMs between CI vectors (see
        module docstring for conventions). Reference parity:
        cisolver.trans_rdm12 in FCI_EVCont.py:121-123."""
        n = self.norb
        bra = np.asarray(bra).reshape(self.dim)
        ket = np.asarray(ket).reshape(self.dim)
        Dket = self._apply_E(ket).reshape(n * n, -1)
        rdm1 = (Dket @ bra.ravel()).reshape(n, n)
        Dbra = self._apply_E(bra).reshape(n * n, -1)
        # <bra| E_pq E_rs |ket> = <E_qp bra | E_rs ket>
        M = (Dbra @ Dket.T)
        # index of E_qp in the flat (p*n+q) layout is q*n+p -> transpose blocks
        M = M.reshape(n, n, n, n).transpose(1, 0, 2, 3).reshape(n * n, n * n)
        rdm2 = M.reshape(n, n, n, n).copy()
        # subtract delta_qr <bra|E_ps|ket>
        for q in range(n):
            rdm2[:, q, q, :] -= rdm1
        return rdm1, rdm2

    def energy_from_rdms(self, h1, eri, rdm1, rdm2):
        return float(np.einsum("pq,pq->", h1, rdm1)
                     + 0.5 * np.einsum("pqrs,pqrs->", eri, rdm2))
