"""Matrix-product-state DMRG for ab initio Hamiltonians.

A minimal but real in-framework DMRG (the role block2 plays for the
reference's training states, evcont/DMRG_EVCont.py / converge_dmrg.py):

  * Jordan-Wigner mapping: 2*norb spin-orbital modes, one d=2 site each
    (even = alpha, odd = beta of the same spatial orbital — keeps
    same-orbital modes adjacent for locality).
  * The Hamiltonian MPO is compiled by summing elementary operator-string
    MPOs (bond dimension 1 each, JW parity strings included) with
    SVD compression at near-machine cutoff after each batch — no hand-built
    complementary-operator tables, exactness checked against dense
    Fock-space matrices in the tests.
  * Two-site DMRG sweeps with Davidson in the effective space; bond
    dimension schedules follow the reference's ladder
    (config.DMRGScheduleConfig).
  * For t-RDM evaluation the converged MPS is contracted back to a dense
    CI vector (exact; practical to ~12 spatial orbitals), reusing the
    framework's particle-number-resolved CI machinery. Larger systems keep
    the external-solver file interface.

Host numpy implementation: training-side tool, f64 exactness first.
"""

import numpy as np

# single-site (d=2) operators
_I = np.eye(2)
_CR = np.array([[0.0, 0.0], [1.0, 0.0]])   # creation: |1><0|
_AN = _CR.T                                  # annihilation
_Z = np.diag([1.0, -1.0])                    # JW parity (|0>: +, |1>: -)
_N = np.diag([0.0, 1.0])


def term_mpo(n_sites, op_list, coeff):
    """MPO (bond dim 1) for coeff * prod of fermionic ops.

    Args:
        op_list: sequence of (site, kind) applied RIGHT to LEFT on kets,
            kind in {"+", "-"}; e.g. a+_p a_q -> [("+", p), ("-", q)] means
            the annihilator acts first.

    Returns:
        list of (1, 1, 2, 2) site tensors.
    """
    mats = [np.eye(2) for _ in range(n_sites)]
    for kind, site in reversed(op_list):  # rightmost operator acts first
        op = _CR if kind == "+" else _AN
        # JW string on all sites strictly left of `site`
        for s in range(site):
            mats[s] = _Z @ mats[s]
        mats[site] = op @ mats[site]
    tensors = [m.reshape(1, 1, 2, 2) for m in mats]
    tensors[0] = tensors[0] * coeff
    return tensors


def mpo_add(A, B):
    """Direct sum of two MPOs."""
    out = []
    n = len(A)
    for i, (a, b) in enumerate(zip(A, B)):
        Dl = a.shape[0] + b.shape[0] if i > 0 else 1
        Dr = a.shape[1] + b.shape[1] if i < n - 1 else 1
        w = np.zeros((a.shape[0] + b.shape[0], a.shape[1] + b.shape[1],
                      2, 2))
        w[:a.shape[0], :a.shape[1]] = a
        w[a.shape[0]:, a.shape[1]:] = b
        if i == 0:
            w = w.sum(axis=0, keepdims=True)
        if i == n - 1:
            w = w.sum(axis=1, keepdims=True)
        out.append(w)
    return out


def mpo_compress(W, cutoff=1e-12):
    """Two-pass SVD compression of an MPO at near-machine cutoff."""
    n = len(W)
    W = [w.copy() for w in W]
    # left -> right
    for i in range(n - 1):
        w = W[i]
        Dl, Dr = w.shape[0], w.shape[1]
        mat = np.transpose(w, (0, 2, 3, 1)).reshape(Dl * 4, Dr)
        U, s, Vt = np.linalg.svd(mat, full_matrices=False)
        keep = max(1, int(np.sum(s > cutoff * max(s[0], 1e-300))))
        U, s, Vt = U[:, :keep], s[:keep], Vt[:keep]
        W[i] = np.transpose(U.reshape(Dl, 2, 2, keep), (0, 3, 1, 2))
        W[i + 1] = np.einsum("a,ab,bcde->acde", s, Vt,
                             W[i + 1], optimize=True)
    # right -> left
    for i in range(n - 1, 0, -1):
        w = W[i]
        Dl, Dr = w.shape[0], w.shape[1]
        mat = w.reshape(Dl, Dr * 4)
        U, s, Vt = np.linalg.svd(mat, full_matrices=False)
        keep = max(1, int(np.sum(s > cutoff * max(s[0], 1e-300))))
        U, s, Vt = U[:, :keep], s[:keep], Vt[:keep]
        W[i] = Vt.reshape(keep, Dr, 2, 2)
        W[i - 1] = np.einsum("abde,bc,c->acde", W[i - 1], U, s,
                             optimize=True)
    return W


def build_hamiltonian_mpo(h1, eri, batch=40, cutoff=1e-12):
    """Compile the ab initio Hamiltonian into an MPO over 2*norb JW sites.

    H = sum_pq h_pq E_pq + 1/2 sum_pqrs (pq|rs) E_pq E_rs, expanded to
    spin orbitals with mode ordering (p, spin) -> 2p + spin."""
    norb = h1.shape[0]
    n_sites = 2 * norb

    def mode(p, s):
        return 2 * p + s

    terms = []
    for p in range(norb):
        for q in range(norb):
            if abs(h1[p, q]) < 1e-14:
                continue
            for s in range(2):
                terms.append(([("+", mode(p, s)), ("-", mode(q, s))],
                              h1[p, q]))
    for p in range(norb):
        for q in range(norb):
            for r in range(norb):
                for s_ in range(norb):
                    g = eri[p, q, r, s_]
                    if abs(g) < 1e-14:
                        continue
                    for sa in range(2):
                        for sb in range(2):
                            # 1/2 (pq|rs) a+_psa a+_rsb a_ssb a_qsa
                            terms.append((
                                [("+", mode(p, sa)), ("+", mode(r, sb)),
                                 ("-", mode(s_, sb)), ("-", mode(q, sa))],
                                0.5 * g))

    H = None
    for start in range(0, len(terms), batch):
        chunk = terms[start:start + batch]
        M = term_mpo(n_sites, *chunk[0])
        for ops, c in chunk[1:]:
            M = mpo_add(M, term_mpo(n_sites, ops, c))
        H = M if H is None else mpo_add(H, M)
        H = mpo_compress(H, cutoff)
    return H


def number_penalty_mpo(n_sites, n_target, sz_target, lam=8.0):
    """MPO for lam * [(N - n)^2 + (Sz - sz)^2]: confines the unsymmetric
    DMRG to the requested particle-number / Sz sector (block2 uses
    symmetry-adapted tensors; a quadratic penalty is the simple exact
    equivalent for ground-state targeting)."""
    terms = []
    # N^2 and Sz^2: sum_ij w_i w_j n_i n_j with w = 1 (N) or +-1/2 (Sz)
    w_n = np.ones(n_sites)
    w_s = np.array([0.5 if i % 2 == 0 else -0.5 for i in range(n_sites)])
    for i in range(n_sites):
        for j in range(n_sites):
            c = lam * (w_n[i] * w_n[j] + w_s[i] * w_s[j])
            terms.append(([("+", i), ("-", i), ("+", j), ("-", j)], c)
                         if i != j else
                         ([("+", i), ("-", i)], c))
    for i in range(n_sites):
        c = lam * (-2.0 * n_target * w_n[i] - 2.0 * sz_target * w_s[i])
        terms.append(([("+", i), ("-", i)], c))
    const = lam * (n_target ** 2 + sz_target ** 2)

    H = None
    for start in range(0, len(terms), 60):
        chunk = terms[start:start + 60]
        M = term_mpo(n_sites, *chunk[0])
        for ops, c in chunk[1:]:
            M = mpo_add(M, term_mpo(n_sites, ops, c))
        H = M if H is None else mpo_add(H, M)
        H = mpo_compress(H)
    # constant shift on the first tensor via identity string
    ident = term_mpo(n_sites, [], 1.0)
    ident[0] = ident[0] * const
    return mpo_compress(mpo_add(H, ident))


# ---------------------------------------------------------------------------
# two-site DMRG
# ---------------------------------------------------------------------------
def _right_canonicalize(mps):
    n = len(mps)
    for i in range(n - 1, 0, -1):
        Dl, d, Dr = mps[i].shape
        mat = mps[i].reshape(Dl, d * Dr)
        U, s, Vt = np.linalg.svd(mat, full_matrices=False)
        mps[i] = Vt.reshape(-1, d, Dr)
        mps[i - 1] = np.einsum("adb,bc,c->adc", mps[i - 1], U, s,
                               optimize=True)
    mps[0] /= np.linalg.norm(mps[0])
    return mps


def mpo_expectation(mps, W):
    """<mps| W |mps> for a normalized MPS."""
    E = np.ones((1, 1, 1))   # (bra bond, mpo bond, ket bond)
    for A, w in zip(mps, W):
        # E (a, b, c); ket A (c, y, f); mpo w (b, e, x, y); bra conj(A) (a, x, d)
        T = np.einsum("abc,cyf->abyf", E, A, optimize=True)
        T = np.einsum("abyf,bexy->aexf", T, w, optimize=True)
        E = np.einsum("aexf,axd->def", T, np.conj(A), optimize=True)
    return float(E[0, 0, 0])


def dmrg_ground_state(W_ham, n_sites, n_elec, sz=0.0, bond_dims=(32, 64),
                      sweeps_per_dim=2, penalty=8.0, noise=1e-4, seed=0):
    """Two-site DMRG ground state of the penalized Hamiltonian.

    Returns (energy <H> without penalty, mps)."""
    from scipy.sparse.linalg import eigsh, LinearOperator

    W_pen = number_penalty_mpo(n_sites, n_elec, sz, lam=penalty)
    W = mpo_compress(mpo_add(W_ham, W_pen))

    rng = np.random.default_rng(seed)
    # HF-like product start: occupy alpha modes of the first na orbitals,
    # beta modes of the first nb
    nb = int(n_elec) // 2 + (1 if (n_elec % 2 and sz < 0) else 0)
    na = int(n_elec) - nb
    occ = [0] * n_sites
    for p in range(na):
        occ[2 * p] = 1
    for p in range(nb):
        occ[2 * p + 1] = 1
    mps = []
    for i in range(n_sites):
        t = np.zeros((1, 2, 1))
        t[0, occ[i], 0] = 1.0
        mps.append(t)
    mps = _right_canonicalize(mps)

    def right_envs(mps):
        RE = [None] * (n_sites + 1)
        RE[n_sites] = np.ones((1, 1, 1))
        for i in range(n_sites - 1, -1, -1):
            A = mps[i]
            T = np.einsum("cyf,def->cyde", A, RE[i + 1], optimize=True)
            T = np.einsum("bexy,cyde->bxcd", W[i], T, optimize=True)
            RE[i] = np.einsum("axd,bxcd->abc", np.conj(A), T,
                              optimize=True)
        return RE

    LE = [None] * (n_sites + 1)
    LE[0] = np.ones((1, 1, 1))
    RE = right_envs(mps)

    energy = None
    for m in bond_dims:
        for sweep in range(sweeps_per_dim):
            # left -> right
            for i in range(n_sites - 1):
                energy = _two_site_update(mps, W, LE, RE, i, m, rng,
                                          noise, sweep_dir="L")
            # right -> left
            for i in range(n_sites - 2, -1, -1):
                energy = _two_site_update(mps, W, LE, RE, i, m, rng,
                                          noise, sweep_dir="R")
        noise *= 0.1
    e_phys = mpo_expectation(mps, W_ham)
    return e_phys, mps


def _two_site_update(mps, W, LE, RE, i, m, rng, noise, sweep_dir):
    from scipy.sparse.linalg import eigsh, LinearOperator

    A1, A2 = mps[i], mps[i + 1]
    Dl, d, _ = A1.shape
    _, _, Dr = A2.shape
    shape = (Dl, d, d, Dr)
    L, R = LE[i], RE[i + 2]
    W1, W2 = W[i], W[i + 1]

    def matvec(v):
        # L (a,b,c) theta (c,y,z,f) W1 (b,g,x,y) W2 (g,h,u,z) R (d,h,f)
        # -> out (a,x,u,d)
        th = v.reshape(shape)
        T = np.einsum("abc,cyzf->abyzf", L, th, optimize=True)
        T = np.einsum("abyzf,bgxy->agxzf", T, W1, optimize=True)
        T = np.einsum("agxzf,ghuz->ahxuf", T, W2, optimize=True)
        out = np.einsum("ahxuf,dhf->axud", T, R, optimize=True)
        return out.reshape(-1)

    dim = Dl * d * d * Dr
    v0 = np.einsum("axb,byc->axyc", A1, A2, optimize=True).reshape(-1)
    nrm = np.linalg.norm(v0)
    v0 = v0 / nrm if nrm > 1e-12 else None
    if dim <= 8:
        # dense fallback for tiny blocks
        Hd = np.zeros((dim, dim))
        for k in range(dim):
            e = np.zeros(dim)
            e[k] = 1.0
            Hd[:, k] = matvec(e)
        w, v = np.linalg.eigh(0.5 * (Hd + Hd.T))
        e0, th = w[0], v[:, 0]
    else:
        op = LinearOperator((dim, dim), matvec=matvec)
        w, v = eigsh(op, k=1, which="SA", v0=v0, maxiter=400, tol=1e-9)
        e0, th = w[0], v[:, 0]

    th = th.reshape(Dl * d, d * Dr)
    if noise > 0:
        th = th + noise * rng.standard_normal(th.shape) \
            * np.linalg.norm(th) / np.sqrt(th.size)
    U, s, Vt = np.linalg.svd(th, full_matrices=False)
    keep = min(m, int(np.sum(s > 1e-12)))
    keep = max(keep, 1)
    U, s, Vt = U[:, :keep], s[:keep], Vt[:keep]
    s = s / np.linalg.norm(s)
    if sweep_dir == "L":
        mps[i] = U.reshape(Dl, d, keep)
        mps[i + 1] = (np.diag(s) @ Vt).reshape(keep, d, Dr)
        # update left environment at i+1
        A = mps[i]
        T = np.einsum("abc,cyf->abyf", LE[i], A, optimize=True)
        T = np.einsum("abyf,bexy->aexf", T, W[i], optimize=True)
        LE[i + 1] = np.einsum("aexf,axd->def", T, np.conj(A),
                              optimize=True)
    else:
        mps[i] = (U * s).reshape(Dl, d, keep)
        mps[i + 1] = Vt.reshape(keep, d, Dr)
        A = mps[i + 1]
        T = np.einsum("cyf,def->cyde", A, RE[i + 2], optimize=True)
        T = np.einsum("bexy,cyde->bxcd", W[i + 1], T, optimize=True)
        RE[i + 1] = np.einsum("axd,bxcd->abc", np.conj(A), T,
                              optimize=True)
    return e0


def mps_to_statevector(mps):
    """Contract an MPS to the dense 2^n state vector (site 0 = most
    significant bit; tests / t-RDM extraction for small systems)."""
    v = mps[0][0]            # (d, D)
    for A in mps[1:]:
        v = np.einsum("xb,byc->xyc", v, A, optimize=True)
        v = v.reshape(-1, A.shape[2])
    return v[:, 0]


def _transfer(E, A, B, op=None):
    """One-site transfer of the (bra_bond, ket_bond) environment."""
    Bx = B if op is None else np.einsum("xy,cyf->cxf", op, B,
                                        optimize=True)
    T = np.einsum("ac,cxf->axf", E, Bx, optimize=True)
    return np.einsum("axf,axd->df", T, np.conj(A), optimize=True)


def mps_overlap(mpsA, mpsB):
    """<A|B> between two MPSes of equal site count."""
    E = np.ones((1, 1))
    for A, B in zip(mpsA, mpsB):
        E = _transfer(E, A, B)
    return float(E[0, 0])


def mps_transition_rdm1(mpsA, mpsB, norb):
    """Spin-summed transition 1-RDM <A| E_pq |B> between two MPSes
    (bra != ket), with Jordan-Wigner strings handled per operator pair.

    O(k^3 m^3) host contraction — the first rung of MPS-native t-RDMs
    (the 2-RDM sweep, needed to feed the continuation beyond the dense
    extraction limit, is future work)."""
    n_sites = len(mpsA)
    # plain left environments
    Lp = [np.ones((1, 1))]
    for s in range(n_sites):
        Lp.append(_transfer(Lp[s], mpsA[s], mpsB[s]))
    # plain right environments: Rp[s][d, f] sums sites s..end
    Rp = [None] * (n_sites + 1)
    Rp[n_sites] = np.ones((1, 1))
    for s in range(n_sites - 1, -1, -1):
        Rp[s] = np.einsum("axd,cxf,df->ac", np.conj(mpsA[s]), mpsB[s],
                          Rp[s + 1], optimize=True)

    def elem(i, j):
        """<A| a+_i a_j |B> for modes i, j."""
        lo, hi = min(i, j), max(i, j)
        E = Lp[lo]
        for s in range(lo, hi + 1):
            if i == j and s == i:
                op = _N
            elif s == i:                      # creation site
                op = _CR @ _Z if i < j else _CR
            elif s == j:                      # annihilation site
                op = _AN if j > i else _Z @ _AN
            else:
                op = _Z
            E = _transfer(E, mpsA[s], mpsB[s], op)
        # close with the plain right environment
        return float(np.einsum("df,df->", E, Rp[hi + 1], optimize=True))

    rdm1 = np.zeros((norb, norb))
    for p in range(norb):
        for q in range(norb):
            rdm1[p, q] = elem(2 * p, 2 * q) + elem(2 * p + 1, 2 * q + 1)
    return rdm1


def _plain_envs(mpsA, mpsB):
    """Cached identity left/right environments between two MPSes."""
    n_sites = len(mpsA)
    Lp = [np.ones((1, 1))]
    for s in range(n_sites):
        Lp.append(_transfer(Lp[s], mpsA[s], mpsB[s]))
    Rp = [None] * (n_sites + 1)
    Rp[n_sites] = np.ones((1, 1))
    for s in range(n_sites - 1, -1, -1):
        Rp[s] = np.einsum("axd,cxf,df->ac", np.conj(mpsA[s]), mpsB[s],
                          Rp[s + 1], optimize=True)
    return Lp, Rp


def mps_cross_term(mpsA, mpsB, op_list, envs=None):
    """<A| (fermionic operator string) |B> in the term_mpo convention
    ([("+", mode), ...], applied right-to-left on kets).

    Without envs: exact for any op_list (full-chain contraction). With
    cached plain environments (envs = _plain_envs(A, B)) only the sites
    inside the operator span are contracted — valid only for even-length
    strings: an odd string leaves an uncancelled Jordan-Wigner Z on every
    site left of the span, which the plain boundary environment ignores."""
    n_sites = len(mpsA)
    mats = term_mpo(n_sites, op_list, 1.0)
    if envs is None:
        E = np.ones((1, 1))
        for s in range(n_sites):
            E = _transfer(E, mpsA[s], mpsB[s], mats[s][0, 0])
        return float(E[0, 0])
    if len(op_list) % 2:
        raise ValueError(
            "cached-environment fast path requires an even-length operator "
            "string (odd strings carry a JW Z tail left of the span); call "
            "with envs=None for the exact full-chain contraction")
    Lp, Rp = envs
    sites = [s for _, s in op_list]
    lo, hi = (min(sites), max(sites)) if sites else (0, -1)
    E = Lp[lo]
    for s in range(lo, hi + 1):
        E = _transfer(E, mpsA[s], mpsB[s], mats[s][0, 0])
    return float(np.einsum("df,df->", E, Rp[hi + 1], optimize=True))


def mps_transition_rdm12(mpsA, mpsB, norb):
    """Transition 1- and 2-RDMs between two MPSes, conventions matching
    solvers/fci.py (chemist order, spin-summed):
        rdm2[p,q,r,s] = sum_st <A| a+_ps a+_rt a_st a_qs |B>.

    Exact; O(norb^4) operator strings contracted over their site spans
    between cached boundary environments. The full cached-environment
    sweep (O(norb^2) scaling) is the planned round-2 lift for
    production-size orbital counts."""
    envs = _plain_envs(mpsA, mpsB)
    rdm1 = mps_transition_rdm1(mpsA, mpsB, norb)
    rdm2 = np.zeros((norb,) * 4)
    for p in range(norb):
        for q in range(norb):
            for r in range(norb):
                for s_ in range(norb):
                    val = 0.0
                    for sa in range(2):
                        for sb in range(2):
                            ops = [("+", 2 * p + sa), ("+", 2 * r + sb),
                                   ("-", 2 * s_ + sb), ("-", 2 * q + sa)]
                            # same spin with identical modes annihilates
                            if sa == sb and (p == r or q == s_):
                                continue
                            val += mps_cross_term(mpsA, mpsB, ops, envs)
                    rdm2[p, q, r, s_] = val
    return rdm1, rdm2


def mps_to_ci(mps, norb, nelec):
    """Extract the (Na, Nb) particle-number-resolved CI matrix from an MPS
    (exact; practical to ~12 spatial orbitals).

    Handles the Jordan-Wigner reordering sign: Fock basis states are
    ascending-mode creation products, while the CI convention is
    (alpha ascending)(beta ascending); the parity of the interleaving
    permutation multiplies each amplitude."""
    from .fci import make_strings

    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = nelec // 2
        na = nelec - nb
    v = mps_to_statevector(mps)
    n_sites = 2 * norb
    strings_a = make_strings(norb, na)
    strings_b = make_strings(norb, nb)
    ci = np.zeros((len(strings_a), len(strings_b)))
    for ia, sa in enumerate(strings_a):
        modes_a = [2 * p for p in sa]
        for ib, sb in enumerate(strings_b):
            modes_b = [2 * p + 1 for p in sb]
            modes = modes_a + modes_b      # CI operator order
            # Fock index: site 0 = most significant bit
            f = 0
            for m_ in modes:
                f |= 1 << (n_sites - 1 - m_)
            # parity of sorting `modes` ascending (= #inversions)
            inv = 0
            for x in range(len(modes)):
                for y in range(x + 1, len(modes)):
                    if modes[x] > modes[y]:
                        inv += 1
            ci[ia, ib] = ((-1) ** inv) * v[f]
    return ci


def mpo_to_dense(W):
    """Contract an MPO to the dense Fock-space matrix (tests only; site 0
    is the outermost kron factor)."""
    out = W[0]  # (1, D, row, col)
    for w in W[1:]:
        out = np.einsum("abrc,bdxy->adrxcy", out, w, optimize=True)
        a, d, r, x, c, y = out.shape
        out = out.reshape(a, d, r * x, c * y)
    return out[0, 0]
