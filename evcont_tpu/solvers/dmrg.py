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
  * Two-site DMRG sweeps with Davidson in the effective space; the
    converge_dmrg driver reproduces the reference's schedule exactly —
    bond-dimension ladder, per-rung noise decay 4^-i, per-rung
    DMRG_result_{tag}.txt logging, MPS save/restart
    (evcont/converge_dmrg.py:10-107).
  * t-RDMs between stored MPSes: either dense CI extraction (exact;
    practical to ~12 spatial orbitals) or the batched cached-environment
    sweep mps_transition_rdm12 — every <A|a+ a+ a a|B> element from
    O(n_sites) BLAS-batched contractions, H30-scale (30 orbitals, m=32)
    in ~30 s/pair on one core.

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


def _svd(mat):
    """SVD with a gesvd fallback: LAPACK's default divide-and-conquer
    driver (gesdd) can fail to converge on ill-scaled MPO blocks; the
    slower Jacobi-free gesvd is unconditionally convergent."""
    try:
        return np.linalg.svd(mat, full_matrices=False)
    except np.linalg.LinAlgError:
        from scipy.linalg import svd as _scipy_svd
        return _scipy_svd(mat, full_matrices=False,
                          lapack_driver="gesvd")


def mpo_compress(W, cutoff=1e-12):
    """Two-pass SVD compression of an MPO at near-machine cutoff."""
    n = len(W)
    W = [w.copy() for w in W]
    # left -> right
    for i in range(n - 1):
        w = W[i]
        Dl, Dr = w.shape[0], w.shape[1]
        mat = np.transpose(w, (0, 2, 3, 1)).reshape(Dl * 4, Dr)
        U, s, Vt = _svd(mat)
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
        U, s, Vt = _svd(mat)
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
    equivalent for ground-state targeting). Built as squared one-body FSM
    MPOs — O(1) compressed bond dimension at any chain length."""
    wn = np.eye(n_sites)
    ws = np.diag([0.5 if i % 2 == 0 else -0.5 for i in range(n_sites)])
    N = one_body_mpo(wn)
    Sz = one_body_mpo(ws)
    H = mpo_add(mpo_multiply(N, N), mpo_multiply(Sz, Sz))
    H = mpo_add(H, one_body_mpo(-2.0 * n_target * wn
                                - 2.0 * sz_target * ws))
    ident = term_mpo(n_sites, [], 1.0)
    ident[0] = ident[0] * (n_target ** 2 + sz_target ** 2)
    H = mpo_compress(mpo_add(H, ident))
    H[0] = H[0] * lam
    return H


# ---------------------------------------------------------------------------
# two-site DMRG
# ---------------------------------------------------------------------------
def _right_canonicalize(mps):
    n = len(mps)
    for i in range(n - 1, 0, -1):
        Dl, d, Dr = mps[i].shape
        mat = mps[i].reshape(Dl, d * Dr)
        U, s, Vt = _svd(mat)
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


def _hf_product_mps(n_sites, n_elec, sz):
    """HF-like product start: occupy alpha modes of the first na orbitals,
    beta modes of the first nb."""
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
    return _right_canonicalize(mps)


def _make_envs(mps, W):
    """Fresh left/right MPO environments for sweeping."""
    n_sites = len(mps)
    LE = [None] * (n_sites + 1)
    LE[0] = np.ones((1, 1, 1))
    RE = [None] * (n_sites + 1)
    RE[n_sites] = np.ones((1, 1, 1))
    for i in range(n_sites - 1, -1, -1):
        A = mps[i]
        T = np.einsum("cyf,def->cyde", A, RE[i + 1], optimize=True)
        T = np.einsum("bexy,cyde->bxcd", W[i], T, optimize=True)
        RE[i] = np.einsum("axd,bxcd->abc", np.conj(A), T, optimize=True)
    return LE, RE


def _run_sweep(mps, W, LE, RE, m, rng, noise):
    """One full left->right + right->left two-site sweep at bond dim m.
    Returns (last local energy, max discarded weight)."""
    n_sites = len(mps)
    energy, dw_max = None, 0.0
    for i in range(n_sites - 1):
        energy, dw = _two_site_update(mps, W, LE, RE, i, m, rng, noise,
                                      sweep_dir="L")
        dw_max = max(dw_max, dw)
    for i in range(n_sites - 2, -1, -1):
        energy, dw = _two_site_update(mps, W, LE, RE, i, m, rng, noise,
                                      sweep_dir="R")
        dw_max = max(dw_max, dw)
    return energy, dw_max


def dmrg_ground_state(W_ham, n_sites, n_elec, sz=0.0, bond_dims=(32, 64),
                      sweeps_per_dim=2, penalty=8.0, noise=1e-4, seed=0):
    """Two-site DMRG ground state of the penalized Hamiltonian.

    Returns (energy <H> without penalty, mps)."""
    W_pen = number_penalty_mpo(n_sites, n_elec, sz, lam=penalty)
    W = mpo_compress(mpo_add(W_ham, W_pen))

    rng = np.random.default_rng(seed)
    mps = _hf_product_mps(n_sites, n_elec, sz)
    LE, RE = _make_envs(mps, W)

    for m in bond_dims:
        for sweep in range(sweeps_per_dim):
            _run_sweep(mps, W, LE, RE, m, rng, noise)
        noise *= 0.1
    e_phys = mpo_expectation(mps, W_ham)
    return e_phys, mps


def save_mps(path, mps):
    """Persist an MPS as an npz bundle (restart format, the analog of
    block2's nodex/{tag}-mps_info.bin reload in converge_dmrg.py:65-69)."""
    np.savez_compressed(path, n=len(mps),
                        **{f"t{i}": t for i, t in enumerate(mps)})


def load_mps(path):
    data = np.load(path)
    return [data[f"t{i}"] for i in range(int(data["n"]))]


def converge_dmrg(h1, h2, nelec, tag, bond_dim_schedule=None, noises=None,
                  tolerance=1.0e-4, restart_tag=None, workdir=".",
                  penalty=8.0, max_sweeps_per_rung=8, seed=0,
                  device=False, lanczos_k=20):
    """Schedule-parity DMRG driver (reference: evcont/converge_dmrg.py:10-107).

    Reproduces the reference's control flow with the in-framework MPS
    solver in place of block2:
      * bond-dimension ladder round(1.8^(6..15)) by default, iterated over
        rungs i = 0..len-2 (the reference's loop bound);
      * per-rung noise schedule noises * 4^(-i) with
        noises = logspace(-2, -7, 4) + [0], applied per sweep;
      * per-rung rows (bond_dim, energy, discarded_weight, noise) appended
        to {workdir}/DMRG_result_{tag}.txt;
      * cross-rung early stop when |E_i - E_{i-1}| < tolerance, and
        within-rung early stop on the same tolerance;
      * restart from {workdir}/{restart_tag}-mps.npz when present.

    device=True routes every sweep through the jitted static-shape
    two-site kernel (solvers/dmrg_jax.DeviceDMRG) so the solver's FLOPs
    run on the accelerator; ladder/noise/logging/restart semantics are
    identical (the MPS is re-padded at each rung boundary).

    Returns (mps, final_energy) — energy is the physical <H> (the number-
    sector penalty is excluded), nuclear repulsion NOT included (the
    reference's convention: h1/h2 only).
    """
    import os

    norb = h1.shape[0]
    n_sites = 2 * norb
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = int(nelec) // 2
        na = int(nelec) - nb
    if bond_dim_schedule is None:
        bond_dim_schedule = np.round(1.8 ** np.arange(6, 16)).astype(int)
    if noises is None:
        noises = np.append(np.logspace(-2, -7, num=4), 0)
    noises = np.asarray(noises, dtype=float)

    # grouped FSM compilation scales to tens of orbitals; tighten the
    # compression cutoff on small systems where exactness tests live
    W_ham = build_hamiltonian_mpo_fast(
        h1, h2, cutoff=1e-12 if norb <= 10 else 1e-9)
    W_pen = number_penalty_mpo(n_sites, na + nb, 0.5 * (na - nb),
                               lam=penalty)
    W = mpo_compress(mpo_add(W_ham, W_pen))

    os.makedirs(workdir, exist_ok=True)
    restart_path = (os.path.join(workdir, f"{restart_tag}-mps.npz")
                    if restart_tag is not None else None)
    if restart_path and os.path.exists(restart_path):
        mps = load_mps(restart_path)
    else:
        mps = _hf_product_mps(n_sites, na + nb, 0.5 * (na - nb))
    if device:
        from .dmrg_jax import DeviceDMRG
    else:
        LE, RE = _make_envs(mps, W)
    rng = np.random.default_rng(seed)

    log_path = os.path.join(workdir, f"DMRG_result_{tag}.txt")
    open(log_path, "w").close()

    final_energies = []
    for i in range(len(bond_dim_schedule) - 1):
        m = int(bond_dim_schedule[i])
        rung_noises = noises * (4.0 ** (-i))
        if device:
            dev = DeviceDMRG(W, n_sites, m, mps0=mps)
        rows = []
        prev_e = None
        for j in range(max_sweeps_per_rung):
            noise = rung_noises[min(j, len(rung_noises) - 1)]
            if device:
                _, dw = dev.sweep(noise=noise, k=lanczos_k,
                                  seed=seed + 1000 * i + j)
                e_phys = dev.expectation(W_ham)
            else:
                _, dw = _run_sweep(mps, W, LE, RE, m, rng, noise)
                e_phys = mpo_expectation(mps, W_ham)
            rows.append((m, e_phys, dw, noise))
            if prev_e is not None and abs(e_phys - prev_e) < tolerance:
                break
            prev_e = e_phys
        if device:
            mps = dev.mps()
        final_energies.append(rows[-1][1])
        with open(log_path, "a") as fl:
            for bd, en, dw, noise in rows:
                fl.write(f"{bd}  {en}  {dw}  {noise}\n")
        if len(final_energies) > 1 and \
                abs(final_energies[-1] - final_energies[-2]) < tolerance:
            break

    save_mps(os.path.join(workdir, f"{tag}-mps.npz"), mps)
    return mps, final_energies[-1]


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
    U, s, Vt = _svd(th)
    keep = min(m, int(np.sum(s > 1e-12)))
    keep = max(keep, 1)
    dw = float(np.sum(s[keep:] ** 2) / max(np.sum(s ** 2), 1e-300))
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
    return e0, dw


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


def mps_transition_rdm12_strings(mpsA, mpsB, norb):
    """Transition 1- and 2-RDMs between two MPSes, conventions matching
    solvers/fci.py (chemist order, spin-summed):
        rdm2[p,q,r,s] = sum_st <A| a+_ps a+_rt a_st a_qs |B>.

    Exact; O(norb^4) operator strings contracted over their site spans
    between cached boundary environments. Reference implementation kept
    as the correctness oracle for mps_transition_rdm12 (the batched
    cached-environment sweep)."""
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


# ---------------------------------------------------------------------------
# batched cached-environment t-RDM sweep
# ---------------------------------------------------------------------------
# The O(norb^4) string method above re-contracts the chain span for every
# element. The sweep below computes every <A| o1 o2 o3 o4 |B> in O(n_sites)
# *batched* BLAS contractions (block2's cached-environment strategy,
# re-derived for the JW chain):
#
#   1. Each 4-operator string is canonically site-ordered (fermionic sign
#      = parity of the distinct-site inversions; same-site operators keep
#      their order and fuse into an even-weight composite N = a+a or
#      Nbar = a a+).
#   2. In canonical order the JW dressing is fixed: site matrices
#      o1Z, o2, o3Z, o4 with Z-filled regions (u1,u2), (u3,u4) and
#      identity elsewhere — so every string splits at u3 into a left half
#      that depends only on (o1,u1,o2,u2) and a right half on
#      (o3,u3,o4,u4).
#   3. A left-to-right sweep advances *batches* of left environments (one
#      (n_entries, mA, mB) tensor per structure class, one einsum per
#      site); a right-to-left pre-sweep caches every right half at its
#      start bond. One GEMM per bond then yields all elements that split
#      there.
#
# Structure classes (w = fermionic weight; F in {N, Nbar}):
#   B1  (o1,u1)          singles, Z-advanced      (region (u1,u2) is Z)
#   B3  (o1,u1,o2,u2)    pairs, plain-advanced    (region (u2,u3) is I)
#   B4  (F,u1)           fused singles, plain     (even weight)
#   B2  (o1,u1,F,u2)     single+fused, Z-advanced
#   B5  (F,u1,o2,u2)     fused+single, Z-advanced
# closed against right caches Rpair (o3Z..Z..o4), Rsingle (o3), Rfused (F).


def _batched_ltransfer(E, A, B, op=None):
    """Advance a batch of left environments E (g, a, c) through one site."""
    Bx = B if op is None else np.einsum("xy,cyf->cxf", op, B,
                                        optimize=True)
    T = np.einsum("gac,cxf->gaxf", E, Bx, optimize=True)
    return np.einsum("gaxf,axd->gdf", T, np.conj(A), optimize=True)


def _batched_rtransfer(R, A, B, op=None):
    """Advance a batch of right environments R (g, d, f) down through one
    site: out[g, a, c] closes sites s..end given R closing s+1..end."""
    Bx = B if op is None else np.einsum("xy,cyf->cxf", op, B,
                                        optimize=True)
    T = np.einsum("cxf,gdf->gcxd", Bx, R, optimize=True)
    return np.einsum("axd,gcxd->gac", np.conj(A), T, optimize=True)


_NBAR = _AN @ _CR          # a a+ = I - N
_KIND_OPS = (_CR, _AN)     # kind 0 = "+", kind 1 = "-"
_FUSED_OPS = (_N, _NBAR)   # fused kind 0 = a+a, 1 = a a+

# canonical-key case tags
_TAG4, _TAG3A, _TAG3B, _TAG3C, _TAG2, _TAG1 = 0, 1, 2, 3, 4, 5


def _pack(case, left, right):
    return ((np.int64(case) << 48)
            | (np.asarray(left, dtype=np.int64) << 24)
            | np.asarray(right, dtype=np.int64))


def _sweep_all_elements(mpsA, mpsB):
    """All canonical operator-string expectations between two MPSes.

    Returns (keys int64 sorted, values) covering every case tag; keys
    encode (case, left-structure, right-structure) via _pack with
    site/kind fields packed as k | (u << 1) per operator slot (8 bits
    kind+site each, 3 slots max per half)."""
    n = len(mpsA)
    assert n < 128
    Lp, Rp = _plain_envs(mpsA, mpsB)

    def slot(k, u):
        return k | (u << 1)

    # ---- right pre-sweep -------------------------------------------------
    # caches: for each bond c, the right halves starting at site c
    r_single = {}    # (k, c) -> env
    r_fused = {}     # (f, c) -> env
    r_pair = [None] * n          # c -> (meta codes, env batch)
    bz_meta, bz = [], np.zeros((0, mpsA[-1].shape[2], mpsB[-1].shape[2]))
    for c in range(n - 1, -1, -1):
        A, B = mpsA[c], mpsB[c]
        R_next = Rp[c + 1][None]
        # singles / fused starting (and ending) at c
        for k in range(2):
            r_single[(k, c)] = _batched_rtransfer(
                R_next, A, B, _KIND_OPS[k])[0]
        for f in range(2):
            r_fused[(f, c)] = _batched_rtransfer(
                R_next, A, B, _FUSED_OPS[f])[0]
        # pairs with o3 at c: close the Z-advanced singles with o3 Z
        if bz_meta:
            codes = []
            envs = []
            for k3 in range(2):
                e = _batched_rtransfer(bz, A, B, _KIND_OPS[k3] @ _Z)
                envs.append(e)
                codes.extend((slot(k3, c) << 8) | m for m in bz_meta)
            r_pair[c] = (np.array(codes, dtype=np.int64),
                         np.concatenate(envs, axis=0))
        # advance the Z-singles through c, then add new singles at u4 = c
        if bz_meta:
            bz = _batched_rtransfer(bz, A, B, _Z)
        new = np.stack([
            _batched_rtransfer(R_next, A, B, _KIND_OPS[k])[0]
            for k in range(2)])
        bz = np.concatenate([bz, new], axis=0) if bz_meta else new
        bz_meta.extend(slot(k, c) for k in range(2))

    # ---- left sweep with combination at each bond ------------------------
    keys_out, vals_out = [], []

    def emit(case, lcodes, lenvs, rcodes, renvs):
        if len(lcodes) == 0 or len(rcodes) == 0:
            return
        V = np.einsum("gab,hab->gh", lenvs, renvs, optimize=True)
        K = _pack(case, np.asarray(lcodes, dtype=np.int64)[:, None],
                  np.asarray(rcodes, dtype=np.int64)[None, :])
        keys_out.append(K.ravel())
        vals_out.append(V.ravel())

    mA0, mB0 = mpsA[0].shape[0], mpsB[0].shape[0]
    b1_meta, b1 = [], np.zeros((0, mA0, mB0))
    b3_meta, b3 = [], np.zeros((0, mA0, mB0))
    b4_meta, b4 = [], np.zeros((0, mA0, mB0))
    b2_meta, b2 = [], np.zeros((0, mA0, mB0))
    b5_meta, b5 = [], np.zeros((0, mA0, mB0))

    for c in range(n):
        A, B = mpsA[c], mpsB[c]
        # ---- combine at bond c (right halves start at site c) ----------
        if r_pair[c] is not None:
            rc, re = r_pair[c]
            emit(_TAG4, b3_meta, b3, rc, re)
        rs_codes = [slot(k, c) for k in range(2)]
        rs_envs = np.stack([r_single[(k, c)] for k in range(2)])
        rf_codes = [slot(f, c) for f in range(2)]
        rf_envs = np.stack([r_fused[(f, c)] for f in range(2)])
        emit(_TAG3A, b2_meta, b2, rs_codes, rs_envs)
        emit(_TAG3B, b5_meta, b5, rs_codes, rs_envs)
        emit(_TAG3C, b3_meta, b3, rf_codes, rf_envs)
        emit(_TAG2, b4_meta, b4, rf_codes, rf_envs)
        # 2-op strings (transition 1-RDM): B1 x Rsingle; same-site N/Nbar
        emit(_TAG1, b1_meta, b1, rs_codes, rs_envs)
        for f in range(2):
            keys_out.append(np.array(
                [_pack(_TAG1, 0, (1 << 16) | slot(f, c))]))
            vals_out.append(np.array(
                [float(np.sum(Lp[c] * r_fused[(f, c)]))]))

        # ---- create new entries consuming site c -----------------------
        Lc = Lp[c][None]
        new_b3, new_b3m = [], []
        new_b2, new_b2m = [], []
        if b1_meta:
            for k2 in range(2):
                new_b3.append(_batched_ltransfer(b1, A, B, _KIND_OPS[k2]))
                new_b3m.extend((m << 8) | slot(k2, c) for m in b1_meta)
            for f in range(2):
                new_b2.append(_batched_ltransfer(b1, A, B,
                                                 _FUSED_OPS[f] @ _Z))
                new_b2m.extend((m << 8) | slot(f, c) for m in b1_meta)
        new_b5, new_b5m = [], []
        if b4_meta:
            for k2 in range(2):
                new_b5.append(_batched_ltransfer(b4, A, B,
                                                 _KIND_OPS[k2] @ _Z))
                new_b5m.extend((m << 8) | slot(k2, c) for m in b4_meta)
        new_b1 = np.stack([
            _batched_ltransfer(Lc, A, B, _KIND_OPS[k] @ _Z)[0]
            for k in range(2)])
        new_b1m = [slot(k, c) for k in range(2)]
        new_b4 = np.stack([
            _batched_ltransfer(Lc, A, B, _FUSED_OPS[f])[0]
            for f in range(2)])
        new_b4m = [slot(f, c) for f in range(2)]

        # ---- advance the old batches through site c ---------------------
        def adv(meta, batch, new_list, new_meta, op):
            parts = []
            if meta:
                parts.append(_batched_ltransfer(batch, A, B, op))
            parts.extend(x for x in new_list if len(x))
            meta = meta + new_meta
            if parts:
                return meta, np.concatenate(parts, axis=0)
            Dr_A, Dr_B = A.shape[2], B.shape[2]
            return meta, np.zeros((0, Dr_A, Dr_B))

        b1_meta, b1 = adv(b1_meta, b1, [new_b1], new_b1m, _Z)
        b4_meta, b4 = adv(b4_meta, b4, [new_b4], new_b4m, None)
        b3_meta, b3 = adv(b3_meta, b3, new_b3, new_b3m, None)
        b2_meta, b2 = adv(b2_meta, b2, new_b2, new_b2m, _Z)
        b5_meta, b5 = adv(b5_meta, b5, new_b5, new_b5m, _Z)

    keys = np.concatenate(keys_out)
    vals = np.concatenate(vals_out)
    order = np.argsort(keys)
    return keys[order], vals[order]


def _lookup(keys_sorted, vals_sorted, query):
    pos = np.searchsorted(keys_sorted, query)
    pos = np.clip(pos, 0, len(keys_sorted) - 1)
    found = keys_sorted[pos] == query
    out = np.where(found, vals_sorted[pos], 0.0)
    return out, found


def mps_transition_rdm12(mpsA, mpsB, norb, method="auto"):
    """Transition 1- and 2-RDMs between two MPSes, conventions matching
    solvers/fci.py (chemist order, spin-summed):
        rdm2[p,q,r,s] = sum_st <A| a+_ps a+_rt a_st a_qs |B>.

    method="sweep": batched cached-environment sweep — every element from
    O(n_sites) batched contractions (the block2-style production path,
    DMRG_EVCont.py:70-85). "sweep-device": the same sweep with the
    batched transfers dispatched to the accelerator
    (solvers/dmrg_trdm_device.py) — the H30-scale path. "strings": the
    O(norb^4)-string oracle. "auto" picks the sweep beyond tiny systems."""
    if method == "auto":
        method = "sweep" if norb > 4 else "strings"
    if method == "strings":
        return mps_transition_rdm12_strings(mpsA, mpsB, norb)

    if method == "sweep-device":
        from .dmrg_trdm_device import _sweep_all_elements_device
        keys, vals = _sweep_all_elements_device(mpsA, mpsB)
    else:
        keys, vals = _sweep_all_elements(mpsA, mpsB)
    return _decode_rdm12(keys, vals, norb)


def mps_transition_rdm12_multi(mpsA, kets, norb, method="auto", chunk=8):
    """Transition 1-/2-RDMs of one bra against MANY kets.

    On the device path the cached-environment sweep is batched over the
    ket axis (solvers/dmrg_trdm_device._sweep_all_elements_device_multi):
    one jitted site-step dispatch serves every ket, so the per-pair
    dispatch overhead AND the small-GEMM underutilization of a single
    m x m sweep are amortized across the training set — this is what an
    active-learning append does (new state vs all stored states,
    DMRG_EVCont.py:70-85). `chunk` bounds the ket batch per sweep (the
    emitted value blocks scale linearly with it in HBM).

    Returns a list of (rdm1, rdm2), one per ket."""
    if method == "auto":
        method = "sweep" if norb > 4 else "strings"
    if method == "strings" or method == "sweep":
        return [mps_transition_rdm12(mpsA, B, norb, method=method)
                for B in kets]
    from .dmrg_trdm_device import _sweep_all_elements_device_multi
    out = []
    for start in range(0, len(kets), chunk):
        group = kets[start:start + chunk]
        keys, vals = _sweep_all_elements_device_multi(mpsA, group)
        out.extend(_decode_rdm12(keys, v, norb) for v in vals)
    return out


def _decode_rdm12(keys, vals, norb):
    """Assemble the spin-summed 1-/2-RDMs from the sorted canonical
    operator-string expectations a sweep returns."""

    def slot_arr(k, u):
        return (k | (u << 1)).astype(np.int64)

    # ---- transition 1-RDM: sum_s <A| a+_{2p+s} a_{2q+s} |B> -------------
    p, q, s = np.meshgrid(np.arange(norb), np.arange(norb), np.arange(2),
                          indexing="ij")
    i = (2 * p + s).ravel()
    j = (2 * q + s).ravel()
    kinds_i = np.zeros_like(i)
    kinds_j = np.ones_like(j)
    same = i == j
    lo_is_i = i < j
    u1 = np.where(lo_is_i, i, j)
    k1 = np.where(lo_is_i, 0, 1)
    u2 = np.where(lo_is_i, j, i)
    k2 = np.where(lo_is_i, 1, 0)
    sign = np.where(lo_is_i | same, 1.0, -1.0)
    key2 = _pack(_TAG1, slot_arr(k1, u1), slot_arr(k2, u2))
    key_same = _pack(_TAG1, np.zeros_like(i),
                     (np.int64(1) << 16) | slot_arr(np.zeros_like(i), i))
    query = np.where(same, key_same, key2)
    v, found = _lookup(keys, vals, query)
    rdm1 = (sign * v).reshape(norb, norb, 2).sum(axis=2)

    # ---- transition 2-RDM ------------------------------------------------
    P, Q, R, S, SA, SB = np.meshgrid(*([np.arange(norb)] * 4),
                                     np.arange(2), np.arange(2),
                                     indexing="ij")
    sh = P.shape
    modes = np.stack([(2 * P + SA).ravel(), (2 * R + SB).ravel(),
                      (2 * S + SB).ravel(), (2 * Q + SA).ravel()], axis=1)
    kinds = np.broadcast_to(np.array([0, 0, 1, 1]), modes.shape)
    # a+a+ / aa with equal modes annihilate
    zero = (modes[:, 0] == modes[:, 1]) | (modes[:, 2] == modes[:, 3])

    order = np.argsort(modes, axis=1, kind="stable")
    srt = np.take_along_axis(modes, order, axis=1)
    knd = np.take_along_axis(kinds, order, axis=1)
    # parity of distinct-site inversions
    inv = np.zeros(len(modes), dtype=np.int64)
    for x in range(4):
        for y in range(x + 1, 4):
            inv += modes[:, x] > modes[:, y]
    sign = np.where(inv % 2 == 0, 1.0, -1.0)

    e01 = srt[:, 0] == srt[:, 1]
    e12 = srt[:, 1] == srt[:, 2]
    e23 = srt[:, 2] == srt[:, 3]
    # three+ coincident sites annihilate (same mode twice in a+ or a pair)
    zero |= (e01 & e12) | (e12 & e23)

    def fused_code(ka, kb):
        """(+,-) -> N (code 0); (-,+) -> Nbar (code 1); like kinds -> -1."""
        return np.where(ka == kb, -1, np.where(ka == 0, 0, 1))

    vals_out = np.zeros(len(modes))
    g4 = ~zero & ~e01 & ~e12 & ~e23
    g3b = ~zero & e01 & ~e12 & ~e23     # fused first
    g3a = ~zero & e12 & ~e01 & ~e23     # fused middle
    g3c = ~zero & e23 & ~e01 & ~e12     # fused last
    g2 = ~zero & e01 & e23

    def seln(mask, cols_l, cols_r, tag, fuse_l=None, fuse_r=None):
        """Assemble keys for a case: cols are (kind_idx, site_idx) slot
        lists for the left/right halves; fuse_* marks slots whose kind is
        a fused code (pairs of sorted positions)."""
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return
        sm, sk = srt[idx], knd[idx]

        def mk(col):
            if isinstance(col, tuple):   # fused from sorted positions
                a, b = col
                f = fused_code(sk[:, a], sk[:, b])
                bad = f < 0
                return np.where(bad, 0, f), sm[:, a], bad
            return sk[:, col], sm[:, col], np.zeros(len(idx), bool)

        left, right = np.int64(0), np.int64(0)
        invalid = np.zeros(len(idx), bool)
        for col in cols_l:
            k, u, bad = mk(col)
            left = (left << 8) | slot_arr(k, u)
            invalid |= bad
        for col in cols_r:
            k, u, bad = mk(col)
            right = (right << 8) | slot_arr(k, u)
            invalid |= bad
        v, found = _lookup(keys, vals, _pack(tag, left, right))
        vals_out[idx] = np.where(invalid, 0.0, v)

    seln(g4, [0, 1], [2, 3], _TAG4)
    seln(g3a, [0, (1, 2)], [3], _TAG3A)
    seln(g3b, [(0, 1), 2], [3], _TAG3B)
    seln(g3c, [0, 1], [(2, 3)], _TAG3C)
    seln(g2, [(0, 1)], [(2, 3)], _TAG2)

    vals_out = np.where(zero, 0.0, sign * vals_out)
    rdm2 = vals_out.reshape(sh).sum(axis=(4, 5))
    return rdm1, rdm2


# ---------------------------------------------------------------------------
# scalable Hamiltonian-MPO construction
# ---------------------------------------------------------------------------
def one_body_mpo(M, cutoff=1e-12):
    """Exact MPO for the spin-orbital one-body operator sum_IJ M[I,J]
    a+_I a_J over the JW chain, built as a finite-state machine with
    complementary operators (bond dim <= 2 + 2 n_right before compression).

    FSM states at bond b: 0 = nothing placed, 1 = done, then for every
    right mode J one "pending a_J" state carrying sum_{I<b} M[I,J] a+_I
    (odd parity: advances with Z), and one "pending a+_I" state carrying
    sum_{J<b} M[I,J] a_J."""
    n = M.shape[0]
    W = []
    for s in range(n):
        right_modes = list(range(s + 1, n))
        nl = 2 + 2 * (n - s)        # incoming states (right modes >= s)
        nr = 2 + 2 * (n - s - 1)    # outgoing states (right modes > s)
        w = np.zeros((nl, nr, 2, 2))

        def iin(state, mode=None):
            # incoming bond: pending lists over modes >= s
            if state == "I":
                return 0
            if state == "done":
                return 1
            if state == "pend_an":   # pending a_mode
                return 2 + (mode - s)
            return 2 + (n - s) + (mode - s)   # pend_cr

        def iout(state, mode=None):
            if state == "I":
                return 0
            if state == "done":
                return 1
            if state == "pend_an":
                return 2 + (mode - s - 1)
            return 2 + (n - s - 1) + (mode - s - 1)

        w[iin("I"), iout("I")] = _I
        w[iin("done"), iout("done")] = _I
        # diagonal term at this site
        if abs(M[s, s]) > 0:
            w[iin("I"), iout("done")] += M[s, s] * _N
        # open a creation here, pending a_J for J > s (weight M[s, J])
        for J in right_modes:
            if abs(M[s, J]) > 0:
                w[iin("I"), iout("pend_an", J)] += M[s, J] * _CR
            if abs(M[J, s]) > 0:
                w[iin("I"), iout("pend_cr", J)] += M[J, s] * _AN
        # close pendings at this site
        w[iin("pend_an", s), iout("done")] = _AN
        w[iin("pend_cr", s), iout("done")] = _CR
        # advance other pendings with the JW parity
        for J in right_modes:
            w[iin("pend_an", J), iout("pend_an", J)] = _Z
            w[iin("pend_cr", J), iout("pend_cr", J)] = _Z
        if s == 0:
            w = w[0:1]
        if s == n - 1:
            w = w[:, 1:2]
        W.append(w)
    return mpo_compress(W, cutoff)


def mpo_multiply(W1, W2, cutoff=1e-12):
    """MPO product W1 @ W2 (W1 applied after W2), SVD-compressed."""
    out = []
    for a, b in zip(W1, W2):
        w = np.einsum("abxy,cdyz->acbdxz", a, b, optimize=True)
        s = w.shape
        out.append(w.reshape(s[0] * s[1], s[2] * s[3], 2, 2))
    return mpo_compress(out, cutoff)


def _tree_sum_mpos(mpos, cutoff):
    """Balanced-tree mpo_add with compression at each level (keeps
    intermediate bond dimensions near the final compressed rank instead of
    the linear-accumulation worst case)."""
    while len(mpos) > 1:
        nxt = []
        for i in range(0, len(mpos) - 1, 2):
            nxt.append(mpo_compress(mpo_add(mpos[i], mpos[i + 1]), cutoff))
        if len(mpos) % 2:
            nxt.append(mpos[-1])
        mpos = nxt
    return mpos[0]


def spin_orbital_one_body(M_spatial):
    """Expand a spatial one-body matrix to the interleaved spin-orbital
    chain (mode 2p + sigma)."""
    norb = M_spatial.shape[0]
    Mso = np.zeros((2 * norb, 2 * norb))
    Mso[0::2, 0::2] = M_spatial
    Mso[1::2, 1::2] = M_spatial
    return Mso


def build_hamiltonian_mpo_fast(h1, eri, cutoff=1e-9, group_thresh=1e-11,
                               batch=16):
    """Grouped Hamiltonian-MPO compilation that scales to tens of
    orbitals: H = sum_pq E_pq (x) G_pq with G_pq the one-body operator
    sum_rs (pq|rs)/2 E_rs, each factor an FSM one-body MPO
    (one_body_mpo), multiplied and summed with balanced-tree SVD
    compression. The E_pq E_rs ordering correction folds into an
    effective one-body term h1' = h1 - 1/2 sum_r (pr|rq).

    Same operator as build_hamiltonian_mpo (tested against it and against
    dense Fock matrices); build cost O(norb^2) group MPOs instead of
    O(norb^4) term MPOs."""
    norb = h1.shape[0]
    h_eff = h1 - 0.5 * np.einsum("prrq->pq", eri)
    groups = [one_body_mpo(spin_orbital_one_body(h_eff), cutoff)]
    for p in range(norb):
        for q in range(norb):
            G = 0.5 * eri[p, q]
            if np.abs(G).max() < group_thresh:
                continue
            Epq = np.zeros((norb, norb))
            Epq[p, q] = 1.0
            W_e = one_body_mpo(spin_orbital_one_body(Epq), cutoff)
            W_g = one_body_mpo(spin_orbital_one_body(G), cutoff)
            groups.append(mpo_multiply(W_e, W_g, cutoff))
    return _tree_sum_mpos(groups, cutoff)
