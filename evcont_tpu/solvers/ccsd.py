"""Spin-orbital CCSD with perturbative triples.

Replaces pyscf.cc.CCSD(+T) used for the reference's coupled-cluster
baselines (scripts/MD/H2O-H3O+/md_H2O-H3O+_CCSD.py, the CCSD/CCSD(T)
columns of 05_Zundel_test_potential_energy.py:182-210).

Standard Stanton-Gauss-Watts-Bartlett equations in the spin-orbital
basis (simple and exact; adequate for the baseline role — these never sit
on the hot path). Antisymmetrized physicist-notation integrals
<pq||rs> = (pr|qs) - (ps|qr); amplitudes converged with DIIS.
"""

from functools import partial

import numpy as np


def _so_order(n, nelec):
    """Spin-orbital permutation putting occupied first (even = alpha,
    odd = beta, spatial orbital p -> spin orbitals 2p, 2p+1)."""
    ns = 2 * n
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = nelec // 2
        na = nelec - nb
    occ = sorted([2 * i for i in range(na)] + [2 * i + 1 for i in range(nb)])
    order = occ + [p for p in range(ns) if p not in occ]
    return order, len(occ)


def spin_orbital_integrals(h1, eri, nelec):
    """Spatial (chemist) -> spin-orbital (antisymmetrized physicist).

    Spin-orbital ordering: even = alpha, odd = beta, orbital p -> 2p, 2p+1.
    Returns (h_so, v_aspq, nocc_so)."""
    n = h1.shape[0]
    ns = 2 * n
    h_so = np.zeros((ns, ns))
    h_so[::2, ::2] = h1
    h_so[1::2, 1::2] = h1
    # physicist <pq|rs> = (pr|qs), spin delta on (p,r) and (q,s)
    phys = np.asarray(eri).transpose(0, 2, 1, 3)
    v = np.zeros((ns, ns, ns, ns))
    for sp in (0, 1):
        for sq in (0, 1):
            v[sp::2, sq::2, sp::2, sq::2] = phys
    v = v - v.transpose(0, 1, 3, 2)
    order, no = _so_order(n, nelec)
    h_so = h_so[np.ix_(order, order)]
    v = v[np.ix_(order, order, order, order)]
    return h_so, v, no


def _hbar_rhs(t1, t2, f, v, jnp=np):
    """Right-hand side of the CCSD amplitude equations (Stanton-Gauss-
    Watts-Bartlett intermediates), with the diagonal-Fock terms moved to
    the denominators: at convergence rhs1 = D1*t1, rhs2 = D2*t2.

    Array-namespace parametric: called with jax.numpy it serves (a) the
    jitted solver iteration and (b) the VJP-based adjoint (Lambda) solve
    and response-density Lagrangian in ccsd_rdm1; with the default numpy
    it stays exact in processes where jax x64 is disabled."""
    no = t1.shape[0]
    o, u = slice(None, no), slice(no, None)

    tau_t = t2 + 0.5 * (jnp.einsum("ia,jb->ijab", t1, t1)
                        - jnp.einsum("ib,ja->ijab", t1, t1))
    tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1) \
        - jnp.einsum("ib,ja->ijab", t1, t1)

    Fae = (f[u, u] - jnp.diag(jnp.diag(f[u, u]))
           - 0.5 * jnp.einsum("me,ma->ae", f[o, u], t1)
           + jnp.einsum("mf,mafe->ae", t1, v[o, u, u, u])
           - 0.5 * jnp.einsum("mnaf,mnef->ae", tau_t, v[o, o, u, u]))
    Fmi = (f[o, o] - jnp.diag(jnp.diag(f[o, o]))
           + 0.5 * jnp.einsum("ie,me->mi", t1, f[o, u])
           + jnp.einsum("ne,mnie->mi", t1, v[o, o, o, u])
           + 0.5 * jnp.einsum("inef,mnef->mi", tau_t, v[o, o, u, u]))
    Fme = f[o, u] + jnp.einsum("nf,mnef->me", t1, v[o, o, u, u])

    Wmnij = (v[o, o, o, o]
             + jnp.einsum("je,mnie->mnij", t1, v[o, o, o, u])
             - jnp.einsum("ie,mnje->mnij", t1, v[o, o, o, u])
             + 0.25 * jnp.einsum("ijef,mnef->mnij", tau, v[o, o, u, u]))
    Wabef = (v[u, u, u, u]
             - jnp.einsum("mb,amef->abef", t1, v[u, o, u, u])
             + jnp.einsum("ma,bmef->abef", t1, v[u, o, u, u])
             + 0.25 * jnp.einsum("mnab,mnef->abef", tau, v[o, o, u, u]))
    Wmbej = (v[o, u, u, o]
             + jnp.einsum("jf,mbef->mbej", t1, v[o, u, u, u])
             - jnp.einsum("nb,mnej->mbej", t1, v[o, o, u, o])
             - jnp.einsum("jnfb,mnef->mbej",
                          0.5 * t2 + jnp.einsum("jf,nb->jnfb", t1, t1),
                          v[o, o, u, u]))

    rhs1 = (f[o, u]
            + jnp.einsum("ie,ae->ia", t1, Fae)
            - jnp.einsum("ma,mi->ia", t1, Fmi)
            + jnp.einsum("imae,me->ia", t2, Fme)
            - jnp.einsum("nf,naif->ia", t1, v[o, u, o, u])
            - 0.5 * jnp.einsum("imef,maef->ia", t2, v[o, u, u, u])
            - 0.5 * jnp.einsum("mnae,nmei->ia", t2, v[o, o, u, o]))

    rhs2 = jnp.array(v[o, o, u, u])  # copy: += below must not alias v
    tmp = jnp.einsum("ijae,be->ijab", t2,
                     Fae - 0.5 * jnp.einsum("mb,me->be", t1, Fme))
    rhs2 += tmp - tmp.transpose(0, 1, 3, 2)
    tmp = jnp.einsum("imab,mj->ijab", t2,
                     Fmi + 0.5 * jnp.einsum("je,me->mj", t1, Fme))
    rhs2 -= tmp - tmp.transpose(1, 0, 2, 3)
    rhs2 += 0.5 * jnp.einsum("mnab,mnij->ijab", tau, Wmnij)
    rhs2 += 0.5 * jnp.einsum("ijef,abef->ijab", tau, Wabef)
    tmp = (jnp.einsum("imae,mbej->ijab", t2, Wmbej)
           - jnp.einsum("ie,ma,mbej->ijab", t1, t1, v[o, u, u, o]))
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    rhs2 += tmp
    tmp = jnp.einsum("ie,abej->ijab", t1, v[u, u, u, o])
    rhs2 += tmp - tmp.transpose(1, 0, 2, 3)
    tmp = jnp.einsum("ma,mbij->ijab", t1, v[o, u, o, o])
    rhs2 -= tmp - tmp.transpose(0, 1, 3, 2)

    return rhs1, rhs2


_HBAR_RHS_JIT = None


def _hbar_rhs_jit():
    """Jitted f64 rhs when jax x64 is on; plain numpy otherwise (jnp
    would silently downcast the f64 amplitudes to f32)."""
    import jax

    if not jax.config.jax_enable_x64:
        return _hbar_rhs
    global _HBAR_RHS_JIT
    if _HBAR_RHS_JIT is None:
        import jax.numpy as jnp
        _HBAR_RHS_JIT = jax.jit(partial(_hbar_rhs, jnp=jnp))
    return _HBAR_RHS_JIT


def ccsd(h1, eri, nelec, max_cycle=100, conv_tol=1e-9, diis_size=8,
         with_triples=False):
    """CCSD (optionally +T) correlation energy on top of the HF reference
    defined by the first nelec spin orbitals of the given orbital basis
    (pass integrals in the canonical MO basis).

    Returns (e_corr, (t1, t2)) or (e_corr, e_triples, (t1, t2))."""
    h, v, no = spin_orbital_integrals(h1, eri, nelec)
    ns = h.shape[0]
    nv = ns - no
    o, u = slice(None, no), slice(no, None)

    # Fock matrix of the reference determinant
    f = h + np.einsum("piqi->pq", v[:, o, :, o])
    fo, fv = np.diag(f)[o], np.diag(f)[u]
    D1 = fo[:, None] - fv[None, :]
    D2 = (fo[:, None, None, None] + fo[None, :, None, None]
          - fv[None, None, :, None] - fv[None, None, None, :])

    t1 = f[o, u] / D1
    t2 = v[o, o, u, u] / D2

    def energy(t1, t2):
        tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
            - np.einsum("ib,ja->ijab", t1, t1)
        return (np.einsum("ia,ia->", f[o, u], t1)
                + 0.25 * np.einsum("ijab,ijab->", v[o, o, u, u], tau))

    diis_t, diis_e = [], []
    e_old = 0.0
    rhs_fn = _hbar_rhs_jit()
    for it in range(max_cycle):
        rhs1, rhs2 = rhs_fn(t1, t2, f, v)
        t1_new = np.array(rhs1) / D1
        t2_new = np.array(rhs2) / D2

        # DIIS on stacked amplitudes
        vec = np.concatenate([t1_new.ravel(), t2_new.ravel()])
        err = np.concatenate([(t1_new - t1).ravel(), (t2_new - t2).ravel()])
        diis_t.append(vec)
        diis_e.append(err)
        if len(diis_t) > diis_size:
            diis_t.pop(0)
            diis_e.pop(0)
        if len(diis_t) > 1:
            m = len(diis_t)
            B = -np.ones((m + 1, m + 1))
            B[-1, -1] = 0.0
            for i in range(m):
                for j in range(m):
                    B[i, j] = diis_e[i] @ diis_e[j]
            rhs = np.zeros(m + 1)
            rhs[-1] = -1.0
            try:
                w = np.linalg.solve(B, rhs)[:m]
                vec = sum(wi * ti for wi, ti in zip(w, diis_t))
            except np.linalg.LinAlgError:
                pass
        t1 = vec[:no * nv].reshape(no, nv)
        t2 = vec[no * nv:].reshape(no, no, nv, nv)

        e = energy(t1, t2)
        if abs(e - e_old) < conv_tol:
            break
        e_old = e

    e_corr = float(energy(t1, t2))
    if not with_triples:
        return e_corr, (t1, t2)

    e_t = perturbative_triples_so(t1, t2, f, v, no)
    return e_corr, e_t, (t1, t2)


def _triples_body(t1, t2, f, v, no, jnp=np):
    """(T) energy body: standard disconnected + connected triples
    (Crawford-Schaefer conventions). Array-namespace parametric; with
    jax.numpy the permutation adds over the O(n^6) tensors fuse in XLA
    instead of materializing strided numpy temporaries (measured 527 s
    -> far less per Zundel point on this host)."""
    fo, fv = jnp.diag(f)[:no], jnp.diag(f)[no:]
    o, u = slice(None, no), slice(no, None)
    ein = partial(jnp.einsum, optimize=True) if jnp is np else jnp.einsum
    D3 = (fo[:, None, None, None, None, None]
          + fo[None, :, None, None, None, None]
          + fo[None, None, :, None, None, None]
          - fv[None, None, None, :, None, None]
          - fv[None, None, None, None, :, None]
          - fv[None, None, None, None, None, :])

    # connected triples: P(i/jk) P(a/bc) antisymmetrization of the
    # generator terms
    g = (ein("jkae,eibc->ijkabc", t2, v[u, o, u, u])
         - ein("imbc,majk->ijkabc", t2, v[o, u, o, o]))
    # P(i/jk): 1 - (i<->j) - (i<->k); P(a/bc): 1 - (a<->b) - (a<->c)
    g = (g - g.transpose(1, 0, 2, 3, 4, 5) - g.transpose(2, 1, 0, 3, 4, 5))
    g = (g - g.transpose(0, 1, 2, 4, 3, 5) - g.transpose(0, 1, 2, 5, 4, 3))

    # disconnected triples
    d = ein("ia,jkbc->ijkabc", t1, v[o, o, u, u])
    d = (d - d.transpose(1, 0, 2, 3, 4, 5) - d.transpose(2, 1, 0, 3, 4, 5))
    d = (d - d.transpose(0, 1, 2, 4, 3, 5) - d.transpose(0, 1, 2, 5, 4, 3))

    # E(T) = sum (t3c * D3)(t3c + t3d)/36 with t3 = {g,d}/D3, folded so
    # no extra O(n^6) temporaries materialize
    return jnp.sum(g * (g + d) / D3) / 36.0


_TRIPLES_JIT = {}


def perturbative_triples_so(t1, t2, f, v, no):
    """Perturbative (T) correction from converged spin-orbital
    amplitudes. Shared by the spin-orbital solver and by ccsd_rhf (which
    embeds its spatial amplitudes, _embed_so). Uses a jitted XLA-CPU body
    when jax x64 is on (same dispatch rule as _hbar_rhs_jit)."""
    import jax

    if not jax.config.jax_enable_x64:
        return float(_triples_body(t1, t2, f, v, no))
    if no not in _TRIPLES_JIT:
        import jax.numpy as jnp
        _TRIPLES_JIT[no] = jax.jit(
            partial(_triples_body, jnp=jnp), static_argnums=4)
    return float(_TRIPLES_JIT[no](t1, t2, f, v, no))


def _residual_so(t1, t2, h, v, jnp=np):
    """Full CCSD amplitude residual R(t; h, v) (vanishes at convergence),
    with the Fock matrix and denominators rebuilt from h so the residual
    is differentiable w.r.t. the one-electron integrals."""
    no = t1.shape[0]
    o = slice(None, no)
    f = h + jnp.einsum("piqi->pq", v[:, o, :, o])
    fo, fv = jnp.diag(f)[:no], jnp.diag(f)[no:]
    D1 = fo[:, None] - fv[None, :]
    D2 = (fo[:, None, None, None] + fo[None, :, None, None]
          - fv[None, None, :, None] - fv[None, None, None, :])
    rhs1, rhs2 = _hbar_rhs(t1, t2, f, v, jnp=jnp)
    return rhs1 - D1 * t1, rhs2 - D2 * t2


def _e_total_so(t1, t2, h, v, jnp=np):
    """Total electronic energy (HF reference + CCSD correlation) as a
    function of the spin-orbital integrals."""
    no = t1.shape[0]
    o, u = slice(None, no), slice(no, None)
    f = h + jnp.einsum("piqi->pq", v[:, o, :, o])
    e_ref = jnp.sum(jnp.diag(h)[:no]) \
        + 0.5 * jnp.einsum("ijij->", v[o, o, o, o])
    tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1) \
        - jnp.einsum("ib,ja->ijab", t1, t1)
    return (e_ref + jnp.einsum("ia,ia->", f[o, u], t1)
            + 0.25 * jnp.einsum("ijab,ijab->", v[o, o, u, u], tau))


def ccsd_rdm1(h1, eri, nelec, amplitudes=None, max_cycle=100,
              conv_tol=1e-8, diis_size=8):
    """Unrelaxed CCSD response one-particle density in the (spatial)
    orbital basis of the input integrals (pyscf cc.ccsd.make_rdm1 parity,
    used by the reference's trajectory observable evaluators, e.g.
    evaluate_dipole_moment_charges_CCSD_final_continuation_trajectory.py:61-66).

    Instead of hand-coded Lambda equations, the adjoint system
        lambda^T (dR/dt) = -dE/dt
    is solved with autodiff VJPs of the amplitude residual (quasi-Newton
    iteration preconditioned by the Moller-Plesset denominators + DIIS),
    and the density is the gradient of the CC Lagrangian
        L(h) = E(t, h) + <lambda, R(t, h)>
    w.r.t. the one-electron integrals — mathematically identical to the
    textbook Lambda-equation density, with zero rederivation risk.

    Returns (rdm1_spatial, e_total_electronic). rdm1 is symmetrized; its
    trace equals nelec. Requires jax x64 (raises otherwise)."""
    import jax
    import jax.numpy as jnp

    if not jax.config.jax_enable_x64:
        raise RuntimeError("ccsd_rdm1 requires jax_enable_x64")

    h1 = np.asarray(h1, dtype=float)
    n = h1.shape[0]
    h, v, no = spin_orbital_integrals(h1, eri, nelec)
    if amplitudes is None:
        _, amplitudes = ccsd(h1, eri, nelec, max_cycle=max_cycle,
                             conv_tol=conv_tol, diis_size=diis_size)
    t1, t2 = (jnp.asarray(a) for a in amplitudes)
    h_j, v_j = jnp.asarray(h), jnp.asarray(v)

    # Moller-Plesset denominators for preconditioning the adjoint solve
    f = h + np.einsum("piqi->pq", v[:, :no, :, :no])
    fo, fv = np.diag(f)[:no], np.diag(f)[no:]
    D1 = fo[:, None] - fv[None, :]
    D2 = (fo[:, None, None, None] + fo[None, :, None, None]
          - fv[None, None, :, None] - fv[None, None, None, :])

    def R_fn(tt):
        return _residual_so(tt[0], tt[1], h_j, v_j, jnp=jnp)

    def E_fn(tt):
        return _e_total_so(tt[0], tt[1], h_j, v_j, jnp=jnp)

    gE = jax.grad(E_fn)((t1, t2))
    _, vjp = jax.vjp(R_fn, (t1, t2))
    vjp = jax.jit(vjp)
    gE1, gE2 = np.array(gE[0]), np.array(gE[1])

    l1, l2 = np.zeros_like(gE1), np.zeros_like(gE2)
    diis_t, diis_e = [], []
    for it in range(max_cycle):
        w = vjp((jnp.asarray(l1), jnp.asarray(l2)))[0]
        r1 = gE1 + np.array(w[0])            # adjoint residual
        r2 = gE2 + np.array(w[1])
        if max(np.abs(r1).max(), np.abs(r2).max()) < conv_tol:
            break
        l1_new = l1 + r1 / D1
        l2_new = l2 + r2 / D2
        vec = np.concatenate([l1_new.ravel(), l2_new.ravel()])
        err = np.concatenate([(r1 / D1).ravel(), (r2 / D2).ravel()])
        diis_t.append(vec)
        diis_e.append(err)
        if len(diis_t) > diis_size:
            diis_t.pop(0)
            diis_e.pop(0)
        if len(diis_t) > 1:
            m = len(diis_t)
            B = -np.ones((m + 1, m + 1))
            B[-1, -1] = 0.0
            for i in range(m):
                for j in range(m):
                    B[i, j] = diis_e[i] @ diis_e[j]
            rhs = np.zeros(m + 1)
            rhs[-1] = -1.0
            try:
                wts = np.linalg.solve(B, rhs)[:m]
                vec = sum(wi * ti for wi, ti in zip(wts, diis_t))
            except np.linalg.LinAlgError:
                pass
        l1 = vec[:l1.size].reshape(l1.shape)
        l2 = vec[l1.size:].reshape(l2.shape)
    else:
        raise RuntimeError("CCSD adjoint (Lambda) solve did not converge")

    l1_j, l2_j = jnp.asarray(l1), jnp.asarray(l2)

    def lagrangian(hh):
        r1_, r2_ = _residual_so(t1, t2, hh, v_j, jnp=jnp)
        return (_e_total_so(t1, t2, hh, v_j, jnp=jnp)
                + jnp.sum(l1_j * r1_) + jnp.sum(l2_j * r2_))

    e_tot = float(_e_total_so(t1, t2, h_j, v_j, jnp=jnp))
    D_so = np.array(jax.grad(lagrangian)(h_j))
    D_so = 0.5 * (D_so + D_so.T)

    # undo the occupied-first permutation, fold spin blocks to spatial
    order, _ = _so_order(n, nelec)
    inv = np.argsort(order)
    D_so = D_so[np.ix_(inv, inv)]
    return D_so[::2, ::2] + D_so[1::2, 1::2], e_tot
