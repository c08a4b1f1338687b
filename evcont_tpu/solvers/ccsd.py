"""Spin-orbital CCSD with perturbative triples.

Replaces pyscf.cc.CCSD(+T) used for the reference's coupled-cluster
baselines (scripts/MD/H2O-H3O+/md_H2O-H3O+_CCSD.py, the CCSD/CCSD(T)
columns of 05_Zundel_test_potential_energy.py:182-210).

Standard Stanton-Gauss-Watts-Bartlett equations in the spin-orbital
basis (simple and exact; adequate for the baseline role — these never sit
on the hot path). Antisymmetrized physicist-notation integrals
<pq||rs> = (pr|qs) - (ps|qr); amplitudes converged with DIIS.
"""

import numpy as np


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
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = nelec // 2
        na = nelec - nb
    # occupied spin orbitals: alpha of first na, beta of first nb orbitals
    occ = sorted([2 * i for i in range(na)] + [2 * i + 1 for i in range(nb)])
    order = occ + [p for p in range(ns) if p not in occ]
    h_so = h_so[np.ix_(order, order)]
    v = v[np.ix_(order, order, order, order)]
    return h_so, v, len(occ)


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
    for it in range(max_cycle):
        tau_t = t2 + 0.5 * (np.einsum("ia,jb->ijab", t1, t1)
                            - np.einsum("ib,ja->ijab", t1, t1))
        tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
            - np.einsum("ib,ja->ijab", t1, t1)

        Fae = (f[u, u] - np.diag(np.diag(f[u, u]))
               - 0.5 * np.einsum("me,ma->ae", f[o, u], t1)
               + np.einsum("mf,mafe->ae", t1, v[o, u, u, u])
               - 0.5 * np.einsum("mnaf,mnef->ae", tau_t, v[o, o, u, u]))
        Fmi = (f[o, o] - np.diag(np.diag(f[o, o]))
               + 0.5 * np.einsum("ie,me->mi", t1, f[o, u])
               + np.einsum("ne,mnie->mi", t1, v[o, o, o, u])
               + 0.5 * np.einsum("inef,mnef->mi", tau_t, v[o, o, u, u]))
        Fme = f[o, u] + np.einsum("nf,mnef->me", t1, v[o, o, u, u])

        Wmnij = (v[o, o, o, o]
                 + np.einsum("je,mnie->mnij", t1, v[o, o, o, u])
                 - np.einsum("ie,mnje->mnij", t1, v[o, o, o, u])
                 + 0.25 * np.einsum("ijef,mnef->mnij", tau, v[o, o, u, u]))
        Wabef = (v[u, u, u, u]
                 - np.einsum("mb,amef->abef", t1, v[u, o, u, u])
                 + np.einsum("ma,bmef->abef", t1, v[u, o, u, u])
                 + 0.25 * np.einsum("mnab,mnef->abef", tau, v[o, o, u, u]))
        Wmbej = (v[o, u, u, o]
                 + np.einsum("jf,mbef->mbej", t1, v[o, u, u, u])
                 - np.einsum("nb,mnej->mbej", t1, v[o, o, u, o])
                 - np.einsum("jnfb,mnef->mbej",
                             0.5 * t2 + np.einsum("jf,nb->jnfb", t1, t1),
                             v[o, o, u, u]))

        # T1 equations
        rhs1 = (f[o, u]
                + np.einsum("ie,ae->ia", t1, Fae)
                - np.einsum("ma,mi->ia", t1, Fmi)
                + np.einsum("imae,me->ia", t2, Fme)
                - np.einsum("nf,naif->ia", t1, v[o, u, o, u])
                - 0.5 * np.einsum("imef,maef->ia", t2, v[o, u, u, u])
                - 0.5 * np.einsum("mnae,nmei->ia", t2, v[o, o, u, o]))
        t1_new = rhs1 / D1

        # T2 equations
        rhs2 = v[o, o, u, u].copy()
        tmp = np.einsum("ijae,be->ijab", t2,
                        Fae - 0.5 * np.einsum("mb,me->be", t1, Fme))
        rhs2 += tmp - tmp.transpose(0, 1, 3, 2)
        tmp = np.einsum("imab,mj->ijab", t2,
                        Fmi + 0.5 * np.einsum("je,me->mj", t1, Fme))
        rhs2 -= tmp - tmp.transpose(1, 0, 2, 3)
        rhs2 += 0.5 * np.einsum("mnab,mnij->ijab", tau, Wmnij)
        rhs2 += 0.5 * np.einsum("ijef,abef->ijab", tau, Wabef)
        tmp = (np.einsum("imae,mbej->ijab", t2, Wmbej)
               - np.einsum("ie,ma,mbej->ijab", t1, t1, v[o, u, u, o]))
        tmp = tmp - tmp.transpose(0, 1, 3, 2)
        tmp = tmp - tmp.transpose(1, 0, 2, 3)
        rhs2 += tmp
        tmp = np.einsum("ie,abej->ijab", t1, v[u, u, u, o])
        rhs2 += tmp - tmp.transpose(1, 0, 2, 3)
        tmp = np.einsum("ma,mbij->ijab", t1, v[o, u, o, o])
        rhs2 -= tmp - tmp.transpose(0, 1, 3, 2)
        t2_new = rhs2 / D2

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

    # perturbative (T): standard disconnected + connected triples
    D3 = (fo[:, None, None, None, None, None]
          + fo[None, :, None, None, None, None]
          + fo[None, None, :, None, None, None]
          - fv[None, None, None, :, None, None]
          - fv[None, None, None, None, :, None]
          - fv[None, None, None, None, None, :])

    # connected triples: P(i/jk) P(a/bc) antisymmetrization of the
    # generator terms (Crawford-Schaefer conventions)
    g = (np.einsum("jkae,eibc->ijkabc", t2, v[u, o, u, u])
         - np.einsum("imbc,majk->ijkabc", t2, v[o, u, o, o]))
    # P(i/jk): 1 - (i<->j) - (i<->k); P(a/bc): 1 - (a<->b) - (a<->c)
    g = (g - g.transpose(1, 0, 2, 3, 4, 5) - g.transpose(2, 1, 0, 3, 4, 5))
    g = (g - g.transpose(0, 1, 2, 4, 3, 5) - g.transpose(0, 1, 2, 5, 4, 3))
    t3c = g / D3

    # disconnected triples
    d = np.einsum("ia,jkbc->ijkabc", t1, v[o, o, u, u])
    d = (d - d.transpose(1, 0, 2, 3, 4, 5) - d.transpose(2, 1, 0, 3, 4, 5))
    d = (d - d.transpose(0, 1, 2, 4, 3, 5) - d.transpose(0, 1, 2, 5, 4, 3))
    t3d = d / D3

    e_t = float(np.einsum("ijkabc,ijkabc->", t3c * D3, t3c + t3d) / 36.0)
    return e_corr, e_t, (t1, t2)
