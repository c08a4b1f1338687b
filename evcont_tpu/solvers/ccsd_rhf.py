"""Closed-shell (spin-adapted) CCSD with perturbative triples.

Same role as solvers/ccsd.py (the reference's CCSD/CCSD(T) baseline
columns — scripts/MD/H2O-H3O+/md_H2O-H3O+_CCSD.py and the CCSD(T)
comparison of 05_Zundel_test_potential_energy.py:182-210) but exploiting
spin symmetry of an RHF reference: amplitudes are stored as the spatial
abab blocks T1[i,a], T2[i,j,a,b] (T2[i,j,a,b] = T2[j,i,b,a]), cutting
the iteration flops ~16x and memory ~16x vs the spin-orbital solver —
the difference between ~15 min and ~1 min per Zundel training point on
this host.

Equations are the standard spin-adapted RHF-CCSD right-hand sides
(Hirata-style intermediates, physicist-notation spatial integrals
<pq|rs> and the spin-summed combinations L = 2<pq|rs> - <pq|sr>).
Correctness is pinned term-exactly against the spin-orbital solver:
tests/test_ccsd_rhf.py embeds random spatial amplitudes into the
spin-orbital layout and requires the abab block of the spin-orbital rhs
to match this module's rhs at non-converged amplitudes (an oracle far
stronger than comparing converged energies).

The (T) correction reuses solvers/ccsd.perturbative_triples_so on the
embedded spin-orbital amplitudes — a one-time O(n^7) evaluation that is
not the bottleneck at these system sizes.
"""

from functools import partial

import numpy as np

from .ccsd import perturbative_triples_so, spin_orbital_integrals


def _rhs_rhf(t1, t2, f, V, jnp=np):
    """Spin-adapted CCSD right-hand sides: at convergence
    rhs1 = D1*t1 and rhs2 = D2*t2 (diagonal-Fock terms moved to the
    denominators, matching solvers/ccsd._hbar_rhs conventions).

    V is the full spatial integral tensor in physicist notation
    <pq|rs>; t1 (no,nv), t2 (no,no,nv,nv) are the abab spatial blocks.
    Array-namespace parametric (numpy or jax.numpy) like _hbar_rhs."""
    no = t1.shape[0]
    o, u = slice(None, no), slice(no, None)
    ein = partial(jnp.einsum, optimize=True) if jnp is np else jnp.einsum

    Voovv = V[o, o, u, u]
    Loovv = 2.0 * Voovv - Voovv.transpose(0, 1, 3, 2)
    Vooov = V[o, o, o, u]
    Looov = 2.0 * Vooov - Vooov.transpose(1, 0, 2, 3)
    Vovvv = V[o, u, u, u]
    Lovvv = 2.0 * Vovvv - Vovvv.transpose(0, 1, 3, 2)

    tau_t = t2 + 0.5 * ein("ia,jb->ijab", t1, t1)
    tau = t2 + ein("ia,jb->ijab", t1, t1)

    Fae = (f[u, u] - jnp.diag(jnp.diag(f[u, u]))
           - 0.5 * ein("me,ma->ae", f[o, u], t1)
           + ein("mf,mafe->ae", t1, Lovvv)
           - ein("mnaf,mnef->ae", tau_t, Loovv))
    Fmi = (f[o, o] - jnp.diag(jnp.diag(f[o, o]))
           + 0.5 * ein("ie,me->mi", t1, f[o, u])
           + ein("ne,mnie->mi", t1, Looov)
           + ein("inef,mnef->mi", tau_t, Loovv))
    Fme = f[o, u] + ein("nf,mnef->me", t1, Loovv)

    Wmnij = (V[o, o, o, o]
             + ein("je,mnie->mnij", t1, Vooov)
             + ein("ie,mnej->mnij", t1, V[o, o, u, o])
             + ein("ijef,mnef->mnij", tau, Voovv))
    t2f = 0.5 * t2 + ein("jf,nb->jnfb", t1, t1)
    Wmbej = (V[o, u, u, o]
             + ein("jf,mbef->mbej", t1, Vovvv)
             - ein("nb,mnej->mbej", t1, V[o, o, u, o])
             - ein("jnfb,mnef->mbej", t2f, Voovv)
             + 0.5 * ein("njfb,mnef->mbej", t2, Loovv))
    Wmbje = (-V[o, u, o, u]
             - ein("jf,mbfe->mbje", t1, Vovvv)
             + ein("nb,mnje->mbje", t1, Vooov)
             + ein("jnfb,mnfe->mbje", t2f, Voovv))
    Zmbij = ein("mbef,ijef->mbij", Vovvv, tau)

    t2s = 2.0 * t2 - t2.transpose(0, 1, 3, 2)
    rhs1 = (f[o, u]
            + ein("ie,ae->ia", t1, Fae)
            - ein("ma,mi->ia", t1, Fmi)
            + ein("imae,me->ia", t2s, Fme)
            + 2.0 * ein("nf,nafi->ia", t1, V[o, u, u, o])
            - ein("nf,naif->ia", t1, V[o, u, o, u])
            + ein("imef,mafe->ia", t2s, Vovvv)
            - 2.0 * ein("mnae,nmei->ia", t2, V[o, o, u, o])
            + ein("mnae,mnei->ia", t2, V[o, o, u, o]))

    def p_ab_ij(x):
        return x + x.transpose(1, 0, 3, 2)

    rhs2 = jnp.array(Voovv)  # copy: += below must not alias V
    Fae_m = Fae - 0.5 * ein("mb,me->be", t1, Fme)
    rhs2 = rhs2 + p_ab_ij(ein("ijae,be->ijab", t2, Fae_m))
    Fmi_m = Fmi + 0.5 * ein("je,me->mj", t1, Fme)
    rhs2 = rhs2 - p_ab_ij(ein("imab,mj->ijab", t2, Fmi_m))
    rhs2 = rhs2 + ein("mnab,mnij->ijab", tau, Wmnij)
    rhs2 = rhs2 + ein("ijef,abef->ijab", tau, V[u, u, u, u])
    rhs2 = rhs2 - p_ab_ij(ein("ma,mbij->ijab", t1, Zmbij))
    rhs2 = rhs2 + p_ab_ij(
        ein("imae,mbej->ijab", t2 - t2.transpose(0, 1, 3, 2), Wmbej))
    rhs2 = rhs2 + p_ab_ij(ein("imae,mbej->ijab", t2, Wmbej)
                          + ein("imae,mbje->ijab", t2, Wmbje))
    rhs2 = rhs2 + p_ab_ij(ein("mjae,mbie->ijab", t2, Wmbje))
    rhs2 = rhs2 - p_ab_ij(
        ein("ie,ma,mbej->ijab", t1, t1, V[o, u, u, o]))
    rhs2 = rhs2 - p_ab_ij(
        ein("ie,mb,maje->ijab", t1, t1, V[o, u, o, u]))
    rhs2 = rhs2 + p_ab_ij(ein("ie,abej->ijab", t1, V[u, u, u, o]))
    rhs2 = rhs2 - p_ab_ij(ein("ma,mbij->ijab", t1, V[o, u, o, o]))
    return rhs1, rhs2


def rhf_corr_energy(t1, t2, f, V, jnp=np):
    """Spin-adapted CCSD correlation energy
    E = 2 f_ia t1_ia + sum (t2 + t1 t1)(2<ij|ab> - <ij|ba>)."""
    no = t1.shape[0]
    o, u = slice(None, no), slice(no, None)
    Voovv = V[o, o, u, u]
    L = 2.0 * Voovv - Voovv.transpose(0, 1, 3, 2)
    tau = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
    return (2.0 * jnp.einsum("ia,ia->", f[o, u], t1)
            + jnp.einsum("ijab,ijab->", tau, L))


def _embed_so(t1, t2):
    """Spatial abab amplitudes -> spin-orbital amplitudes in the
    occupied-first, even=alpha/odd=beta layout of solvers/ccsd (for a
    closed-shell reference the _so_order permutation is the identity)."""
    t1 = np.asarray(t1)
    t2 = np.asarray(t2)
    no, nv = t1.shape
    t1_so = np.zeros((2 * no, 2 * nv))
    t1_so[::2, ::2] = t1
    t1_so[1::2, 1::2] = t1
    t2_so = np.zeros((2 * no, 2 * no, 2 * nv, 2 * nv))
    t2x = t2.transpose(0, 1, 3, 2)
    t2_so[::2, 1::2, ::2, 1::2] = t2           # abab
    t2_so[1::2, ::2, 1::2, ::2] = t2           # baba
    t2_so[::2, 1::2, 1::2, ::2] = -t2x         # abba
    t2_so[1::2, ::2, ::2, 1::2] = -t2x         # baab
    aa = t2 - t2x
    t2_so[::2, ::2, ::2, ::2] = aa             # aaaa
    t2_so[1::2, 1::2, 1::2, 1::2] = aa         # bbbb
    return t1_so, t2_so


_RHS_RHF_JIT = None


def _rhs_rhf_jit():
    """Jitted f64 rhs when jax x64 is on; plain numpy otherwise (same
    dispatch rule as solvers/ccsd._hbar_rhs_jit)."""
    import jax

    if not jax.config.jax_enable_x64:
        return _rhs_rhf
    global _RHS_RHF_JIT
    if _RHS_RHF_JIT is None:
        import jax.numpy as jnp
        _RHS_RHF_JIT = jax.jit(partial(_rhs_rhf, jnp=jnp))
    return _RHS_RHF_JIT


class _Diis:
    """Pulay DIIS over stacked flat amplitude vectors."""

    def __init__(self, size=8):
        self.size = size
        self.vecs, self.errs = [], []

    def extrapolate(self, vec, err):
        self.vecs.append(vec)
        self.errs.append(err)
        if len(self.vecs) > self.size:
            self.vecs.pop(0)
            self.errs.pop(0)
        if len(self.vecs) < 2:
            return vec
        m = len(self.vecs)
        B = -np.ones((m + 1, m + 1))
        B[-1, -1] = 0.0
        for i in range(m):
            for j in range(m):
                B[i, j] = self.errs[i] @ self.errs[j]
        rhs = np.zeros(m + 1)
        rhs[-1] = -1.0
        try:
            w = np.linalg.solve(B, rhs)[:m]
        except np.linalg.LinAlgError:
            return vec
        return sum(wi * ti for wi, ti in zip(w, self.vecs))


def ccsd_rhf(h1, eri, nelec, max_cycle=100, conv_tol=1e-9, diis_size=8,
             with_triples=False):
    """Closed-shell CCSD (optionally +T) on top of the RHF reference
    defined by the first nelec//2 spatial orbitals of the given basis
    (pass integrals in the canonical MO basis; nelec must be even).

    Drop-in replacement for solvers/ccsd.ccsd on closed-shell systems:
    returns (e_corr, (t1, t2)) or (e_corr, e_triples, (t1, t2)) with the
    amplitudes in the SPATIAL abab layout (use _embed_so for the
    spin-orbital view)."""
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
        if na != nb:
            raise ValueError("ccsd_rhf requires a closed-shell reference")
        nelec = na + nb
    if nelec % 2:
        raise ValueError("ccsd_rhf requires an even electron count")
    no = nelec // 2
    n = h1.shape[0]
    nv = n - no
    o, u = slice(None, no), slice(no, None)

    h1 = np.asarray(h1, dtype=float)
    V = np.ascontiguousarray(
        np.asarray(eri, dtype=float).transpose(0, 2, 1, 3))  # <pq|rs>
    # closed-shell Fock: f = h + 2J - K over the doubly-occupied space
    f = (h1 + 2.0 * np.einsum("piqi->pq", V[:, o, :, o], optimize=True)
         - np.einsum("piiq->pq", V[:, o, o, :], optimize=True))

    fo, fv = np.diag(f)[o], np.diag(f)[u]
    D1 = fo[:, None] - fv[None, :]
    D2 = (fo[:, None, None, None] + fo[None, :, None, None]
          - fv[None, None, :, None] - fv[None, None, None, :])

    t1 = f[o, u] / D1
    t2 = V[o, o, u, u] / D2

    rhs_fn = _rhs_rhf_jit()
    diis = _Diis(diis_size)
    e_old = 0.0
    for _ in range(max_cycle):
        rhs1, rhs2 = rhs_fn(t1, t2, f, V)
        t1_new = np.array(rhs1) / D1
        t2_new = np.array(rhs2) / D2
        vec = diis.extrapolate(
            np.concatenate([t1_new.ravel(), t2_new.ravel()]),
            np.concatenate([(t1_new - t1).ravel(),
                            (t2_new - t2).ravel()]))
        t1 = vec[:no * nv].reshape(no, nv)
        t2 = vec[no * nv:].reshape(no, no, nv, nv)
        e = rhf_corr_energy(t1, t2, f, V)
        if abs(e - e_old) < conv_tol:
            break
        e_old = e

    e_corr = float(rhf_corr_energy(t1, t2, f, V))
    if not with_triples:
        return e_corr, (t1, t2)

    # (T) on the embedded spin-orbital amplitudes — a single O(n^7)
    # evaluation, exact and shared with the spin-orbital solver
    h_so, v_so, no_so = spin_orbital_integrals(h1, eri, nelec)
    f_so = h_so + np.einsum("piqi->pq", v_so[:, :no_so, :, :no_so],
                            optimize=True)
    t1_so, t2_so = _embed_so(t1, t2)
    e_t = perturbative_triples_so(t1_so, t2_so, f_so, v_so, no_so)
    return e_corr, e_t, (t1, t2)
