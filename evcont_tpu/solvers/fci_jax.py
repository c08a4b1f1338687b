"""Device-side FCI sigma build (JAX).

The SURVEY build plan's stretch goal: move the direct-CI contraction onto
the TPU. The sigma operator factors into
  (1) excitation expansion   D[pq] = E_pq C          (gather + scatter-add)
  (2) integral contraction   G = (pq|rs) . D         (one big GEMM -> MXU)
  (3) excitation contraction sigma += E . G          (gather + scatter-add)
with all link tables static — exactly the shapes the TPU wants. The
Davidson loop stays on host, calling the jitted sigma.

Precision note: on TPU this runs in f32 (x64 is emulated prohibitively
slowly through this environment's compile path), bounding Davidson
residuals around 1e-6; the host f64 path (solvers/fci.py, C++ kernels)
remains the exactness reference. On CPU with x64 enabled this kernel is
exact and doubles as an independent implementation check.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .fci import gather_link_tables, make_strings


def _flat_links(norb, nelec):
    """Flattened link table: per link l, (pq[l], src[l], tgt[l], sign[l])."""
    row_ptr, pq, src, sign = gather_link_tables(norb, nelec)
    counts = np.diff(row_ptr)
    tgt = np.repeat(np.arange(len(counts)), counts)
    return pq.astype(np.int32), src.astype(np.int32), \
        tgt.astype(np.int32), sign


def make_sigma_jax(norb, nelec):
    """Build a jitted sigma(C, h1, eri) for the given CI space.

    Returns (sigma_fn, (Na, Nb))."""
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = nelec // 2
        na = nelec - nb
    Na = len(make_strings(norb, na))
    Nb = len(make_strings(norb, nb))
    pq_a, src_a, tgt_a, sign_a = _flat_links(norb, na)
    if nb == na:
        pq_b, src_b, tgt_b, sign_b = pq_a, src_a, tgt_a, sign_a
    else:
        pq_b, src_b, tgt_b, sign_b = _flat_links(norb, nb)
    n2 = norb * norb

    def expand(C):
        """D[pq, Ia, Ib] = (E_pq C), alpha + beta parts."""
        # alpha: row operations on C
        vals_a = sign_a[:, None] * C[src_a]              # (La, Nb)
        flat_a = pq_a.astype(np.int64) * Na + tgt_a
        Da = jnp.zeros((n2 * Na, C.shape[1]), C.dtype) \
            .at[flat_a].add(vals_a).reshape(n2, Na, C.shape[1])
        # beta: row operations on C^T
        Ct = C.T
        vals_b = sign_b[:, None] * Ct[src_b]             # (Lb, Na)
        flat_b = pq_b.astype(np.int64) * Nb + tgt_b
        Db = jnp.zeros((n2 * Nb, Na), C.dtype) \
            .at[flat_b].add(vals_b).reshape(n2, Nb, Na)
        return Da + jnp.swapaxes(Db, 1, 2)

    def contract(G):
        """sum_pq E_pq G[pq]."""
        Gf = G.reshape(n2 * Na, Nb)
        contrib_a = sign_a[:, None] * Gf[pq_a.astype(np.int64) * Na + src_a]
        sig = jnp.zeros((Na, Nb), G.dtype).at[tgt_a].add(contrib_a)
        Gt = jnp.swapaxes(G, 1, 2).reshape(n2 * Nb, Na)
        contrib_b = sign_b[:, None] * Gt[pq_b.astype(np.int64) * Nb + src_b]
        sig_t = jnp.zeros((Nb, Na), G.dtype).at[tgt_b].add(contrib_b)
        return sig + sig_t.T

    @jax.jit
    def sigma(C, h1, eri):
        k1 = h1 - 0.5 * jnp.einsum("prrq->pq", eri)
        D = expand(C)
        sig = jnp.tensordot(k1.reshape(-1), D, axes=1)
        G = jnp.tensordot(
            eri.reshape(n2, n2), D.reshape(n2, -1), axes=1
        ).reshape(D.shape)
        return sig + 0.5 * contract(G)

    return sigma, (Na, Nb)


def fci_davidson_jax(h1, eri, norb, nelec, tol=1e-8, max_cycle=100):
    """Ground state via Davidson with the device-side sigma; host
    orthogonalization. Returns (energy, civec)."""
    from .fci import FCISolver

    sigma, (Na, Nb) = make_sigma_jax(norb, nelec)
    # reuse the host solver's diagonal for preconditioning
    host = FCISolver.__new__(FCISolver)   # tables without native build
    FCISolver.__init__(host, norb, nelec, use_native=False)
    hdiag = host.make_hdiag(np.asarray(h1), np.asarray(eri)).ravel()
    dim = Na * Nb

    h1j = jnp.asarray(h1)
    erij = jnp.asarray(eri)

    def matvec(v):
        return np.array(sigma(jnp.asarray(v.reshape(Na, Nb)), h1j,
                              erij)).ravel()

    v0 = np.zeros(dim)
    v0[np.argmin(hdiag)] = 1.0
    V = [v0]
    AV = [matvec(v0)]
    e_old = None
    for _ in range(max_cycle):
        Vm, AVm = np.array(V), np.array(AV)
        Hs = Vm @ AVm.T
        Hs = 0.5 * (Hs + Hs.T)
        w, y = np.linalg.eigh(Hs)
        e, c = w[0], y[:, 0]
        x = c @ Vm
        r = c @ AVm - e * x
        if e_old is not None and abs(e - e_old) < tol \
                and np.linalg.norm(r) < max(np.sqrt(tol), 1e-5):
            break
        e_old = e
        denom = hdiag - e
        denom = np.where(np.abs(denom) < 1e-8, 1e-8, denom)
        t = r / denom
        for v in V:
            t = t - v * (v @ t)
        nrm = np.linalg.norm(t)
        if nrm < 1e-7:
            break
        V.append(t / nrm)
        AV.append(matvec(V[-1]))
        if len(V) > 30:
            V = [x / np.linalg.norm(x)]
            AV = [matvec(V[0])]
            e_old = None
    return float(e), x.reshape(Na, Nb) / np.linalg.norm(x)
