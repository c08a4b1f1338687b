"""Device-resident cached-environment t-RDM sweep.

The numpy sweep in solvers/dmrg.py:_sweep_all_elements computes every
4-operator cross expectation <A|o1 o2 o3 o4|B> in O(n_sites) *batched*
environment transfers (block2's cached-environment strategy, reference
DMRG_EVCont.py:70-85 get_1pdm/get_2pdm with bra != ket). At H30 scale
(60 JW sites, bond dim 32) those batches reach ~7,000 environments of
(m, m) each — ~10^13 FLOPs of small GEMMs, minutes of single-core BLAS
per state pair on the host.

This module is the accelerator twin, designed for XLA's compilation
model rather than translated: every batch class lives in a
fixed-capacity zero-padded device buffer (capacities are deterministic
functions of the chain length), one jitted *site step* performs all of a
site's transfers, emissions, and buffer insertions in a single dispatch
(insertion offsets are traced scalars, so ONE executable serves all 60
sites), and emitted value blocks stay on the device until a final
gather compacts the logical entries and fetches them in one transfer.
Zero padding is exact throughout: padded environment rows only ever
multiply zero rows of the padded site tensors, so they stay zero through
every transfer and emit.

The key/meta bookkeeping (identical to the numpy sweep — it depends only
on the chain length, never on the data) stays on the host.

Correctness is pinned against the numpy sweep and the string oracle in
tests/test_dmrg_device_trdm.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dmrg import (_AN, _CR, _FUSED_OPS, _KIND_OPS, _N, _NBAR, _TAG1,
                   _TAG2, _TAG3A, _TAG3B, _TAG3C, _TAG4, _Z, _pack)


def _ops(dtype):
    return {
        "cr": jnp.asarray(_CR, dtype), "an": jnp.asarray(_AN, dtype),
        "z": jnp.asarray(_Z, dtype),
        "n": jnp.asarray(_N, dtype), "nbar": jnp.asarray(_NBAR, dtype),
        "crz": jnp.asarray(_CR @ _Z, dtype),
        "anz": jnp.asarray(_AN @ _Z, dtype),
        "nz": jnp.asarray(_N @ _Z, dtype),
        "nbarz": jnp.asarray(_NBAR @ _Z, dtype),
        "i": jnp.eye(2, dtype=dtype),
    }


def _lt(E, A, B, op):
    """Advance a batch of left environments E (g, a, c) through one site
    (bra tensor A (a, x, d), ket tensor B (c, y, f), site operator op)."""
    Bx = jnp.einsum("xy,cyf->cxf", op, B)
    T = jnp.einsum("gac,cxf->gaxf", E, Bx)
    return jnp.einsum("gaxf,axd->gdf", T, A)


def _rt(R, A, B, op):
    """Advance a batch of right environments R (g, d, f) down through one
    site: out (g, a, c) closes sites s..end given R closing s+1..end."""
    Bx = jnp.einsum("xy,cyf->cxf", op, B)
    T = jnp.einsum("cxf,gdf->gcxd", Bx, R)
    return jnp.einsum("axd,gcxd->gac", A, T)


def _ins(buf, part, off):
    return jax.lax.dynamic_update_slice(buf, part, (off, 0, 0))


@partial(jax.jit, donate_argnums=(2,))
def _right_step(A, B, bz, Rnext, gz, op):
    """One site of the right pre-sweep: singles/fused right halves at
    this site, pair closures of the Z-advanced singles batch, then
    advance bz through the site and append the new singles at offset gz
    (traced)."""
    R1 = Rnext[None]
    rs = jnp.concatenate([_rt(R1, A, B, op["cr"]),
                          _rt(R1, A, B, op["an"])])
    rf = jnp.concatenate([_rt(R1, A, B, op["n"]),
                          _rt(R1, A, B, op["nbar"])])
    rpair = jnp.concatenate([_rt(bz, A, B, op["crz"]),
                             _rt(bz, A, B, op["anz"])])
    bz = _rt(bz, A, B, op["z"])
    bz = _ins(bz, rs, gz)
    return rs, rf, rpair, bz


@partial(jax.jit, donate_argnums=(3, 4, 5, 6, 7))
def _left_step(A, B, Lpc, b1, b3, b4, b2, b5, rs, rf, rpair,
               g1, g3, g4, g2, g5, op):
    """One site of the left sweep, fused into a single dispatch:
    1. emit every bond combination against the cached right halves
       (full-capacity GEMMs; padded rows/cols contribute zeros),
    2. create the entries that consume this site,
    3. advance all five batch classes and insert the new entries at
       their (traced) logical offsets."""
    V4 = jnp.einsum("gab,hab->gh", b3, rpair)
    V3a = jnp.einsum("gab,hab->gh", b2, rs)
    V3b = jnp.einsum("gab,hab->gh", b5, rs)
    V3c = jnp.einsum("gab,hab->gh", b3, rf)
    V2 = jnp.einsum("gab,hab->gh", b4, rf)
    V1 = jnp.einsum("gab,hab->gh", b1, rs)
    Vf = jnp.einsum("ab,hab->h", Lpc, rf)

    new_b3 = (_lt(b1, A, B, op["cr"]), _lt(b1, A, B, op["an"]))
    new_b2 = (_lt(b1, A, B, op["nz"]), _lt(b1, A, B, op["nbarz"]))
    new_b5 = (_lt(b4, A, B, op["crz"]), _lt(b4, A, B, op["anz"]))
    Lc = Lpc[None]
    new_b1 = jnp.concatenate([_lt(Lc, A, B, op["crz"]),
                              _lt(Lc, A, B, op["anz"])])
    new_b4 = jnp.concatenate([_lt(Lc, A, B, op["n"]),
                              _lt(Lc, A, B, op["nbar"])])

    b1n = _ins(_lt(b1, A, B, op["z"]), new_b1, g1)
    b4n = _ins(_lt(b4, A, B, op["i"]), new_b4, g4)
    b3n = _lt(b3, A, B, op["i"])
    b3n = _ins(b3n, new_b3[0], g3)
    b3n = _ins(b3n, new_b3[1], g3 + g1)
    b2n = _lt(b2, A, B, op["z"])
    b2n = _ins(b2n, new_b2[0], g2)
    b2n = _ins(b2n, new_b2[1], g2 + g1)
    b5n = _lt(b5, A, B, op["z"])
    b5n = _ins(b5n, new_b5[0], g5)
    b5n = _ins(b5n, new_b5[1], g5 + g4)
    return (b1n, b3n, b4n, b2n, b5n), (V4, V3a, V3b, V3c, V2, V1, Vf)


@jax.jit
def _gather_vals(blocks, idx):
    flat = jnp.concatenate([b.ravel() for b in blocks])
    return flat[idx]


def _pad_stack(mps, m, dtype):
    """Stack a ragged-bond MPS into one (n, m, 2, m) device array."""
    n = len(mps)
    out = np.zeros((n, m, 2, m))
    for i, t in enumerate(mps):
        out[i, : t.shape[0], :, : t.shape[2]] = t
    return jnp.asarray(out, dtype=dtype)


def _sweep_all_elements_device(mpsA, mpsB):
    """Device twin of dmrg._sweep_all_elements: identical keys/semantics.
    Returns (keys int64 sorted, values) as host numpy arrays."""
    n = len(mpsA)
    assert n < 128
    m = max(max(t.shape[0], t.shape[2]) for t in mpsA + mpsB)
    dtype = jnp.zeros(0).dtype  # follows jax_enable_x64
    As = _pad_stack(mpsA, m, dtype)
    Bs = _pad_stack(mpsB, m, dtype)
    op = _ops(dtype)

    # fixed capacities (exact logical maxima plus insertion-block slack)
    cap1 = 2 * n                      # b1 / b4 / bz singles batches
    cap3 = 2 * n * (n - 1) + cap1 + 4  # b3 / b2 / b5 pair batches
    capr = 2 * cap1                   # pair right halves (2 kinds x bz)

    # plain environments, padded to (m, m); exact by zero padding
    e0 = jnp.zeros((1, m, m), dtype).at[0, 0, 0].set(1.0)
    Lp = [e0[0]]
    cur = e0
    for s in range(n):
        cur = _lt(cur, As[s], Bs[s], op["i"])
        Lp.append(cur[0])
    Rp = [None] * (n + 1)
    Rp[n] = e0[0]
    cur = e0
    for s in range(n - 1, -1, -1):
        cur = _rt(cur, As[s], Bs[s], op["i"])
        Rp[s] = cur[0]

    def slot(k, u):
        return k | (u << 1)

    # ---- right pre-sweep -------------------------------------------------
    r_single = [None] * n   # (2, m, m) per site: [cr, an]
    r_fused = [None] * n    # (2, m, m) per site: [N, Nbar]
    r_pair = [None] * n     # (codes, (capr, m, m)) per site
    bz_meta = []
    bz = jnp.zeros((cap1, m, m), dtype)
    for c in range(n - 1, -1, -1):
        gz = len(bz_meta)
        rs, rf, rpair, bz = _right_step(As[c], Bs[c], bz, Rp[c + 1],
                                        gz, op)
        r_single[c], r_fused[c] = rs, rf
        if bz_meta:
            codes = [(slot(k3, c) << 8) | mm
                     for k3 in range(2) for mm in bz_meta]
            r_pair[c] = (np.array(codes, dtype=np.int64), rpair)
        bz_meta.extend(slot(k, c) for k in range(2))

    # ---- left sweep ------------------------------------------------------
    # emitted value blocks stay on device; the host records, per block,
    # (#padded values, flat indices of the logical entries, their keys)
    blocks, block_meta = [], []
    keys_out = []

    def emit(case, lcodes, V, pad_shape, rcodes, rcols=None):
        """Record block V (device, padded pad_shape) with logical rows
        lcodes and logical column positions rcols (defaults 0..len-1)."""
        if len(lcodes) == 0 or len(rcodes) == 0:
            return
        g, h = len(lcodes), len(rcodes)
        cols = np.arange(h) if rcols is None else np.asarray(rcols)
        idx = (np.arange(g)[:, None] * pad_shape[1] + cols[None, :])
        K = _pack(case, np.asarray(lcodes, dtype=np.int64)[:, None],
                  np.asarray(rcodes, dtype=np.int64)[None, :])
        blocks.append(V)
        block_meta.append((int(np.prod(pad_shape)), idx.ravel()))
        keys_out.append(K.ravel())

    b1_meta, b3_meta, b4_meta, b2_meta, b5_meta = [], [], [], [], []
    b1 = jnp.zeros((cap1, m, m), dtype)
    b4 = jnp.zeros((cap1, m, m), dtype)
    b3 = jnp.zeros((cap3, m, m), dtype)
    b2 = jnp.zeros((cap3, m, m), dtype)
    b5 = jnp.zeros((cap3, m, m), dtype)

    for c in range(n):
        g1, g3, g4 = len(b1_meta), len(b3_meta), len(b4_meta)
        g2, g5 = len(b2_meta), len(b5_meta)
        rpair_env = (r_pair[c][1] if r_pair[c] is not None
                     else jnp.zeros((capr, m, m), dtype))
        (b1, b3, b4, b2, b5), Vs = _left_step(
            As[c], Bs[c], Lp[c], b1, b3, b4, b2, b5,
            r_single[c], r_fused[c], rpair_env, g1, g3, g4, g2, g5, op)
        V4, V3a, V3b, V3c, V2, V1, Vf = Vs

        rs_codes = [slot(k, c) for k in range(2)]
        rf_codes = [slot(f, c) for f in range(2)]
        if r_pair[c] is not None:
            rc = r_pair[c][0]
            h = len(rc) // 2
            # rpair block layout: rows [0, cap1) kind 0, [cap1, 2 cap1)
            # kind 1; logical h/2 rows in each half
            rcols = np.concatenate([np.arange(h), cap1 + np.arange(h)])
            emit(_TAG4, b3_meta, V4, (cap3, capr), rc, rcols=rcols)
        emit(_TAG3A, b2_meta, V3a, (cap3, 2), rs_codes)
        emit(_TAG3B, b5_meta, V3b, (cap3, 2), rs_codes)
        emit(_TAG3C, b3_meta, V3c, (cap3, 2), rf_codes)
        emit(_TAG2, b4_meta, V2, (cap1, 2), rf_codes)
        emit(_TAG1, b1_meta, V1, (cap1, 2), rs_codes)
        # same-site fused 1-RDM terms <A| N/Nbar |B>
        blocks.append(Vf)
        block_meta.append((2, np.arange(2)))
        keys_out.append(np.array(
            [_pack(_TAG1, 0, (1 << 16) | slot(f, c)) for f in range(2)]))

        # host meta bookkeeping (mirrors the numpy sweep exactly)
        new_b3m = [(mm << 8) | slot(k2, c)
                   for k2 in range(2) for mm in b1_meta]
        new_b2m = [(mm << 8) | slot(f, c)
                   for f in range(2) for mm in b1_meta]
        new_b5m = [(mm << 8) | slot(k2, c)
                   for k2 in range(2) for mm in b4_meta]
        b3_meta.extend(new_b3m)
        b2_meta.extend(new_b2m)
        b5_meta.extend(new_b5m)
        b1_meta.extend(slot(k, c) for k in range(2))
        b4_meta.extend(slot(f, c) for f in range(2))

    # ---- one device-side compaction + one fetch --------------------------
    offsets = np.cumsum([0] + [pl for pl, _ in block_meta])
    flat_idx = np.concatenate([
        off + np.asarray(ix, dtype=np.int64)
        for off, (_, ix) in zip(offsets[:-1], block_meta)])
    vals = np.asarray(jax.device_get(
        _gather_vals(tuple(blocks), jnp.asarray(flat_idx))),
        dtype=np.float64)
    keys = np.concatenate(keys_out)
    order = np.argsort(keys)
    return keys[order], vals[order]


# ---------------------------------------------------------------------------
# multi-ket sweep: one bra against a BATCH of kets
# ---------------------------------------------------------------------------
# The key/meta bookkeeping depends only on the chain length, so a batch of
# kets shares it verbatim; every device tensor just gains a leading ket
# axis. One jitted site-step dispatch then serves the whole batch — the
# per-pair dispatch overhead (~2 n tunnel round-trips) and the MXU
# underutilization of single (m, m) transfers are amortized across the
# training set. This is the active-learning append shape (new state vs
# all stored states, reference DMRG_EVCont.py:70-85).


def _ltm(E, A, B, op):
    """Multi-ket left transfer: E (k, g, a, c), B (k, c, y, f)."""
    Bx = jnp.einsum("xy,kcyf->kcxf", op, B)
    T = jnp.einsum("kgac,kcxf->kgaxf", E, Bx)
    return jnp.einsum("kgaxf,axd->kgdf", T, A)


def _rtm(R, A, B, op):
    Bx = jnp.einsum("xy,kcyf->kcxf", op, B)
    T = jnp.einsum("kcxf,kgdf->kgcxd", Bx, R)
    return jnp.einsum("axd,kgcxd->kgac", A, T)


def _insm(buf, part, off):
    return jax.lax.dynamic_update_slice(buf, part, (0, off, 0, 0))


@partial(jax.jit, donate_argnums=(2,))
def _right_step_multi(A, B, bz, Rnext, gz, op):
    R1 = Rnext[:, None]
    rs = jnp.concatenate([_rtm(R1, A, B, op["cr"]),
                          _rtm(R1, A, B, op["an"])], axis=1)
    rf = jnp.concatenate([_rtm(R1, A, B, op["n"]),
                          _rtm(R1, A, B, op["nbar"])], axis=1)
    rpair = jnp.concatenate([_rtm(bz, A, B, op["crz"]),
                             _rtm(bz, A, B, op["anz"])], axis=1)
    bz = _rtm(bz, A, B, op["z"])
    bz = _insm(bz, rs, gz)
    return rs, rf, rpair, bz


@partial(jax.jit, donate_argnums=(3, 4, 5, 6, 7))
def _left_step_multi(A, B, Lpc, b1, b3, b4, b2, b5, rs, rf, rpair,
                     g1, g3, g4, g2, g5, op):
    V4 = jnp.einsum("kgab,khab->kgh", b3, rpair)
    V3a = jnp.einsum("kgab,khab->kgh", b2, rs)
    V3b = jnp.einsum("kgab,khab->kgh", b5, rs)
    V3c = jnp.einsum("kgab,khab->kgh", b3, rf)
    V2 = jnp.einsum("kgab,khab->kgh", b4, rf)
    V1 = jnp.einsum("kgab,khab->kgh", b1, rs)
    Vf = jnp.einsum("kab,khab->kh", Lpc, rf)

    new_b3 = (_ltm(b1, A, B, op["cr"]), _ltm(b1, A, B, op["an"]))
    new_b2 = (_ltm(b1, A, B, op["nz"]), _ltm(b1, A, B, op["nbarz"]))
    new_b5 = (_ltm(b4, A, B, op["crz"]), _ltm(b4, A, B, op["anz"]))
    Lc = Lpc[:, None]
    new_b1 = jnp.concatenate([_ltm(Lc, A, B, op["crz"]),
                              _ltm(Lc, A, B, op["anz"])], axis=1)
    new_b4 = jnp.concatenate([_ltm(Lc, A, B, op["n"]),
                              _ltm(Lc, A, B, op["nbar"])], axis=1)

    b1n = _insm(_ltm(b1, A, B, op["z"]), new_b1, g1)
    b4n = _insm(_ltm(b4, A, B, op["i"]), new_b4, g4)
    b3n = _ltm(b3, A, B, op["i"])
    b3n = _insm(b3n, new_b3[0], g3)
    b3n = _insm(b3n, new_b3[1], g3 + g1)
    b2n = _ltm(b2, A, B, op["z"])
    b2n = _insm(b2n, new_b2[0], g2)
    b2n = _insm(b2n, new_b2[1], g2 + g1)
    b5n = _ltm(b5, A, B, op["z"])
    b5n = _insm(b5n, new_b5[0], g5)
    b5n = _insm(b5n, new_b5[1], g5 + g4)
    return (b1n, b3n, b4n, b2n, b5n), (V4, V3a, V3b, V3c, V2, V1, Vf)


@jax.jit
def _gather_vals_multi(blocks, idx):
    K = blocks[0].shape[0]
    flat = jnp.concatenate([b.reshape(K, -1) for b in blocks], axis=1)
    return flat[:, idx]


def _sweep_all_elements_device_multi(mpsA, mpsBs):
    """Multi-ket twin of _sweep_all_elements_device: identical keys.
    Returns (keys int64 sorted, vals (n_kets, n_keys)) as host numpy."""
    n = len(mpsA)
    assert n < 128
    K = len(mpsBs)
    all_mps = list(mpsA)
    for B in mpsBs:
        all_mps += list(B)
    m = max(max(t.shape[0], t.shape[2]) for t in all_mps)
    dtype = jnp.zeros(0).dtype
    As = _pad_stack(mpsA, m, dtype)
    Bs = jnp.stack([_pad_stack(B, m, dtype) for B in mpsBs])  # (K,n,m,2,m)
    op = _ops(dtype)

    cap1 = 2 * n
    cap3 = 2 * n * (n - 1) + cap1 + 4
    capr = 2 * cap1

    e0 = jnp.zeros((K, 1, m, m), dtype).at[:, 0, 0, 0].set(1.0)
    Lp = [e0[:, 0]]
    cur = e0
    for s in range(n):
        cur = _ltm(cur, As[s], Bs[:, s], op["i"])
        Lp.append(cur[:, 0])
    Rp = [None] * (n + 1)
    Rp[n] = e0[:, 0]
    cur = e0
    for s in range(n - 1, -1, -1):
        cur = _rtm(cur, As[s], Bs[:, s], op["i"])
        Rp[s] = cur[:, 0]

    def slot(k, u):
        return k | (u << 1)

    r_single = [None] * n
    r_fused = [None] * n
    r_pair = [None] * n
    bz_meta = []
    bz = jnp.zeros((K, cap1, m, m), dtype)
    for c in range(n - 1, -1, -1):
        gz = len(bz_meta)
        rs, rf, rpair, bz = _right_step_multi(As[c], Bs[:, c], bz,
                                              Rp[c + 1], gz, op)
        r_single[c], r_fused[c] = rs, rf
        if bz_meta:
            codes = [(slot(k3, c) << 8) | mm
                     for k3 in range(2) for mm in bz_meta]
            r_pair[c] = (np.array(codes, dtype=np.int64), rpair)
        bz_meta.extend(slot(k, c) for k in range(2))

    blocks, block_meta = [], []
    keys_out = []

    def emit(case, lcodes, V, pad_shape, rcodes, rcols=None):
        if len(lcodes) == 0 or len(rcodes) == 0:
            return
        g, h = len(lcodes), len(rcodes)
        cols = np.arange(h) if rcols is None else np.asarray(rcols)
        idx = (np.arange(g)[:, None] * pad_shape[1] + cols[None, :])
        Kk = _pack(case, np.asarray(lcodes, dtype=np.int64)[:, None],
                   np.asarray(rcodes, dtype=np.int64)[None, :])
        blocks.append(V)
        block_meta.append((int(np.prod(pad_shape)), idx.ravel()))
        keys_out.append(Kk.ravel())

    b1_meta, b3_meta, b4_meta, b2_meta, b5_meta = [], [], [], [], []
    b1 = jnp.zeros((K, cap1, m, m), dtype)
    b4 = jnp.zeros((K, cap1, m, m), dtype)
    b3 = jnp.zeros((K, cap3, m, m), dtype)
    b2 = jnp.zeros((K, cap3, m, m), dtype)
    b5 = jnp.zeros((K, cap3, m, m), dtype)

    for c in range(n):
        g1, g3, g4 = len(b1_meta), len(b3_meta), len(b4_meta)
        g2, g5 = len(b2_meta), len(b5_meta)
        rpair_env = (r_pair[c][1] if r_pair[c] is not None
                     else jnp.zeros((K, capr, m, m), dtype))
        (b1, b3, b4, b2, b5), Vs = _left_step_multi(
            As[c], Bs[:, c], Lp[c], b1, b3, b4, b2, b5,
            r_single[c], r_fused[c], rpair_env, g1, g3, g4, g2, g5, op)
        V4, V3a, V3b, V3c, V2, V1, Vf = Vs

        rs_codes = [slot(k, c) for k in range(2)]
        rf_codes = [slot(f, c) for f in range(2)]
        if r_pair[c] is not None:
            rc = r_pair[c][0]
            h = len(rc) // 2
            rcols = np.concatenate([np.arange(h), cap1 + np.arange(h)])
            emit(_TAG4, b3_meta, V4, (cap3, capr), rc, rcols=rcols)
        emit(_TAG3A, b2_meta, V3a, (cap3, 2), rs_codes)
        emit(_TAG3B, b5_meta, V3b, (cap3, 2), rs_codes)
        emit(_TAG3C, b3_meta, V3c, (cap3, 2), rf_codes)
        emit(_TAG2, b4_meta, V2, (cap1, 2), rf_codes)
        emit(_TAG1, b1_meta, V1, (cap1, 2), rs_codes)
        blocks.append(Vf)
        block_meta.append((2, np.arange(2)))
        keys_out.append(np.array(
            [_pack(_TAG1, 0, (1 << 16) | slot(f, c)) for f in range(2)]))

        new_b3m = [(mm << 8) | slot(k2, c)
                   for k2 in range(2) for mm in b1_meta]
        new_b2m = [(mm << 8) | slot(f, c)
                   for f in range(2) for mm in b1_meta]
        new_b5m = [(mm << 8) | slot(k2, c)
                   for k2 in range(2) for mm in b4_meta]
        b3_meta.extend(new_b3m)
        b2_meta.extend(new_b2m)
        b5_meta.extend(new_b5m)
        b1_meta.extend(slot(k, c) for k in range(2))
        b4_meta.extend(slot(f, c) for f in range(2))

    offsets = np.cumsum([0] + [pl for pl, _ in block_meta])
    flat_idx = np.concatenate([
        off + np.asarray(ix, dtype=np.int64)
        for off, (_, ix) in zip(offsets[:-1], block_meta)])
    vals = np.asarray(jax.device_get(
        _gather_vals_multi(tuple(blocks), jnp.asarray(flat_idx))),
        dtype=np.float64)
    keys = np.concatenate(keys_out)
    order = np.argsort(keys)
    return keys[order], vals[:, order]
