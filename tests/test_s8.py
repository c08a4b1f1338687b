"""s8 packed layout: full 8-fold ERI-symmetry projection of the t-RDM
store (oao.py s8 block).

The contract: for every h2 with the real-orbital 8-group symmetry
{i<->j, k<->l, (ij)<->(kl)},

    store_s8 @ s8_fold(h2, 0.5) == store_rfp @ rfp_fold(h2, 0.5)

with store_s8 = store_to_s8(store_rfp) — i.e. projecting the store onto
the symmetric subspace changes nothing the assembly can see, while the
packed axis shrinks from M(M+1)/2 (M = n^2) to P(P+1)/2 (P = n(n+1)/2),
3.7x at the Zundel-84 flagship. These tests pin the identity, the tril
entry order, the unfold/export views, and end-to-end model parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from evcont_tpu.molecule import Molecule
from evcont_tpu.model import ContinuationModel
from evcont_tpu.oao import (
    compress_exchange,
    restore_exchange,
    rfp_fold,
    rfp_permutation,
    s8_fold,
    s8_npacked,
    s8_to_tril_maps,
    s8_unfold,
    store_to_s8,
)


def _sym8(h):
    """Symmetrize a random (n,n,n,n) tensor over the full 8-group."""
    h = h + h.transpose(1, 0, 2, 3)
    h = h + h.transpose(0, 1, 3, 2)
    h = h + h.transpose(2, 3, 0, 1)
    return h / 8.0


def _random_case(n=5, npair=7, seed=0):
    rng = np.random.default_rng(seed)
    M = n * n
    store_tril = rng.standard_normal((npair, M * (M + 1) // 2))
    store_rfp = store_tril[:, rfp_permutation(n)]
    h2 = _sym8(rng.standard_normal((n, n, n, n)))
    return store_tril, store_rfp, h2


def test_s8_contraction_identity():
    store_tril, store_rfp, h2 = _random_case()
    n = h2.shape[0]
    s8 = store_to_s8(store_rfp, n, order="rfp")
    assert s8.shape == (store_rfp.shape[0], s8_npacked(n))
    ref = store_rfp @ np.asarray(rfp_fold(jnp.asarray(h2), 0.5))
    got = s8 @ np.asarray(s8_fold(jnp.asarray(h2), 0.5))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_s8_from_tril_matches_rfp_route():
    store_tril, store_rfp, h2 = _random_case(seed=1)
    n = h2.shape[0]
    a = store_to_s8(store_tril, n, order="tril")
    b = store_to_s8(store_rfp, n, order="rfp")
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


def test_s8_device_path_matches_numpy():
    _, store_rfp, h2 = _random_case(seed=2)
    n = h2.shape[0]
    a = store_to_s8(store_rfp, n, order="rfp")
    b = np.asarray(store_to_s8(jnp.asarray(store_rfp), n, order="rfp",
                               chunk_slots=17))   # force several chunks
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


def test_s8_unfold_is_symmetric_and_contraction_consistent():
    _, store_rfp, h2 = _random_case(seed=3)
    n = h2.shape[0]
    s8 = store_to_s8(store_rfp, n, order="rfp")
    full = np.asarray(s8_unfold(jnp.asarray(s8[0]), n))
    # full 8-group symmetry of the reconstructed tensor
    np.testing.assert_allclose(full, full.transpose(1, 0, 2, 3), atol=1e-13)
    np.testing.assert_allclose(full, full.transpose(0, 1, 3, 2), atol=1e-13)
    np.testing.assert_allclose(full, full.transpose(2, 3, 0, 1), atol=1e-13)
    # sum(Gamma_s * h2) must equal 2 * (store @ s8_fold(h2, 0.5))
    ref = 2.0 * (s8[0] @ np.asarray(s8_fold(jnp.asarray(h2), 0.5)))
    np.testing.assert_allclose(np.vdot(full, h2), ref, rtol=1e-12)


def test_s8_tril_export_view():
    _, store_rfp, h2 = _random_case(seed=4)
    n = h2.shape[0]
    s8 = store_to_s8(store_rfp, n, order="rfp")
    idx, w = s8_to_tril_maps(n)
    tril_view = s8[:, idx] * w
    # must equal compress_exchange of the symmetrized full tensor
    full = np.asarray(s8_unfold(jnp.asarray(s8), n))
    ref = np.asarray(compress_exchange(jnp.asarray(full)))
    np.testing.assert_allclose(tril_view, ref, rtol=0, atol=1e-13)
    # and contracting the exported tril store reproduces the energy of
    # the original store against a symmetric h2
    ref_e = store_rfp @ np.asarray(rfp_fold(jnp.asarray(h2), 0.5))
    got_e = tril_view @ np.asarray(
        compress_exchange(jnp.asarray(h2), 0.5))
    np.testing.assert_allclose(got_e, ref_e, rtol=0, atol=1e-12)


def _chain_model(compress_s8, seed=5, n_h=4, ntrain=3):
    xs = (np.arange(n_h) - np.median(np.arange(n_h))) * 1.8
    mol = Molecule.build([("H", (x, 0.0, 0.0)) for x in xs],
                         basis="sto-3g")
    nao = n_h
    npair = ntrain * (ntrain + 1) // 2
    M = nao * nao
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((ntrain, ntrain)) * 0.05
    ov = np.eye(ntrain) + 0.5 * (v + v.T)
    r1 = rng.standard_normal((npair, nao, nao)) * 0.1
    r2 = rng.standard_normal((npair, M * (M + 1) // 2)) * 0.02
    return ContinuationModel(mol, ov, r1, r2, compress_s8=compress_s8), mol


def test_model_parity_rfp_vs_s8():
    """End-to-end (integrals -> OAO -> assembly -> GEP -> forces): the s8
    model must reproduce the rfp model's energies and forces to the
    rounding level at which the computed f64 h2 is 8-symmetric."""
    m_rfp, mol = _chain_model(False)
    m_s8, _ = _chain_model(True)
    assert m_rfp.packed_layout == "rfp"
    assert m_s8.packed_layout == "s8"
    c = np.asarray(mol.coords) + 0.01
    e0, f0 = m_rfp.potential_and_forces(c)
    e1, f1 = m_s8.potential_and_forces(c)
    assert abs(float(e0) - float(e1)) < 1e-11
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-9)
    # batched path
    cb = np.stack([c, c * 1.001])
    eb0, fb0 = m_rfp.potential_and_forces_batch(cb)
    eb1, fb1 = m_s8.potential_and_forces_batch(cb)
    np.testing.assert_allclose(np.asarray(eb0), np.asarray(eb1), atol=1e-11)
    # predicted RDMs: rdm1 identical; rdm2 is the symmetrized projection,
    # so it must agree after symmetrizing the rfp prediction
    e0, v0, rdm1_0, rdm2_0 = m_rfp.state(c)
    e1, v1, rdm1_1, rdm2_1 = m_s8.state(c)
    np.testing.assert_allclose(np.asarray(rdm1_0), np.asarray(rdm1_1),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(rdm2_1),
                               _sym8(np.asarray(rdm2_0)), atol=1e-10)


def test_model_parity_precise_path():
    """The precise (emulated-f64 + error-free assembly) path through the
    s8 layout must match the rfp precise path."""
    m_rfp, mol = _chain_model(False, seed=6)
    m_s8, _ = _chain_model(True, seed=6)
    c = np.asarray(mol.coords) + 0.02
    e0, f0 = m_rfp.potential_and_forces_precise(c)
    e1, f1 = m_s8.potential_and_forces_precise(c)
    assert abs(float(e0) - float(e1)) < 1e-11
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-9)


def test_s8_fold_f32_gemm_matches_gather():
    """The f32 path routes the composite-pair selection through 0/1
    GEMMs (MXU); it must match the f64 gather path exactly (the one-hot
    products are exact in f32 for exactly-representable inputs)."""
    import jax.numpy as jnp
    from evcont_tpu.oao import s8_fold

    rng = np.random.default_rng(3)
    n = 5
    # exactly-f32-representable 8-symmetric tensor
    a = np.round(rng.standard_normal((n,) * 4) * 64.0) / 64.0
    for perm in [(1, 0, 2, 3), (0, 1, 3, 2), (2, 3, 0, 1)]:
        a = a + a.transpose(perm)
    p64 = np.asarray(s8_fold(jnp.asarray(a, dtype=jnp.float64), 0.5))
    p32 = np.asarray(s8_fold(jnp.asarray(a, dtype=jnp.float32), 0.5))
    np.testing.assert_array_equal(p32.astype(np.float64), p64)
