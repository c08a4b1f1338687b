"""Nonorthogonal Wick-kernel tests (the pygnme replacement).

Oracles: orthonormal CI algebra (FCISolver.trans_rdm12) for same-basis
pairs, and the independent full-space embed+transform_ci path for
cross-geometry CAS pairs."""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.fci import FCISolver
from evcont_tpu.solvers.nonorthogonal import (
    cas_no_state,
    trans_rdm12_nonorthogonal,
)

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'


def h4(d):
    return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                          basis="sto-3g")


def _oao_ints(mol):
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri), trafo)
    return np.array(h1), np.array(h2)


def test_same_basis_matches_orthonormal_algebra():
    h1, h2 = _oao_ints(h4(1.7))
    solver = FCISolver(4, 4, spin=None)
    es, vecs = solver.kernel(h1, h2, nroots=2)
    r1_ref, r2_ref = solver.trans_rdm12(vecs[0], vecs[1])

    st0 = cas_no_state(vecs[0], np.eye(4), 0, 4, (2, 2))
    st1 = cas_no_state(vecs[1], np.eye(4), 0, 4, (2, 2))
    ov, r1, r2 = trans_rdm12_nonorthogonal(st0, st1)
    assert abs(ov) < 1e-12                      # orthogonal eigenstates
    np.testing.assert_allclose(r1, r1_ref, atol=1e-12)
    np.testing.assert_allclose(r2, r2_ref, atol=1e-12)

    # diagonal element reproduces the energy
    ovd, r1d, r2d = trans_rdm12_nonorthogonal(st0, st0)
    E = np.einsum("pq,pq->", h1, r1d) + 0.5 * np.einsum(
        "pqrs,pqrs->", h2, r2d)
    assert abs(ovd - 1.0) < 1e-12
    assert abs(E - es[0]) < 1e-10


def test_zero_overlap_channels():
    """Orthogonal single determinants: 1-RDM follows the one-zero
    Slater-Condon rule; everything must stay finite with exact zeros."""
    norb = 4
    # |D_A> occupies orbitals {0,1}; |D_B> occupies {0,2}: one zero channel
    ci = np.ones((1, 1))
    occA = np.array([[0, 1]])
    occB = np.array([[0, 2]])
    from evcont_tpu.solvers.nonorthogonal import NOState
    stA = NOState(ci=ci, occ_a=occA, occ_b=occA, orbs=np.eye(norb))
    stB = NOState(ci=ci, occ_a=occB, occ_b=occA, orbs=np.eye(norb))
    ov, r1, r2 = trans_rdm12_nonorthogonal(stA, stB)
    assert abs(ov) < 1e-14
    # alpha: <D_A| a+_p a_q |D_B> = delta_p1 delta_q2 (transfer 2 -> 1)
    expected = np.zeros((norb, norb))
    expected[1, 2] = 1.0
    np.testing.assert_allclose(r1, expected, atol=1e-13)
    assert np.all(np.isfinite(r2))


def test_cross_geometry_cas_vs_fullspace():
    """The backend-level check: wick and fullspace methods must build
    identical t-RDM stores (see backends/casci_backend.py)."""
    from evcont_tpu.backends.casci_backend import CASCIBackend

    b1 = CASCIBackend(ncas=2, nelecas=2, method="wick")
    b2 = CASCIBackend(ncas=2, nelecas=2, method="fullspace")
    for d in [1.5, 2.1]:
        b1.append_to_rdms(h4(d))
        b2.append_to_rdms(h4(d))
    np.testing.assert_allclose(b1.overlap, b2.overlap, atol=1e-12)
    np.testing.assert_allclose(b1.one_rdm, b2.one_rdm, atol=1e-12)
    np.testing.assert_allclose(b1.two_rdm, b2.two_rdm, atol=1e-12)


def test_jax_kernel_matches_host():
    """The jitted device kernel must agree with the numpy host version."""
    from evcont_tpu.solvers.casci import casci
    from evcont_tpu.solvers.nonorthogonal import make_wick_kernel
    from evcont_tpu.integrals.engine import IntegralEngine

    def cas_state(mol):
        eng = IntegralEngine(mol)
        b = eng.compute_jit(np.asarray(mol.coords))
        S = np.array(b.ovlp)
        res = casci(S, np.array(b.hcore), np.array(b.eri), float(b.enuc),
                    (2, 2), 2, 2)
        w, V = np.linalg.eigh(S)
        d = (V * np.sqrt(w)) @ V.T @ res.mo_coeff
        return cas_no_state(res.ci, d, res.ncore, 2, (1, 1))

    stA, stB = cas_state(h4(1.5)), cas_state(h4(2.1))
    ov0, r10, r20 = trans_rdm12_nonorthogonal(stA, stB)
    kern = make_wick_kernel(stA.occ_a, stA.occ_b, stB.occ_a, stB.occ_b)
    ov1, r11, r21 = kern(stA.ci, stA.orbs, stB.ci, stB.orbs)
    assert abs(float(ov1) - ov0) < 1e-12
    np.testing.assert_allclose(np.array(r11), r10, atol=1e-12)
    np.testing.assert_allclose(np.array(r21), r20, atol=1e-12)
