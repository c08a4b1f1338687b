"""MPS orbital rotation (solvers/mps_rotation.py): Givens decomposition,
gate circuit vs the determinant-algebra CI transform, and the
orbital_rotation DMRG append strategy (reference MPS_orb_rotation.py /
DMRG_EVCont.py:275-428, rebuilt on an exact circuit)."""

import numpy as np
import pytest
from scipy.linalg import expm

from evcont_tpu.solvers.ci_transform import transform_ci
from evcont_tpu.solvers.dmrg import (build_hamiltonian_mpo,
                                     dmrg_ground_state, mpo_expectation,
                                     mps_overlap, mps_to_ci)
from evcont_tpu.solvers.mps_rotation import (converge_orbital_rotation_mps,
                                             givens_decompose_adjacent,
                                             rotate_orbitals_mps)


def _reconstruct(rots, signs, n):
    V = np.diag(signs)
    for p, th in reversed(rots):
        G = np.eye(n)
        c, s = np.cos(th), np.sin(th)
        G[p, p] = c
        G[p, p + 1] = -s
        G[p + 1, p] = s
        G[p + 1, p + 1] = c
        V = G @ V
    return V


def test_givens_decompose_adjacent():
    rng = np.random.default_rng(0)
    for n in (2, 5, 8):
        for det_sign in (1, -1):
            Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
            if np.linalg.det(Q) * det_sign < 0:
                Q[:, 0] *= -1
            rots, signs = givens_decompose_adjacent(Q)
            assert all(0 <= p < n - 1 for p, _ in rots)
            assert len(rots) <= n * (n - 1) // 2
            np.testing.assert_allclose(_reconstruct(rots, signs, n), Q,
                                       atol=1e-12)
    with pytest.raises(ValueError):
        givens_decompose_adjacent(np.ones((3, 3)))


def _random_ground_mps(norb, na, nb, seed):
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(norb, norb))
    h1 = h1 + h1.T
    eri = rng.normal(size=(norb,) * 4) * 0.3
    for perm in [(1, 0, 2, 3), (0, 1, 3, 2), (2, 3, 0, 1)]:
        eri = eri + eri.transpose(perm)
    W = build_hamiltonian_mpo(h1, eri)
    _, mps = dmrg_ground_state(W, 2 * norb, na + nb, sz=0.5 * (na - nb),
                               bond_dims=(8, 16, 16), sweeps_per_dim=3)
    nrm = np.sqrt(mps_overlap(mps, mps))
    mps[0] = mps[0] / nrm
    return h1, eri, W, mps


def test_rotation_matches_ci_transform():
    """Gate circuit == determinant-algebra transform_ci to machine
    precision, for det(U) = +1 and -1, closed and open shell."""
    for norb, na, nb, seed in [(3, 2, 2, 1), (3, 2, 1, 2)]:
        _, _, _, mps = _random_ground_mps(norb, na, nb, seed)
        ci = mps_to_ci(mps, norb, (na, nb))
        rng = np.random.default_rng(seed + 10)
        for det_sign in (1, -1):
            K = rng.normal(size=(norb, norb))
            U = expm(K - K.T)
            if det_sign < 0:
                U[:, 1] *= -1
            rot, dw = rotate_orbitals_mps(mps, U)
            assert dw < 1e-20
            assert abs(mps_overlap(rot, rot) - 1.0) < 1e-10
            np.testing.assert_allclose(
                mps_to_ci(rot, norb, (na, nb)),
                transform_ci(ci, (na, nb), U), atol=1e-11)


def test_rotation_energy_invariance_and_composition():
    """<psi|H(B)|psi> equals <rot(psi)|H(B U)|rot(psi)>, and rotating by
    U then U^T is the identity."""
    norb, na, nb = 3, 2, 2
    h1, eri, W, mps = _random_ground_mps(norb, na, nb, 3)
    e0 = mpo_expectation(mps, W)
    rng = np.random.default_rng(4)
    K = rng.normal(size=(norb, norb))
    U = expm(K - K.T)
    rot, _ = rotate_orbitals_mps(mps, U)
    h1r = U.T @ h1 @ U
    erir = np.einsum("pqrs,pi,qj,rk,sl->ijkl", eri, U, U, U, U,
                     optimize=True)
    Wr = build_hamiltonian_mpo(h1r, erir)
    assert abs(mpo_expectation(rot, Wr) - e0) < 1e-9
    back, _ = rotate_orbitals_mps(rot, U.T)
    assert abs(abs(mps_overlap(back, mps)) - 1.0) < 1e-10


def test_converge_orbital_rotation_escalates():
    """The escalation wrapper reaches the requested discarded weight and
    reports the cap it used."""
    norb, na, nb = 3, 2, 2
    _, _, _, mps = _random_ground_mps(norb, na, nb, 5)
    U = expm(np.array([[0.0, 0.4, -0.2], [-0.4, 0.0, 0.7],
                       [0.2, -0.7, 0.0]]))
    rot, dw, m = converge_orbital_rotation_mps(mps, U, init_bond_dim=2,
                                               tol=1e-12)
    assert dw < 1e-12
    assert abs(mps_overlap(rot, rot) - 1.0) < 1e-8


@pytest.mark.slow
def test_orbital_rotation_append_strategy_matches_oao():
    """DMRGBackend(append_strategy="orbital_rotation"): solve each
    geometry in its own split/Fiedler basis, Givens-rotate stored kets
    into the bra frame per cross term (NO re-solves). At exact bond
    dimension the store and the continuation PES must match the default
    OAO strategy (the test the reference's broken implementation could
    never pass)."""
    from evcont_tpu.backends.dmrg_backend import DMRGBackend
    from evcont_tpu.model import ContinuationModel
    from evcont_tpu.molecule import Molecule

    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    kw = dict(bond_dims=(16, 32, 64), sweeps_per_dim=3, trdm_method="mps")
    b_oao = DMRGBackend(**kw)
    b_rot = DMRGBackend(append_strategy="orbital_rotation",
                        cibasis="split", **kw)
    for d in [1.4, 2.1, 2.8]:
        b_oao.append_to_rdms(h4(d))
        b_rot.append_to_rdms(h4(d))
    np.testing.assert_allclose(b_rot.ens, b_oao.ens, atol=3e-6)
    np.testing.assert_allclose(np.abs(b_rot.overlap),
                               np.abs(b_oao.overlap), atol=1e-6)
    m_oao = ContinuationModel.from_backend(h4(1.8), b_oao)
    m_rot = ContinuationModel.from_backend(h4(1.8), b_rot)
    for d in [1.6, 2.4]:
        e_o = float(m_oao.potential(h4(d).coords))
        e_r = float(m_rot.potential(h4(d).coords))
        assert abs(e_r - e_o) < 2e-6, (d, e_r, e_o)


def test_svd_gesvd_fallback(monkeypatch):
    """dmrg._svd must survive gesdd non-convergence (observed on
    ill-scaled MPO compression blocks at norb >= 10) by falling back to
    the unconditionally convergent gesvd driver."""
    from evcont_tpu.solvers import dmrg as dmod

    A = np.random.default_rng(0).normal(size=(12, 7))
    U, s, Vt = dmod._svd(A)
    np.testing.assert_allclose((U * s) @ Vt, A, atol=1e-12)

    def boom(*a, **k):
        raise np.linalg.LinAlgError("SVD did not converge")

    monkeypatch.setattr(np.linalg, "svd", boom)
    U, s, Vt = dmod._svd(A)
    np.testing.assert_allclose((U * s) @ Vt, A, atol=1e-12)
