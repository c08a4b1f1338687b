"""FCI solver tests: golden values, dense cross-checks, RDM conventions."""

import numpy as np

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.fci import FCISolver


def _oao_ints(mol):
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri), trafo)
    return np.array(h1), np.array(h2), float(b.enuc)


def test_h2_fci_golden():
    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                         basis="sto-3g")
    h1, h2, enuc = _oao_ints(mol)
    e, vec = FCISolver(2, 2).kernel(h1, h2)
    # literature H2/STO-3G FCI at R = 1.4 Bohr
    assert abs(e + enuc - (-1.1372759)) < 1e-6


def test_h4_davidson_vs_dense():
    mol = Molecule.build([("H", (0, 0, 1.8 * i)) for i in range(4)],
                         basis="sto-3g")
    h1, h2, _ = _oao_ints(mol)
    solver = FCISolver(4, 4)
    es, vecs = solver.kernel(h1, h2, nroots=3)
    Na, Nb = solver.dim
    dim = Na * Nb
    H = np.zeros((dim, dim))
    for i in range(dim):
        u = np.zeros(dim)
        u[i] = 1.0
        H[:, i] = solver.sigma(u.reshape(Na, Nb), h1, h2).ravel()
    np.testing.assert_allclose(H, H.T, atol=1e-12)
    w = np.linalg.eigvalsh(H)
    # singlet-sector restriction: returned roots must appear in the full
    # spectrum; ground state must match exactly
    assert abs(es[0] - w[0]) < 1e-9
    for e in es:
        assert np.min(np.abs(w - e)) < 1e-8


def test_rdm_energy_consistency():
    mol = Molecule.build([("H", (0, 0, 1.6 * i)) for i in range(4)],
                         basis="sto-3g")
    h1, h2, _ = _oao_ints(mol)
    solver = FCISolver(4, 4)
    e, vec = solver.kernel(h1, h2)
    r1, r2 = solver.trans_rdm12(vec, vec)
    assert abs(solver.energy_from_rdms(h1, h2, r1, r2) - e) < 1e-9
    assert abs(np.trace(r1) - 4.0) < 1e-10
    # 2-RDM partial trace: sum_r rdm2[p,q,r,r] = (N-1) rdm1[p,q]
    np.testing.assert_allclose(np.einsum("pqrr->pq", r2), 3.0 * r1,
                               atol=1e-9)


def test_trans_rdm_off_diagonal():
    mol = Molecule.build([("H", (0, 0, 1.7 * i)) for i in range(4)],
                         basis="sto-3g")
    h1, h2, _ = _oao_ints(mol)
    solver = FCISolver(4, 4)
    es, vecs = solver.kernel(h1, h2, nroots=2)
    r1, r2 = solver.trans_rdm12(vecs[0], vecs[1])
    # eigenstates: <0|H|1> = 0 and <0|1> = 0
    h01 = np.einsum("pq,pq->", h1, r1) + 0.5 * np.einsum("pqrs,pqrs->", h2, r2)
    assert abs(h01) < 1e-8
    assert abs(np.vdot(vecs[0], vecs[1])) < 1e-10
