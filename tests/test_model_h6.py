"""End-to-end H-chain continuation tests (scaled-down H6 workload,
reference: scripts/PES_H_chain/H6_PES/H6_continuation.py).

Uses H4 chains to keep CPU test time low; the full H6/H10 configurations run
in evcont_tpu/workloads/."""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.model import ContinuationModel
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.fci import FCISolver

N_AT = 4


def chain(d, basis="sto-3g"):
    xs = (np.arange(N_AT) - np.median(np.arange(N_AT))) * d
    return Molecule.build([("H", (x, 0.0, 0.0)) for x in xs], basis=basis)


@pytest.fixture(scope="module")
def trained():
    backend = FCIBackend()
    for d in [1.2, 1.8, 2.6]:
        backend.append_to_rdms(chain(d))
    model = ContinuationModel.from_backend(chain(1.8), backend)
    return backend, model


def test_interpolation_exact_at_training_points(trained):
    """At a training geometry the continuation must reproduce the exact FCI
    energy (subspace contains the exact eigenvector)."""
    backend, model = trained
    for i, d in enumerate([1.2, 1.8, 2.6]):
        e = float(model.potential(chain(d).coords))
        assert abs(e - backend.ens[i]) < 1e-9


def test_pes_accuracy_between_training_points(trained):
    backend, model = trained
    mol = chain(2.2)
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri), trafo)
    ef, _ = FCISolver(N_AT, N_AT).kernel(np.array(h1), np.array(h2))
    e_exact = ef + float(b.enuc)
    e_cont = float(model.potential(mol.coords))
    # variational: continuation energy lies above exact FCI
    assert e_cont >= e_exact - 1e-10
    # and close (interpolation quality for a 3-point training set)
    assert e_cont - e_exact < 5e-3


def test_forces_vs_finite_difference(trained):
    _, model = trained
    rng = np.random.default_rng(0)
    c0 = np.asarray(chain(1.9).coords) + 0.05 * rng.standard_normal((N_AT, 3))
    e, F = model.potential_and_forces(c0)
    F = np.array(F)
    eps = 1e-5
    for (i, d) in [(0, 0), (1, 1), (3, 2)]:
        cp, cm = c0.copy(), c0.copy()
        cp[i, d] += eps
        cm[i, d] -= eps
        fd = -(float(model.potential(cp)) - float(model.potential(cm))) / (2 * eps)
        assert abs(F[i, d] - fd) < 1e-7


def test_forces_at_symmetric_geometry(trained):
    """Symmetric H chains have degenerate AO-overlap spectra — the case the
    reference handles with explicit degenerate PT
    (ab_initio_gradients_loewdin.py:55-80). The Daleckii-Krein JVP must give
    finite, finite-difference-consistent forces here."""
    _, model = trained
    c0 = np.asarray(chain(1.8).coords)
    e, F = model.potential_and_forces(c0)
    F = np.array(F)
    assert np.all(np.isfinite(F))
    eps = 1e-5
    cp, cm = c0.copy(), c0.copy()
    cp[0, 0] += eps
    cm[0, 0] -= eps
    fd = -(float(model.potential(cp)) - float(model.potential(cm))) / (2 * eps)
    assert abs(F[0, 0] - fd) < 1e-7
    # translation invariance: forces sum to zero
    np.testing.assert_allclose(F.sum(axis=0), 0.0, atol=1e-9)


def test_batched_pes_matches_single(trained):
    _, model = trained
    ds = [1.4, 1.9, 2.4]
    batch = np.stack([np.asarray(chain(d).coords) for d in ds])
    ens = np.array(model.potential_batch(batch))
    singles = [float(model.potential(chain(d).coords)) for d in ds]
    np.testing.assert_allclose(ens, singles, atol=1e-11)


def test_multistate(trained):
    _, model = trained
    e, vecs = model.multistate(chain(2.0).coords, nroots=2)
    e = np.array(e)
    assert e[0] < e[1]
    assert vecs.shape == (2, 3)


def test_multistate_forces_vs_finite_difference(trained):
    """Excited-state forces: per-root Hellmann-Feynman derivatives of the
    continuation energies against finite differences."""
    backend = FCIBackend(nroots=2, roots_train=[0, 1])
    for d in [1.2, 1.8, 2.6]:
        backend.append_to_rdms(chain(d))
    model = ContinuationModel.from_backend(chain(1.8), backend)
    rng = np.random.default_rng(1)
    c0 = np.asarray(chain(2.0).coords) + 0.03 * rng.standard_normal((N_AT, 3))
    en, F = model.multistate_and_forces(c0, nroots=2)
    en, F = np.array(en), np.array(F)
    assert en[0] < en[1]
    eps = 1e-5
    for k in range(2):
        for (i, d) in [(0, 0), (2, 1)]:
            cp, cm = c0.copy(), c0.copy()
            cp[i, d] += eps
            cm[i, d] -= eps
            ep = np.array(model.multistate(cp, nroots=2)[0])[k]
            em = np.array(model.multistate(cm, nroots=2)[0])[k]
            fd = -(ep - em) / (2 * eps)
            assert abs(F[k, i, d] - fd) < 1e-6


def test_batched_forces_chunked_matches_fused(trained):
    """lax.map-chunked batched dispatch must agree exactly with the fused
    vmap (the bench's batch-128 recovery path)."""
    _, model = trained
    ds = [1.4, 1.7, 2.0, 2.3]
    batch = np.stack([np.asarray(chain(d).coords) for d in ds])
    e0, f0 = model.potential_and_forces_batch(batch)
    e1, f1 = model.potential_and_forces_batch(batch, chunk=2)
    np.testing.assert_allclose(np.array(e1), np.array(e0), atol=1e-12)
    np.testing.assert_allclose(np.array(f1), np.array(f0), atol=1e-12)
