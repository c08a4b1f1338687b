"""compress=True backends must be numerically identical to the full-layout
store through the continuation (the production layout for growing
active-learning runs: pair + exchange compression, 4x smaller, matching
the reference's 'both symmetries' case,
ab_initio_eigenvector_continuation.py:41-71 / 03_Zundel...:110), and the
host-worker snapshot/resume must reproduce the training state exactly."""

import numpy as np
import pytest

from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.backends.host_worker import HostWorkerBackend
from evcont_tpu.model import ContinuationModel
from evcont_tpu.molecule import Molecule


def _h4(d):
    return Molecule.build([("H", (0.0, 0.0, d * i)) for i in range(4)],
                          basis="sto-3g", unit="Bohr")


@pytest.fixture(scope="module")
def full_and_compressed():
    full = FCIBackend()
    comp = FCIBackend(compress=True)
    for d in (1.6, 1.9, 2.3):
        mol = _h4(d)
        full.append_to_rdms(mol)
        comp.append_to_rdms(mol)
    return full, comp


def test_compressed_layout_shapes(full_and_compressed):
    full, comp = full_and_compressed
    n = full.one_rdm.shape[-1]
    npair, packed = 3 * 4 // 2, n * n * (n * n + 1) // 2
    assert comp.overlap.shape == (3, 3)
    assert comp.one_rdm.shape == (npair, n, n)
    assert comp.two_rdm.shape == (npair, packed)
    np.testing.assert_array_equal(comp.overlap, full.overlap)
    # packed entries are the tril rows of the full store
    rows, cols = np.tril_indices(3)
    np.testing.assert_array_equal(comp.one_rdm, full.one_rdm[rows, cols])


def test_compressed_energies_match_full(full_and_compressed):
    full, comp = full_and_compressed
    mol = _h4(2.0)
    m_full = ContinuationModel.from_backend(mol, full)
    m_comp = ContinuationModel.from_backend(mol, comp)
    e_full = float(m_full.potential(mol.coords))
    e_comp = float(m_comp.potential(mol.coords))
    assert abs(e_full - e_comp) < 5e-6   # same math, reassociated sums


def test_compressed_prune_matches_full(full_and_compressed):
    full, comp = full_and_compressed
    # snapshot/restore round-trip doubles as the picklable-state check
    # (deepcopy would choke on the FCI solver's ctypes handle)
    f2, c2 = FCIBackend(), FCIBackend(compress=True)
    f2.restore(full.snapshot())
    c2.restore(comp.snapshot())
    f2.prune_datapoints([0, 2])
    c2.prune_datapoints([0, 2])
    rows, cols = np.tril_indices(2)
    np.testing.assert_array_equal(c2.overlap, f2.overlap)
    np.testing.assert_array_equal(c2.one_rdm, f2.one_rdm[rows, cols])


def test_host_worker_snapshot_resume(tmp_path):
    """Kill the worker mid-run, resume from solver_state.pkl, and keep
    appending: the resumed store must equal an uninterrupted run's."""
    workdir = str(tmp_path)
    factory = "evcont_tpu.backends.fci_backend:FCIBackend"
    kwargs = {"compress": True}

    oracle = FCIBackend(compress=True)
    for d in (1.6, 1.9, 2.3):
        oracle.append_to_rdms(_h4(d))

    with HostWorkerBackend(factory, kwargs=kwargs, workdir=workdir,
                           compress=True) as w1:
        w1.append_to_rdms(_h4(1.6))
        w1.append_to_rdms(_h4(1.9))
    # worker gone; resume and append the third point
    with HostWorkerBackend(factory, kwargs=kwargs, workdir=workdir,
                           compress=True, resume=True) as w2:
        assert w2.ntrain == 2
        w2.append_to_rdms(_h4(2.3))
        np.testing.assert_allclose(w2.overlap, oracle.overlap,
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(w2.one_rdm, oracle.one_rdm,
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(w2.two_rdm, oracle.two_rdm,
                                   rtol=0, atol=1e-10)
