"""Training-basis orthonormalization (continuation.orthonormalize_store):
exact equivalence in f64, and the f32 conditioning win it exists for.

Production context: the Zundel-84 store's training overlap has
kappa(S) ~ 2e6; the raw f32 whitened GEP collapses to spurious states
tens of Ha below the physical ground state (observed in the stage-4
production run), while the same f32 pipeline on the orthonormalized
store stays at the 1e-5-Ha level.
"""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.model import ContinuationModel
from evcont_tpu.continuation import orthonormalize_store, to_pair_layout


def chain(d, n=4):
    xs = (np.arange(n) - np.median(np.arange(n))) * d
    return Molecule.build([("H", (x, 0.0, 0.0)) for x in xs],
                          basis="sto-3g")


@pytest.fixture(scope="module")
def ill_conditioned_backend():
    """Training set with nearly linearly dependent states: close
    geometries make kappa(S) large, the production failure mode."""
    backend = FCIBackend()
    for d in [1.70, 1.701, 1.7015, 2.1]:
        backend.append_to_rdms(chain(d))
    return backend


def test_orthonormalized_equivalence_f64(ill_conditioned_backend):
    backend = ill_conditioned_backend
    mol = chain(1.9)
    m_raw = ContinuationModel.from_backend(mol, backend)
    m_ort = ContinuationModel.orthonormalized(
        mol, backend.overlap, backend.one_rdm, backend.two_rdm)
    assert np.allclose(np.asarray(m_ort.overlap),
                       np.eye(m_ort.overlap.shape[0]))
    for d in (1.75, 1.9, 2.05):
        e0 = float(m_raw.potential(chain(d).coords))
        e1 = float(m_ort.potential(chain(d).coords))
        assert abs(e0 - e1) < 1e-9


def test_orthonormalized_pair_layout_roundtrip(ill_conditioned_backend):
    backend = ill_conditioned_backend
    r1p, r2p = to_pair_layout(np.asarray(backend.one_rdm),
                              np.asarray(backend.two_rdm))
    ov_f, r1_f, r2_f = orthonormalize_store(
        backend.overlap, backend.one_rdm, backend.two_rdm)
    ov_p, r1_p, r2_p = orthonormalize_store(backend.overlap, r1p, r2p)
    # pair-compressed output must match the packed full-layout transform
    M = ov_p.shape[0]
    rows, cols = np.tril_indices(M)
    assert np.abs(r1_p - r1_f[rows, cols]).max() < 1e-12
    mol = chain(1.9)
    m_full = ContinuationModel(mol, ov_f, r1_f, r2_f)
    m_pair = ContinuationModel(mol, ov_p, r1_p, r2_p)
    e_full = float(m_full.potential(mol.coords))
    e_pair = float(m_pair.potential(mol.coords))
    assert abs(e_full - e_pair) < 1e-9


def test_f32_conditioning_win(ill_conditioned_backend):
    """Cast both stores to f32 and compare against the f64 truth: the raw
    near-singular whitening must lose orders of magnitude more accuracy
    than the orthonormalized store (the production failure this function
    exists to prevent)."""
    backend = ill_conditioned_backend
    mol = chain(1.9)
    coords = np.asarray(chain(1.85).coords)

    e_true = float(ContinuationModel.from_backend(mol, backend)
                   .potential(coords))

    r1p, r2p = to_pair_layout(np.asarray(backend.one_rdm),
                              np.asarray(backend.two_rdm))
    m_raw32 = ContinuationModel(mol, np.asarray(backend.overlap,
                                                dtype=np.float32),
                                r1p.astype(np.float32),
                                r2p.astype(np.float32))
    ov_o, r1_o, r2_o = orthonormalize_store(backend.overlap, r1p, r2p)
    m_ort32 = ContinuationModel(mol, ov_o.astype(np.float32),
                                r1_o.astype(np.float32),
                                r2_o.astype(np.float32))
    err_raw = abs(float(m_raw32.potential(coords)) - e_true)
    err_ort = abs(float(m_ort32.potential(coords)) - e_true)
    # orthonormalization must beat the raw f32 solve by >= 10x on this
    # deliberately ill-conditioned set, and stay chemically sane itself
    assert err_ort < 1e-3
    assert err_raw > 10 * err_ort
